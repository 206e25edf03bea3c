"""Round-7 unit tests: the protobuf compatibility shim and the new
SQL-surface operators' edge semantics that the oracle compare can't
see (idempotence, shim scoping, probe determinism)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ensure_protobuf_loads_state_messages():
    """In this container the system google-cloud-sdk runtime must make
    pyspark's state-server messages importable (the gate that un-gated
    stream_transform_with_state)."""
    from csv_to_parquet_spark.pbcompat import ensure_protobuf

    assert ensure_protobuf() is True
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    assert len(sm.DESCRIPTOR.message_types_by_name) > 0
    # idempotent: a second call must not stack another wrapper
    from google.protobuf import runtime_version

    before = runtime_version.ValidateProtobufRuntimeVersion
    assert ensure_protobuf() is True
    assert runtime_version.ValidateProtobufRuntimeVersion is before


def test_ensure_protobuf_exports_shim_pythonpath():
    """ensure_protobuf must put the sitecustomize shim dir on
    PYTHONPATH (Spark-spawned pythons import StateMessage_pb2 from
    framework code before any user code — interpreter startup is the
    only patch point there)."""
    from csv_to_parquet_spark.pbcompat import _SHIM_DIR, ensure_protobuf

    ensure_protobuf()
    assert _SHIM_DIR in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    assert os.path.isfile(os.path.join(_SHIM_DIR, "sitecustomize.py"))


def test_sitecustomize_shim_fixes_fresh_interpreter():
    """End-to-end check of the exact mechanism Spark's spawned pythons
    rely on: a FRESH interpreter with only the shim dir on PYTHONPATH
    (no repo imports) must be able to import StateMessage_pb2."""
    from csv_to_parquet_spark.pbcompat import _SHIM_DIR

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = _SHIM_DIR
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import pyspark.sql.streaming.proto.StateMessage_pb2 as m;"
            "print('N', len(m.DESCRIPTOR.message_types_by_name))",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().startswith("N ")


def test_lsh_query_probes_deterministic_and_sized(spark):
    """The directed-multiprobe UDF must emit exactly _T_PROBES buckets
    per table, base bucket first, all within the k-bit key space, and
    identically across invocations (seeded planes, no RNG at call
    time)."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.operators.similarity import (
        _K_BITS,
        _N_TABLES,
        _T_PROBES,
        _query_probes,
        _table_buckets,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
    )
    probes = {
        r.vec_id: r.p
        for r in emb.select("vec_id", _query_probes(F.col("embedding")).alias("p")).collect()
    }
    base = {
        r.vec_id: r.b
        for r in emb.select("vec_id", _table_buckets(F.col("embedding")).alias("b")).collect()
    }
    probes2 = {
        r.vec_id: r.p
        for r in emb.select("vec_id", _query_probes(F.col("embedding")).alias("p")).collect()
    }
    assert probes == probes2
    for vid, tables in probes.items():
        assert len(tables) == _N_TABLES
        for t, plist in enumerate(tables):
            assert len(plist) == _T_PROBES
            assert plist[0] == base[vid][t]  # zero-perturbation first
            assert len(set(plist)) == _T_PROBES  # distinct buckets
            assert all(0 <= p < (1 << _K_BITS) for p in plist)


def test_sql_scripting_recurrence_matches_python_loop(spark):
    """The WHILE-loop compounding in sql_scripting_compound_loop must
    equal the plain Python integer recurrence for edge seeds too
    (zero, unit, and int64-scale balances) — the oracle only checks
    the one fixture-derived seed."""
    from csv_to_parquet_spark.operators.spark4b import (
        _SCRIPT_PERIODS,
        _SCRIPT_RATE_BP,
    )

    for seed in (0, 1, 17, 10**15):
        got = spark.sql(
            f"""
            BEGIN
              DECLARE bal BIGINT DEFAULT {seed};
              DECLARE i INT DEFAULT 0;
              WHILE i < {_SCRIPT_PERIODS} DO
                SET bal = bal + bal * {_SCRIPT_RATE_BP} DIV 10000;
                SET i = i + 1;
              END WHILE;
              SELECT bal AS final;
            END
            """
        ).collect()[0].final
        bal = seed
        for _ in range(_SCRIPT_PERIODS):
            bal = bal + bal * _SCRIPT_RATE_BP // 10000
        assert got == bal, (seed, got, bal)


def test_collation_join_is_broadcast_hash(spark):
    """The UTF8_LCASE join must stay a broadcast HASH join — if a
    Spark upgrade ever demotes collated equality to a nested loop,
    this trips before the bench does."""
    from csv_to_parquet_spark.operators.spark4b import (
        join_collation_ci_segments,
    )

    df = join_collation_ci_segments(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_sessions_late_arrival_invariance():
    """Regression for the r7 review finding: the timer sessionizer's
    state fold must be arrival-order-INSENSITIVE — a within-watermark
    late event delivered in a later batch must yield exactly the
    sessions a single sorted batch would."""
    from csv_to_parquet_spark.streaming.jobs import merge_sessions

    MIN = 60 * 1_000_000
    gap = 30 * MIN
    events = [0, 10 * MIN, 95 * MIN, 115 * MIN, 200 * MIN]

    def fold(batches):
        s: list = []
        for b in batches:
            s = merge_sessions(s, b, gap)
        return s

    expect = fold([sorted(events)])
    assert [tuple(s) for s in expect] == [
        (0, 10 * MIN, 2),
        (95 * MIN, 115 * MIN, 2),
        (200 * MIN, 200 * MIN, 1),
    ]
    # every 2-batch split, including late (out-of-order) deliveries
    import itertools

    for k in range(1, len(events)):
        for first in itertools.combinations(events, k):
            second = [e for e in events if e not in first]
            assert fold([list(first), second]) == expect, (first, second)
    # the review's exact scenario: late 09:30 after state holds
    # last=10:00, then 10:20 — must stay ONE session, end 10:20
    H = 60 * MIN
    s = merge_sessions([], [9 * H, 10 * H], gap)  # 09:00, 10:00 (>gap split? 60min>30min gap -> two)
    assert len(s) == 2
    s = merge_sessions(s, [9 * H + 30 * MIN], gap)  # late 09:30 bridges
    assert [tuple(x) for x in s] == [(9 * H, 10 * H, 3)]
    s = merge_sessions(s, [10 * H + 20 * MIN], gap)  # 10:20 extends
    assert [tuple(x) for x in s] == [(9 * H, 10 * H + 20 * MIN, 4)]


def test_events_stream_sentinel_survives_int96_source(spark, tmp_path):
    """Regression for the r7 review: a legacy INT96 timestamp source
    surfaces in arrow as timestamp[ns] while the nanosAsLong read path
    stays off — the flush sentinel must still land flush_days out (not
    ~43 minutes, the ns-vs-us unit slip) and be written in the SOURCE's
    physical representation so both files read under one schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.sources.tables import load_table
    from csv_to_parquet_spark.streaming.jobs import _events_stream

    src = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    pdf = src.toPandas()
    sf_dir = str(tmp_path)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(
        tbl,
        f"{sf_dir}/events.parquet",
        use_deprecated_int96_timestamps=True,
    )
    meta = pq.ParquetFile(f"{sf_dir}/events.parquet")
    ts_idx = meta.schema_arrow.get_field_index("ts")
    assert meta.metadata.schema.column(ts_idx).physical_type == "INT96"

    ev = _events_stream(spark, sf_dir, flush_days=30)
    rows = (
        ev.writeStream.format("memory")
        .queryName("int96_sentinel_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    rows.awaitTermination()
    got = spark.sql("SELECT * FROM int96_sentinel_probe")
    real_max = got.filter(F.col("user_id") >= 0).agg(F.max("ts")).collect()[0][0]
    sent_min = got.filter(F.col("user_id") < 0).agg(F.min("ts")).collect()[0][0]
    gap_days = (sent_min - real_max).total_seconds() / 86_400
    assert abs(gap_days - 30) < 1, f"sentinel landed {gap_days:.2f} days out"
    assert got.filter(F.col("user_id") < 0).count() == 2
