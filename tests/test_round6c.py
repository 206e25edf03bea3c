"""Unit tests for the Spark-4 API-surface operators (spark4.py):
DataSource determinism + partition planning, the HLL rollup's error
bound vs exact distinct counts, mapInArrow edge cases, and SQL-UDF
inlining (no Python workers in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_python_datasource_partitions_and_determinism(spark, sf_smoke):
    from csv_to_parquet_spark.operators.spark4 import (
        _DSRC_PARTS,
        _make_rangelog_datasource,
        source_python_datasource,
    )

    spark.dataSource.register(_make_rangelog_datasource())
    src = spark.read.format("rangelog").load()
    # partitions() is the parallelism contract: one scan task per shard
    assert src.rdd.getNumPartitions() == _DSRC_PARTS

    a = sorted(map(tuple, source_python_datasource(spark, sf_smoke).collect()))
    b = sorted(map(tuple, source_python_datasource(spark, sf_smoke).collect()))
    assert a == b and len(a) == 5  # all five levels, bit-identical reads
    assert sum(r[1] for r in a) == src.count()


def test_hll_rollup_tracks_exact_distinct(spark, sf_oracle):
    from csv_to_parquet_spark.operators.spark4 import sketch_hll_daily_rollup

    got = {
        r.event_type: r.approx_users
        for r in sketch_hll_daily_rollup(spark, sf_oracle).collect()
    }
    from csv_to_parquet_spark.sources.tables import load_table

    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, est in got.items():
        # lgConfigK=12 default → relative standard error ≈ 0.8%; 10%
        # is ~12 sigma, far past any plausible flake
        assert abs(est - exact[t]) <= max(2, 0.10 * exact[t]), (
            t,
            est,
            exact[t],
        )


def test_mapinarrow_handles_empty_and_matches_jvm(spark, tmp_path):
    """Edge cases the bench corpus never hits: a zero-length vector
    (reduceat's empty-segment copy quirk) and a single-element batch;
    plus value agreement with an independent JVM-side computation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from csv_to_parquet_spark.operators.spark4 import (
        _ARROW_Q,
        mapinarrow_norm_audit,
    )

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[0.5, -0.25], [], [1.0]],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 0], type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = {
        r.vec_id: (r.dim, r.norm_sq_q)
        for r in mapinarrow_norm_audit(spark, str(tmp_path)).collect()
    }
    q = _ARROW_Q
    # floor(0.5e6)=500000, floor(-0.25e6)=-250000
    assert got[1] == (2, 500_000**2 + 250_000**2)
    assert got[2] == (0, 0)
    assert got[3] == (1, q * q)

    # independent JVM-side computation over the same file
    jvm = (
        spark.read.parquet(str(tmp_path / "embeddings.parquet"))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(transform(embedding, x -> CAST(FLOOR("
                f"CAST(x AS DOUBLE) * {q}) AS BIGINT)), CAST(0 AS BIGINT),"
                f" (acc, v) -> acc + v * v)"
            ).alias("n"),
        )
        .collect()
    )
    assert {r.vec_id: r.n for r in jvm} == {k: v[1] for k, v in got.items()}


def test_sql_udf_stays_jvm_side(spark, sf_smoke):
    """The SQL UDF must be inlined by Catalyst: no Python-eval nodes
    in the physical plan (that's the whole point vs a Python UDF)."""
    from csv_to_parquet_spark.operators.spark4 import sql_udf_disc_revenue

    df = sql_udf_disc_revenue(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    rows = {r.l_returnflag: r.disc_revenue_units for r in df.collect()}
    assert set(rows) == {"A", "N", "R"} and all(v > 0 for v in rows.values())


def test_observe_metrics_match_direct_aggregate(spark, sf_smoke):
    from csv_to_parquet_spark.functions import tokenize
    from csv_to_parquet_spark.operators.spark4 import (
        _OBS_SHORT_TOKENS,
        pipeline_observe_metrics,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = pipeline_observe_metrics(spark, sf_smoke).collect()[0]
    n_tok = F.size(tokenize("text"))
    want = (
        load_table(spark, sf_smoke, "documents")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok.cast("bigint")).alias("n_tokens"),
            F.sum(
                F.when(n_tok < _OBS_SHORT_TOKENS, 1).otherwise(0).cast("bigint")
            ).alias("n_short"),
            F.max(n_tok.cast("bigint")).alias("max_tokens"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_transform_with_state_matches_batch_aggregate(spark, sf_smoke):
    """Runs only where google.protobuf exists (transformWithState's
    JVM<->Python state server requires it); the operator is gated out
    of the catalog in environments without it."""
    from csv_to_parquet_spark.streaming.jobs import _HAS_PROTOBUF

    if not _HAS_PROTOBUF:
        pytest.skip("google.protobuf not available in this environment")

    from csv_to_parquet_spark.streaming.jobs import (
        stream_transform_with_state,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {
        r.user_id: (r.n_events, r.value_cents, r.n_types)
        for r in stream_transform_with_state(spark, sf_smoke).collect()
    }
    want = {
        r.user_id: (r.n_events, r.value_cents, r.n_types)
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias(
                "value_cents"
            ),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert got == want


def test_phash_near_dup_exact_vs_bruteforce(spark, sf_smoke):
    """The banded candidate scheme must equal a brute-force Hamming
    sweep over ALL hash pairs (lossless at radius 3 by pigeonhole) —
    a stronger check than the rows-only driver gate for this
    non-SQL-expressible operator."""
    import numpy as np

    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.multimodal import (
        _PHASH_MAX_HAMMING,
        mm_phash_near_dup,
        phash_signatures,
    )

    sigs = {r.doc_id: r.phash for r in phash_signatures(spark, sf_smoke).collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in mm_phash_near_dup(spark, sf_smoke).collect()
    }
    release_caches()

    ids = sorted(sigs)
    h = np.array([sigs[i] for i in ids], dtype=np.int64).view(np.uint64)

    def popcount64(x):  # numpy<2 has no bitwise_count
        b = x.view(np.uint8).reshape(-1, 8)
        return np.unpackbits(b, axis=1).sum(axis=1)

    want = {}
    for i in range(len(ids)):
        d = popcount64(h ^ h[i])
        for j in np.nonzero(d <= _PHASH_MAX_HAMMING)[0]:
            if ids[i] < ids[j]:
                want[(ids[i], ids[j])] = int(d[j])
    assert got == want
    # hash determinism: a second distributed pass agrees bit-for-bit
    again = {r.doc_id: r.phash for r in phash_signatures(spark, sf_smoke).collect()}
    assert again == sigs
