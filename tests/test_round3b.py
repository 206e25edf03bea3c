"""Plan-shape and layout assertions for the round-3 additions.

Mirrors tests/test_plans.py: after correctness, assert the PHYSICAL
plan is the one we designed for 100 TB — broadcasts where a side is
small, no shuffle where the op is narrow, clustering where a rewrite
promises it.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontam_broadcasts_eval_side(spark, sf_smoke):
    from csv_to_parquet_spark.operators.textops import decontam_train_eval

    plan = _plan(decontam_train_eval(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    # the train side must NOT shuffle for the join itself
    assert "SortMergeJoin" not in plan


def test_repetition_filter_is_narrow(spark, sf_smoke):
    from csv_to_parquet_spark.operators.textops import text_repetition_filter

    plan = _plan(text_repetition_filter(spark, sf_smoke))
    # only the local-parallelism spread() round-robin; no hash exchange
    assert plan.count("Exchange hashpartitioning") == 0


def test_cdc_diff_is_single_full_outer_join(spark, sf_smoke):
    from csv_to_parquet_spark.operators.maintenance import cdc_snapshot_diff

    plan = _plan(cdc_snapshot_diff(spark, sf_smoke))
    assert "FullOuter" in plan
    assert plan.count("Join") == 1


def test_anomaly_zscore_single_window_shuffle(spark, sf_smoke):
    from csv_to_parquet_spark.operators.relational2 import events_anomaly_zscore

    plan = _plan(events_anomaly_zscore(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1  # the window partition
    assert "Window" in plan


def test_zorder_files_are_clustered(spark, sf_smoke):
    """The rewritten files must be disjoint in z-range (repartitionByRange
    + sortWithinPartitions), which is what makes min/max row-group
    pruning effective on BOTH z-dimensions."""
    import pyarrow.parquet as pq

    from csv_to_parquet_spark.operators.layout import (
        _WAREHOUSE,
        _sf_tag,
        layout_zorder_events,
    )

    layout_zorder_events(spark, sf_smoke).count()  # ensure written
    path = os.path.join(_WAREHOUSE, f"events_zorder_{_sf_tag(sf_smoke)}")
    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        arrow_schema = md.schema.to_arrow_schema()
        idx = arrow_schema.get_field_index("z_value")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file z-ranges overlap — not range-clustered"


def test_zorder_filter_pushdown(spark, sf_smoke):
    from csv_to_parquet_spark.operators.layout import (
        _WAREHOUSE,
        _sf_tag,
        layout_zorder_events,
    )

    layout_zorder_events(spark, sf_smoke).count()
    path = os.path.join(_WAREHOUSE, f"events_zorder_{_sf_tag(sf_smoke)}")
    df = spark.read.parquet(path).filter(F.col("z_value") < 1000)
    assert "PushedFilters: [IsNotNull(z_value), LessThan(z_value,1000)]" in _plan(
        df
    ) or "LessThan(z_value,1000)" in _plan(df)


def test_seq_dots_udf_matches_interpreted(spark, sf_smoke):
    """The numpy dimension-loop accumulation must be bit-identical to
    the interpreted F.aggregate sequential dot product."""
    from csv_to_parquet_spark.operators.clustering import (
        _PAIR_PLANES,
        _dot_seq,
        _arr_lit,
        _seq_dots_udf,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    e = load_table(spark, sf_smoke, "embeddings").limit(50)
    planes = [_PAIR_PLANES[0][j] for j in range(3)]
    udf = _seq_dots_udf(planes)
    got = e.select("vec_id", udf("embedding").alias("s")).select(
        "vec_id",
        *[F.col("s.dots")[i].alias(f"d{i}") for i in range(3)],
        F.col("s.nv").alias("nv"),
    )
    want = e.select(
        "vec_id",
        *[
            _dot_seq(F.col("embedding"), _arr_lit(p)).alias(f"d{i}")
            for i, p in enumerate(planes)
        ],
        F.sqrt(_dot_seq(F.col("embedding"), F.col("embedding"))).alias("nv"),
    )
    g = {r["vec_id"]: r for r in got.collect()}
    w = {r["vec_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in g:
        for c in ("d0", "d1", "d2", "nv"):
            assert g[k][c] == w[k][c], f"bit drift at {k}.{c}"
