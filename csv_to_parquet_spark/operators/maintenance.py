"""Warehouse-maintenance patterns: MERGE-style upsert and SCD2 builds.

The reference rewrites whole files per run (converter/converter.go:
153-158 — no incremental path of any kind); real pipelines at 100 TB
cannot. These two operators cover the canonical incremental shapes a
reference user upgrading to a lakehouse workflow needs:

- **MERGE upsert** (``merge_upsert_orders``): apply an updates batch
  to a base snapshot — update matched keys, insert new keys — without
  Delta/Iceberg: ``base ⟕anti updates ∪ updates``. The updates batch
  is small relative to the snapshot by definition, so the anti join
  broadcasts it and the base table is NEVER shuffled — the whole merge
  is a map over base splits plus a union. (A join-on-key formulation
  would shuffle all 100 TB of base on the merge key.)

- **SCD2 / run-length history** (``scd2_event_type_runs``): collapse
  an event stream into validity intervals per entity — the
  gaps-and-islands pattern: a lag-change flag, a running sum to number
  runs, then interval bounds via min/lead. Two shuffles by necessity
  (one hash partition on the entity for the windows, one for the
  per-run aggregate); group cardinality is per-entity so skew follows
  entity activity — salt hot entities if needed (see agg_salted_skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()


@CAT.query(
    "merge_upsert_orders",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(ROUND(o_totalprice * 1.05 * 100) AS BIGINT) AS total_cents
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N',
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 1000 = 0)
    SELECT b.o_orderkey, b.o_orderstatus,
           CAST(ROUND(b.o_totalprice * 100) AS BIGINT) AS total_cents,
           'base' AS src
    FROM orders b
    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, total_cents, 'merged' AS src
    FROM upd
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO base USING updates: matched keys take the update row,
    unmatched update keys insert. The updates batch (1% changed + 0.1%
    new, derived deterministically from orders so the oracle can
    reproduce it) broadcasts into a left-anti join against base — zero
    base-side shuffle."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    src = load_table(spark, sf_dir, "orders")
    updates = (
        src.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 1.05 * 100)
            .cast("bigint")
            .alias("total_cents"),
        )
        .unionAll(
            src.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .alias("total_cents"),
            )
        )
    )
    survivors = base.join(
        F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
    ).withColumn("src", F.lit("base"))
    return survivors.unionByName(updates.withColumn("src", F.lit("merged")))


@CAT.query(
    "scd2_event_type_runs",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IS DISTINCT FROM
                       LAG(event_type) OVER w THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    intervals AS (
      SELECT user_id, run_id, event_type,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type)
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY run_id) AS valid_to,
           n_events,
           (LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY run_id) IS NULL) AS is_current
    FROM intervals
    """,
)
def scd2_event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build via gaps-and-islands: consecutive runs of
    the same event_type per user become [valid_from, valid_to)
    intervals, open-ended (is_current) on the last run."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w_run = Window.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        "user_id",
        F.col("run_id").cast("bigint").alias("run_id"),
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_run).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w_run).isNull().alias("is_current"),
    )


@CAT.query(
    "cdc_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 <> 0),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST(ROUND(o_totalprice*1.10*100) AS BIGINT)
                  ELSE CAST(ROUND(o_totalprice*100) AS BIGINT) END AS cents
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS change_type,
           o.cents AS old_cents, n.cents AS new_cents
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.cents <> n.cents OR o.o_orderstatus <> n.o_orderstatus
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: emit one row
    per inserted ('I'), deleted ('D'), or value-changed ('U') key —
    the diff feed a downstream incremental consumer replays. Both
    snapshots are derived deterministically from ``orders`` (old drops
    keys %10=0; new drops %7=0 and bumps %3=0 prices 10%) so the
    oracle reproduces them exactly.

    Scale posture: a single full-outer sort-merge join on the key —
    the one unavoidable shuffle; unchanged rows are filtered BEFORE
    the result materializes, so the emitted diff is proportional to
    the churn, not the table. At 100 TB, snapshots bucketed on the
    key make this join exchange-free (see
    ``bucketed_join_order_revenue``)."""
    src = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = src.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("old_status"),
        cents.alias("old_cents"),
    )
    new = src.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("new_status"),
        F.when(F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") * 1.10 * 100))
        .otherwise(F.round(F.col("o_totalprice") * 100))
        .cast("bigint")
        .alias("new_cents"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_cents").isNull() & F.col("old_status").isNull(), "I")
        .when(F.col("new_cents").isNull() & F.col("new_status").isNull(), "D")
        .otherwise("U")
    )
    return (
        j.filter(
            F.col("old_status").isNull()
            | F.col("new_status").isNull()
            | (F.col("old_cents") != F.col("new_cents"))
            | (F.col("old_status") != F.col("new_status"))
        )
        .select(
            "o_orderkey",
            change.alias("change_type"),
            "old_cents",
            "new_cents",
        )
    )


#: Point-in-time timestamp for the SCD2 as-of lookup (mid-corpus).
_AS_OF_TS = "2024-01-15 00:00:00"


@CAT.query(
    "scd2_as_of_lookup",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IS DISTINCT FROM
                       LAG(event_type) OVER w THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    intervals AS (
      SELECT user_id, run_id, event_type, MIN(ts) AS valid_from
      FROM runs GROUP BY user_id, run_id, event_type),
    hist AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY run_id) AS valid_to
      FROM intervals)
    SELECT user_id, event_type, valid_from, valid_to
    FROM hist
    WHERE valid_from <= TIMESTAMP '{_AS_OF_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_AS_OF_TS}')
    """,
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) lookup against the SCD2 history:
    each user's dimension row that was valid AS OF a fixed timestamp —
    ``valid_from <= T < valid_to`` with the open (is_current) interval
    matching on NULL ``valid_to``. The query every SCD2 warehouse
    serves ("what did this dimension look like on date X").

    Reuses :func:`scd2_event_type_runs`'s interval build (same single
    user_id exchange + run windows), then a narrow interval filter —
    the as-of predicate prunes before any further join, and on a
    valid_from-partitioned history table it would prune partitions at
    the scan. At most one row per user survives by construction
    (intervals partition each user's timeline)."""
    hist = scd2_event_type_runs(spark, sf_dir)
    t = F.lit(_AS_OF_TS).cast("timestamp_ntz")
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "event_type", "valid_from", "valid_to")


@CAT.query(
    "maintenance_gdpr_erase",
    oracle="""
    WITH e AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(COUNT(e.c_custkey) AS BIGINT) AS n_erased,
           CAST(COUNT(*) - COUNT(e.c_custkey) AS BIGINT) AS n_after
    FROM orders o LEFT JOIN e ON o.o_custkey = e.c_custkey
    GROUP BY o_orderstatus
    """,
)
def maintenance_gdpr_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure audit: given an erasure-request
    key set (deterministic stand-in: custkeys ≡ 0 mod 97), report per
    order status how many fact rows existed, how many the erasure
    removes, and how many survive — the compliance report a pipeline
    emits BEFORE rewriting files. The actual rewrite is the kept-rows
    filter (``n_after`` side) written back partition-by-partition; at
    100 TB you only rewrite partitions that contain at least one hit,
    which is exactly what the per-key counts identify.

    Plan: one left join of the fact table against the erasure key set
    and one aggregation. The erasure frame is keyed on the dimension
    key with no broadcast hint — request lists are usually tiny and
    AQE will broadcast them when they are, but nothing breaks when a
    regulator-scale list arrives (same posture as the ADVICE fix in
    ``basket_association_rules``); counting ``e.c_custkey`` after a
    left join gives kept/erased in the same pass as the totals, so
    the fact table is scanned once."""
    erase = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    )
    return (
        orders.join(erase, orders.o_custkey == erase.c_custkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.count("c_custkey").alias("n_erased"),
            (F.count(F.lit(1)) - F.count("c_custkey"))
            .cast("bigint")
            .alias("n_after"),
        )
    )


@CAT.query(
    "ivm_incremental_agg",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 20 != 0),
    ins AS (SELECT * FROM orders WHERE o_orderkey % 20 = 0),
    final AS (
      SELECT o_orderdate, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(ROUND(o_totalprice * 1.05 * 100) AS BIGINT)
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
             END AS cents
      FROM base
      UNION ALL
      SELECT o_orderdate, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
      FROM ins)
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM final GROUP BY 1, 2, 3
    """,
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: refresh a materialized
    (year, month, status) revenue aggregate from a CDC delta batch
    WITHOUT rescanning the base table's updated rows — the standard
    signed-delta algebra (insert → +1/+cents, update → retraction
    −1/−old PLUS re-insert +1/+new) folded into the stored partials.

    Fixture: the base snapshot is orders with key % 20 != 0; the
    delta batch inserts the remaining orders and applies a +5% price
    update to base rows with key % 7 == 0. The maintained view is
    computed as ``agg(base) ∪ signed-agg(delta) → re-agg``, so the
    refresh cost is |delta| + |groups| — the whole point of IVM; the
    oracle instead aggregates the final table state directly, proving
    the incremental result IS the full recompute (counts cancel
    exactly because retraction and re-insert carry signed counts).

    Scale: the base aggregate would be a stored table in production
    (here recomputed once to stand in for it); the delta path touches
    only delta rows, partials are map-side combined, and the final
    merge groups ≤ |groups| + |delta groups| rows. Groups whose count
    reaches zero are dropped by the n > 0 filter — the retraction
    edge case that naive "add the delta" implementations miss.
    """
    from csv_to_parquet_spark.functions import cents

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    grp = [
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.col("o_orderstatus"),
    ]
    base = orders.filter(F.col("o_orderkey") % 20 != 0)
    inserts = orders.filter(F.col("o_orderkey") % 20 == 0)
    updated = base.filter(F.col("o_orderkey") % 7 == 0)

    v_base = base.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents("o_totalprice")).alias("c")
    )
    delta = (
        inserts.select(
            *grp, F.lit(1).alias("dn"), cents("o_totalprice").alias("dc")
        )
        .unionAll(
            updated.select(
                *grp,
                F.lit(-1).alias("dn"),
                (-cents("o_totalprice")).alias("dc"),
            )
        )
        .unionAll(
            updated.select(
                *grp,
                F.lit(1).alias("dn"),
                cents(F.col("o_totalprice") * 1.05).alias("dc"),
            )
        )
    )
    d_agg = delta.groupBy("yr", "mo", "o_orderstatus").agg(
        F.sum("dn").alias("n"), F.sum("dc").alias("c")
    )
    return (
        v_base.unionAll(d_agg)
        .groupBy("yr", "mo", "o_orderstatus")
        .agg(F.sum("n").alias("n_orders"), F.sum("c").alias("revenue_cents"))
        .filter(F.col("n_orders") > 0)
        .select("yr", "mo", "o_orderstatus", "n_orders", "revenue_cents")
    )
