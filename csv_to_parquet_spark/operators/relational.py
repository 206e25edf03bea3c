"""Relational operator catalog — scans, filters, projections, joins
(broadcast/shuffle/semi/anti/outer/range/theta/as-of), aggregations
(hash, distinct, rollup/cube/grouping sets), windows, sorts/top-k, set
ops, and scalar function suites (string/date/math/json/conditional).

The reference tool has none of these (SURVEY.md §2 Part B — it is a
single-table CSV→Parquet pipeline, converter/converter.go:66-378); this
module is the relational surface our Spark engine adds on top, each
query oracle-tested against DuckDB.

Scale notes (100 TB posture):
- Dimension joins (`nation`, `region`, `part`, `supplier`) are
  broadcast explicitly — no shuffle of the fact table.
- Fact-fact joins shuffle on their join keys once; AQE handles skew.
- Aggregations are expressed as single groupBy so Spark plans
  partial (map-side) + final hash aggregation.
- Top-k uses orderBy().limit(k) which plans TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, no global sort).
- Money aggregates go through exact integer cents (see functions/):
  bit-identical results regardless of partition merge order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csv_to_parquet_spark.functions import cents
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Aggregation suite
# ---------------------------------------------------------------------------

@CAT.query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                     AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → hash agg (partial+final) → sort.

    Flagship query. Single shuffle on the two low-cardinality group
    keys; sums are exact integer cents so every partition merge order
    yields identical bits.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    charge_c = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("bigint")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (F.sum(disc_price_c) / 100.0).alias("sum_disc_price"),
            (F.sum(charge_c) / 100.0).alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("bigint")) / cnt.cast("double")).alias("avg_qty"),
            (F.sum(cents("l_extendedprice")) / cnt.cast("double") / 100.0).alias("avg_price"),
            (F.sum(cents("l_discount")) / cnt.cast("double") / 100.0).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@CAT.query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — Spark plans a two-phase expand + agg."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@CAT.query("agg_approx_count_distinct")  # no oracle: HLL estimate is engine-specific
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the *scale* path for distinct
    counting (exact distinct shuffles all keys; HLL is one pass,
    mergeable, constant memory). Rows-only check by design."""
    return (
        _t(spark, sf_dir, "lineitem")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"))
    )


@CAT.query(
    "agg_stats_customer",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           SQRT((CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT) * CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)
                 - CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)
                   * CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) / 100.0 AS std_bal,
           MEDIAN(CAST(ROUND(c_acctbal*100) AS BIGINT)) / 100.0 AS med_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def agg_stats_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: min/max/stddev/median per group.

    stddev is computed from exact integer-cents partial sums (sum,
    sum-of-squares, count) with an identical double-arithmetic formula
    on both engines — engine-internal stddev implementations (Welford
    vs sum-of-squares, merge order) differ in the last ulps and are not
    hash-stable.
    """
    c = cents("c_acctbal")
    agg = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(c).alias("bal_cents"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.sum(c * c).alias("_sum_sq"),
            (F.median(c) / 100.0).alias("med_bal"),
        )
    )
    s1 = F.col("bal_cents").cast("double")
    std = (
        F.sqrt(
            (F.col("_sum_sq").cast("double") - s1 * s1 / F.col("n"))
            / (F.col("n") - 1)
        )
        / 100.0
    )
    return agg.select(
        "c_mktsegment",
        "n",
        "bal_cents",
        "min_bal",
        "max_bal",
        std.alias("std_bal"),
        "med_bal",
    ).orderBy("c_mktsegment")


@CAT.query(
    "rollup_region_nation",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals after two broadcast dimension joins."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(cents("c_acctbal")).alias("bal_cents"),
        )
    )


@CAT.query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("total"),
        )
    )


@CAT.query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS oyear,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)), (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (Catalyst Expand operator)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS oyear,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS total_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)), (o_orderstatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Filters / projections / sorts / distinct / set ops
# ---------------------------------------------------------------------------

@CAT.query(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection — both push into the parquet scan
    (verified by tests/test_plans.py: PushedFilters + pruned ReadSchema)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 45)
        & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@CAT.query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: plans TakeOrderedAndProject (no global sort — per-partition
    heaps, driver merges k rows). Unique tiebreaker keeps it deterministic."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@CAT.query(
    "distinct_mktsegments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@CAT.query(
    "set_union_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@CAT.query(
    "set_intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@CAT.query(
    "set_except_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@CAT.query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two equi-joins → agg → top-k.

    customer is filtered before the join (Catalyst pushes the predicate
    below the join); the orders⋈lineitem join shuffles on orderkey once.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_c) / 100.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@CAT.query(
    "q5_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Facts shuffle on their keys;
    nation/region/supplier are broadcast.

    The region prune is applied BEFORE the fact shuffles: the ASIA
    nation list (nation⋈region, a handful of rows) broadcasts onto
    customer ahead of the custkey exchange, so only the regional
    ~fifth of customers — and therefore of the joined order rows —
    ever shuffles; the supplier broadcast is semi-pruned by the same
    list. Joining region last would shuffle every customer and order
    on the planet first and discard 4/5 of the work."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    c = _t(spark, sf_dir, "customer").join(
        asia, F.col("c_nationkey") == F.col("n_nationkey")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").join(
            asia.select("n_nationkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .groupBy("n_name")
        .agg((F.sum(rev_c) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@CAT.query(
    "join_broadcast_part_qty",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem, part WHERE l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_broadcast_part_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: zero shuffle for the
    join; only the final (tiny) agg exchanges."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@CAT.query(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): emits each left row at most once, never
    materializes right columns."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@CAT.query(
    "join_anti_customers_no_p_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_anti_customers_no_p_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@CAT.query(
    "join_full_outer_nation_counts",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nk,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates with COALESCE defaulting."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nk"),
        F.coalesce(F.col("n_cust"), F.lit(0).cast("bigint")).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0).cast("bigint")).alias("n_supp"),
    )


@CAT.query(
    "join_range_shipments_90d",
    oracle="""
    SELECT o_orderkey, COUNT(*) AS n_shipped_90d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    """,
)
def join_range_shipments_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range (band) residual predicate: the equi key
    drives the shuffle/hash, the range is evaluated as a post-join
    filter — the scalable plan shape for banded joins."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_90d"))
    )


@CAT.query(
    "join_theta_nation_pairs",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (inequality residual on top of an equi key)."""
    a = _t(spark, sf_dir, "nation").alias("a")
    b = _t(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))


@CAT.query(
    "join_asof_purchase_signup",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT MAX(s.ts) FROM events s
            WHERE s.user_id = e.user_id AND s.event_type = 'signup'
              AND s.ts <= e.ts) AS signup_ts
    FROM events e WHERE e.event_type = 'purchase'
    """,
)
def join_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase → most recent signup of the same user
    at-or-before it), Spark lacks a native operator for this.

    Implementation: union both sides, one window pass with
    ``last(..., ignorenulls)`` over (user, ts). This is the scalable
    pattern — a single shuffle on user_id, no per-row subqueries, no
    cross product; exactly how you'd do it on 100 TB of events.
    """
    ev = _t(spark, sf_dir, "events")
    sides = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        # signup sorts before purchase at equal ts → inclusive as-of
        F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)).alias("_tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sig = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        sides.withColumn("signup_ts", sig)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "signup_ts")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@CAT.query(
    "window_rank_top3_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS drnk
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_rank_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank — the scalable per-group top-N idiom
    (single shuffle on the partition key, no self-join)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@CAT.query(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             / CAST(COUNT(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS mov_avg,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
    FROM orders
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame moving average + exact running total, both built
    on integer-cents window sums (hash-stable; see module docstring)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, 0)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents("o_totalprice")).over(w3)
            / F.count(F.lit(1)).over(w3).cast("double")
            / 100.0
        ).alias("mov_avg"),
        F.sum(cents("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_cents"),
    )


@CAT.query(
    "window_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — days since the customer's previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("bigint")
        .alias("gap_days"),
    )


@CAT.query(
    "session_window_batch",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id, COUNT(DISTINCT sid) AS n_sessions
    FROM s GROUP BY user_id
    """,
)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window() in batch mode: 30-minute-gap sessionization,
    counted per user. Oracle is the classic gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sessions.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))


# ---------------------------------------------------------------------------
# Scalar function suites
# ---------------------------------------------------------------------------

@CAT.query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 10) AS name_prefix,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite (reference analog: the fixed
    trim/lower/replace pipeline in converter.go:201-211,380-412,
    generalized to user expressions)."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    )


@CAT.query(
    "date_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS oyear,
           CAST(month(o_orderdate) AS BIGINT) AS omonth,
           CAST(day(o_orderdate) AS BIGINT) AS oday,
           CAST(quarter(o_orderdate) AS BIGINT) AS oquarter,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function suite (the reference only *probes* date formats
    and discards the result — converter.go:264-275; here they're real)."""
    d = F.col("o_orderdate")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("oyear"),
        F.month(d).cast("bigint").alias("omonth"),
        F.dayofmonth(d).cast("bigint").alias("oday"),
        F.quarter(d).cast("bigint").alias("oquarter"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("due_date"),
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
    )


@CAT.query(
    "math_funcs_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
           l_orderkey % 7 AS key_mod
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function suite; transcendentals rounded to 6 dp (libm vs
    java.lang.Math may differ in the last ulp)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
            F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
        )
    )


@CAT.query(
    "json_extract_events",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the events.props JSON column."""
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return _t(spark, sf_dir, "events").select(
        "event_id", "event_type", parsed["k"].alias("k")
    )


@CAT.query(
    "case_when_bucketing",
    oracle="""
    SELECT bucket, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM (
      SELECT o_totalprice,
             CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 200000 THEN 'medium'
                  ELSE 'large' END AS bucket
      FROM orders) t
    GROUP BY bucket ORDER BY bucket
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(bucket, "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("bucket")
    )


@CAT.query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() — wide conditional aggregation."""
    piv = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    zero = F.lit(0).cast("bigint")
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), zero).alias("n_f"),
        F.coalesce(F.col("O"), zero).alias("n_o"),
        F.coalesce(F.col("P"), zero).alias("n_p"),
    ).orderBy("o_orderpriority")


@CAT.query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join — no per-row execution)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )
