"""TPC-H wave 3 — the multi-join / correlated-subquery shapes (Q7, Q8,
Q9, Q13, Q16, Q17, Q20, Q22), adapted to the driver's star schema.

The reference tool has no relational surface at all (SURVEY.md §2
Part B; converter/converter.go is a single-table pipeline); these are
engine extensions. Where the classic TPC-H query needs a column or
table this schema lacks (``partsupp``, ``l_commitdate``/``l_receiptdate``,
``o_comment``, ``c_phone``, ``p_container``), the query keeps the
*plan shape* that makes it interesting — the join topology, the
correlated or nested subquery, the anti-join — and drops only the
missing predicate; each docstring notes the adaptation.

Scale posture follows relational.py: dimension tables broadcast, fact
joins shuffle once on their keys, money aggregates in exact integer
cents, thresholds against averages computed as exact-integer /
integer so both engines derive bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import cents
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()

_REV_CENTS_SQL = "CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_cents() -> F.Column:
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@CAT.query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND year(l_shipdate) IN (1996, 1997)
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Two broadcast copies of ``nation`` (supplier side and
    customer side) with a disjunctive cross-nation predicate; the
    three fact/bridge joins shuffle on their keys once."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    sn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
        .join(cn, c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@CAT.query(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT year(o_orderdate) AS o_year,
             {_REV_CENTS_SQL} AS rev_cents,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN rev_cents ELSE 0 END) AS DOUBLE)
                 / SUM(rev_cents), 6) AS mkt_share
    FROM all_sales GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share within a region's market
    for one part type, per order year — an 8-way join with a
    conditional-aggregation ratio. All five dimensions broadcast; the
    share divides exact cent sums so the double is engine-identical.
    (Adaptation: p_type filter stands in for the 'ECONOMY ANODIZED
    STEEL' literal; schema has no multi-word types.)

    Join order is chosen for shuffle volume, not prose order: the
    selective PROMO part broadcast prunes lineitem ~6× BEFORE its
    orderkey exchange, and the nation→region broadcasts prune customer
    to the EUROPE ~fifth before its custkey exchange — Catalyst keeps
    written shuffle-join order absent CBO stats, so pruning ahead of
    the two fact-fact exchanges is our job, and at 100 TB those
    exchanges are the whole query."""
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO"))
    cn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_regionkey").alias("cn_region"),
        )
    )
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    sn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
    )
    c_eur = (
        _t(spark, sf_dir, "customer")
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cn_region") == r.r_regionkey)
    )
    o = _t(spark, sf_dir, "orders")
    sales = (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c_eur, o.o_custkey == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev_cents().alias("rev_cents"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("rev_cents")).otherwise(
        F.lit(0)
    )
    return (
        sales.groupBy("o_year")
        .agg(
            F.round(
                F.sum(nat).cast("double") / F.sum("rev_cents"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@CAT.query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS profit_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    order year, with a substring filter on part name pushed into the
    broadcast dimension. (Adaptation: no ``partsupp`` table in this
    schema, so profit omits the supplycost term — the 5-way join
    topology and LIKE-filtered dimension are the exercised shape.)"""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_rev_cents()).alias("profit_cents"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@CAT.query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count-per-customer histogram — a
    left outer join (customers with zero orders must appear) under a
    double aggregation. (Adaptation: no ``o_comment`` column, so the
    NOT-LIKE comment filter is dropped.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@CAT.query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    surviving (brand, type, size) bucket. (Adaptation: supplier-part
    pairs come from ``lineitem`` since the schema has no ``partsupp``;
    the exclusion predicates and COUNT DISTINCT under a multi-column
    groupBy are the exercised shape.) The distinct agg plans as a
    two-phase hash aggregation (dedupe on the grouping+suppkey, then
    count) — no row ever carries more than the four key columns."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@CAT.query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS avg_pk, 0.2 * AVG(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS total_cents,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON avg_pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity line items,
    where "small" is correlated — below 20%% of that part's own average
    quantity. The correlated scalar subquery is decorrelated into a
    per-part aggregate joined back on the part key (exactly what
    Catalyst does to the subquery form). The average is exact-sum /
    count over integral-valued quantities, so the threshold double is
    engine-identical. (Adaptation: no ``p_container`` column.)"""
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, F.col("avg_pk") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.sum(cents("l_extendedprice")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@CAT.query(
    "q20_heavy_shippers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1997
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100)
    ORDER BY s_suppkey
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of a
    product line in one year — a nested grouped-HAVING subquery
    consumed through a semi-join. (Adaptation: volume from
    ``lineitem`` instead of partsupp availability.) The subquery
    aggregates before the semi-join, so the join's build side is one
    row per qualifying supplier, not per line item."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    )
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    # the aggregated side is ≤ one row per supplier — broadcast it so
    # the semi-join never shuffles the supplier dimension (aggregates
    # have no stats, so Catalyst won't pick the broadcast on its own)
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@CAT.query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name ORDER BY n_name
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers who never ordered — a scalar
    average subquery as the threshold plus a NOT EXISTS anti-join,
    grouped by nation. The average is taken over exact integer cents
    (long sum / count) so the threshold double is engine-identical;
    the anti-join ships only custkeys. (Adaptation: grouped by nation
    since the schema has no ``c_phone`` country code.)"""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders")
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(
            F.avg(cents("c_acctbal")).alias("a")
        )
    )
    return (
        c.crossJoin(avg_bal)
        .filter(cents("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents("c_acctbal")).alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )


@CAT.query(
    "join_lateral_top2_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def join_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join with per-row LIMIT — the SQL-standard
    top-N-per-group surface (Spark 3.4+ decorrelates the correlated
    limit; DuckDB executes LATERAL natively). Each customer's two
    priciest orders, deterministic via the orderkey tiebreaker.
    Customers with no orders drop (inner lateral), with fewer than 2
    orders keep what exists — semantics a plain window-rank rewrite
    must reproduce exactly, which is why this entry exercises the
    LATERAL path itself rather than the `window_rank_top3_orders`
    rewrite the optimizer ultimately plans both into.

    Scale: Catalyst decorrelates to a partitioned rank over orders
    (one hash exchange on o_custkey) joined back to customer — the
    same physical shape as the window formulation, NOT a per-row
    subquery execution; the LATERAL syntax is free at 100 TB."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lateral_customer_v"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lateral_orders_v"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lateral_customer_v c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lateral_orders_v o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )
