"""Relational operator catalog, wave 2 — widens SURVEY §2 Part B
coverage: more TPC-H query shapes (Q4/Q6), outer joins with unmatched
rows, argmax aggregation, map/array explode over JSON, null-handling
and conditional functions, unionByName, exact percentiles, and
IN-subquery rewrites.

Same scale rules as relational.py: broadcast the small side, one
shuffle per groupBy/join key, integer-cents money math, every computed
column aliased identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import cents
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@CAT.query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-filtered orders semi-joined to late-shipping
    lineitems, counted per priority. The semi join shuffles each side
    once on orderkey and never materializes lineitem columns."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@CAT.query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global agg — the all-pushdown
    query. Every predicate reaches the parquet scan; zero shuffles
    beyond the single-row final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "bigint"
                )
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@CAT.query(
    "join_left_outer_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_cents, 0) AS total_cents
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
                      CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
               FROM orders GROUP BY o_custkey) o
      ON o.o_custkey = c.c_custkey
    """,
)
def join_left_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers (aggregate-then-
    join: the fact side collapses to one row per key BEFORE the join —
    at scale this is the shuffle-minimal order)."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders", zero).alias("n_orders"),
        F.coalesce("total_cents", zero).alias("total_cents"),
    )


@CAT.query(
    "agg_argmax_supplier",
    oracle="""
    SELECT n_name, s_acctbal AS top_bal, s_suppkey AS top_suppkey
    FROM (SELECT n_name, s_acctbal, s_suppkey,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY s_acctbal DESC, s_suppkey DESC) AS rn
          FROM supplier JOIN nation ON s_nationkey = n_nationkey) t
    WHERE rn = 1 ORDER BY n_name
    """,
)
def agg_argmax_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group via max(struct(value, key)) — a deterministic
    single-pass argmax (ties broken by key), no window, no join-back."""
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    top = F.max(F.struct(F.col("s_acctbal"), F.col("s_suppkey"))).alias("top")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(top)
        .select(
            "n_name",
            F.col("top.s_acctbal").alias("top_bal"),
            F.col("top.s_suppkey").alias("top_suppkey"),
        )
        .orderBy("n_name")
    )


@CAT.query(
    "map_explode_props",
    oracle="""
    SELECT event_id, 'k' AS prop_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_value
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def map_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → map<string,bigint> → explode to (key, value) rows — the
    generic property-bag flattening pattern (schema-free ingestion)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))
        .filter(F.col("prop_value").isNotNull())
    )


@CAT.query(
    "null_funcs_supplier",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           GREATEST(s_acctbal, 0.0) AS bal_floor0,
           LEAST(s_acctbal, 1000.0) AS bal_cap1000,
           CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal_nonneg,
           (s_acctbal IS NULL) AS bal_is_null
    FROM supplier
    """,
)
def null_funcs_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling suite: coalesce/nullif/greatest/least/conditional
    nulling (the reference's only null semantics is empty-cell→NULL,
    converter.go:385-390; here nulls are first-class expressions)."""
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif("s_name", F.lit("")), F.lit("unknown")).alias(
            "name_or_default"
        ),
        F.greatest("s_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("s_acctbal", F.lit(1000.0)).alias("bal_cap1000"),
        F.when(F.col("s_acctbal") < 0, None)
        .otherwise(F.col("s_acctbal"))
        .alias("bal_nonneg"),
        F.isnull("s_acctbal").alias("bal_is_null"),
    )


@CAT.query(
    "union_by_name_parties",
    oracle="""
    SELECT kind, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(bal*100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS bal FROM supplier
    ) GROUP BY kind ORDER BY kind
    """,
)
def union_by_name_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName over heterogeneous sources normalized to a common
    schema — the ingestion-union pattern."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("bal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("bal")
    )
    return (
        c.unionByName(s)
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("bal")).alias("bal_cents"))
        .orderBy("kind")
    )


@CAT.query(
    "percentiles_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_quantity, 0.95), 6) AS p95
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark percentile ≙
    DuckDB quantile_cont). approx_percentile is the sketch-based scale
    path — estimates are engine-specific, so the exact form carries the
    oracle check."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.round(F.percentile("l_quantity", p), 6).alias(f"p{int(p * 100)}")
                for p in (0.25, 0.50, 0.75, 0.95)
            ]
        )
        .orderBy("l_returnflag")
    )


@CAT.query(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Date + returnflag filters push to the scans; nation broadcasts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_c) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@CAT.query(
    "q14_promo_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
                   ELSE 0 END)
             / SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)), 6)
             AS promo_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast
    fact⋈dim join (LIKE predicate on the dimension)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev_c).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev_c), 6).alias("promo_pct"),
        )
    )


@CAT.query(
    "q19_bracket_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates across both join
    sides — the join keeps the equi key, the OR-of-ANDs evaluates as a
    post-join filter."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    brackets = (
        ((b == "Brand#1") & q.between(1, 11) & s.between(1, 5))
        | ((b == "Brand#2") & q.between(10, 20) & s.between(1, 10))
        | ((b == "Brand#3") & q.between(20, 30) & s.between(1, 15))
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(brackets)
        .agg(
            F.sum(rev_c).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@CAT.query(
    "agg_collect_sorted_types",
    oracle="""
    SELECT p_brand,
           array_to_string(list_sort(list_distinct(list(p_type))), '|') AS types_sorted,
           CAST(len(list_distinct(list(p_type))) AS BIGINT) AS n_types
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def agg_collect_sorted_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + array_sort + array_join — deterministic string
    aggregation (sorted, so partition order can't leak into results)."""
    return (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.collect_set("p_type").alias("types"))
        .select(
            "p_brand",
            F.array_join(F.array_sort("types"), "|").alias("types_sorted"),
            F.size("types").cast("bigint").alias("n_types"),
        )
        .orderBy("p_brand")
    )


@CAT.query(
    "posexplode_tokens_sample",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents WHERE doc_id < 10)
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS pos,
           toks[i] AS token
    FROM t, unnest(range(1, len(toks) + 1)) r(i)
    """,
)
def posexplode_tokens_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — position-preserving array flattening."""
    from csv_to_parquet_spark.functions import tokenize

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


@CAT.query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation — the hand-rolled skew mitigation
    for a groupBy whose key distribution is pathological (here
    l_returnflag: 3 distinct values over the whole fact table, the
    worst case for a single-exchange hash agg).

    Stage 1 groups on (key, salt16) so the skewed key spreads over 16
    reducers; stage 2 collapses the 16 partials per key. Results are
    identical to the plain groupBy (the oracle) because count/sum are
    decomposable. At 100 TB this caps any single reducer's input at
    1/16 of the hottest key. (AQE's skew handling covers joins; skewed
    *aggregations* still need explicit salting.)
    """
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", (F.col("l_orderkey") % 16).cast("int"))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("pq"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("pn").alias("n"), F.sum("pq").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@CAT.query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi join (orders whose total
    quantity clears a threshold) back into the 3-way join, top 100.
    The qualifying-keys aggregate runs first and semi-joins — the big
    fact table is never re-scanned per key."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


@CAT.query(
    "window_distribution_funcs",
    oracle="""
    SELECT s_suppkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(s_suppkey) OVER w AS poorest_key,
           LAST_VALUE(s_suppkey) OVER (PARTITION BY s_nationkey
               ORDER BY s_acctbal, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS richest_key
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile, percent_rank, cume_dist,
    first/last value over an explicit full-partition frame."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("s_suppkey").over(w).alias("poorest_key"),
        F.last("s_suppkey").over(w_full).alias("richest_key"),
    )


@CAT.query("approx_percentile_sketch")  # sketch estimates are engine-specific
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the single-pass,
    mergeable, bounded-memory scale path for quantiles; the exact
    interpolated variant (percentiles_quantity) carries the oracle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
                "approx_median_price"
            )
        )
    )


@CAT.query(
    "regexp_funcs_docs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[a-z]+') AS first_word,
           CAST(len(regexp_extract_all(text, 'ta[a-z]+')) AS BIGINT) AS n_ta_words,
           CAST(regexp_matches(text, 'hash') AS BOOLEAN) AS mentions_hash,
           regexp_replace(text, '[aeiou]+', '-', 'g')[1:20] AS devoweled_20
    FROM documents WHERE doc_id < 100
    """,
)
def regexp_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp suite: extract / extract_all count / match test / replace.
    Patterns stay in the common subset of Java regex (Spark) and RE2
    (DuckDB) so both engines agree."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("ta[a-z]+"), 0))
        .cast("bigint")
        .alias("n_ta_words"),
        F.col("text").rlike("hash").alias("mentions_hash"),
        F.substring(F.regexp_replace("text", "[aeiou]+", "-"), 1, 20).alias(
            "devoweled_20"
        ),
    )


@CAT.query(
    "filtered_aggregates",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents,
           CAST(MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'P') AS TIMESTAMP)
             AS last_pending
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates — per-aggregate predicates in one pass
    (one scan, one exchange) instead of N filtered subqueries."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                   FILTER (WHERE o_orderstatus = 'O') AS open_cents,
               CAST(MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'P')
                    AS TIMESTAMP_NTZ) AS last_pending
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@CAT.query(
    "bitwise_funcs_keys",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 15 AS or15,
           xor(l_orderkey, l_linenumber) AS xored,
           l_orderkey << 2 AS shl2,
           l_orderkey >> 3 AS shr3,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def bitwise_funcs_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function suite: and/or/xor/shifts/popcount."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("or15"),
        k.bitwiseXOR(F.col("l_linenumber")).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


@CAT.query(
    "set_multiset_ops",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
      SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (
      SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
    """,
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
    duplicate multiplicities, unlike the distinct set ops in wave 1."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionByName(ea)


@CAT.query(
    "string_funcs2_part",
    oracle="""
    SELECT p_partkey,
           upper(p_name[1:1]) || lower(p_name[2:]) AS name_title,
           translate(p_brand, '#', '_') AS brand_tr,
           repeat(p_brand[1:1], 3) AS b3,
           reverse(p_type) AS type_rev,
           CAST(instr(p_type, 'AN') AS BIGINT) AS an_pos,
           left(p_name, 5) AS name_l5,
           right(p_type, 4) AS type_r4,
           CAST(starts_with(p_type, 'PROMO') AS BOOLEAN) AS is_promo,
           CAST(contains(p_name, 'red') AS BOOLEAN) AS has_red
    FROM part
    """,
)
def string_funcs2_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function suite: title-case composition/translate/
    repeat/reverse/instr/left/right/startswith/contains."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.lower(F.expr("substring(p_name, 2)")),
        ).alias("name_title"),
        F.translate("p_brand", "#", "_").alias("brand_tr"),
        F.repeat(F.substring("p_brand", 1, 1), 3).alias("b3"),
        F.reverse("p_type").alias("type_rev"),
        F.instr("p_type", "AN").cast("bigint").alias("an_pos"),
        F.substring("p_name", 1, 5).alias("name_l5"),
        F.substring(F.col("p_type"), -4, 4).alias("type_r4"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
    )


@CAT.query(
    "array_funcs_docs",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(list_contains(toks, 'hash') AS BOOLEAN) AS has_hash,
           CAST(list_position(toks, 'table') AS BIGINT) AS table_pos,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
    FROM t
    """,
)
def array_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function suite over token arrays: size/distinct/contains/
    position/indexing/sort+slice — all JVM-side array ops.
    (array_position returns 0 for missing in both engines.)"""
    from csv_to_parquet_spark.functions import tokenize

    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", tokenize("text").alias("toks"))
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.array_contains("toks", "hash").alias("has_hash"),
        F.array_position("toks", "table").cast("bigint").alias("table_pos"),
        F.col("toks")[0].alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("toks")), 1, 3), ","
        ).alias("first3_sorted"),
    )


@CAT.query(
    "profile_table_stats",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(l_quantity) AS qty_nonnull,
           MIN(l_quantity) AS qty_min,
           MAX(l_quantity) AS qty_max,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS flag_card,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS ship_min,
           CAST(MAX(l_shipdate) AS TIMESTAMP) AS ship_max,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS disc_violations
    FROM lineitem
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: null counts, ranges, cardinalities, and a
    constraint check in ONE scan (all aggregates fold map-side, one
    single-row exchange) — the ingestion-QA step a pipeline runs before
    promoting data. The reference's only validation is output-file
    non-emptiness (converter/converter.go:161-166)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("qty_nonnull"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.count_distinct("l_returnflag").alias("flag_card"),
        F.min("l_shipdate").cast("timestamp_ntz").alias("ship_min"),
        F.max("l_shipdate").cast("timestamp_ntz").alias("ship_max"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("disc_violations"),
    )


_Z_THRESH = 2.5


@CAT.query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, CAST(ROUND(value*100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, c,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             SUM(c) OVER (PARTITION BY user_id) AS s,
             SUM(c*c) OVER (PARTITION BY user_id) AS ss
      FROM e),
    z AS (
      SELECT event_id, user_id, c,
             CASE WHEN CAST(ss AS DOUBLE)/n
                       - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n) > 0
                  THEN (CAST(c AS DOUBLE) - CAST(s AS DOUBLE)/n)
                       / sqrt(CAST(ss AS DOUBLE)/n
                              - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
             END AS zs
      FROM w)
    SELECT event_id, user_id, c AS value_cents, ROUND(zs, 6) AS z
    FROM z WHERE abs(zs) > {_Z_THRESH}
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity outlier detection: events whose value sits more than
    2.5 standard deviations from the user's own mean — the monitoring
    / data-QA scan that catches bad meters and corrupt loads before
    training data is promoted.

    Cross-engine exactness despite float statistics: the per-user
    moments are EXACT integer sums (count, sum of cents, sum of
    squared cents — all bigint, associative in any partition order);
    mean/variance/z are then derived with an identical double
    expression tree on both engines, so no accumulation-order drift
    exists anywhere. One shuffle (the per-user window partition);
    the flagged subset is filtered before materialization.

    Zero-variance guard: a user whose events all share one value (a
    single-event user suffices) has variance exactly 0; an unguarded
    divide would throw DIVIDE_BY_ZERO under Spark's ANSI mode while
    DuckDB silently NULLs. Both engines gate the z-score behind
    ``variance > 0`` with the same CASE shape, so constant-valued
    users are dropped identically — a near-certainty in any 100 TB
    corpus even though the driver fixtures happen not to contain one.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("user_id")
    n = F.count(F.lit(1)).over(w)
    sm = F.sum("c").over(w)
    ss = F.sum(F.col("c") * F.col("c")).over(w)
    mean = sm.cast("double") / n
    var = ss.cast("double") / n - mean * mean
    # CASE branches evaluate lazily per-row, so the division never runs
    # when var == 0 (ANSI-safe); NULL zs rows fail the threshold filter
    # exactly as the oracle's NULL does.
    zs = F.when(var > 0, (F.col("c").cast("double") - mean) / F.sqrt(var))
    return (
        e.withColumn("zs", zs)
        .filter(F.abs(F.col("zs")) > _Z_THRESH)
        .select(
            "event_id",
            "user_id",
            F.col("c").alias("value_cents"),
            F.round("zs", 6).alias("z"),
        )
    )


@CAT.query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_cents
    FROM supplier, rev
    WHERE s_suppkey = l_suppkey
      AND total_cents = (SELECT MAX(total_cents) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, then the
    supplier(s) achieving the global maximum (aggregate → scalar-max
    semi-filter → dim join). The revenue aggregate is computed once and
    reused for both the max and the final join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_c).alias("total_cents"))
    mx = rev.agg(F.max("total_cents").alias("m"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        rev.join(F.broadcast(mx), rev.total_cents == mx.m)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
        .orderBy("s_suppkey")
    )


@CAT.query(
    "udtf_split_bigrams",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents WHERE doc_id < 5)
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS bigram_idx,
           array_to_string(toks[i:i+1], ' ') AS bigram
    FROM t, unnest(range(1, len(toks))) r(i)
    """,
)
def udtf_split_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → many output rows
    with arbitrary Python logic — the extension point for custom
    flatteners/parsers. (This one deliberately mirrors a pure-Spark
    explode so the oracle can verify the UDTF machinery exactly; the
    explode formulation in text_ngram_top50 remains the perf path.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram_idx bigint, bigram string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str):
            toks = text.strip().split()
            for i in range(len(toks) - 1):
                yield doc_id, i, f"{toks[i]} {toks[i + 1]}"

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    d.createOrReplaceTempView("_udtf_docs_in")
    spark.udtf.register("split_bigrams", BigramUDTF)
    return spark.sql(
        "SELECT t.* FROM _udtf_docs_in, "
        "LATERAL split_bigrams(doc_id, text) t"
    )


@CAT.query(
    "generate_date_spine",
    oracle="""
    WITH spine AS (
      SELECT CAST(unnest(range(DATE '1997-01-01', DATE '1997-03-01',
                               INTERVAL 1 DAY)) AS TIMESTAMP) AS d)
    SELECT s.d AS order_day, COUNT(o.o_orderkey) AS n_orders
    FROM spine s LEFT JOIN orders o
      ON CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) = s.d
    GROUP BY s.d
    """,
)
def generate_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date spine (sequence + explode) left-joined to facts —
    the calendar-table pattern that reports zero-activity days. The
    fact side is aggregated to day granularity FIRST (map-side partial
    agg collapses 100 TB of orders to one row per day), then the spine
    left-joins the tiny day-level aggregate with a broadcast on the
    non-preserved side — Spark cannot broadcast the preserved side of
    an outer join, so joining raw facts with a spine-side hint would
    silently fall back to a shuffle join over the whole fact table."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-02-28").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    ).select(F.col("day").cast("timestamp_ntz").alias("order_day"))
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("day", "o_orderdate").cast("timestamp_ntz").alias("order_day")
        )
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    return spine.join(F.broadcast(daily), "order_day", "left").select(
        "order_day",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


@CAT.query(
    "grouped_pandas_order_seq",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) - 1 AS seq_idx,
           COALESCE(date_diff('day',
               CAST(LAG(o_orderdate) OVER w AS DATE),
               CAST(o_orderdate AS DATE)), -1) AS days_since_prev,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def grouped_pandas_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer order-history features
    (sequence index, day gaps, exact running cents) computed with
    pandas inside each group — the operator shape for per-entity
    feature engineering where the transition logic outgrows window
    functions (here it deliberately doesn't, so the window-SQL oracle
    verifies the grouped-map machinery bit-for-bit: every output is
    integer-exact). One shuffle on the grouping key; group size is
    bounded by orders-per-customer, so executor memory is safe at any
    corpus scale."""
    import numpy as np
    import pandas as pd  # noqa: F811

    def features(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
        days = pdf["o_orderdate"].astype("datetime64[us]").dt.normalize().diff()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "seq_idx": np.arange(len(pdf), dtype=np.int64),
                "days_since_prev": days.dt.days.fillna(-1).astype(np.int64),
                "cum_cents": np.round(pdf["o_totalprice"] * 100)
                .astype(np.int64)
                .cumsum(),
            }
        )

    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .applyInPandas(
            features,
            "o_orderkey BIGINT, o_custkey BIGINT, seq_idx BIGINT, "
            "days_since_prev BIGINT, cum_cents BIGINT",
        )
    )


@CAT.query(
    "in_subquery_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 400000)
    """,
)
def in_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (SQL form) — Catalyst rewrites to a left-semi join;
    same plan as the DataFrame semi join, proving the SQL surface."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
        """
    )
