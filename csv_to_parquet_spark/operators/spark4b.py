"""Round-7 Spark-4 SQL-language surfaces: SQL scripting
(BEGIN…END control flow), EXECUTE IMMEDIATE (dynamic SQL with
parameter binding), collation-aware joins, and ``approx_top_k``.

Like ``spark4.py``, no reference analog exists (the reference is a
565-line Go file converter — converter/converter.go); these round out
the query-language surface a platform team migrating TO this engine
would expect. Each is oracle-checked: scripting and dynamic SQL
reduce to deterministic integer arithmetic; the collated join's
oracle lowercases on the DuckDB side (DuckDB has no UNICODE_CI
collation but ``lower()`` equality is the same relation for the ASCII
join keys used here); ``approx_top_k`` is run with
``maxItemsTracked`` ≥ the key domain, where the sketch is provably
exact (every key tracked — no eviction ever happens), making the
"approximate" API oracle-checkable while still exercising its plan.

Scale notes per entry live on the docstrings; none of these introduce
a new shuffle shape — scripting/EXECUTE IMMEDIATE compile to ordinary
plans once the text is resolved, the collated join is a plain
hash join on a collated key (Catalyst hashes the collation key), and
approx_top_k is a single partial+final aggregate carrying a bounded
sketch per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from csv_to_parquet_spark.functions import cents
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()


# ---------------------------------------------------------------------------
# SQL scripting: BEGIN … END with variables, a WHILE loop, and IF
# ---------------------------------------------------------------------------

#: Loop iterations for the compounding script (and its oracle CTE).
_SCRIPT_PERIODS = 8
#: Growth per period in basis points (5%), applied in integer cents:
#: balance += balance * 500 div 10000 — exact on both engines.
_SCRIPT_RATE_BP = 500


@CAT.query(
    "sql_scripting_compound_loop",
    oracle=f"""
    WITH RECURSIVE seed AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 10000
                  AS BIGINT) AS bal
      FROM orders WHERE o_orderpriority = '1-URGENT'),
    it AS (
      SELECT 0 AS period, bal FROM seed
      UNION ALL
      SELECT period + 1, bal + bal * {_SCRIPT_RATE_BP} // 10000
      FROM it WHERE period < {_SCRIPT_PERIODS})
    SELECT CAST({_SCRIPT_PERIODS} AS BIGINT) AS periods,
           CAST({_SCRIPT_RATE_BP} AS BIGINT) AS rate_bp,
           (SELECT bal FROM it WHERE period = 0) AS seed_cents,
           (SELECT bal FROM it WHERE period = {_SCRIPT_PERIODS})
             AS final_cents
    """,
)
def sql_scripting_compound_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN…END``): DECLARE session
    variables, seed one from an aggregate over the data (SET var =
    (scalar subquery)), compound it through a WHILE loop in exact
    integer cents, and return the trajectory endpoints — the
    procedural-SQL surface (migrations from stored-procedure
    warehouses) exercised end to end: DECLARE, SET-from-query, WHILE,
    and a final SELECT whose result is the script's result.

    The oracle replays the loop as a DuckDB recursive CTE — same
    integer recurrence, so the equality is exact, not approximate.
    Scale: the loop runs DRIVER-side over two scalar variables; the
    only distributed work is the seed aggregate (one partial+final
    agg). Scripting never turns row-wise work into driver loops here —
    that is exactly the anti-pattern the recursive/iterative operators
    (recursion.py, graph.py) exist to avoid."""
    sdf = spark.sql(
        f"""
        BEGIN
          DECLARE seed_cents BIGINT;
          DECLARE bal BIGINT;
          DECLARE i INT DEFAULT 0;
          SET seed_cents = (
            SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        DIV 10000 AS BIGINT)
            FROM parquet.`{sf_dir}/orders.parquet`
            WHERE o_orderpriority = '1-URGENT');
          SET bal = seed_cents;
          WHILE i < {_SCRIPT_PERIODS} DO
            SET bal = bal + bal * {_SCRIPT_RATE_BP} DIV 10000;
            SET i = i + 1;
          END WHILE;
          SELECT CAST({_SCRIPT_PERIODS} AS BIGINT) AS periods,
                 CAST({_SCRIPT_RATE_BP} AS BIGINT) AS rate_bp,
                 seed_cents,
                 bal AS final_cents;
        END
        """
    )
    return sdf


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE: dynamic pivot with parameter binding
# ---------------------------------------------------------------------------


@CAT.query(
    "sql_execute_immediate_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5
    FROM orders
    WHERE o_totalprice >= 1000.0
    GROUP BY o_orderstatus
    """,
)
def sql_execute_immediate_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via ``EXECUTE IMMEDIATE`` (Spark 4): discover the
    pivot column set from the DATA (distinct priorities — a bounded
    dim-sized collect), assemble one conditional-count column per
    value into a query string, and execute it with the price
    threshold bound through a named parameter (``USING``), never
    string-spliced — the injection-safe pattern dynamic reporting
    actually requires.

    The assembled text compiles to a single ordinary
    partial+final hash aggregate — dynamic SQL costs nothing at run
    time; only the *planning* input is data-driven. The oracle pins
    today's priority domain literally, so if the fixture ever grows a
    new priority the hash check fails loudly instead of silently
    reshaping the output."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_ei")
    prios = sorted(
        r.o_orderpriority
        for r in orders.select("o_orderpriority").distinct().collect()
    )
    # splice order matters (ADVICE r7): escape backslashes BEFORE
    # quotes — Spark string literals honor backslash escapes by
    # default, so an unescaped backslash in a data-derived priority
    # value would corrupt the assembled statement text
    cols = ", ".join(
        "CAST(COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS BIGINT)"
        " AS p{i}".format(
            p=p.replace("\\", "\\\\").replace("'", "''"), i=i + 1
        )
        for i, p in enumerate(prios)
    )
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'"
        + (
            "SELECT o_orderstatus, " + cols + " "
            "FROM orders_ei WHERE o_totalprice >= :min_price "
            "GROUP BY o_orderstatus"
        )
        .replace("\\", "\\\\")
        .replace("'", "\\'")
        + "' "
        "USING 1000.0 AS min_price"
    )


# ---------------------------------------------------------------------------
# Collation-aware join (Spark 4 collations)
# ---------------------------------------------------------------------------

#: Case-mangled segment labels, as they'd arrive from a sloppy
#: upstream: the collated join must land each on its canonical
#: customer segment without any explicit lower()/upper() scrubbing.
_CI_LABELS = [
    ("aUtOmObIlE", "tier-1"),
    ("BUILDING", "tier-2"),
    ("furniture", "tier-2"),
    ("HouseHold", "tier-3"),
    ("machinery", "tier-3"),
]


@CAT.query(
    "join_collation_ci_segments",
    oracle="""
    WITH dim(label, tier) AS (VALUES
      ('aUtOmObIlE', 'tier-1'), ('BUILDING', 'tier-2'),
      ('furniture', 'tier-2'), ('HouseHold', 'tier-3'),
      ('machinery', 'tier-3'))
    SELECT dim.label, dim.tier,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer
    JOIN dim ON lower(c_mktsegment) = lower(dim.label)
    GROUP BY dim.label, dim.tier
    """,
)
def join_collation_ci_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware equi-join (Spark 4 ``COLLATE UTF8_LCASE``):
    case-mangled upstream segment labels join directly onto
    ``customer.c_mktsegment`` by declaring the join key
    case-insensitive — the COLLATION carries the semantics, not a
    scrubbing ``lower()`` wrapped around every reference (which would
    have to be repeated at every use site and silently breaks
    equality-based optimizations written against the raw column).

    It stays a plain broadcast hash equi-join: Catalyst hashes the
    collation sort key, so pushdown/codegen are unaffected — exactly
    why collations beat expression-wrapping at scale. The oracle
    expresses the same relation with ``lower()`` equality (DuckDB has
    no UTF8_LCASE; for these ASCII keys the relations coincide).
    Money is summed in exact cents."""
    dim = spark.createDataFrame(_CI_LABELS, "label STRING, tier STRING")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").cast("string collate UTF8_LCASE").alias("seg_ci"),
        cents("c_acctbal").alias("cents"),
    )
    return (
        cust.join(
            F.broadcast(
                dim.withColumn(
                    "label_ci", F.col("label").cast("string collate UTF8_LCASE")
                )
            ),
            F.col("seg_ci") == F.col("label_ci"),
        )
        .groupBy("label", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("acctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# approx_top_k in the exact regime
# ---------------------------------------------------------------------------

#: Tracked-item capacity handed to approx_top_k. The p_brand domain is
#: 25 values; with maxItemsTracked ≥ the domain the sketch never
#: evicts, so every count is exact and the entry is oracle-checkable
#: while still exercising the sketch aggregate's plan. (Under-capacity
#: behavior — the actually-approximate regime — is what
#: sketch_count_min_tokens and text_heavy_hitters_mg cover, with
#: explicit error-bound tests.)
_TOPK_TRACKED = 256
_TOPK_K = 10
#: Items REQUESTED from the sketch — deliberately > the key domain so
#: the sketch returns every tracked key and the deterministic
#: (count DESC, brand) re-rank below owns ALL tie-breaking; asking the
#: sketch for exactly k would let ITS unspecified tie order pick which
#: boundary-tied brands survive, diverging from the oracle's LIMIT.
_TOPK_SKETCH_K = 64


@CAT.query(
    "agg_approx_top_k_brands",
    oracle=f"""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
    FROM part
    GROUP BY p_brand
    ORDER BY n DESC, p_brand
    LIMIT {_TOPK_K}
    """,
)
def agg_approx_top_k_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Spark 4.1 sketch aggregate) over part brands,
    run with ``maxItemsTracked`` ≥ the key domain — the exact regime —
    then exploded and re-ranked with a deterministic (count DESC,
    brand) tiebreak before the oracle's identical LIMIT.

    Why a sketch at all when a groupBy gives exact counts: the sketch
    is MERGEABLE fixed-size state. At 100 TB the partial aggregate
    carries one bounded sketch per partition instead of one row per
    distinct key per partition, and layered rollups
    (``approx_top_k_combine``) union saved sketches without re-reading
    raw data — same argument as the HLL rollup
    (``sketch_hll_daily_rollup``), but for heavy hitters. The re-rank
    is over k rows — driver-trivial, yet it pins the output order so
    the driver hash check is deterministic even where the sketch's
    own tie order is not."""
    part = load_table(spark, sf_dir, "part")
    sk = part.agg(
        F.expr(
            f"approx_top_k(p_brand, {_TOPK_SKETCH_K}, {_TOPK_TRACKED})"
        ).alias("top")
    )
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("p_brand"),
            F.col("e.count").cast("bigint").alias("n"),
        )
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(_TOPK_K)
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operator chains)
# ---------------------------------------------------------------------------


@CAT.query(
    "sql_pipe_syntax_revenue",
    oracle="""
    WITH f AS (
      SELECT l_suppkey, l_returnflag,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'),
    a AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
      FROM f WHERE l_returnflag <> 'R' GROUP BY l_suppkey)
    SELECT l_suppkey, n_items, rev_cents
    FROM a
    ORDER BY rev_cents DESC, l_suppkey
    LIMIT 25
    """,
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>``): the same logical pipeline a
    DataFrame chain expresses — scan, filter, derive, filter again,
    aggregate, order, limit — written as a linear pipe instead of
    inside-out nested SQL. Each ``|>`` stage compiles to the identical
    Catalyst operator the keyword form produces (this is SYNTAX, not a
    new engine path), so pushdown/codegen/TakeOrderedAndProject all
    behave exactly as in the oracle's classic formulation.

    Revenue is derived in exact integer cents before aggregation;
    ordering carries the (rev DESC, suppkey) tiebreak so the LIMIT is
    deterministic on both engines.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pipe")
    return spark.sql(
        """
        FROM li_pipe
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> SELECT l_suppkey, l_returnflag,
                  CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT) AS rev_cents
        |> WHERE l_returnflag <> 'R'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
           GROUP BY l_suppkey
        |> SELECT l_suppkey, n_items, rev_cents
        |> ORDER BY rev_cents DESC, l_suppkey
        |> LIMIT 25
        """
    )
