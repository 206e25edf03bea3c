"""Recursive-CTE operators (``WITH RECURSIVE`` — new SQL surface in
Spark 4.x): hierarchy walks and order-dependent recurrences that have
NO closed-form relational rewrite.

The reference converter has no query language at all
(converter/converter.go:66-420); these extend SURVEY §2's SQL-surface
coverage with the two canonical shapes recursion is FOR:

- **hierarchy traversal** (``recursive_doc_ancestry``): walk every
  document's ancestor chain in a synthetic binary tree (parent =
  ``id div 2`` — derived, deterministic, and dense so the recursion
  carries corpus-sized frames, not toy rows);
- **sequential recurrence** (``recursive_yearly_compound``): an
  integer balance recurrence with truncating division — genuinely
  non-parallelizable per step and not expressible with windows
  (prefix sums/products don't survive per-step ``floor``).

Exactness: both are pure integer arithmetic, so DuckDB (which also
speaks WITH RECURSIVE) matches bit-for-bit. The only textual
divergence between the two engines is integer division — ``div`` in
Spark, ``//`` in DuckDB — so each side renders a shared template with
its own operator.

Scale posture: Spark executes each recursion step as a full
distributed plan (the recursion is over FRAMES, not rows): the
ancestry walk runs O(log max_id) joins of narrow (doc_id, node, depth)
triples, each step map-only from the previous (no shuffle until the
final groupBy); the compound recurrence aggregates the corpus ONCE
into a PERSISTED yearly frame (calendar-bounded: a handful of rows
even for decades of data) and recurses over that — the classic
"reduce, then recurse over the small sequential core" split, which on
Spark is mandatory: UnionLoop re-evaluates referenced relations every
iteration (see recursive_yearly_compound's docstring). Step count is bounded by
``spark.sql.cteRecursionLevelLimit`` (default 100; depth here ≤ ~25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.operators.cache import persist_tracked
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()


def _ancestry_sql(intdiv: str) -> str:
    """Shared template; ``intdiv`` is 'div' (Spark) or '//' (DuckDB)."""
    return f"""
    WITH RECURSIVE anc AS (
      SELECT doc_id, doc_id AS node, 0 AS depth
      FROM documents
      UNION ALL
      SELECT doc_id, node {intdiv} 2 AS node, depth + 1 AS depth
      FROM anc WHERE node > 1
    )
    SELECT doc_id,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS chain_len,
           CAST(SUM(node) AS BIGINT) AS ancestor_id_sum
    FROM anc GROUP BY doc_id
    """


@CAT.query("recursive_doc_ancestry", oracle=_ancestry_sql("//"))
def recursive_doc_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-chain walk over the derived binary document tree
    (parent = ``doc_id div 2``) via WITH RECURSIVE: per document, its
    depth, chain length, and the exact sum of ancestor ids.

    Every recursion step is a narrow map over the previous step's
    frame (filter + integer div — no join needed because the parent is
    computed, exactly like following a materialized parent pointer);
    the frame shrinks only when chains bottom out, so the work is
    O(n·log max_id) rows total, distributed across the cluster at
    every step. The terminal groupBy is the single shuffle.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ancestry_sql("div"))


#: Monthly interest in basis points applied to the carried balance
#: (integer, truncating division — the part windows can't express).
_COMPOUND_BP = 20


def _compound_sql(intdiv: str, pre: str) -> str:
    """Shared recursion template over a pre-aggregated yearly frame
    ``pre`` (name of the relation holding (yr, rev_cents))."""
    return f"""
    WITH RECURSIVE seq AS (
      SELECT yr, rev_cents,
             CAST(ROW_NUMBER() OVER (ORDER BY yr) AS BIGINT) AS rn
      FROM {pre}
    ),
    bal AS (
      SELECT rn, yr, rev_cents, rev_cents AS balance_cents
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.yr, s.rev_cents,
             b.balance_cents + s.rev_cents
               + (b.balance_cents * {_COMPOUND_BP}) {intdiv} 10000
               AS balance_cents
      FROM bal b JOIN seq s ON s.rn = b.rn + 1
    )
    SELECT yr, rev_cents, balance_cents FROM bal
    """


_YEARLY_DUCK = """
    (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS rev_cents
     FROM orders GROUP BY 1)
"""


@CAT.query(
    "recursive_yearly_compound",
    oracle=f"""
    WITH RECURSIVE pre AS {_YEARLY_DUCK},
    seq AS (
      SELECT yr, rev_cents,
             CAST(ROW_NUMBER() OVER (ORDER BY yr) AS BIGINT) AS rn
      FROM pre
    ),
    bal AS (
      SELECT rn, yr, rev_cents, rev_cents AS balance_cents
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.yr, s.rev_cents,
             b.balance_cents + s.rev_cents
               + (b.balance_cents * {_COMPOUND_BP}) // 10000
               AS balance_cents
      FROM bal b JOIN seq s ON s.rn = b.rn + 1
    )
    SELECT yr, rev_cents, balance_cents FROM bal
    """,
)
def recursive_yearly_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year compounding balance: each year carries the prior
    balance plus 0.2% integer interest (truncating division) plus the
    year's order revenue — an order-dependent integer recurrence with
    NO window/prefix closed form (the per-step floor breaks
    prefix-product algebra), i.e. the shape recursion exists for.

    Execution-model note (measured): Spark's UnionLoop re-evaluates
    every relation the recursive branch references ON EACH iteration —
    with the corpus aggregation inlined in the CTE, an 84-step monthly
    recursion re-aggregated the orders table 84 times (18 s at
    sf0.001). The fix is structural, and is the production rule for
    Spark recursion: do the corpus-sized reduction ONCE into a
    PERSISTED frame (calendar-bounded: |years| rows), register that as
    the view the recursion references, and keep the loop over the tiny
    sequential core — 7 steps, each joining the cached frame. The
    recursion is inherently sequential (that is the point of the
    operator); what must never be sequential-times-N is the corpus
    scan.
    """
    yearly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    yearly = persist_tracked(yearly)
    yearly.createOrReplaceTempView("yearly_rev_pre")
    return spark.sql(_compound_sql("div", "yearly_rev_pre"))
