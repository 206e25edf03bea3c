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
- **sequential recurrence** (``recursive_monthly_compound``): an
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
into a months frame (calendar-bounded: a few hundred rows for decades
of data) and recurses over that — the classic "reduce, then recurse
over the small sequential core" split. Step count is bounded by
``spark.sql.cteRecursionLevelLimit`` (default 100; depth here ≤ ~25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv_to_parquet_spark.operators import Catalog
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


def _compound_sql(intdiv: str, cents: str) -> str:
    """Shared template; ``cents`` is each engine's exact money cast."""
    return f"""
    WITH RECURSIVE m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(SUM({cents}) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT mon, rev_cents,
             CAST(ROW_NUMBER() OVER (ORDER BY mon) AS BIGINT) AS rn
      FROM m
    ),
    bal AS (
      SELECT rn, mon, rev_cents, rev_cents AS balance_cents
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.mon, s.rev_cents,
             b.balance_cents + s.rev_cents
               + (b.balance_cents * {_COMPOUND_BP}) {intdiv} 10000
               AS balance_cents
      FROM bal b JOIN seq s ON s.rn = b.rn + 1
    )
    SELECT mon, rev_cents, balance_cents FROM bal
    """


@CAT.query(
    "recursive_monthly_compound",
    oracle=_compound_sql("//", "CAST(ROUND(o_totalprice * 100) AS BIGINT)"),
)
def recursive_monthly_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month compounding balance: each month carries the
    prior balance plus 0.2% integer interest (truncating division)
    plus the month's order revenue — an order-dependent integer
    recurrence with NO window/prefix closed form (the per-step floor
    breaks prefix-product algebra), i.e. the shape recursion exists
    for.

    The corpus-sized work is the one distributed month aggregation;
    the recursion then steps over the calendar-bounded months frame
    (one tiny join per step, ~84 steps for the 7-year TPC-H span).
    Exact integers end to end ⇒ bit-identical to DuckDB's recursion.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        _compound_sql("div", "CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    )
