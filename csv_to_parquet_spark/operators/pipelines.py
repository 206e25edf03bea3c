"""Composite pipelines — several LLM-data operators fused in one DAG.

The individual operators (textops.py, dedup.py) are each a catalog
query; a real training-data job chains them. This module proves the
composition works as ONE Catalyst plan — quality gate → language gate
→ exact dedup → deterministic split — with a single end-to-end oracle,
rather than materializing intermediates between steps.

Scale shape: one scan of ``documents``, a narrow projection computing
all gate signals, one shuffle on the content hash for the dedup
keep-list, one narrow split projection. Filters run BEFORE the dedup
shuffle, so rejected docs never shuffle at all.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import md5_60, md5_60_sql, tokenize
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.operators.textops import _STOP_SQL, _STOPWORDS
from csv_to_parquet_spark.sources.tables import load_table, spread

CAT = Catalog()

_MIN_TOKENS = 20
_MIN_ALPHA = 0.5
_MIN_STOP = 0.03


@CAT.query(
    "pipeline_corpus_clean",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, md5(text) AS m,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             CAST(length(text) AS BIGINT) AS nc
      FROM documents),
    q AS (
      SELECT doc_id, m FROM t
      WHERE len(toks) >= {_MIN_TOKENS}
        AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / nc >= {_MIN_ALPHA}
        AND CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP_SQL}))) AS DOUBLE)
            / len(toks) >= {_MIN_STOP}),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY m)
    SELECT doc_id,
           CASE WHEN {md5_60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                THEN 'train' ELSE 'test' END AS split
    FROM keep
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: quality gate (length + alpha ratio)
    → English gate (stopword-hit ratio) → exact dedup keeping the
    lowest doc_id per content hash → deterministic 90/10 split.

    All three gates are codegen'd expressions over one scan; only the
    surviving (md5, doc_id) pairs reach the dedup shuffle. The whole
    pipeline is one lazy plan — Catalyst fuses the gates into the
    scan's filter and prunes every unused column.
    """
    toks = tokenize("text")
    n_chars = F.length("text").cast("bigint")
    stop_re = r"\s(?:" + "|".join(_STOPWORDS) + r")(?=\s)"
    stop_hits = F.regexp_count(
        F.concat(F.lit(" "), F.lower("text"), F.lit(" ")), F.lit(stop_re)
    )
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double") / n_chars
    )
    gated = (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(
            (F.size(toks) >= _MIN_TOKENS)
            & (alpha_ratio >= _MIN_ALPHA)
            & (stop_hits.cast("double") / F.size(toks) >= _MIN_STOP)
        )
        .select("doc_id", F.md5("text").alias("m"))
    )
    keep = gated.groupBy("m").agg(F.min("doc_id").alias("doc_id"))
    bucket = F.pmod(md5_60(F.col("doc_id").cast("string")), F.lit(100))
    return keep.select(
        "doc_id", F.when(bucket < 90, "train").otherwise("test").alias("split")
    )


# ---------------------------------------------------------------------------
# Partitioned corpus export — the "publish" step
# ---------------------------------------------------------------------------

_EXPORT_STAGE = os.path.join(tempfile.gettempdir(), "csv2pq_corpus_export")


@CAT.query(
    "sink_partitioned_corpus",
    oracle=f"""
    SELECT doc_id, n_chars, lang,
           CASE WHEN {md5_60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def sink_partitioned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish the corpus partitioned by (lang, split) and read it
    back — the final step of a training-data pipeline: downstream
    trainers read exactly one language/split directory, so the layout
    IS the access path (directory pruning instead of a filter scan;
    same mechanism as ``partition_pruned_year_revenue``).

    The split is the deterministic md5 bucket (never ``randomSplit``),
    so the published layout is reproducible run-over-run and the
    oracle recomputes membership from the raw table. Roundtrip
    invariance: partitioned rewrite changes layout, never content —
    the returned frame is read FROM the published files."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(_EXPORT_STAGE, f"corpus_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        bucket = F.pmod(md5_60(F.col("doc_id").cast("string")), F.lit(100))
        (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "n_chars",
                "lang",
                F.when(bucket < 90, "train").otherwise("test").alias("split"),
            )
            .write.mode("overwrite")
            .partitionBy("lang", "split")
            .parquet(path)
        )
    back = spark.read.parquet(path)
    return back.select("doc_id", "n_chars", "lang", "split")


@CAT.query(
    "profile_key_skew",
    oracle="""
    WITH k AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_rows,
             round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_rows
      FROM k),
    top AS (
      SELECT o_custkey, n,
             row_number() OVER (ORDER BY n DESC, o_custkey) AS rk
      FROM k)
    SELECT s.n_keys, s.n_rows, s.max_rows, s.avg_rows,
           round(s.max_rows / s.avg_rows, 6) AS skew_ratio,
           t.o_custkey AS top_key, t.n AS top_rows
    FROM s, top t WHERE t.rk = 1
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis for ``orders.o_custkey``: key count,
    row count, the heaviest key and its row count, and the skew ratio
    (max/avg rows per key) — the report that decides whether a
    downstream join on this key needs salting or AQE skew handling
    (the engine's own salted-agg and AQE paths; see
    ``agg_salted_skew``).

    One groupBy(o_custkey) with map-side partials collapses the fact
    table to per-key counts; everything after runs on that key-level
    frame (a global agg and a top-1 via TakeOrdered — both driver-size).
    The 1-row summary and 1-row top key broadcast-join back together."""
    k = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
        F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_rows"
        ),
    )
    top = (
        k.orderBy(F.desc("n"), "o_custkey")
        .limit(1)
        .select(F.col("o_custkey").alias("top_key"), F.col("n").alias("top_rows"))
    )
    return s.crossJoin(F.broadcast(top)).select(
        "n_keys",
        "n_rows",
        "max_rows",
        "avg_rows",
        F.round(F.col("max_rows") / F.col("avg_rows"), 6).alias("skew_ratio"),
        "top_key",
        "top_rows",
    )
