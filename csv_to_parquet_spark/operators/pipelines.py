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

from csv_to_parquet_spark.functions import cents, cents_sql, md5_60, md5_60_sql, tokenize
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.operators.textops import _STOP_SQL, _STOPWORDS
from csv_to_parquet_spark.sources.tables import load_table, spread

CAT = Catalog()

_MIN_TOKENS = 20
_MIN_ALPHA = 0.5
_MIN_STOP = 0.03


def _gate_exprs():
    """The three cleaning-gate expressions, shared by
    :func:`pipeline_corpus_clean` (which filters on them) and
    :func:`quality_filter_attribution` (which attributes drops to
    them) so a threshold or regex change can never desynchronize the
    report from the pipeline it explains. Returns
    (toks, alpha_ratio, stop_ratio) columns over a ``text`` column."""
    toks = tokenize("text")
    n_chars = F.length("text").cast("bigint")
    stop_re = r"\s(?:" + "|".join(_STOPWORDS) + r")(?=\s)"
    stop_hits = F.regexp_count(
        F.concat(F.lit(" "), F.lower("text"), F.lit(" ")), F.lit(stop_re)
    )
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / n_chars
    )
    stop_ratio = stop_hits.cast("double") / F.size(toks)
    return toks, alpha_ratio, stop_ratio



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
    toks, alpha_ratio, stop_ratio = _gate_exprs()
    gated = (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(
            (F.size(toks) >= _MIN_TOKENS)
            & (alpha_ratio >= _MIN_ALPHA)
            & (stop_ratio >= _MIN_STOP)
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


@CAT.query(
    "dq_constraint_report",
    oracle="""
    WITH o AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price
      FROM orders),
    l AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
      FROM lineitem),
    oo AS (
      -- NOT EXISTS, not NOT IN: matches left_anti semantics even if
      -- the FK target column ever contains NULLs (NOT IN would yield
      -- zero violations; anti join still counts orphans)
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders o2
      WHERE o2.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o2.o_custkey)),
    lo AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l2
      WHERE NOT EXISTS (SELECT 1 FROM orders o3
                        WHERE o3.o_orderkey = l2.l_orderkey))
    SELECT rule, n_violations, n_checked,
           round(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_pct
    FROM (
      SELECT 'orders.custkey_not_null' AS rule, o.null_key AS n_violations,
             o.n AS n_checked FROM o
      UNION ALL SELECT 'orders.totalprice_positive', o.bad_price, o.n FROM o
      UNION ALL SELECT 'lineitem.quantity_positive', l.bad_qty, l.n FROM l
      UNION ALL SELECT 'orders.custkey_fk_customer', oo.n,
                       (SELECT n FROM o) FROM oo
      UNION ALL SELECT 'lineitem.orderkey_fk_orders', lo.n,
                       (SELECT n FROM l) FROM lo)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint report: one row per declared
    expectation — null keys, non-positive amounts, and referential
    integrity (orphan foreign keys) — with violation counts and rates,
    the gate a pipeline evaluates before publishing a batch.

    Column-level rules fold into ONE conditional-aggregate scan per
    table (adding rules adds zero passes); each FK rule is one
    left-anti join on its key — the orders-side probe reuses the same
    map-side count. The five 1-row rule frames union into the report;
    everything after the scans is driver-size."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    oagg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("bad_price"),
    )
    lagg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("bad_qty"),
    )
    o_orphan = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orph"))
    )
    l_orphan = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orph"))
    )
    rows = (
        oagg.select(
            F.lit("orders.custkey_not_null").alias("rule"),
            F.col("null_key").alias("n_violations"),
            F.col("n").alias("n_checked"),
        )
        .unionAll(
            oagg.select(
                F.lit("orders.totalprice_positive"),
                F.col("bad_price"),
                F.col("n"),
            )
        )
        .unionAll(
            lagg.select(
                F.lit("lineitem.quantity_positive"), F.col("bad_qty"), F.col("n")
            )
        )
        .unionAll(
            o_orphan.crossJoin(F.broadcast(oagg.select("n"))).select(
                F.lit("orders.custkey_fk_customer"),
                F.col("n_orph"),
                F.col("n"),
            )
        )
        .unionAll(
            l_orphan.crossJoin(F.broadcast(lagg.select("n"))).select(
                F.lit("lineitem.orderkey_fk_orders"),
                F.col("n_orph"),
                F.col("n"),
            )
        )
    )
    return rows.select(
        "rule",
        "n_violations",
        "n_checked",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_checked"), 6
        ).alias("violation_pct"),
    )


#: Histogram bucket width (chars) for the length profile.
_HIST_WIDTH = 500


@CAT.query(
    "profile_doc_length_hist",
    oracle=f"""
    SELECT CAST(length(text) // {_HIST_WIDTH} AS BIGINT) AS bucket,
           CAST(length(text) // {_HIST_WIDTH} AS BIGINT) * {_HIST_WIDTH}
             AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(length(text)) AS BIGINT) AS min_chars,
           CAST(max(length(text)) AS BIGINT) AS max_chars
    FROM documents GROUP BY bucket
    """,
)
def profile_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width document-length histogram (500-char buckets) with
    per-bucket extrema — the length profile a corpus report renders
    before picking truncation/packing budgets.

    One narrow integer-division projection and one groupBy over the
    bounded bucket space with map-side partials — the cheapest
    possible profiling shape at any scale."""
    d = spread(load_table(spark, sf_dir, "documents"))
    bucket = F.expr(f"length(text) div {_HIST_WIDTH}").cast("bigint")
    return d.groupBy(bucket.alias("bucket")).agg(
        (F.col("bucket") * _HIST_WIDTH).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.length("text")).cast("bigint").alias("min_chars"),
        F.max(F.length("text")).cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Round 5: feature engineering — smoothed target encoding
# ---------------------------------------------------------------------------

#: Additive-smoothing pseudo-count (rows of global prior per category).
_TE_SMOOTH = 100


@CAT.query(
    "feat_target_encoding",
    oracle=f"""
    WITH j AS (
      SELECT p.p_brand, {cents_sql("l.l_extendedprice")} AS cts
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    g AS (SELECT CAST(SUM(cts) AS BIGINT) AS gsum,
                 CAST(COUNT(*) AS BIGINT) AS gn FROM j),
    b AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cts) AS BIGINT) AS s
      FROM j GROUP BY p_brand)
    SELECT b.p_brand, b.n,
           round(CAST(b.s AS DOUBLE) / b.n, 6) AS mean_cents,
           round((CAST(b.s AS DOUBLE)
                  + {_TE_SMOOTH} * (CAST(g.gsum AS DOUBLE) / g.gn))
                 / (b.n + {_TE_SMOOTH}), 6) AS encoded_cents
    FROM b, g
    """,
)
def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (p_brand)
    against a numeric label (line revenue in cents) — the standard
    high-cardinality categorical encoder for tabular training data:
    encoded(c) = (Σ_c y + m·ȳ_global) / (n_c + m), shrinking rare
    categories toward the global prior (m = {_TE_SMOOTH}).

    All sums are exact BIGINT cents (order-independent, engine-exact);
    the two divisions and the blend run in double with the identical
    expression tree on both engines. One fact-side shuffle for the
    brand rollup (the part dimension joins before aggregation —
    broadcast at driver scale via AQE, shuffle-join at 100 TB where
    the part dimension is itself huge); the global prior is a 1-row
    broadcast. The category-level output is dimension-sized, never
    fact-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", cents("l_extendedprice").alias("cts")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey).select("p_brand", "cts")
    g = j.agg(
        F.sum("cts").alias("gsum"), F.count(F.lit(1)).alias("gn")
    )
    b = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cts").alias("s")
    )
    prior = F.col("gsum").cast("double") / F.col("gn")
    return b.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_cents"),
        F.round(
            (F.col("s").cast("double") + _TE_SMOOTH * prior)
            / (F.col("n") + _TE_SMOOTH),
            6,
        ).alias("encoded_cents"),
    )


@CAT.query(
    "quality_filter_attribution",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             CAST(length(text) AS BIGINT) AS nc
      FROM documents),
    s AS (
      SELECT CASE
               WHEN len(toks) < {_MIN_TOKENS} THEN 'min_tokens'
               WHEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         AS DOUBLE) / nc < {_MIN_ALPHA} THEN 'alpha_ratio'
               WHEN CAST(len(list_filter(toks,
                         x -> lower(x) IN ({_STOP_SQL}))) AS DOUBLE)
                    / len(toks) < {_MIN_STOP} THEN 'stopword_ratio'
               ELSE 'kept'
             END AS drop_rule
      FROM t)
    SELECT drop_rule, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM s GROUP BY drop_rule
    """,
)
def quality_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule drop attribution for the cleaning cascade — the report
    that tells a pipeline operator WHY documents die, not just how
    many survive. Each doc is attributed to the FIRST failing rule in
    the cascade's fixed order (min_tokens → alpha_ratio →
    stopword_ratio), matching how ``pipeline_corpus_clean`` would
    short-circuit; 'kept' rows pass every gate. When a filter change
    tanks corpus yield, this table is the diff you read first.

    Plan: the same one-scan fused projection as the cleaning pipeline
    — all three rule expressions are codegen'd into a single CASE,
    and the only exchange is the 4-row groupBy. At 100 TB this is a
    map-side-combined count per rule label: the report costs one scan
    regardless of corpus size."""
    toks, alpha_ratio, stop_ratio = _gate_exprs()
    stage = (
        F.when(F.size(toks) < _MIN_TOKENS, "min_tokens")
        .when(alpha_ratio < _MIN_ALPHA, "alpha_ratio")
        .when(stop_ratio < _MIN_STOP, "stopword_ratio")
        .otherwise("kept")
        .alias("drop_rule")
    )
    return (
        spread(load_table(spark, sf_dir, "documents"))
        .select(stage)
        .groupBy("drop_rule")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@CAT.query(
    "pipeline_dataset_card",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS en_docs,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq_docs
      FROM documents GROUP BY source)
    SELECT source, n_docs, total_chars,
           total_chars // n_docs AS avg_chars,
           n_langs,
           (en_docs * 1000000) // n_docs AS en_ppm,
           ((n_docs - uniq_docs) * 1000000) // n_docs AS dup_ppm
    FROM s ORDER BY source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source "dataset card" — the one-scan summary table a corpus
    release ships: volume (docs, chars, avg length), language spread
    (distinct langs, English share), and exact duplicate rate (docs
    minus distinct text fingerprints).

    All ratios are integer floor-division ppm — order-independent and
    bit-identical cross-engine. The two COUNT(DISTINCT)s make Spark
    plan an Expand (each input row replicated per distinct-aggregate)
    — a 2× map-side blowup that stays fully partial-aggregated before
    the single shuffle on ``source``; the md5 fingerprint (not the
    text) is what ships. At 100 TB the alternative — approx sketches —
    loses the exact-dup audit; the Expand is the honest price and
    scales linearly.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum((F.col("lang") == "en").cast("bigint")).alias("en_docs"),
        F.countDistinct(F.md5("text")).alias("uniq_docs"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        F.expr("total_chars div n_docs").alias("avg_chars"),
        "n_langs",
        F.expr("(en_docs * CAST(1000000 AS BIGINT)) div n_docs").alias("en_ppm"),
        F.expr(
            "((n_docs - uniq_docs) * CAST(1000000 AS BIGINT)) div n_docs"
        ).alias("dup_ppm"),
    ).orderBy("source")


#: Shard count for the training manifest.
_MANIFEST_SHARDS = 8


@CAT.query(
    "pipeline_training_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, lang, md5(text) AS m,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             CAST(length(text) AS BIGINT) AS nc
      FROM documents),
    q AS (
      SELECT doc_id, lang, m, nc, CAST(len(toks) AS BIGINT) AS nt FROM t
      WHERE len(toks) >= {_MIN_TOKENS}
        AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / nc >= {_MIN_ALPHA}
        AND CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP_SQL}))) AS DOUBLE)
            / len(toks) >= {_MIN_STOP}),
    keep AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY m ORDER BY doc_id) AS rn
        FROM q) WHERE rn = 1)
    SELECT {md5_60_sql("CAST(doc_id AS VARCHAR)")} % {_MANIFEST_SHARDS}
             AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(nc) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM keep GROUP BY shard ORDER BY shard
    """,
)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composite: quality/language gates → exact dedup
    (keep lowest doc_id per content hash) → deterministic shard
    assignment → the per-shard MANIFEST a training job consumes
    (docs, tokens, chars, language spread per shard). One lazy plan:
    the same fused gates as :func:`pipeline_corpus_clean`, one dedup
    shuffle on the content hash carrying only (hash, id, small ints),
    one manifest groupBy over {_MANIFEST_SHARDS} shards.

    Keep-first needs the keeper's METRICS, not just its id, so the
    dedup aggregation is ``min_by(struct(...), doc_id)`` — one pass,
    no join-back of the winner against the corpus (the two-shuffle
    shape a SELECT-then-rejoin would cost). Shard = doc_id-hash mod
    {_MANIFEST_SHARDS}: reshuffling-stable as the corpus grows, the
    property batch ids or row_numbers lack.
    """
    toks, alpha_ratio, stop_ratio = _gate_exprs()
    per = (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(
            (F.size(toks) >= _MIN_TOKENS)
            & (alpha_ratio >= _MIN_ALPHA)
            & (stop_ratio >= _MIN_STOP)
        )
        .select(
            F.md5("text").alias("m"),
            F.struct(
                F.col("doc_id"),
                F.col("lang"),
                F.length("text").cast("bigint").alias("nc"),
                F.size(tokenize("text")).cast("bigint").alias("nt"),
            ).alias("s"),
        )
    )
    keep = per.groupBy("m").agg(
        F.min_by("s", F.col("s.doc_id")).alias("k")
    ).select("k.*")
    shard = F.pmod(
        md5_60(F.col("doc_id").cast("string")), F.lit(_MANIFEST_SHARDS)
    )
    return (
        keep.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("nc").alias("n_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("shard")
    )


@CAT.query(
    "feat_target_encoding_loo",
    oracle=f"""
    WITH j AS (
      SELECT l.l_orderkey, l.l_linenumber, p.p_brand,
             {cents_sql("l.l_extendedprice")} AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    b AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM j GROUP BY p_brand)
    SELECT j.l_orderkey, j.l_linenumber, j.p_brand, b.n AS n_cat,
           CAST(CASE WHEN b.n > 1
                     THEN (CAST(b.s - j.y AS HUGEINT) * 1000000) // (b.n - 1)
                END AS BIGINT) AS loo_micro
    FROM j JOIN b ON j.p_brand = b.p_brand
    """,
)
def feat_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding, the leakage-safe row-level form
    of ``feat_target_encoding``: each training row's encoded value is
    the category mean computed WITHOUT that row,
    (Σ_c y − y_i) / (n_c − 1) — the standard guard against the
    target-leakage that plain target encoding injects into the very
    rows it will train on. Singleton categories get NULL (no leave-
    one-out mean exists), which the training pipeline imputes from
    the global prior.

    Exactness: the encoding is an all-integer micro-floored division
    of exact cent sums — no float anywhere, so the fact-sized output
    (one row per lineitem) hash-matches unconditionally. Scale: one
    fact-side shuffle for the category rollup, then the category map
    (dimension-sized) broadcasts back onto the fact scan — the
    row-level output never reshuffles. The fact frame is deliberately
    NOT persisted: materializing the 4-column fact once costs more
    than the second columnar scan + broadcast join it saves (measured
    1.45 s persisted vs 0.85 s two-pass at sf0.1). A brand-partitioned
    window would fuse the passes but shuffles the whole fact onto ~25
    keys — a skew cliff at scale, so two broadcast passes win.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey",
        cents("l_extendedprice").alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "y"
    )
    b = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    return (
        j.join(F.broadcast(b), "p_brand")
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_brand",
            F.col("n").cast("bigint").alias("n_cat"),
            # per-brand cent sums reach ~7e17 at sf1, so (s-y)*1e6 tops
            # int64 near sf10-20. Instead of DECIMAL(38,0) (BigDecimal
            # multiply per row — the r7 regression), decompose the
            # floor division in pure int64: for a = s-y >= 0, d = n-1,
            #   floor(a*M/d) = (a div d)*M + ((a mod d)*M) div d
            # both terms stay under 2^63 (a div d is a mean cent value;
            # a mod d < d), and div truncation == floor for a >= 0.
            F.when(
                F.col("n") > 1,
                F.expr(
                    "((s - y) div (n - 1)) * 1000000"
                    " + (((s - y) % (n - 1)) * 1000000) div (n - 1)"
                ),
            )
            .cast("bigint")
            .alias("loo_micro"),
        )
    )
