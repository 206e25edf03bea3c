"""Text-analysis operators for LLM training-data pipelines.

The reference has no text operators at all (its only string handling is
the fixed header/cell-cleaning pipeline, converter/converter.go:201-211,
380-412); these are the SURVEY §7 M5 extensions over the ``documents``
table: token counting (whitespace + BPE-ish regex), quality scoring,
language ID (stopword-hit heuristic), and document fingerprinting.

Scale posture: every operator is a single narrow projection or one
groupBy — no joins, no collects, no Python UDFs. All expressions are
whole-stage-codegen'd `pyspark.sql.functions`; at 100 TB these run as
pure map tasks over parquet splits (plus one shuffle where grouped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import md5_60, md5_60_sql, tokenize
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table, spread

CAT = Catalog()

# A small fixed English stopword list: enough signal for the n-gram/
# stopword-ratio language heuristic, and identical in the oracle SQL.
_STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that "
    "from be not have has had but they you we he she i"
).split()
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# BPE-ish tokenizer regex: runs of word chars OR single non-space symbols
# (the shape GPT-2's pre-tokenizer produces, minus byte-level details).
_BPE_RE = r"\w+|[^\w\s]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex/array per-row work on a single-file table → parallelize
    return spread(load_table(spark, sf_dir, "documents"))


@CAT.query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens per doc."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokenize("text")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("bigint").alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


@CAT.query(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents)
    SELECT doc_id, n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(length(array_to_string(toks, '')) AS DOUBLE) / len(toks), 6) AS avg_token_len,
           ROUND(CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS alpha_ratio,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring heuristics: length, punctuation/alpha/stopword
    ratios, vocabulary diversity — the standard pre-training filters.

    Hot-path engineering (this is the most text-heavy batch query):
    every per-token quantity is reformulated as a codegen'd string
    expression instead of an interpreted higher-order function —
    - stopword hits: one ``regexp_count`` DFA pass over the lowercased
      text (a token is a whitespace-delimited run, so ``\\s(stop|…)``
      with a ``(?=\\s)`` lookahead on space-padded text counts exactly
      the tokens whose lowercase form is in the stoplist; duplicates
      count, matching the oracle's ``list_filter``), replacing a
      per-token interpreted lambda with a 31-way ``isin``;
    - summed token length: ``length(regexp_replace(trim(text),
      '\\s+', ''))`` — all non-whitespace chars of the trimmed text —
      replacing ``array_join`` over the token array.
    Only ``array_distinct`` (a single native array pass) remains
    outside whole-stage codegen. Measured ~10× over the HOF
    formulation at sf0.1.
    """
    toks = tokenize("text")
    n_chars = F.length("text").cast("bigint")
    n_toks = F.size(toks)
    stop_re = r"\s(?:" + "|".join(_STOPWORDS) + r")(?=\s)"
    stop_hits = F.regexp_count(
        F.concat(F.lit(" "), F.lower("text"), F.lit(" ")), F.lit(stop_re)
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
            .cast("double")
            / n_toks,
            6,
        ).alias("avg_token_len"),
        F.round(
            F.length(F.regexp_replace("text", "[^.,;:!?'\"]", "")).cast("double")
            / n_chars,
            6,
        ).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / n_toks, 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / n_chars,
            6,
        ).alias("alpha_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_toks, 6).alias(
            "distinct_ratio"
        ),
    )


@CAT.query(
    "text_language_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents)
    SELECT doc_id, lang AS lang_label,
           CASE WHEN CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(toks) >= 0.03
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM t
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic: docs whose stopword ratio clears
    a threshold classify as 'en'. (A full n-gram model is just more
    terms in the same hit-ratio expression — the plan shape is what
    matters: one narrow map, no shuffle.)"""
    toks = tokenize(F.lower(F.col("text")))
    stop_re = r"\s(?:" + "|".join(_STOPWORDS) + r")(?=\s)"
    ratio = (
        F.regexp_count(
            F.concat(F.lit(" "), F.lower("text"), F.lit(" ")), F.lit(stop_re)
        ).cast("double")
        / F.size(toks)
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(ratio >= 0.03, "en").otherwise("unk").alias("lang_pred"),
    )


@CAT.query(
    "text_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents)
    SELECT doc_id,
           md5(text) AS content_md5,
           {md5_60_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS bow_fingerprint,
           {md5_60_sql("array_to_string(toks[1:8], ' ')")} AS prefix_fingerprint
    FROM t
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-content md5, an order-insensitive
    bag-of-words fingerprint (sorted distinct tokens), and a prefix
    fingerprint (first 8 tokens) — the keys exact/near dedup group on."""
    toks = tokenize("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        md5_60(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "bow_fingerprint"
        ),
        md5_60(F.array_join(F.slice(toks, 1, 8), " ")).alias("prefix_fingerprint"),
    )


@CAT.query(
    "text_ngram_top50",
    oracle="""
    WITH t AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents),
    g AS (
      SELECT unnest(CASE WHEN len(toks) >= 2
                    THEN [array_to_string(toks[i:i+1], ' ')
                          for i in range(1, len(toks))]
                    ELSE [] END) AS bigram
      FROM t)
    SELECT bigram, COUNT(*) AS n
    FROM g GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
    """,
)
def text_ngram_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigrams: explode → count → top-k.

    Partial aggregation runs map-side before the single shuffle on the
    bigram key; the final top-k is TakeOrderedAndProject.
    """
    toks = tokenize(F.lower(F.col("text")))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _docs(spark, sf_dir)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )
