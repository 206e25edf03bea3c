"""Deduplication operators — exact, bag-of-words, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine.

The reference has no dedup at all (it is a per-file converter,
converter/converter.go:66-378); these are the SURVEY §7 M5 LLM-pipeline
extensions over ``documents`` / ``embeddings``.

Scale posture (the whole point of each implementation):
- Exact/BoW dedup: one hash-groupBy on a fingerprint — the 100 TB plan
  is scan → partial agg → single shuffle on a 60-bit key.
- n-gram Jaccard: inverted-index self-join on shingles (explode →
  join on shingle → count common), NEVER an all-pairs cross join.
  Pairs are generated only for docs sharing ≥1 shingle.
- MinHash+LSH: 64 universal-hash minima folded in ONE aggregation
  (no 64-pass), banded r=2/b=32 → candidates via band-key self-join →
  exact-Jaccard verification of candidates only. O(n · sig) not O(n²).
- SimHash: 60-bit signature from one explode + one groupBy with 60
  map-side-combined bit sums.
- Embedding near-dup: brute-force is the exact baseline; the LSH
  variant in similarity.py is the scale path.

All hashes are md5-derived (functions.md5_60) so DuckDB computes the
identical values — signatures and verified pairs are oracle-exact,
not rows-only.
"""

from __future__ import annotations

import random
from typing import NamedTuple

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import (
    md5_60,
    md5_60_sql,
    shingles,
    shingles_sql,
    tokenize,
)
from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table, spread

CAT = Catalog()

# Tracked-persist registry (shared; see operators/cache.py): queries
# here return LAZY plans over a persisted intermediate (the MinHash
# shingle cache), so they cannot unpersist before the caller
# materializes; sweep harnesses call ``release_caches()`` between
# queries. Re-exported under the historical names.
from csv_to_parquet_spark.operators.cache import (  # noqa: E402
    _ACTIVE_CACHES,
    persist_tracked as _persist,
    release_caches,
    scope_token,
)


JACCARD_THRESHOLD = 0.6  # planted near-dups sit at J≈0.99, noise at ≈0.05
CONTAINMENT_THRESHOLD = 0.8  # directed |A∩B|/|A| gate for subset dups

# 64 universal hash functions h_j(x) = (a_j*x + b_j) mod p over the
# 31-bit md5-derived shingle hash; p = 2^31-1 keeps every product
# within bigint range. Seeded → identical on every run and engine.
_P31 = 2_147_483_647
_rng = random.Random(42)
_MINHASH_AB = [(_rng.randrange(1, _P31), _rng.randrange(0, _P31)) for _ in range(64)]
_N_BANDS, _BAND_R = 32, 2  # r=2, b=32: P(candidate | J=0.6) ≈ 1 - (1-0.36)^32 ≈ 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every consumer here does hash-heavy per-row work → spread the
    # single-file scan across all cores (see sources.tables.spread)
    return spread(load_table(spark, sf_dir, "documents"))


_SHINGLES_SQL = shingles_sql("regexp_split_to_array(trim(text), '\\s+')", 3)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the inverted-index input.

    Distinctness is enforced per-doc with ``array_distinct`` BEFORE the
    explode — a doc's shingles all live in one row's array, so per-doc
    distinct ≡ global (doc_id, sh) distinct, and the narrow map replaces
    the full (doc_id, sh)-string exchange a ``.distinct()`` here cost
    every inverted-index consumer (mirrors the oracle's per-doc
    ``list_distinct``). At 100 TB that removed shuffle is the largest
    intermediate in the shingle pipelines.
    """
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokenize("text"), 3))).alias("sh"),
    )


# ---------------------------------------------------------------------------
# Exact + bag-of-words dedup
# ---------------------------------------------------------------------------

@CAT.query(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS content_md5,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content md5, keep the lowest doc_id.

    At 100 TB this is the canonical one-shuffle dedup: the md5 is
    computed map-side, partial counts combine before the exchange.
    """
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_BOW_FP_SQL = md5_60_sql(
    "array_to_string(list_sort(list_distinct("
    "regexp_split_to_array(trim(text), '\\s+'))), ' ')"
)


@CAT.query(
    "dedup_bow_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_BOW_FP_SQL} AS bow_fp
      FROM documents)
    SELECT bow_fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
    FROM t GROUP BY bow_fp HAVING COUNT(*) >= 1
    """,
)
def dedup_bow_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive dedup on the bag-of-words fingerprint
    (sorted distinct tokens) — catches shuffled/reordered copies."""
    bow = md5_60(
        F.array_join(F.array_sort(F.array_distinct(tokenize("text"))), " ")
    )
    return (
        _docs(spark, sf_dir)
        .groupBy(bow.alias("bow_fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------

#: Document-frequency cap for inverted-index shingles. A shingle in
#: more than this many docs is a "stop shingle": it contributes
#: O(df²) join rows on ONE key — the classic straggler at corpus
#: scale. At 100 TB this would be sized relative to the corpus
#: (e.g. ~1e-5 of doc count); the absolute default keeps every
#: driver-scale run uncapped (max df ≈ dup-cluster size ≪ 1024) so
#: the query stays oracle-exact while the guard is real code.
SHINGLE_DF_CAP = 1024


@CAT.query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM t a, t b WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM p
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via a df-capped
    inverted-index join.

    Plan: explode shingles → document-frequency pass → self-join on
    the shingle key for shingles with df ≤ :data:`SHINGLE_DF_CAP`
    only (only docs sharing an indexable shingle ever meet) → count
    common-uncapped per pair → join per-doc set sizes plus each doc's
    (tiny, df>cap) capped-shingle array → correct the common count
    with the capped-side intersection → filter J ≥ t. The oracle
    brute-forces all pairs; this never does.

    Exactness: the emitted Jaccard of every pair is EXACT — capped
    shingles are excluded only from candidate generation, then added
    back via ``array_intersect`` over the per-doc capped arrays
    (bounded by the number of stop shingles, so they ship as small
    arrays where full shingle sets would not). The only delta vs the
    oracle: a pair whose common shingles ALL have df > cap is never
    generated. At J ≥ 0.6 such a pair is boilerplate-only by
    construction (every shared trigram appears in >cap docs), and at
    the driver's scales the cap never fires, so the result is
    verified identical to the brute-force oracle.
    """
    return ngram_jaccard_pairs(_doc_shingles(spark, sf_dir))


class _CappedIndex(NamedTuple):
    """Shared artifacts of the df-capped inverted-index dedup family
    (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`,
    :func:`dedup_incremental_batch`). Built ONCE per query over the
    persisted (doc_id, sh) frame so the cap/add-back logic lives in
    one place."""

    sh: DataFrame  #: persisted (doc_id, sh) distinct pairs
    dfreq: DataFrame  #: (sh, df) document frequencies
    stops: DataFrame  #: persisted (sh, is_stop) stop-shingles (df > cap)
    idx: DataFrame  #: sh minus stop-shingles — the joinable index
    info: DataFrame  #: persisted (doc_id, n_sh, capped_sh array) per doc
    docs: DataFrame  #: (sh, docs sorted array) per indexable shingle, ≥2 docs


def _capped_index(sh: DataFrame, df_cap: int) -> _CappedIndex:
    """The preamble every capped-index dedup shares. ``sh`` is
    persisted (tracked; see cache.release_caches): four consumers
    reference it (document frequencies, the stop-flag join feeding
    info and the index, the supplemental containment probe) and would
    otherwise re-run the scan→explode shuffle each — this is the
    inverted index any shingle-dedup system materializes once.

    r13 restructure (guide §2.3/§2.4 — aggregate before you shuffle,
    remove exchanges; VERDICT r12 #1):

    - ``info`` is ONE doc-keyed aggregation over the stop-flagged rows
      (count + conditional collect) instead of the r4–r12
      sizes-aggregate ⋈ capped-aggregate LeftOuter join (two doc-keyed
      exchanges + a join per build). It is PERSISTED: every consumer
      references it twice (both pair sides), and before this the whole
      subtree — including a fresh dfreq aggregation — was planned once
      per reference (the r12 before-plans show 2-3 copies; AQE's
      runtime exchange reuse did not collapse them into one query
      stage). The cache is per-doc metadata, the same O(docs) class as
      the signature store.
    - ``stops`` is persisted too: it is the df > cap FILTER of dfreq —
      at most the handful of boilerplate shingles (usually zero rows)
      — and caching it means the corpus-scale dfreq aggregation behind
      it runs ONCE, not once per broadcast site / eager probe. This
      subsumes the old ``cache_dfreq`` option, which cached the full
      corpus-scale per-shingle frame to serve the same probe.
    - ``docs`` groups the capped index by shingle — (sh, sorted doc
      list, length ≤ df_cap by construction, singleton groups dropped)
      — so pair-generating consumers emit candidates with a bounded
      array-explode instead of self-joining the index (the r12
      fingerprint-core pattern: a corpus-keyed grouping replaces a
      corpus-scale self-join; the join's per-key df² output rows and
      the explode's are the same rows, but the join machinery, its
      second index read, and one AQE query stage per join side
      disappear). Skew stays bounded: stop shingles are dropped BEFORE
      the grouping, so no group exceeds df_cap."""
    sh = _persist(sh)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    stops = _persist(
        dfreq.filter(F.col("df") > df_cap)
        .select("sh", F.lit(True).alias("is_stop"))
    )
    flagged = sh.join(F.broadcast(stops), "sh", "left")
    idx = flagged.filter(F.col("is_stop").isNull()).select("doc_id", "sh")
    # collect_list skips the NULLs the when() leaves on non-stop rows,
    # and returns [] (never NULL) for docs with no stop shingle — the
    # exact semantics of the old left-join + coalesce(empty) pair.
    info = _persist(
        flagged.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.collect_list(
                F.when(F.col("is_stop"), F.col("sh"))
            ).alias("capped_sh"),
        )
    )
    docs = (
        idx.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    return _CappedIndex(sh, dfreq, stops, idx, info, docs)


def ngram_jaccard_pairs(
    sh: DataFrame, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Core of :func:`dedup_ngram_jaccard` over a (doc_id, sh)
    distinct-pairs frame — parameterized on the df cap so tests can
    force stop-shingles on a synthetic corpus."""
    ix = _capped_index(sh, df_cap)
    # candidate pairs from the per-shingle doc groups (r13; see
    # _capped_index): each sorted group of k ≤ df_cap docs emits its
    # k(k-1)/2 ordered (doc_a < doc_b) pairs via a two-step explode —
    # doc_a with its strict tail slice, then the tail — so per-row
    # memory stays O(df_cap), exactly the multiset the idx self-join
    # on (a.sh = b.sh AND a.doc_id < b.doc_id) produced.
    common = (
        ix.docs.select(
            F.posexplode("docs").alias("i", "doc_a"), F.col("docs")
        )
        .select(
            "doc_a",
            F.explode(
                F.slice("docs", F.col("i") + 2, F.size("docs"))
            ).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c_uncapped"))
    )
    ia = ix.info.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_sh").alias("na"),
        F.col("capped_sh").alias("ca"),
    )
    ib = ix.info.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_sh").alias("nb"),
        F.col("capped_sh").alias("cb"),
    )
    c = F.col("c_uncapped") + F.size(F.array_intersect("ca", "cb"))
    j = c.cast("double") / (F.col("na") + F.col("nb") - c)
    return (
        common.join(ia, "doc_a")
        .join(ib, "doc_b")
        .filter(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


@CAT.query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na
      FROM t a JOIN t b ON a.doc_id != b.doc_id
      WHERE len(a.sh) > 0)
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / na, 6) AS containment
    FROM p
    WHERE CAST(c AS DOUBLE) / na >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram CONTAINMENT pairs: C(A→B) = |A∩B| / |A| ≥ 0.8.

    Jaccard misses subset duplicates — a document embedded verbatim
    inside a much longer one scores J = |A|/|B| ≈ 0 however exact the
    inclusion — so corpus-dedup pipelines (e.g. the RefinedWeb /
    Gopher recipes) additionally test containment. Asymmetric by
    definition: both directions are emitted when both clear the
    threshold.

    Same inverted-index + df-cap machinery as
    :func:`dedup_ngram_jaccard` (explode → df-capped index self-join →
    per-pair common count → exact add-back of capped stop-shingles),
    with the ``!=`` join emitting each unordered candidate once per
    direction. Never O(n²): only docs sharing an indexable shingle
    meet. The oracle brute-forces all directed pairs.

    Unlike Jaccard — where a pair whose every common shingle is capped
    is boilerplate-only by construction at J ≥ 0.6 — directed
    containment CAN clear 0.8 through stop-shingles alone (a short doc
    made of boilerplate contained in a longer one), so the cap gets a
    supplemental candidate path making the result fully exact: a pair
    missed by the uncapped index shares ONLY capped shingles, which
    bounds C(A→B) ≤ |capped(A)|/|A|; therefore only docs whose capped
    fraction alone could reach the threshold need candidates generated
    from their (few) stop shingles, and every above-threshold pair is
    provably produced by one path or the other. The extra join fans
    out as (capped-heavy docs) × df — the bounded, honest price of
    exactness for that small boilerplate subset, never the O(df²)
    all-stop-shingle blowup the cap exists to prevent.
    """
    return containment_pairs(_doc_shingles(spark, sf_dir))


def containment_pairs(
    sh: DataFrame, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Core of :func:`dedup_containment_pairs` over a (doc_id, sh)
    distinct-pairs frame — parameterized on the df cap so tests can
    force the supplemental stop-shingle path on a synthetic corpus."""
    ix = _capped_index(sh, df_cap)
    # directed candidates from the per-shingle doc groups (r13; see
    # _capped_index): each group of k ≤ df_cap docs emits its k(k-1)
    # ordered (doc_a ≠ doc_b) pairs — both directions, matching the
    # idx self-join on (a.sh = b.sh AND a.doc_id != b.doc_id).
    common = (
        ix.docs.select(F.explode("docs").alias("doc_a"), F.col("docs"))
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c_uncapped"))
    )
    # Supplemental candidates (see dedup_containment_pairs docstring):
    # a pair the uncapped index misses has C(A→B) ≤ |capped(A)|/|A|,
    # so only capped-heavy A-sides need their stop shingles probed
    # against the full index. Adaptive gate: ONE driver-side probe job
    # over the (already persisted) shingle index decides whether any
    # capped-heavy doc exists. When none does — every driver scale,
    # and any corpus whose boilerplate docs are longer than 1/(1-C) of
    # pure stop-shingles — the plan stays the plain candidate set with
    # ZERO added shuffles (an unconditional anti-join/union here
    # re-shuffled the full 2M-pair candidate set: measured +21% at
    # sf0.1 for provably-empty supplemental work). When heavy docs do
    # exist, the candidates are unioned in with c_uncapped = 0 (a
    # missed pair shares no uncapped shingle by definition) and
    # deduped by groupBy-max: for a pair in both sets MAX picks the
    # true uncapped count, and the exchange is only paid on corpora
    # that actually need the supplemental path.
    heavy_pred = F.size("capped_sh").cast("double") >= F.lit(
        CONTAINMENT_THRESHOLD
    ) * F.col("n_sh")
    # two-level probe: no stop shingle at all (one read of the tiny
    # persisted stops cache — its first materialization runs the dfreq
    # aggregation exactly once) ⇒ no capped doc ⇒ no heavy doc,
    # without ever building the info DAG for the probe
    has_stops = ix.stops.limit(1).count() > 0
    if has_stops and ix.info.filter(heavy_pred).limit(1).count() > 0:
        heavy = ix.info.filter(heavy_pred).select(
            "doc_id", F.explode("capped_sh").alias("sh")
        )
        supp = (
            heavy.alias("ha")
            .join(
                ix.sh.alias("hb"),
                (F.col("ha.sh") == F.col("hb.sh"))
                & (F.col("ha.doc_id") != F.col("hb.doc_id")),
            )
            .select(
                F.col("ha.doc_id").alias("doc_a"),
                F.col("hb.doc_id").alias("doc_b"),
            )
            .distinct()
            .withColumn("c_uncapped", F.lit(0).cast("bigint"))
        )
        cand = (
            common.unionByName(supp)
            .groupBy("doc_a", "doc_b")
            .agg(F.max("c_uncapped").alias("c_uncapped"))
        )
    else:
        cand = common
    ia = ix.info.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_sh").alias("na"),
        F.col("capped_sh").alias("ca"),
    )
    ib = ix.info.select(F.col("doc_id").alias("doc_b"), F.col("capped_sh").alias("cb"))
    c = F.col("c_uncapped") + F.size(F.array_intersect("ca", "cb"))
    cont = c.cast("double") / F.col("na")
    return (
        cand.join(ia, "doc_a")
        .join(ib, "doc_b")
        .filter(cont >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


# ---------------------------------------------------------------------------
# Incremental ingestion dedup: a new batch screened against the corpus
# ---------------------------------------------------------------------------

#: Batch split: doc_id % mod == 0 simulates the "newly arrived" 20%
#: screened against the already-ingested 80% — the shape of every
#: production incremental crawl ingest.
_INC_BATCH_MOD = 5


@CAT.query(
    "dedup_incremental_batch",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, md5(text) AS h, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    b AS (SELECT * FROM t WHERE doc_id % {_INC_BATCH_MOD} = 0),
    c AS (SELECT * FROM t WHERE doc_id % {_INC_BATCH_MOD} <> 0),
    ex AS (SELECT DISTINCT b.doc_id FROM b JOIN c ON b.h = c.h),
    near AS (
      SELECT b.doc_id, COUNT(*) AS n_near
      FROM b JOIN c
        ON len(b.sh) + len(c.sh) > 0
       AND CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
           / (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh)))
           >= {JACCARD_THRESHOLD}
      GROUP BY b.doc_id),
    flagged AS (SELECT doc_id FROM ex UNION SELECT doc_id FROM near)
    SELECT f.doc_id,
           CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS exact_dup,
           CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near
    FROM flagged f
    LEFT JOIN ex e ON f.doc_id = e.doc_id
    LEFT JOIN near n ON f.doc_id = n.doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: screen a newly arrived batch
    (``doc_id % _INC_BATCH_MOD == 0``) against the already-ingested
    corpus and
    flag each batch doc that is an exact copy (content md5 match) or a
    near-dup (3-gram Jaccard ≥ threshold with ≥1 corpus doc) — the
    admission gate a production crawl pipeline runs per ingest, where
    re-deduplicating the whole corpus per batch is unaffordable.

    Scale shape: the exact check is a semi-join of batch md5s against
    corpus md5s (shuffles 16-byte hashes, never text). The near check
    reuses the df-capped inverted-index machinery of
    :func:`dedup_ngram_jaccard`, with candidates generated ONLY across
    the batch×corpus boundary — corpus-internal pairs, the quadratic
    bulk an incremental system must not recompute, are never joined.
    Capped stop-shingles are added back exactly, and the same J ≥ 0.6
    boilerplate-only argument covers pairs whose every common shingle
    is capped.

    Output: one row per flagged batch doc — (doc_id, exact_dup 0/1,
    n_near = matching corpus docs)."""
    is_batch = F.col("doc_id") % _INC_BATCH_MOD == 0
    # exact: hash-only semi join (batch side tiny relative to corpus).
    # The (doc_id, md5) projection is persisted (16 B/doc) so the two
    # split branches don't each re-scan the text corpus for its md5.
    hashes = _persist(
        _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("h"))
    )
    ex = (
        hashes.filter(is_batch)
        .join(hashes.filter(~is_batch).select("h"), "h", "left_semi")
        .select("doc_id")
        .withColumn("exact_dup", F.lit(1).cast("bigint"))
    )
    # near: cross-boundary inverted index with df cap + exact add-back
    # (the shared _capped_index preamble; only the candidate predicate
    # — batch side vs corpus side — differs from the jaccard twin)
    ix = _capped_index(_doc_shingles(spark, sf_dir), SHINGLE_DF_CAP)
    # cross-boundary candidates from the per-shingle doc groups (r13;
    # see _capped_index): split each group's doc list into its batch
    # and corpus sides with array filters, then cross them — exactly
    # the batch-side ⋈ corpus-side rows of the old idx join, with
    # corpus-internal pairs never generated, and both sides ≤ df_cap.
    batch_docs = F.filter(
        "docs", lambda d: d % _INC_BATCH_MOD == F.lit(0)
    )
    corpus_docs = F.filter(
        "docs", lambda d: d % _INC_BATCH_MOD != F.lit(0)
    )
    common = (
        ix.docs.select(
            F.explode(batch_docs).alias("doc_id"),
            corpus_docs.alias("cdocs"),
        )
        .select("doc_id", F.explode("cdocs").alias("c_doc"))
        .groupBy("doc_id", "c_doc")
        .agg(F.count(F.lit(1)).alias("c_uncapped"))
    )
    ib = ix.info.select(
        F.col("doc_id").alias("doc_id"),
        F.col("n_sh").alias("nb"),
        F.col("capped_sh").alias("cb"),
    )
    ic = ix.info.select(
        F.col("doc_id").alias("c_doc"),
        F.col("n_sh").alias("nc"),
        F.col("capped_sh").alias("cc"),
    )
    cnt = F.col("c_uncapped") + F.size(F.array_intersect("cb", "cc"))
    j = cnt.cast("double") / (F.col("nb") + F.col("nc") - cnt)
    near = (
        common.join(ib, "doc_id")
        .join(ic, "c_doc")
        .filter(j >= JACCARD_THRESHOLD)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        ex.join(near, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("exact_dup", F.lit(0)).cast("bigint").alias("exact_dup"),
            F.coalesce("n_near", F.lit(0)).cast("bigint").alias("n_near"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_sets(
    spark: SparkSession, sf_dir: str, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, shs array<string>, n_sh, hs array<bigint>) — computed as
    a ZERO-shuffle narrow map: the per-doc distinct shingle set is an
    array_distinct over the row's own tokens (no explode, no groupBy),
    and ``hs`` hashes each shingle exactly once via an array transform.
    At 100 TB this stage is pure scan→project parallelism.

    hash_fn: 'md5' gives the cross-engine-reproducible hash the
    oracle-exact signature query needs; 'xxhash' is the fast JVM-native
    path for the LSH pipeline, whose oracle checks the verified
    *Jaccard pairs*, not the hash values — any uniform hash family is
    valid there.
    """
    if hash_fn == "md5":

        def h(s: Column) -> Column:
            return (
                F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % _P31
            )

    else:

        def h(s: Column) -> Column:
            return F.pmod(F.xxhash64(s), F.lit(_P31))

    shs = F.array_distinct(shingles(tokenize("text"), 3))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", shs.alias("shs"), F.size(shs).alias("n_sh"))
        .filter(F.col("n_sh") > 0)
        .select("doc_id", "shs", "n_sh", F.transform("shs", h).alias("hs"))
    )


def _minhash_sig() -> Column:
    """The 64-permutation MinHash signature of the ``hs`` hash-array
    column, as a vectorized Arrow pandas_udf.

    Spark's higher-order functions are interpreted (no codegen), so 64
    array_min∘transform expressions cost ~50M boxed lambda calls at
    bench scale (measured ~7 s); the numpy formulation — an outer
    product (a⊗h + b) % p with a min along the hash axis — is two
    orders faster and arithmetically identical (int64 throughout, no
    overflow: a,h < 2^31 so a*h+b < 2^63). Arrow moves only the compact
    hash arrays, never the shingle strings.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    a_vec = np.array([a for a, _ in _MINHASH_AB], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in _MINHASH_AB], dtype=np.int64)[:, None]

    @pandas_udf("array<bigint>")
    def sig_udf(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            v = (a_vec * np.asarray(h, dtype=np.int64) + b_vec) % _P31
            out.append(v.min(axis=1))
        return pd.Series(out)

    return sig_udf("hs")


def minhash_signatures(
    spark: SparkSession, sf_dir: str, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, sig array<bigint>[64]) — a zero-shuffle narrow map."""
    sets = shingle_sets(spark, sf_dir, hash_fn)
    return sets.select("doc_id", _minhash_sig().alias("sig"))


@CAT.query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
      FROM documents),
    h AS (
      SELECT doc_id, {md5_60_sql("s")} % {_P31} AS h31 FROM sh)
    SELECT doc_id,
           {", ".join(f"MIN(({a}::BIGINT * h31 + {b}) % {_P31}) AS m{j}" for j, (a, b) in enumerate(_MINHASH_AB[:8]))}
    FROM h GROUP BY doc_id
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 MinHash components, oracle-exact (DuckDB computes the
    identical md5-derived universal hashes). The full 64-wide signature
    feeds the LSH query below."""
    sig = minhash_signatures(spark, sf_dir)
    return sig.select(
        "doc_id", *[sig.sig[j].alias(f"m{j}") for j in range(8)]
    )


_SIG64_SQL = ", ".join(
    f"MIN(({a}::BIGINT * h31 + {b}) % {_P31}) AS m{j}"
    for j, (a, b) in enumerate(_MINHASH_AB)
)
_EST_EQ_SQL = " + ".join(
    f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END" for j in range(64)
)


@CAT.query(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH sh2 AS (
      SELECT DISTINCT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
      FROM documents),
    h AS (SELECT doc_id, {md5_60_sql("s")} % {_P31} AS h31 FROM sh2),
    sig AS (SELECT doc_id, {_SIG64_SQL} FROM h GROUP BY doc_id),
    t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM t a, t b WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b,
             ROUND(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
      FROM p WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {JACCARD_THRESHOLD})
    SELECT doc_a, doc_b, jaccard,
           ROUND(({_EST_EQ_SQL}) / 64.0, 6) AS est_jaccard
    FROM pairs
    JOIN sig sa ON doc_a = sa.doc_id
    JOIN sig sb ON doc_b = sb.doc_id
    """,
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy report: for every verified near-dup pair
    (exact 3-gram Jaccard ≥ threshold), the 64-permutation MinHash
    ESTIMATE (fraction of equal signature components) next to the
    exact value — the monitoring query a production dedup pipeline
    runs to validate that its sketch parameters (here 64 permutations:
    stderr ≈ sqrt(J(1-J)/64) ≈ 0.06 at J=0.6) still track reality
    before trusting estimate-only shortcuts at full scale.

    Both the exact pairs (df-capped inverted index, add-back exact)
    and the md5-derived universal-hash signatures are oracle-exact, so
    the ESTIMATES match DuckDB bit-for-bit too — the comparison is
    signature-component equality, integer arithmetic end to end.

    Scale shape: the signatures are derived from the SAME persisted
    (doc_id, sh) frame the pair verification uses — the md5 shingle
    hashes are computed once on the cached index, re-bagged per doc
    (a shuffle of 8-byte hashed shingles, far smaller than
    re-scanning and re-shingling the text corpus), and folded into
    the 64-wide signature by the vectorized ``_minhash_sig`` Arrow
    UDF. (Measured dead ends at sf0.1: a second narrow
    scan+tokenize+shingle pass cost ~1.7 s extra; 64 codegen'd MIN
    aggregates blow the JVM generated-method limit and fall back to
    interpreted evaluation at 2× the total runtime.) The pair list
    then ships (doc_a, doc_b) ids and joins the 512-byte signatures
    twice."""
    sh = _doc_shingles(spark, sf_dir)
    # persist the (small) verified pair list: it feeds both the
    # participant filter below and the final join, and re-deriving the
    # inverted-index DAG twice doubled the query's cost
    pairs = _persist(ngram_jaccard_pairs(sh))  # persists sh too
    # signatures are only needed for docs that appear in a verified
    # pair — typically a tiny fraction of the corpus. Semi-filter the
    # shingle frame before the md5 signature work: at any scale the
    # sketch-audit query hashes |pair members| docs, not |corpus|.
    # NO broadcast hint: in a duplicate-heavy corpus the member set
    # can be a large fraction of the corpus, and an unconditional
    # broadcast of an unbounded id set risks OOM — the shuffle join
    # prunes identically, and AQE still chooses broadcast whenever the
    # member set is actually small (the driver-scale plan).
    members = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    # persisted (r13): BOTH pair sides read the signature frame, and
    # without the cache the semi-join + md5 + Arrow-UDF subtree was
    # planned and EXECUTED once per side (the r12 before-plan carries
    # two full copies; 8 of the entry's 38 jobs were the duplicate).
    # |pair members| × 512 B — the signature-store scale class.
    sig = _persist(
        sh.join(members, "doc_id", "left_semi")
        .select("doc_id", (md5_60(F.col("sh")) % _P31).alias("h31"))
        .groupBy("doc_id")
        .agg(F.collect_list("h31").alias("hs"))
        .select("doc_id", _minhash_sig().alias("sig"))
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    eq = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(eq.cast("double") / 64.0, 6).alias("est_jaccard"),
        )
    )


@CAT.query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM t a, t b WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM p
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup pairs: banded signatures (r=2, b=32) →
    candidate pairs from band-key collisions → exact-Jaccard
    verification of candidates only.

    The oracle is the exact brute-force Jaccard SQL: with J≈0.99
    planted dups and b=32/r=2, candidate recall at the 0.6 threshold is
    1 - (1-0.6²)^32 ≈ 1-1e-6 — verified equal to exact at the driver's
    sf in tests. At 100 TB only the LSH path is viable: cost is
    O(n·bands) explode + self-join on band keys, never O(n²).

    Engineering notes (measured): the shingle stage is persisted — the
    plan consumes it four times (band sides a/b, verification sides
    a/b) and recomputing the narrow shingle+hash map each time was 3×
    the total runtime (at cluster scale this materialization is the
    signature store every LSH system keeps). Hashes are xxhash64
    (JVM-codegen'd) rather than md5 — valid because the oracle checks
    the verified Jaccard pairs, which are hash-independent. The cache
    and the verification intersects both work on compact int64 hash
    arrays, never the shingle strings (64-bit collisions: ~n_sh²/2⁶⁴
    per pair, immaterial next to the 0.6 threshold).
    """
    shs = F.array_distinct(shingles(tokenize("text"), 3))
    h63 = F.array_distinct(F.transform(shs, lambda s: F.xxhash64(s)))
    # persist the ONE expensive column only; every derived value
    # (sizes, 31-bit hashes, signatures) is cheap arithmetic over the
    # cached arrays. Deriving them before the persist boundary makes
    # CollapseProject evaluate the shingle pipeline once per reference
    # (measured 2-3× slower cache population).
    base = _persist(_docs(spark, sf_dir).select("doc_id", h63.alias("h63")))
    sets = base.withColumn("n_sh", F.size("h63")).filter(F.col("n_sh") > 0)
    sig = sets.withColumn(
        "hs", F.transform("h63", lambda h: F.pmod(h, F.lit(_P31)))
    ).select("doc_id", _minhash_sig().alias("sig"))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bidx).alias("band"),
                        sig.sig[bidx * _BAND_R].alias("k1"),
                        sig.sig[bidx * _BAND_R + 1].alias("k2"),
                    )
                    for bidx in range(_N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.k1", "bk.k2")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification of the candidate set only, off the same
    # persisted shingle sets
    va = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("h63").alias("sha"), F.col("n_sh").alias("na")
    )
    vb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("h63").alias("shb"), F.col("n_sh").alias("nb")
    )
    c = F.size(F.array_intersect("sha", "shb"))
    j = c.cast("double") / (F.col("na") + F.col("nb") - c)
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .filter(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster formation: connected components over near-dup pairs
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 15


def _lineage_truncate(
    df: DataFrame, reliable: bool, eager: bool = True
) -> DataFrame:
    """Cut the logical-plan lineage between CC iterations.

    ``reliable=False`` → ``localCheckpoint`` (executor-local blocks:
    fastest, right for local mode and short jobs, but a lost executor
    loses blocks with no recompute path). ``reliable=True`` →
    ``DataFrame.checkpoint`` to the SparkContext checkpoint dir
    (HDFS/object store on a cluster), which survives executor churn —
    the hardening a 1000-executor run wants. A default dir under the
    local filesystem is installed if the caller never set one.

    ``eager=False`` defers materialization to the caller's next action
    on the returned frame — the CC loop uses this to fuse the
    per-round checkpoint job with its convergence probe (one job per
    round instead of two; at cluster scale that halves the scheduler
    round-trips of the label-propagation driver loop).
    """
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="cc_ckpt_"))
    return df.checkpoint(eager=eager)


# Recursive-CTE connected components over the exact near-dup pair
# graph (min reachable doc_id == cluster id) — shared by the
# components oracle and the keep-best representative oracle below.
_CC_REACH_CTES = f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM t a, t b WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b FROM p
      WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v)"""


@CAT.query(
    "dedup_connected_components",
    oracle=f"""{_CC_REACH_CTES}
    SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
    """,
)
def dedup_connected_components(
    spark: SparkSession, sf_dir: str, *, reliable_checkpoint: bool = False
) -> DataFrame:
    """Duplicate-cluster formation: connected components over the
    MinHash-LSH near-dup pair graph — the step that turns pairwise
    near-dups into "keep one doc per cluster" decisions in a real
    corpus-dedup pipeline.

    Algorithm: hash-to-min label propagation (Rastogi et al., "Finding
    Connected Components in Map-Reduce in Logarithmic Rounds", ICDE
    2013): every node starts labeled with its own id and repeatedly
    takes the min label over itself and its neighbors, until a
    fixpoint. Each iteration is one join (propagate labels along
    edges) + one groupBy-min over (node, label) LONG pairs — never
    over document payloads — and labels are monotonically
    non-increasing, so convergence is detected by comparing
    ``sum(label)`` between iterations (one tiny aggregate per round,
    no extra join). Near-dup clusters at J ≥ 0.6 are clique-dense
    with diameter ~2-3, so 3-4 rounds suffice; the loop is capped at
    ``_CC_MAX_ITERS``.

    Iterative-plan hygiene: every round ends in a lineage truncation
    (``_lineage_truncate``) rather than ``persist`` — the checkpoint
    truncates lineage so Catalyst re-analyzes a leaf relation each
    round instead of the whole upstream LSH DAG (measured 4x
    per-iteration speedup at sf0.1; without truncation the logical
    plan doubles every round and optimizer time, not the shuffle,
    dominates). Same pattern GraphFrames uses for its iterative
    algorithms. ``reliable_checkpoint=True`` switches every truncation
    to a reliable ``DataFrame.checkpoint`` (checkpoint-dir backed) so
    a cluster run survives executor churn; the default stays
    ``localCheckpoint`` for local/short-lived jobs.

    The oracle computes the same components with a recursive CTE
    (min reachable doc_id == cluster id). Output: one row per doc
    that appears in at least one near-dup pair; singletons are
    implicitly their own cluster and are not emitted.
    """
    token = scope_token()  # caches built below are ours to release
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        pairs, reliable_checkpoint=reliable_checkpoint, release_token=token
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def connected_components(
    pairs: DataFrame,
    *,
    reliable_checkpoint: bool = False,
    release_token: int | None = None,
) -> DataFrame:
    """Hash-to-min connected components over an undirected pair list
    (first two columns = the two node ids, any long type) → (node,
    label) with label = min reachable node id. The reusable core of
    :func:`dedup_connected_components` — also drives the embedding
    semantic-cluster op in ``clustering.py``; see that docstring for
    the algorithm/scale discussion.

    ``release_token``: a :func:`cache.scope_token` taken by the caller
    BEFORE building the pair pipeline. Once the edge materialization
    below completes, the caches that pipeline registered (shingle
    index, LSH signatures) are dead weight and are unpersisted — but
    ONLY those: draining the global registry here would silently evict
    caches other operators' still-unmaterialized plans reference.
    ``None`` (the default for library callers) releases nothing."""
    u, v = pairs.columns[:2]
    # materialize the (expensive) pair DAG exactly ONCE, then derive
    # the symmetric edge list from the checkpointed leaf — a
    # union-of-swapped-projections over the raw `pairs` plan would
    # evaluate the whole upstream LSH candidate+verify pipeline twice
    # inside one eager checkpoint (measured +26% on the sf0.1 bench)
    plist = _lineage_truncate(
        pairs.select(F.col(u).alias("u"), F.col(v).alias("v")),
        reliable_checkpoint,
    )
    edges = plist.union(plist.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # the pair list is materialized now — the caller's upstream caches
    # (MinHash shingles, LSH band signatures) are no longer referenced
    # by anything the returned plan needs
    if release_token is not None:
        release_caches(release_token)
    # round 1 is free: with identity labels, the propagate-join is just
    # min-over-neighbors, so initialization and the first iteration fuse
    # into ONE groupBy over the edge list — least(u, min(v)) — skipping
    # a checkpoint, a join, and a convergence collect
    # each round's checkpoint is LAZY: the convergence probe's sum
    # aggregation is the action that materializes it, fusing the
    # checkpoint job and the probe job into one per round
    labels = _lineage_truncate(
        edges.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("node"),
            F.least("u", "mv").alias("label"),
        ),
        reliable_checkpoint,
        eager=False,
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(_CC_MAX_ITERS - 1):
        msgs = (
            edges.join(labels.select(F.col("node").alias("v"), "label"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = _lineage_truncate(
            msgs.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label")),
            reliable_checkpoint,
            eager=False,
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:  # monotone ⇒ equal sums ⇔ fixpoint
            break
        prev_sum = new_sum
    return labels


@CAT.query(
    "dedup_cluster_keep_best",
    oracle=f"""{_CC_REACH_CTES},
    cc AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u)
    SELECT cc.cluster_id, cc.doc_id, d.n_chars,
           (row_number() OVER (PARTITION BY cc.cluster_id
                               ORDER BY d.n_chars DESC, cc.doc_id) = 1)
             AS is_kept
    FROM cc JOIN documents d ON d.doc_id = cc.doc_id
    """,
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: the step after cluster formation
    in a corpus dedup pipeline — within every near-dup cluster, keep
    exactly one representative (longest doc by ``n_chars``, ties
    broken by smallest doc_id) and flag the rest for dropping.

    Built on :func:`connected_components` over the MinHash-LSH pair
    graph (same pipeline as :func:`dedup_connected_components`), then
    one key join to attach doc lengths and one ``row_number`` window
    per cluster. Clusters are near-cliques of duplicates — a handful
    of docs each — so the per-cluster window is trivially balanced;
    the join ships only (node, label) longs against the pruned
    (doc_id, n_chars) projection of the corpus scan. Output: one row
    per clustered doc with its cluster id, length, and keep flag
    (singletons never enter a pair, so they are implicitly kept and
    not emitted — same contract as the components op).
    """
    token = scope_token()
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, release_token=token)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = labels.join(docs, labels.node == docs.doc_id).select(
        F.col("label").alias("cluster_id"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    return j.withColumn("is_kept", F.row_number().over(w) == 1)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60

# Shared CTE body producing (doc_id, simhash) — used by the signature
# oracle and (self-joined) by the banded-pairs oracle.
_SIMHASH_SIG_CTES = f"""
    tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
      FROM documents),
    h AS (SELECT doc_id, {md5_60_sql("t")} AS hv FROM tok),
    bits AS (
      SELECT doc_id,
             {", ".join(f"CASE WHEN SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (1::BIGINT << {b}) ELSE 0 END AS bit{b}" for b in range(_SIMHASH_BITS))}
      FROM h GROUP BY doc_id),
    sig AS (
      SELECT doc_id, {" + ".join(f"bit{b}" for b in range(_SIMHASH_BITS))} AS simhash
      FROM bits)
"""


@CAT.query(
    "dedup_simhash_signatures",
    oracle=f"""
    WITH {_SIMHASH_SIG_CTES}
    SELECT doc_id, simhash FROM sig
    """,
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document as a ZERO-shuffle narrow map.

    Per row: distinct tokens → one md5 per token (array transform) →
    for each bit b, the sign of the ±1 vote sum, folded into a bigint.
    The vote sum per bit is ``2·|{h : bit set}| − n`` so the per-bit
    pass is a cheap array filter over the already-hashed array; no
    explode, no groupBy — at 100 TB this runs as scan→project only.
    Near-dup docs land within small hamming distance; banding the 60
    bits into 4×15-bit chunks gives the LSH candidate path at scale."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    hs = F.transform(F.array_distinct(tokenize("text")), lambda t: md5_60(t))
    hashed = _docs(spark, sf_dir).select("doc_id", hs.alias("hs"))
    bit_idx = np.arange(_SIMHASH_BITS, dtype=np.int64)

    @pandas_udf("bigint")
    def fold_bits(hs_col: pd.Series) -> pd.Series:
        # votes per bit = 2·|{h: bit set}| − n; bit set iff votes > 0.
        # The 60 per-bit array passes were interpreted-HOF cost (~10 s
        # at bench scale). Vectorization is two-level: the bit unpack
        # runs over the CONCATENATED hash arrays of a chunk of docs
        # (one (Σn, 60) broadcast instead of a small numpy call per
        # doc — the per-doc loop was overhead-bound at ~2× the math),
        # and per-doc vote sums come from one `np.add.reduceat` over
        # the doc offsets. Chunking bounds the unpacked matrix to
        # ~20 MB regardless of Arrow batch size.
        out = np.zeros(len(hs_col), dtype=np.int64)
        chunk_sz = 256
        for s in range(0, len(hs_col), chunk_sz):
            chunk = hs_col.iloc[s : s + chunk_sz]
            arrs = [np.asarray(h, dtype=np.int64) for h in chunk]
            lens = np.fromiter(
                (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
            )
            nz = lens > 0
            if not nz.any():
                continue
            flat = np.concatenate([a for a in arrs if len(a)])
            bits = (flat[:, None] >> bit_idx) & 1
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
            sums = np.add.reduceat(bits, offs, axis=0)
            sim = (2 * sums - lens[nz][:, None]) > 0
            vals = (sim.astype(np.int64) << bit_idx).sum(axis=1)
            out[np.nonzero(nz)[0] + s] = vals
        return pd.Series(out)

    return hashed.select("doc_id", fold_bits("hs").alias("simhash"))


@CAT.query(
    "dedup_simhash_pairs",
    # The banding is deterministic given the md5-derived signature, so
    # the emitted pair set (band collision AND hamming ≤ 12) is exactly
    # reproducible in SQL — approximation is only relative to "true"
    # near-dups, not to this query's defined output.
    oracle=f"""
    WITH {_SIMHASH_SIG_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE ({" OR ".join(f"((a.simhash >> {i * 15}) & 32767) = ((b.simhash >> {i * 15}) & 32767)" for i in range(4))})
      AND bit_count(xor(a.simhash, b.simhash)) <= 12
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 12 via 4×15-bit banding
    (pigeonhole: distance ≤ 3 guarantees a clean band; beyond that the
    bands are a high-recall heuristic relative to true near-dups — but
    the emitted set itself is deterministic, so the oracle reproduces
    the banding exactly with an O(n²) reference join)."""
    sig = dedup_simhash_signatures(spark, sf_dir)
    mask = (1 << 15) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 15)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bv")
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("bigint")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 12)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact baseline; LSH path in similarity.py)
# ---------------------------------------------------------------------------

#: Block-partitioned pair generation: each side is bucketed by
#: vec_id mod B and replicated to its bucket PAIRS, so every task
#: compares exactly one (bucket_i, bucket_j) block. B(B+1)/2 uniform
#: groups; per-group memory is two n/B-row blocks plus one
#: chunk × n/B score slab (see _block_cosine), never the corpus.
#: B is DERIVED from the corpus row count (VERDICT r12 #3): floor 16
#: (≥136 groups, enough parallel grain for any local run — and the
#: value every driver-scale fixture resolves to, so plans and outputs
#: are unchanged there), growing linearly once the corpus exceeds
#: _COS_BLOCK_ROWS per block so a block never outgrows an executor.
_COS_BLOCKS_MIN = 16
#: Target rows per bucket before B grows: 64 dims × 8 B × 65536 rows
#: = 32 MiB per block buffer.
_COS_BLOCK_ROWS = 65536


def _cos_blocks(sf_dir: str) -> int:
    """Block count for :func:`dedup_embedding_cosine` — read the
    embeddings row count from the parquet FOOTER metadata (pyarrow, no
    Spark job, sub-millisecond) and size B so each of the B buckets
    holds at most ~_COS_BLOCK_ROWS vectors. Footer-unreadable paths
    fall back to the floor: wrong B is a performance knob, never a
    correctness one (every B produces the identical pair set)."""
    import glob
    import math
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        files = (
            [path]
            if os.path.isfile(path)
            else glob.glob(os.path.join(path, "*.parquet"))
        )
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except OSError:
        n = 0
    return max(_COS_BLOCKS_MIN, math.ceil(n / _COS_BLOCK_ROWS))


#: Row-chunk height of the kernel's score slab: bounds per-group
#: kernel memory at chunk × (n/B) × 8 B (2 MiB at the 65536-row block
#: cap) on top of the two vector blocks — the ADVICE r12 fix: the
#: unchunked (n/B)² matrix would have forced B to grow ~linearly in n
#: to keep memory flat, reintroducing the quadratic group-count blowup
#: the block design exists to avoid.
_COS_CHUNK = 256


@CAT.query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings
               WHERE list_dot_product(v, v) > 0),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cs
      FROM e a, e b WHERE a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, ROUND(cs, 6) AS cosine
    FROM p WHERE cs >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ 0.4) — the brute-force
    baseline the ANN path is measured against. Zero-norm vectors are
    filtered on both engines before scoring — see
    :func:`csv_to_parquet_spark.functions.nonzero_norm`.

    Scale shape (r6 VERDICT fix kept; r12 kernel swap): the semantics
    are inherently O(n²) compute, but neither the MEMORY nor the
    per-pair cost is — each vector is bucketed by
    ``vec_id mod B`` (B = :func:`_cos_blocks`, derived from the corpus row count) and replicated to the B block-pair keys
    its bucket participates in (one ``transform`` over 0..B−1 emitting
    (least(c, j), greatest(c, j)) — the diagonal once), and ONE
    shuffle groups each (bi, bj) block into an ``applyInPandas``
    kernel: B(B+1)/2 uniformly-sized groups, per-group memory two
    n/B-row blocks, never the corpus, and no broadcast of anything.
    At 100 TB you raise B so blocks fit executors; the group count,
    not a driver broadcast, absorbs the growth.

    r12 optimization (guide §4.2 — heavy lifting in native code): the
    r7–r11 shape joined exploded rows pairwise and scored each pair
    with the interpreted zip_with/aggregate HOF — THREE 64-element
    interpreted folds per pair (dot + both norms re-derived per pair),
    ~400M boxed lambda ops at sf0.1. The kernel computes each block's
    norms once per VECTOR and the cross-block dot matrix as 64
    dimension-ordered vectorized accumulations — the `_seq_dots_udf`
    parity argument: per (pair, dim) exactly one IEEE-754 multiply and
    one add in dimension order, so every dot, norm, quotient is
    BIT-IDENTICAL to the sequential HOF form and DuckDB's
    list_dot_product replay (verified exact vs the oracle at sf0.01
    AND sf0.1 before the swap). Only the surviving pairs cross Arrow
    back; ROUND stays JVM-side. Measured 3.55 s → 0.88 s at sf0.1
    (same-session min-of-3) with row-identical output.
    """
    from csv_to_parquet_spark.functions import nonzero_norm

    B = _cos_blocks(sf_dir)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(nonzero_norm("embedding"))
    )
    bkt = (F.col("vec_id") % B).cast("int")
    # the JVM-computed bucket rides the replicated frame (one int per
    # row) so the kernel never re-derives it — ADVICE r12: a Python
    # `ids % B` re-derivation silently disagrees with JVM `%` on
    # negative ids (JVM yields negative, numpy non-negative) and would
    # drop pairs with no error.
    rep = e.select(
        "vec_id",
        "embedding",
        bkt.alias("bkt"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(B - 1)),
                lambda j: F.struct(
                    F.least(bkt, j).cast("int").alias("bi"),
                    F.greatest(bkt, j).cast("int").alias("bj"),
                ),
            )
        ).alias("bp"),
    ).select(
        "vec_id",
        "embedding",
        "bkt",
        F.col("bp.bi").alias("bi"),
        F.col("bp.bj").alias("bj"),
    )

    def _block_cosine(key, pdf):
        import numpy as np

        bi, bj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        # dimension-ordered accumulation: bit-identical to the
        # sequential F.aggregate fold / DuckDB list_dot_product
        n2 = np.zeros(len(V))
        for d in range(V.shape[1]):
            n2 += V[:, d] * V[:, d]
        nrm = np.sqrt(n2)
        c = pdf["bkt"].to_numpy()  # JVM-computed; never re-derived here
        ma, mb = c == bi, c == bj
        ia, va_m, na = ids[ma], V[ma], nrm[ma]
        ib, vb_m, nb = ids[mb], V[mb], nrm[mb]
        if len(ia) == 0 or len(ib) == 0:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cs": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cs": "float64"})
        # row-chunked scoring (ADVICE r12): the score slab is
        # chunk × |ib|, never |ia| × |ib|. Chunking only partitions the
        # ROWS; each (pair, dim) still sees exactly one multiply and
        # one add in dimension order, so every score is bit-identical
        # to the unchunked matrix and the sequential fold.
        outs = []
        for s in range(0, len(ia), _COS_CHUNK):
            va_c = va_m[s : s + _COS_CHUNK]
            acc = np.zeros((va_c.shape[0], len(ib)))
            for d in range(V.shape[1]):
                acc += va_c[:, d : d + 1] * vb_m[:, d][None, :]
            cs = acc / (na[s : s + _COS_CHUNK, None] * nb[None, :])
            ra, rb = np.nonzero(cs >= 0.4)
            outs.append((ia[s + ra], ib[rb], cs[ra, rb]))
        pa = np.concatenate([o[0] for o in outs])
        pb = np.concatenate([o[1] for o in outs])
        pc = np.concatenate([o[2] for o in outs])
        if bi == bj:
            keep = pa < pb
            pa, pb, pc = pa[keep], pb[keep], pc[keep]
        else:
            pa, pb = np.minimum(pa, pb), np.maximum(pa, pb)
        return pd.DataFrame({"vec_a": pa, "vec_b": pb, "cs": pc})

    # Parallelism note (ADVICE r12): the r7–r11 join shape carried an
    # explicit repartition(defaultParallelism, bi, bj); the grouped
    # kernel relies on the groupBy exchange instead and AQE may
    # coalesce byte-small block groups into fewer tasks. Accepted
    # deliberately: the vectorized kernel's CPU-per-byte is ~100×
    # lower than the interpreted fold the guard was sized for, and at
    # any scale where the O(n²) compute matters the replicated blocks
    # are NOT byte-small, so AQE keeps the groups spread.
    return (
        rep.groupBy("bi", "bj")
        .applyInPandas(_block_cosine, "vec_a bigint, vec_b bigint, cs double")
        .select("vec_a", "vec_b", F.round("cs", 6).alias("cosine"))
    )


#: Edit-distance threshold for the fuzzy string-match operator.
_FUZZY_K = 2


@CAT.query(
    "dedup_fuzzy_levenshtein",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_K}
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: all distinct-value pairs within
    Levenshtein distance ≤ 2, via the SymSpell deletion-neighborhood
    candidate scheme — never an all-pairs comparison.

    Candidate generation: every string emits its ≤K-deletion variants
    (itself, each 1-deletion, each 2-deletion — O(L²) short keys per
    string, built by native `transform`/`sequence` substring
    expressions, no Python). The SymSpell theorem guarantees two
    strings with lev ≤ K share at least one common variant, so an
    equi-join on the variant key finds every true pair; `levenshtein`
    then verifies exactly (variants can collide on false candidates).
    Scale shape: `distinct()` first collapses the fact-scale column to
    its vocabulary (one exchange); the variant join is O(n·L²) short
    ids+keys, grouped pair-dedup before the verify keeps the
    quadratic strictly inside same-variant buckets. The brute-force
    oracle is the semantic spec; at open vocabulary it is the plan
    this operator exists to avoid."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    # del1(s) = all strings with exactly one char removed; variants =
    # {s} ∪ del1(s) ∪ del1(del1(s)), deduped. Native expressions only.
    d1 = (
        "transform(sequence(1, length({s})), i -> "
        "concat(substring({s}, 1, i-1), substring({s}, i+1, length({s}))))"
    )
    variants = F.expr(
        "array_distinct(concat(array(p_name), "
        + d1.format(s="p_name")
        + ", flatten(transform("
        + d1.format(s="p_name")
        + ", v -> "
        + d1.format(s="v")
        + "))))"
    )
    exploded = names.select(
        "p_name", F.explode(variants).alias("vkey")
    )
    a = exploded.select(F.col("p_name").alias("name_a"), "vkey")
    b = exploded.select(F.col("p_name").alias("name_b"), "vkey")
    cand = (
        a.join(b, "vkey")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    ).filter(F.col("dist") <= _FUZZY_K)


#: Winnowing parameters: window of consecutive shingle hashes, the
#: shared-fingerprint threshold for reporting a pair, and the maximum
#: document frequency for a fingerprint to count as signal (rare
#: fingerprints carry the match; ubiquitous ones are boilerplate and
#: would make posting lists — and the pair join — quadratic).
_WINNOW_W = 4
_WINNOW_SHARED = 3
_WINNOW_DF_CAP = 20


@CAT.query(
    "dedup_winnowing_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh
      FROM documents),
    h AS (
      SELECT doc_id,
             [{md5_60_sql("x")} for x in sh] AS hs
      FROM t),
    w AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(hs) >= {_WINNOW_W}
                    THEN [list_min(hs[i:i+{_WINNOW_W - 1}])
                          for i in range(1, len(hs) - {_WINNOW_W - 2})]
                    ELSE [] END) AS fps
      FROM h),
    f AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM w),
    rare AS (
      SELECT fp FROM f GROUP BY fp
      HAVING count(*) BETWEEN 2 AND {_WINNOW_DF_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
    JOIN rare r ON r.fp = a.fp
    GROUP BY doc_a, doc_b HAVING count(*) >= {_WINNOW_SHARED}
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS document-fingerprinting
    algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): slide a window of
    4 consecutive shingle hashes over each document's ORDERED hash
    sequence, keep each window's minimum, and report pairs sharing at
    least 3 distinct RARE selected fingerprints (document frequency
    2..20).

    Winnowing's guarantee — any shared substring long enough spans a
    full window, so at least one shared fingerprint is selected from
    it — makes the selected set ~1/w the size of the full shingle set
    with bounded recall loss, which is exactly the sparsification a
    100 TB near-dup index wants. All selection is native array ops
    (transform/slice/array_min over the per-row hash array — zero
    shuffle until the fingerprints explode); the pair join is the
    same ids-only inverted-index shape as the other dedup family
    members, but over the winnowed (≈ n/w) postings. md5-derived
    hashes keep DuckDB's selection bit-identical.

    The df band (2..cap) is part of the operator's SPEC, not an
    approximation: min-of-window selection correlates across documents
    exactly on repeated content, so on a small-vocabulary corpus the
    globally smallest shingle hashes get selected by nearly every doc
    — an uncapped posting list is O(|corpus|) and its pair join
    O(|corpus|²) (measured 22 s at sf0.1 vs ~1 s banded). Ubiquitous
    fingerprints are boilerplate by definition; requiring shared RARE
    fingerprints is the same signal/noise split TF-IDF and the
    df-capped jaccard index make, and the oracle applies the identical
    band.
    """
    toks = tokenize("text")
    shs = shingles(toks, 3)  # ordered, positional — NOT distinct
    # materialize the hash ARRAY behind a persist boundary before the
    # window pass: inlined, CollapseProject would re-evaluate the full
    # md5 transform inside EVERY outer window lambda — O(n²) hashes
    # per doc (measured 15 s vs 0.9 s at sf0.1 for the same output)
    hsdf = _persist(
        _docs(spark, sf_dir).select(
            "doc_id", F.transform(shs, lambda s: md5_60(s)).alias("hs")
        )
    )
    hs = F.col("hs")
    wins = F.when(
        F.size(hs) >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - (_WINNOW_W - 1)),
            lambda i: F.array_min(F.slice(hs, i, _WINNOW_W)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    fps = _persist(
        hsdf.select("doc_id", F.explode(F.array_distinct(wins)).alias("fp"))
    )
    rare = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= _WINNOW_DF_CAP)
    ).select("fp")
    a = fps.join(rare, "fp").select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_SHARED)
    )


# ---------------------------------------------------------------------------
# Round 5: cross-document repeated-passage audit (memorization risk)
# ---------------------------------------------------------------------------

#: Passage length (tokens) for the repeated-passage audit — the
#: 8-gram granularity of Lee et al.'s "Deduplicating Training Data
#: Makes Language Models Better" style span analysis (shorter than
#: their 50-token spans so the synthetic corpus exercises the path).
_PASSAGE_N = 8

_PASSAGES_SQL = shingles_sql("regexp_split_to_array(trim(text), '\\s+')", _PASSAGE_N)


@CAT.query(
    "dedup_repeated_passages",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest({_PASSAGES_SQL}) AS sh FROM documents),
    g AS (
      SELECT {md5_60_sql("sh")} AS passage_fp,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             MIN(doc_id) AS first_doc
      FROM occ GROUP BY 1)
    SELECT passage_fp, n_docs, n_occurrences, first_doc,
           CAST((n_occurrences - 1) * {_PASSAGE_N} AS BIGINT)
             AS dup_token_bound
    FROM g WHERE n_docs >= 2
    """,
)
def dedup_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated {_PASSAGE_N}-token passages — the
    span-level memorization-risk audit that complements document-level
    dedup: a passage appearing in ≥2 documents survives doc-level
    dedup yet is exactly what an LM memorizes (boilerplate, licenses,
    quoted text). Reports, per repeated passage fingerprint, how many
    documents carry it, its total occurrence count (NON-distinct —
    within-doc repetition counts), and an upper bound on duplicated
    tokens attributable to it.

    Plan: one explode of overlapping {_PASSAGE_N}-gram shingles (no
    per-doc distinct — occurrences are the signal), fingerprinted
    map-side to a 60-bit md5 so the groupBy shuffles (fp, doc_id)
    longs instead of passage strings, then a single aggregation with
    a distinct-doc count (Spark's two-phase distinct agg) and the
    df ≥ 2 filter applied post-aggregation. At 100 TB the passage
    stream is ~tokens-per-corpus rows of 16 bytes; the fp groupBy
    partials combine map-side and hot boilerplate fingerprints are
    exactly the keys the count-distinct two-phase split keeps off a
    single reducer."""
    occ = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(shingles(tokenize("text"), _PASSAGE_N)).alias("sh"),
    )
    return (
        occ.select("doc_id", md5_60(F.col("sh")).alias("passage_fp"))
        .groupBy("passage_fp")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "passage_fp",
            "n_docs",
            "n_occurrences",
            "first_doc",
            ((F.col("n_occurrences") - 1) * _PASSAGE_N)
            .cast("bigint")
            .alias("dup_token_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Normalized-exact dedup — C4-style canonicalization before the hash


from csv_to_parquet_spark.operators.textops import (  # noqa: E402
    _STOP_SQL as _NORM_STOP_SQL,
    _STOPWORDS as _NORM_STOPWORDS,
)

# DuckDB mirror of the normalization pipeline in
# :func:`dedup_normalized_exact` — keep in sync with the Spark side.
_NORM_TOKS_SQL = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ', 'g')), '\\s+')"
)
_NORM_FP_SQL = md5_60_sql(
    f"array_to_string(list_filter({_NORM_TOKS_SQL}, "
    f"w -> w <> '' AND w NOT IN ({_NORM_STOP_SQL})), ' ')"
)


@CAT.query(
    "dedup_normalized_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, md5(text) AS raw_md5, {_NORM_FP_SQL} AS norm_fp
      FROM documents)
    SELECT norm_fp, MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_md5) AS BIGINT) AS n_raw_variants
    FROM t GROUP BY norm_fp
    """,
)
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-hash dedup — the C4/CCNet canonical form:
    lowercase, strip punctuation to spaces, drop stopwords, collapse
    whitespace, THEN exact-hash. Catches the near-duplicates raw
    exact dedup misses (casing/punctuation edits, boilerplate
    stopword variation) while staying a single one-shuffle
    hash-groupBy — no candidate generation, no verification pass.
    ``n_raw_variants`` counts how many distinct raw texts collapsed
    into each normalized form (> 1 ⇒ the normalization earned its
    keep; the distinct-count uses Spark's two-phase split, so a hot
    normalized form never lands on one reducer).

    Scale: normalization is a narrow codegen'd projection; the only
    exchange ships (60-bit fp, 60-bit raw fp, doc_id) longs — payload
    text never shuffles. Same posture as
    :func:`dedup_exact_documents`, which stays the raw-bytes gate."""
    toks = tokenize(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "))
    )
    joined = F.array_join(
        F.filter(toks, lambda w: (w != "") & ~w.isin(*_NORM_STOPWORDS)), " "
    )
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.md5("text").alias("raw_md5"),
            md5_60(joined).alias("norm_fp"),
        )
        .groupBy("norm_fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("raw_md5").cast("bigint").alias("n_raw_variants"),
        )
    )


# ---------------------------------------------------------------------------
# Split-document chain detection — shard-boundary artifacts

_SPLIT_K = 8  # boundary fingerprint width in tokens


@CAT.query(
    "dedup_split_doc_chains",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents),
    f AS (
      SELECT doc_id,
             len(toks) AS n_toks,
             {md5_60_sql(f"array_to_string(toks[1:{_SPLIT_K}], ' ')")}
               AS head_fp,
             {md5_60_sql(
                 f"array_to_string(toks[len(toks) - {_SPLIT_K - 1}:"
                 f"len(toks)], ' ')"
             )} AS tail_fp
      FROM t WHERE len(toks) >= {_SPLIT_K}),
    j AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM f a JOIN f b ON a.tail_fp = b.head_fp
      WHERE a.doc_id <> b.doc_id)
    SELECT doc_a, doc_b FROM j
    """,
)
def dedup_split_doc_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document detection: doc A's last {_SPLIT_K} tokens equal
    doc B's first {_SPLIT_K} — the signature of one source document
    sharded across crawl records or shard boundaries (the overlap
    region is duplicated at the cut). Pipelines re-join such chains
    before training; chains also inflate n-gram counts and leak
    "unique" spans across train/eval splits, so the audit matters
    even when no re-join happens.

    Plan: one narrow projection computes a 60-bit head and tail
    fingerprint per doc (payload text never leaves the map side),
    then a single self-equi-join on tail_fp = head_fp — shuffled by
    fingerprint, so matching costs are bounded by boundary-collision
    cardinality, never n². Docs shorter than {_SPLIT_K} tokens can't
    carry a full boundary signature and are excluded in both
    engines."""
    toks = tokenize("text")
    # persist the tiny (doc_id, head_fp, tail_fp) frame: the self-join
    # otherwise re-scans + re-tokenizes + re-hashes the text corpus on
    # BOTH sides (verified: 2 FileScans, no possible exchange reuse —
    # the sides shuffle on different keys)
    f = _persist(
        _docs(spark, sf_dir)
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _SPLIT_K)
        .select(
            "doc_id",
            md5_60(F.array_join(F.slice("toks", 1, _SPLIT_K), " ")).alias(
                "head_fp"
            ),
            md5_60(
                F.array_join(
                    F.slice("toks", -_SPLIT_K, _SPLIT_K), " "
                )
            ).alias("tail_fp"),
        )
    )
    a = f.select(F.col("doc_id").alias("doc_a"), "tail_fp")
    b = f.select(F.col("doc_id").alias("doc_b"), F.col("head_fp").alias("tail_fp"))
    return a.join(b, "tail_fp").filter(F.col("doc_a") != F.col("doc_b")).select(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard (PPJoin-style candidate generation)
# ---------------------------------------------------------------------------

# Exact rational for JACCARD_THRESHOLD = 0.6 — the prefix length must
# be computed with integer ceil, not float, or a rounding-up float
# could SHORTEN a prefix and break candidate completeness.
_TAU_NUM, _TAU_DEN = 3, 5


def jaccard_prefix_filter_pairs(sh: DataFrame) -> DataFrame:
    """Exact Jaccard >= 0.6 pairs via PPJoin-style prefix filtering
    (Chaudhuri et al. 2006; Xiao et al. 2008) over a (doc_id, sh)
    distinct-pairs frame.

    Candidate scheme: order every doc's shingle set by a single GLOBAL
    total order — (document frequency asc, shingle) — and index only
    the first ``p = n - ceil(tau*n) + 1`` shingles per doc. Two docs
    are candidates iff their prefixes share a shingle.

    Completeness (lossless, unlike the df-capped index): J(A,B) >= tau
    implies |A∩B| >= ceil(tau*|A|) and >= ceil(tau*|B|); the smallest
    common shingle under the global order then sits within the first
    ``n - ceil(tau*n) + 1`` positions of BOTH docs, so every qualifying
    pair shares a prefix shingle. Candidates are then verified with the
    exact set intersection, so the output equals the brute-force oracle
    with zero caveats.

    Scale: rarest-first ordering puts each doc's least-frequent
    shingles in its prefix, so prefix postings are the SHORT tail of
    the df distribution — the self-join fan-out per shingle is bounded
    by its (small) prefix-df, not its corpus df. Index size is
    ~(1-tau) of the full inverted index; boilerplate shingles (high
    df) land in suffixes and never generate candidates. Full shingle
    arrays ship only for verified candidates, ids-only everywhere
    else. One shuffle each for dfreq, the df-attach join, the fused
    per-doc aggregation (which yields BOTH the ranked full array and
    its prefix slice — no separate window pass), the prefix-prefix
    join, and the verify joins.
    """
    sh = _persist(sh)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # ONE doc_id aggregation builds both artifacts: the df-ranked
    # full shingle array (verification side) and its prefix slice
    # (candidate side) — fusing what a row_number window + a second
    # sets groupBy would cost as two full-frame doc_id shuffles.
    # sort_array on (df, sh) structs IS the global rarest-first order.
    per_doc = _persist(
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("ranked"))
        .select(
            "doc_id",
            F.expr("transform(ranked, s -> s.sh)").alias("shs"),
            F.size("ranked").alias("n_sh"),
        )
    )
    # p = n - ceil(tau*n) + 1, integer-exact: ceil(3n/5) = (3n+4) div 5
    prefix = per_doc.select(
        "doc_id",
        F.explode(
            F.expr(
                f"slice(shs, 1, size(shs) - CAST(({_TAU_NUM} * size(shs) "
                f"+ {_TAU_DEN - 1}) DIV {_TAU_DEN} AS INT) + 1)"
            )
        ).alias("sh"),
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    sb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    c = F.size(F.array_intersect("sa", "sb"))
    j = c.cast("double") / (F.col("na") + F.col("nb") - c)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


@CAT.query(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
      FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS c,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM t a, t b WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jaccard
    FROM p
    WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via LOSSLESS prefix
    filtering — the alternative candidate scheme to
    :func:`dedup_ngram_jaccard`'s df-capped inverted index.

    Same output contract and brute-force oracle as the capped-index
    variant, but with a provable completeness guarantee instead of the
    "all-common-shingles-are-stop-shingles" caveat: prefix filtering
    never drops a qualifying pair, at the cost of ranking every doc's
    shingles by global document frequency first (one extra shuffle).
    The right default when the corpus has heavy boilerplate AND missed
    near-dups are unacceptable (e.g. benchmark decontamination).
    """
    return jaccard_prefix_filter_pairs(_doc_shingles(spark, sf_dir))


# ---------------------------------------------------------------------------
# Exact duplicated n-gram spans (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the exact-substring
# method, re-expressed at token-shingle granularity)
# ---------------------------------------------------------------------------

#: Tokens per shingle for span-level exact dedup. The paper uses 50
#: BPE tokens on web-scale corpora; the fixture documents average ~54
#: whitespace tokens, so 8 keeps span statistics non-degenerate at
#: test scale while the operator itself is K-agnostic.
_NGRAM_SPAN_K = 8


@CAT.query(
    "dedup_ngram_span_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents WHERE len(trim(text)) > 0),
    sh AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             md5(array_to_string(t[i:i+{_NGRAM_SPAN_K}-1], ' ')) AS h
      FROM toks, UNNEST(range(1, len(t)-{_NGRAM_SPAN_K}+2)) AS u(i)
      WHERE len(t) >= {_NGRAM_SPAN_K}),
    dup AS (SELECT h FROM sh GROUP BY h
            HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM sh JOIN dup USING (h)),
    b AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos)
                       <= {_NGRAM_SPAN_K - 1}
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
    g AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM b)
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_NGRAM_SPAN_K} - 1 AS BIGINT) AS span_end,
           CAST(MAX(pos) + {_NGRAM_SPAN_K} - MIN(pos) AS BIGINT)
             AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_shingles
    FROM g GROUP BY doc_id, grp
    """,
)
def dedup_ngram_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level exact duplicate detection: for every document, the
    merged token intervals covered by K-token shingles that occur
    in at least one OTHER document — the exact-substring dedup of Lee
    et al. 2022, which removes repeated PASSAGES (boilerplate,
    licenses, quoted reposts) that document-level dedup can't touch
    because the surrounding text differs. Downstream, these spans are
    what a training pipeline cuts out of otherwise-kept documents.

    Decomposition (all oracle-exact, zero Python in the hot path):

    1. shingle: one narrow map — tokens arrive as an array per row,
       and a JVM ``transform`` over ``sequence(1, n-K+1)`` emits
       (pos, md5(K-token window)) WITHOUT any shuffle or token
       explosion (a window/lead formulation would shuffle the token
       stream; the HOF stays inside the row). The md5 hex string is
       the cross-engine join key (same bytes in Spark and DuckDB).
    2. global duplicate set: one hash-keyed shuffle,
       ``COUNT(DISTINCT doc_id) >= 2`` — the only corpus-wide
       exchange, and it carries (hash, doc_id) pairs, never text.
    3. span assembly: positions of duplicated shingles rejoin on the
       hash — the join strategy is left to AQE, which broadcasts when
       the duplicate set turns out runtime-small and shuffles when it
       is corpus-sized (no static broadcast assumption in the plan),
       then a per-document window merges overlapping [pos, pos+K-1]
       intervals with the classic gap rule (fixed K ⇒ new span iff
       pos − prev_pos > K−1) — one shuffle on doc_id, emissions are
       span-sized.

    At 100 TB the shuffle in (2) is the same shape as every hash
    dedup here (bucketed by shingle hash); a production deployment
    raises K (the paper's 50) which SHRINKS both the shingle count
    and the duplicate set. Suffix-array construction (the paper's
    in-memory method) is deliberately NOT emulated: the shingle
    formulation is the shuffle-native equivalent at fixed K.
    """
    K = _NGRAM_SPAN_K
    toks = (
        _docs(spark, sf_dir)
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", tokenize("text").alias("t"))
        .filter(F.size("t") >= K)
    )
    # the shingle frame feeds BOTH the duplicate-set aggregate and the
    # position join; tracked persist so tokenize + per-shingle md5 run
    # once instead of twice (the pack_token_budget token-frame pattern)
    sh = _persist(toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - K + 1),
                lambda i: F.struct(
                    i.cast("bigint").alias("pos"),
                    F.md5(
                        F.concat_ws(" ", F.slice("t", i, K)).cast("binary")
                    ).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.h"))
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = sh.join(dup, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # two selects: Spark rejects a window function nested inside
    # another window's argument (lag inside sum)
    b = hits.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= K - 1, F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("brk"),
    )
    g = b.select(
        "doc_id",
        "pos",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    )
    return g.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + K - 1).cast("bigint").alias("span_end"),
        (F.max("pos") + K - F.min("pos")).cast("bigint").alias("span_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_dup_shingles"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# Round 10: CCNet paragraph-level dedup (the pipeline stage BEFORE the LM)


#: "Paragraph" length for the CCNet line-dedup stage: the corpus has
#: no newlines, so consecutive non-overlapping 10-token windows stand
#: in for CCNet's newline-split paragraphs (same proxy family as
#: _PASSAGE_N). Deterministic, identical in SQL.
_CCNET_LINE_TOKENS = 10

#: (doc_id, line_no) packed into one BIGINT so "first occurrence" is
#: a single MIN — line_no < 2^20 (a 10M-token document) is GUARDED in
#: the plan, not assumed: both engines raise on a line_no at or past
#: the pack base (r10 advice — a silent collision would corrupt
#: first-occurrence order identically in both engines, so oracle
#: parity could never catch it). doc_id up to 2^43 before overflow.
_CCNET_LINE_PACK = 1 << 20

#: DuckDB mirror of the CCNet hash normalization in
#: :func:`dedup_ccnet_lines` (lowercase, digits -> 0, strip
#: punctuation, collapse whitespace — Wenzek et al. 2020 §3.1) —
#: keep in sync with the Spark side.
_CCNET_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower(line), "
    "'[0-9]', '0', 'g'), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)


@CAT.query(
    "dedup_ccnet_lines",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE len(trim(text)) > 0),
    t AS (SELECT doc_id, lang,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM d),
    ln0 AS (
      SELECT doc_id, lang, toks,
             CAST((len(toks) + {_CCNET_LINE_TOKENS} - 1)
                  // {_CCNET_LINE_TOKENS} AS BIGINT) AS n_lines,
             unnest(range(0, (len(toks) + {_CCNET_LINE_TOKENS} - 1)
                             // {_CCNET_LINE_TOKENS})) AS line_no
      FROM t),
    ln AS (
      SELECT doc_id, lang, n_lines, CAST(line_no AS BIGINT) AS line_no,
             array_to_string(
               toks[(line_no * {_CCNET_LINE_TOKENS} + 1):
                    (line_no * {_CCNET_LINE_TOKENS} + {_CCNET_LINE_TOKENS})],
               ' ') AS line
      FROM ln0),
    nf AS (
      SELECT doc_id, lang, n_lines, line_no, line,
             {md5_60_sql(_CCNET_NORM_SQL)} AS fp,
             doc_id * {_CCNET_LINE_PACK}
               + CASE WHEN line_no < {_CCNET_LINE_PACK} THEN line_no
                      ELSE error('ccnet line_no overflows pack base')
                 END AS pack
      FROM ln),
    keep AS (SELECT fp, MIN(pack) AS kpack FROM nf GROUP BY 1),
    kept AS (
      SELECT nf.doc_id, nf.lang, nf.n_lines, nf.line_no, nf.line
      FROM nf JOIN keep ON nf.fp = keep.fp AND nf.pack = keep.kpack)
    SELECT doc_id, lang, n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(line, ' ' ORDER BY line_no) AS new_text
    FROM kept
    GROUP BY 1, 2, 3
    """,
)
def dedup_ccnet_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet paragraph-level dedup (Wenzek et al. 2020 §3.1) — the
    stage the published pipeline runs across the WHOLE Common-Crawl
    snapshot *before* LM scoring: split every document into
    paragraphs, hash a normalized form of each (lowercase, digits→0,
    punctuation stripped), and keep only the FIRST occurrence of each
    hash corpus-wide — first by (doc_id, line_no), removing
    boilerplate (cookie banners, navigation chrome) that repeats
    across pages as well as within-document repetition. Documents are
    then rewritten from their surviving paragraphs; a document whose
    every paragraph appeared earlier vanishes, exactly as in CCNet.
    Composes with :func:`textops.text_ccnet_buckets` (the LM tertile
    stage) to complete the published pipeline end to end — the
    composite is pinned by tests/test_round10.py.

    "Paragraphs" are consecutive non-overlapping {_CCNET_LINE_TOKENS}-
    token windows (the corpus has no newlines; same proxy family as
    the repeated-passage audit). Normalization is applied to the HASH
    only — surviving text keeps its original form, as in the paper.

    Exactness: the keep rule is pure integer arithmetic — first
    occurrence is MIN(doc_id·2²⁰ + line_no) per 60-bit md5 fingerprint
    (functions.md5_60, identical in DuckDB), and the rewrite is an
    order-preserving join of surviving lines (string_agg ORDER BY ==
    array_sort on (line_no, line) structs).

    Plan — one corpus-scale fingerprint exchange plus the fp join-back
    and the doc-keyed rewrite (3 exchanges total, pinned in PLANS.md):
    explode to ~tokens/{_CCNET_LINE_TOKENS} line rows, fingerprint
    map-side (the first-occurrence shuffle carries (fp, pack) longs,
    never line text), groupBy fp with a map-side-combined MIN, then an
    fp-keyed join back (AQE skew-splits hot boilerplate fingerprints)
    and one (doc_id)-keyed aggregation for the rewrite. At 100 TB this
    is the same shape CCNet runs sharded: no sort, no window over the
    corpus, exchanges bounded by the line population. The pack guard
    raises loudly (both engines) if a document ever exceeds
    2²⁰ lines instead of silently corrupting first-occurrence order.
    Reference: no counterpart (converter.go is a per-file converter);
    SURVEY §2 LLM-dedup extension."""
    K = _CCNET_LINE_TOKENS
    docs = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    t = docs.select("doc_id", "lang", tokenize("text").alias("toks"))
    segs = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size("toks") - 1) / K).cast("int")
        ),
        lambda i: F.array_join(F.slice("toks", i * K + 1, K), " "),
    )
    # n_lines is known at segmentation time (the segment-array size) —
    # carrying it through the explode saves a second per-doc
    # aggregation + join that the first cut paid (one exchange less)
    lines = t.withColumn("seg", segs).select(
        "doc_id",
        "lang",
        F.size("seg").cast("bigint").alias("n_lines"),
        F.posexplode("seg").alias("line_no", "line"),
    ).withColumn("line_no", F.col("line_no").cast("bigint"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("line")), "[0-9]", "0"),
                "[^a-z0-9 ]",
                " ",
            ),
            " +",
            " ",
        )
    )
    nf = _persist(
        lines.select(
            "doc_id",
            "lang",
            "n_lines",
            "line_no",
            "line",
            md5_60(norm).alias("fp"),
            (
                F.col("doc_id") * _CCNET_LINE_PACK
                + F.when(
                    F.col("line_no") < _CCNET_LINE_PACK, F.col("line_no")
                ).otherwise(
                    F.raise_error(
                        F.lit("ccnet line_no overflows pack base")
                    )
                )
            ).alias("pack"),
        )
    )
    keep = nf.groupBy("fp").agg(F.min("pack").alias("kpack"))
    kept = nf.join(
        keep,
        (nf["fp"] == keep["fp"]) & (nf["pack"] == keep["kpack"]),
    ).select("doc_id", "lang", "n_lines", "line_no", "line")
    return (
        kept.groupBy("doc_id", "lang", "n_lines")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda x: x["line"],
                ),
                " ",
            ).alias("new_text"),
        )
        .select("doc_id", "lang", "n_lines", "n_kept", "new_text")
    )


# ---------------------------------------------------------------------------
# Round 10: cross-source duplication-overlap matrix (mixing audit)


def _mix_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, fps array<bigint>) — ONE narrow
    scan+tokenize pass (persisted, tracked) shared by every consumer
    of the mixing chain: the passage-fingerprint core
    (:func:`_fp_sources`), the per-source available-token counts, and
    the prefix-sum scaffold (:func:`_mix_cum_frame`). Before r12 each
    entry re-scanned and re-tokenized ``documents`` once per consumer
    (the overlap/weights/allocation/selection entries paid the regex
    tokenize 2× each); this is the guide-§8 move — compute the
    lightweight proxy of the corpus once, and run every decision off
    it. At 100 TB the cache is ~8 bytes per corpus token — the same
    signature-store materialization the MinHash pipeline documents
    (a production chain lands it to disk between stages)."""
    toks = tokenize("text")
    return _persist(
        _docs(spark, sf_dir).select(
            "doc_id",
            "source",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.transform(
                shingles(toks, _PASSAGE_N), lambda s: md5_60(s)
            ).alias("fps"),
        )
    )


def _fp_sources(base: DataFrame) -> DataFrame:
    """(fp, ss sorted array<source>) — the distinct source set per
    passage fingerprint, as ONE corpus-scale exchange (persisted,
    tracked): explode → groupBy(fp) with a map-side partial
    collect_set. Replaces the r10/r11 DISTINCT (fp, source) + fp-keyed
    self-join shape, which paid THREE corpus-scale exchanges (the
    distinct, then both self-join sides re-hashed by fp) to derive the
    same two aggregates; per-source totals and source-pair overlap
    counts now both come off this one collapsed frame. The set is
    sorted so downstream pair generation is deterministic; per-fp set
    size is bounded by |sources| (model-sized)."""
    return _persist(
        base.select("source", F.explode("fps").alias("fp"))
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
    )


def _fp_source_totals(bysrc: DataFrame) -> DataFrame:
    """(source, n) distinct-fingerprint count per source off the
    :func:`_fp_sources` frame — map-side combined, |sources| rows."""
    return (
        bysrc.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _fp_source_pairs(bysrc: DataFrame) -> DataFrame:
    """(src_a, src_b, shared) ordered source-pair co-occurrence counts
    off the :func:`_fp_sources` frame: per fp, all ordered pairs of
    its (sorted) source set via a nested array transform — k² work per
    fp bounded by |sources|², never a corpus-scale join."""
    ss = F.col("ss")
    pair_arr = F.flatten(
        F.transform(
            ss,
            lambda a, i: F.transform(
                F.slice(ss, i + 2, F.size(ss)),
                lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
            ),
        )
    )
    return (
        bysrc.filter(F.size("ss") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )


@CAT.query(
    "dedup_cross_source_overlap",
    oracle=f"""
    WITH occ AS (
      SELECT source, unnest({_PASSAGES_SQL}) AS sh FROM documents),
    fp AS (
      SELECT DISTINCT source, {md5_60_sql("sh")} AS fp FROM occ),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM fp
            GROUP BY 1),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS shared_passages
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2)
    SELECT p.src_a, p.src_b, p.shared_passages,
           ta.n AS n_a, tb.n AS n_b,
           CAST(CAST(p.shared_passages AS HUGEINT) * 1000000
                // LEAST(ta.n, tb.n) AS BIGINT) AS overlap_coef_micro
    FROM pairs p
    JOIN tot ta ON ta.source = p.src_a
    JOIN tot tb ON tb.source = p.src_b
    """,
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication-overlap matrix — the audit every
    multi-source mixing decision rests on (the CCNet/FineWeb-style
    cross-dump overlap ablation; RedPajama vs C4 vs CC overlap
    studies): for every pair of sources, how many distinct
    {_PASSAGE_N}-token passages they share, each side's distinct
    passage count, and the overlap coefficient
    shared / min(|A|, |B|) in integer micro-units. A pair with high
    overlap means the mixing weights double-count the same text —
    the usual verdict is dropping or down-weighting the dominated
    source before training.

    Exactness: passage fingerprints are the 60-bit md5 the whole dedup
    family shares (identical in DuckDB), counts are distinct-set
    cardinalities, and the coefficient is a cross-multiplied integer
    ratio widened through DECIMAL(38,0)/HUGEINT (no overflow at
    10¹³+ passages per source, no doubles anywhere).

    Plan (r12 reshape — guide §2.4, remove shuffles outright): one
    explode → map-side fingerprint → groupBy(fp) with a partial
    collect_set — the single CORPUS-scale exchange (the r10/r11 shape
    paid three: a DISTINCT plus both sides of an fp-keyed self-join).
    Everything downstream operates on the collapsed per-fingerprint
    source sets: totals are an explode+count, pair generation is a
    per-fp nested transform over the sorted set — k² per fp bounded
    by |sources|², model-sized here; at thousands of dumps the
    published audits prefilter universal boilerplate by document
    frequency first (the `_WINNOW_DF_CAP` pattern two entries up)
    before pairing. The pair aggregation and the totals join are
    |sources|²- and |sources|-row frames — broadcast. The corpus scan
    itself is the shared one-pass :func:`_mix_base` proxy (tokenized
    once for this entry and the whole mix chain). Reference: no
    counterpart (converter.go is a per-file converter); SURVEY §2
    LLM-dedup extension."""
    bysrc = _fp_sources(_mix_base(spark, sf_dir))
    pairs = _fp_source_pairs(bysrc).withColumnRenamed(
        "shared", "shared_passages"
    )
    tot = _fp_source_totals(bysrc)
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_passages",
            "n_a",
            "n_b",
            F.expr(
                "cast(cast(shared_passages as decimal(38,0)) * 1000000"
                " div least(n_a, n_b) as bigint)"
            ).alias("overlap_coef_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Round 11: mixing weights from the cross-source overlap matrix


#: Shared oracle-CTE prefix producing ``eff(source, n, ceded, e)`` —
#: the down-weighted per-source passage mass consumed by BOTH
#: mix_source_weights and mix_token_allocation (one constant, so the
#: two oracles can never drift from each other). ``eff`` is
#: MATERIALIZED: both consumers reference it at least twice, and the
#: chain above it is corpus-scale (the duckdb-cte-inlining guard).
_SRC_EFF_CTES = f"""occ AS (
      SELECT source, unnest({_PASSAGES_SQL}) AS sh FROM documents),
    fp AS (
      SELECT DISTINCT source, {md5_60_sql("sh")} AS fp FROM occ),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM fp
            GROUP BY 1),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2),
    pj AS (
      SELECT p.*, ta.n AS n_a, tb.n AS n_b
      FROM pairs p
      JOIN tot ta ON ta.source = p.src_a
      JOIN tot tb ON tb.source = p.src_b),
    ceded AS (
      SELECT CASE WHEN n_a < n_b THEN src_a
                  WHEN n_b < n_a THEN src_b
                  ELSE GREATEST(src_a, src_b) END AS source,
             CAST(SUM(shared) AS BIGINT) AS c
      FROM pj GROUP BY 1),
    eff AS MATERIALIZED (
      SELECT t.source, t.n,
             CAST(COALESCE(c.c, 0) AS BIGINT) AS ceded,
             GREATEST(t.n - CAST(COALESCE(c.c, 0) AS BIGINT), 0) AS e
      FROM tot t LEFT JOIN ceded c USING (source))"""


@CAT.query(
    "mix_source_weights",
    oracle=f"""
    WITH {_SRC_EFF_CTES},
    s AS (SELECT CAST(SUM(e) AS BIGINT) AS te FROM eff)
    SELECT eff.source, eff.n AS n_passages, eff.ceded AS ceded_passages,
           CAST(eff.e AS BIGINT) AS effective_passages,
           CAST(CAST(eff.e AS HUGEINT) * 1000000 // s.te AS BIGINT)
             AS weight_micro
    FROM eff, s
    """,
)
def mix_source_weights(
    spark: SparkSession, sf_dir: str, eff: DataFrame | None = None
) -> DataFrame:
    """Mixing-weight DECISION operator over the cross-source overlap
    matrix (VERDICT r10 #5 — the consumer that turns the r10
    diagnostic into an action): down-weight each source by the
    duplicated mass it shares with a LARGER source, then normalize.
    The rule is the published mixing-audit convention — for every
    overlapping pair, the SMALLER source (ties: the lexicographically
    larger name) cedes the shared passage mass, so the dominant copy
    of the text keeps its weight and the dominated source stops
    double-counting it:

        ceded(s)   = Σ shared(a, b) over pairs s loses
        effective  = max(n_distinct_passages − ceded, 0)
        weight     = effective · 10⁶ // Σ effective   (integer floor)

    Reconciliation with :func:`dedup_cross_source_overlap` is pinned
    by an invariant test (tests/test_round11.py): the per-source ceded
    mass recomputed from the overlap matrix's rows matches exactly,
    and Σ weight_micro ∈ (10⁶ − |sources|, 10⁶].

    Exactness: counts are distinct-set cardinalities, ceding is
    integer sums with a deterministic loser rule, and the weight is a
    cross-multiplied integer ratio widened through
    DECIMAL(38,0)/HUGEINT (no overflow at 10¹³+ passages/source, no
    doubles). An all-duplicate corpus (Σ effective = 0) fails loudly
    (division by zero) in BOTH engines rather than emitting garbage.

    Plan: identical corpus shape to the overlap matrix — ONE
    corpus-scale groupBy(fp) exchange off the shared
    :func:`_mix_base` proxy (r12: was DISTINCT + fp self-join, three
    corpus exchanges), then every further frame (totals, pairs,
    ceded, the 1-row normalizer) is |sources|- or |sources|²-sized
    and broadcast; the same DF-cap prefilter escape hatch documented
    there applies at thousands of dumps.
    Reference: no counterpart (converter.go is a per-file converter);
    SURVEY §2 LLM-dedup extension."""
    if eff is None:
        eff = _source_effective_frame(spark, sf_dir)
    te = eff.agg(
        F.sum("effective_passages").cast("bigint").alias("te")
    )
    return eff.join(F.broadcast(te)).select(
        "source",
        "n_passages",
        "ceded_passages",
        "effective_passages",
        F.expr(
            "cast(cast(effective_passages as decimal(38,0)) * 1000000"
            " div te as bigint)"
        ).alias("weight_micro"),
    )


def _source_effective_frame(
    spark: SparkSession, sf_dir: str, base: DataFrame | None = None
) -> DataFrame:
    """(source, n_passages, ceded_passages, effective_passages) —
    the down-weighting core shared by :func:`mix_source_weights`
    (normalized weights) and :func:`mix_token_allocation` (budget
    apportionment). One corpus-scale groupBy(fp) exchange off the
    shared :func:`_mix_base` proxy (r12: was a DISTINCT + fp-keyed
    self-join — three corpus-scale exchanges and a second corpus
    tokenize); everything downstream is |sources|- or
    |sources|²-sized. ``base`` lets callers thread one shared
    tokenized proxy across the chain's cores."""
    if base is None:
        base = _mix_base(spark, sf_dir)
    bysrc = _fp_sources(base)
    tot = _fp_source_totals(bysrc)
    pairs = _fp_source_pairs(bysrc)
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    loser = (
        F.when(F.col("n_a") < F.col("n_b"), F.col("src_a"))
        .when(F.col("n_b") < F.col("n_a"), F.col("src_b"))
        .otherwise(F.greatest("src_a", "src_b"))
    )
    ceded = (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy(loser.alias("source"))
        .agg(F.sum("shared").cast("bigint").alias("c"))
    )
    return (
        tot.join(F.broadcast(ceded), "source", "left")
        .select(
            "source",
            F.col("n").alias("n_passages"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("ceded_passages"),
            F.greatest(
                F.col("n") - F.coalesce("c", F.lit(0)), F.lit(0)
            ).cast("bigint").alias("effective_passages"),
        )
    )


# ---------------------------------------------------------------------------
# Round 11: token-budget apportionment over the mixing weights


#: Global token budget for the mixture-allocation entry — a model
#: parameter (the "how many tokens do we train on" input), not a
#: corpus statistic; sf-independent by design. 28k is chosen so BOTH
#: regimes are exercised at the driver's sf0.01 gate: per-source
#: allocations (~1.2-1.7k tokens) STRADDLE the per-source available
#: mass (~1.3-1.5k) — some sources repeat (repeats_milli > 1000),
#: others leave documents unselected — and at sf0.1 the selection
#: boundary binds for every source. A budget above the corpus total
#: would make `selected` vacuously true everywhere and the repeat
#: factor untested.
_MIX_BUDGET = 28_000


#: Oracle-CTE chain extending ``_SRC_EFF_CTES`` to the Hamilton
#: allocation — produces ``alloc(source, e, alloc_tokens)``. Shared by
#: mix_token_allocation and mix_select_documents (one constant, zero
#: drift). ``alloc`` is MATERIALIZED for the same reason as ``eff``.
_MIX_ALLOC_CTES = f"""{_SRC_EFF_CTES},
    s AS (SELECT CAST(SUM(e) AS BIGINT) AS te FROM eff),
    base AS (
      SELECT eff.source, eff.e,
             CAST(CAST({_MIX_BUDGET} AS HUGEINT) * eff.e // s.te
                  AS BIGINT) AS b,
             CAST(CAST({_MIX_BUDGET} AS HUGEINT) * eff.e % s.te
                  AS BIGINT) AS r
      FROM eff, s),
    lo AS (SELECT CAST({_MIX_BUDGET} - SUM(b) AS BIGINT) AS leftover
           FROM base),
    rk AS (
      SELECT source, e, b, r,
             row_number() OVER (ORDER BY r DESC, source) AS rn
      FROM base),
    alloc AS MATERIALIZED (
      SELECT rk.source, rk.e,
             CAST(rk.b + CASE WHEN rk.rn <= lo.leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_tokens
      FROM rk, lo)"""


@CAT.query(
    "mix_token_allocation",
    oracle=f"""
    WITH {_MIX_ALLOC_CTES},
    avail AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS avail_tokens
      FROM documents GROUP BY 1)
    SELECT a.source,
           CAST(a.e AS BIGINT) AS effective_passages,
           av.avail_tokens,
           a.alloc_tokens,
           CAST((CAST(a.alloc_tokens AS HUGEINT) * 1000
                 + av.avail_tokens - 1) // av.avail_tokens
                AS BIGINT) AS repeats_milli
    FROM alloc a JOIN avail av USING (source)
    """,
)
def mix_token_allocation(
    spark: SparkSession,
    sf_dir: str,
    eff: DataFrame | None = None,
    alloc: DataFrame | None = None,
    cum: DataFrame | None = None,
) -> DataFrame:
    """Token-budget apportionment over the down-weighted mixture — the
    step after :func:`mix_source_weights` in a training-data plan:
    given a global token budget, how many tokens does each source
    contribute, and how many EPOCHS of that source does the allocation
    imply (the data-constrained repeat factor of Muennighoff et al.
    2023 — an allocation above a source's available tokens means the
    source repeats)?

    Apportionment is Hamilton / largest-remainder, the classic
    integer-exact scheme: base_i = ⌊B·eff_i / Σeff⌋, and the leftover
    B − Σbase tokens (one per source, at most |sources|−1) go to the
    largest remainders (ties: source name ASC). Σ alloc_tokens == B
    EXACTLY — pinned by an invariant test, with every allocation
    within one token of its real quota. repeats_milli =
    ⌈alloc·1000 / available⌉ in integer thousandths of an epoch.

    Exactness: the quota arithmetic is cross-multiplied integers
    widened through DECIMAL(38,0)/HUGEINT (B·eff exceeds int64 when a
    10¹³-token budget meets a 10¹³-passage source); the remainder is
    recovered as B·eff − base·Σeff on the Spark side (identical to
    the oracle's modulo by the division algorithm), so both engines
    rank identical integers. Everything downstream of the corpus
    aggregations is |sources|-sized.

    Plan (r12: one shared scan): ONE corpus-scale groupBy(fp)
    exchange (the effective-mass core, off the shared
    :func:`_mix_base` proxy) plus one source-keyed token-count
    aggregation (map-side combined, off the SAME cached proxy — the
    second corpus scan+tokenize this entry used to pay is gone). The
    apportionment itself (1-row total broadcasts, a |sources|-row
    remainder window) is model-sized. Reference: no counterpart
    (converter.go is a per-file converter); SURVEY §2 LLM-dedup
    extension."""
    if cum is not None:
        # pipeline path: the shared cum frame already carries per-doc
        # token counts — no second corpus tokenize
        avail = cum.groupBy("source").agg(
            F.sum("n_tokens").cast("bigint").alias("avail_tokens")
        )
        if alloc is None:
            alloc = _mix_alloc_frame(spark, sf_dir, eff=eff)
    else:
        base = _mix_base(spark, sf_dir)
        avail = base.groupBy("source").agg(
            F.sum("n_tokens").cast("bigint").alias("avail_tokens")
        )
        if alloc is None:
            alloc = _mix_alloc_frame(spark, sf_dir, eff=eff, base=base)
    return alloc.join(F.broadcast(avail), "source").select(
        "source",
        "effective_passages",
        "avail_tokens",
        "alloc_tokens",
        F.expr(
            "cast((cast(alloc_tokens as decimal(38,0)) * 1000"
            " + avail_tokens - 1) div avail_tokens as bigint)"
        ).alias("repeats_milli"),
    )


def _mix_alloc_frame(
    spark: SparkSession,
    sf_dir: str,
    eff: DataFrame | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """(source, effective_passages, alloc_tokens) — the Hamilton
    apportionment core shared by :func:`mix_token_allocation` and
    :func:`mix_select_documents` (the Spark twin of the
    ``_MIX_ALLOC_CTES`` oracle constant). ``eff`` lets
    :func:`mix_pipeline` thread one shared effective-mass frame
    instead of recomputing the fingerprint core; ``base`` threads the
    shared tokenized proxy one level further down."""
    if eff is None:
        eff = _source_effective_frame(spark, sf_dir, base=base)
    te = eff.agg(F.sum("effective_passages").cast("bigint").alias("te"))
    base = eff.join(F.broadcast(te)).select(
        "source",
        "effective_passages",
        F.expr(
            f"cast(cast({_MIX_BUDGET} as decimal(38,0))"
            " * effective_passages div te as bigint)"
        ).alias("b"),
        F.expr(
            f"cast(cast({_MIX_BUDGET} as decimal(38,0)) * effective_passages"
            f" - (cast({_MIX_BUDGET} as decimal(38,0))"
            " * effective_passages div te) * te as bigint)"
        ).alias("r"),
    )
    lo = base.agg(
        (F.lit(_MIX_BUDGET) - F.sum("b")).cast("bigint").alias("leftover")
    )
    rk = base.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("r"), F.asc("source"))),
    )
    return rk.join(F.broadcast(lo)).select(
        "source",
        "effective_passages",
        (
            F.col("b")
            + F.when(F.col("rn") <= F.col("leftover"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("bigint").alias("alloc_tokens"),
    )


#: Documents per prefix-sum bucket for the selection scaffold (the
#: packing.BUCKET convention: the offset table has N/BUCKET rows per
#: source — at 10¹² docs set ~10⁶; small here so the test corpus
#: exercises multiple buckets).
_SEL_BUCKET = 128


@CAT.query(
    "mix_select_documents",
    oracle=f"""
    WITH {_MIX_ALLOC_CTES},
    toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS BIGINT) AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before_tokens
      FROM toks)
    SELECT c.doc_id, c.source, c.n_tokens, c.cum_before_tokens,
           c.cum_before_tokens < a.alloc_tokens AS selected
    FROM cum c JOIN alloc a USING (source)
    """,
)
def mix_select_documents(
    spark: SparkSession,
    sf_dir: str,
    alloc: DataFrame | None = None,
    cum: DataFrame | None = None,
) -> DataFrame:
    """Materialize the mixture — the final step of the weights →
    budget → SELECTION chain: per source, documents are taken in
    deterministic priority order (doc_id here; production substitutes
    a quality or hash-priority key — the scaffold is unchanged) until
    the source's Hamilton allocation (:func:`mix_token_allocation`) is
    exhausted. A document is selected iff the tokens BEFORE it in its
    source's order are still under the allocation, so the one
    boundary-crossing document is included (the packing convention:
    an allocation is a minimum draw, trimmed downstream by the
    sequence packer) and every source with a nonzero allocation
    contributes at least one document.

    Exactness: prefix sums of integer token counts, compared against
    the integer allocation — no floats; the selection boundary is
    pinned per source by an invariant test.

    Plan (r12: one shared scan): the allocation core's single
    corpus-scale groupBy(fp) exchange, plus the pack_token_budget
    two-phase prefix-sum scaffold for the per-source running totals —
    within-(source, doc-bucket) windows run parallel, only the
    per-(source, bucket) offset frame (corpus/{_SEL_BUCKET} rows) pays
    a per-source sequential window, and documents pick up their offset
    through a broadcast join. Both cores read the ONE cached
    :func:`_mix_base` proxy, so the corpus is scanned and tokenized
    once per invocation (was twice). No corpus-wide single-partition
    window: a source with 10¹¹ documents never funnels through one
    task. Reference: no counterpart (converter.go is a per-file
    converter); SURVEY §2 LLM-dedup extension."""
    if alloc is None or cum is None:
        base = _mix_base(spark, sf_dir)
        if alloc is None:
            alloc = _mix_alloc_frame(spark, sf_dir, base=base)
        if cum is None:
            cum = _mix_cum_frame(spark, sf_dir, base=base)
    alloc = alloc.select("source", "alloc_tokens")
    return cum.join(F.broadcast(alloc), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_before_tokens",
        (F.col("cum_before_tokens") < F.col("alloc_tokens")).alias(
            "selected"
        ),
    )


def _mix_cum_frame(
    spark: SparkSession, sf_dir: str, base: DataFrame | None = None
) -> DataFrame:
    """(doc_id, source, n_tokens, cum_before_tokens) — the per-source
    token prefix sum in doc_id order, via the pack_token_budget
    two-phase scaffold (within-(source, bucket) windows run parallel;
    the per-(source, bucket) offset frame is corpus/_SEL_BUCKET rows).
    Shared by :func:`mix_select_documents` and the round-12 epoched
    consumers (:func:`mix_pack_sequences`, :func:`mix_training_order`).
    ``base`` threads the shared :func:`_mix_base` proxy (r12); the
    frame read twice below (within + offsets) is that persisted cache
    either way."""
    if base is None:
        base = _mix_base(spark, sf_dir)
    toks = base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"doc_id div {_SEL_BUCKET}").alias("bucket"),
    )
    w_in = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = toks.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("source", "bucket")
        .agg(F.sum("n_tokens").alias("bucket_sum"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_sum").over(w_off), F.lit(0))
        )
        .select("source", "bucket", "offset")
    )
    return within.join(F.broadcast(offsets), ["source", "bucket"]).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("cum_in") + F.col("offset") - F.col("n_tokens"))
        .cast("bigint")
        .alias("cum_before_tokens"),
    )


# ---------------------------------------------------------------------------
# Round 12: the epoched training stream — mixture -> packed bins + order


#: Oracle-CTE chain extending ``_MIX_ALLOC_CTES`` to the EPOCHED
#: document-instance stream — produces ``inst(source, doc_id,
#: n_tokens, epoch)``: document d of source s appears once per epoch e
#: with e·avail + cum_before(d) < alloc, i.e. the source's doc list
#: repeats cyclically (Muennighoff data-constrained repeats) until its
#: Hamilton allocation is exhausted, each epoch ending on the one
#: boundary-crossing document. Epoch 0 is EXACTLY the
#: mix_select_documents selected set (pinned by a composite test).
#: Shared by mix_pack_sequences and mix_training_order (one constant,
#: zero drift); ``inst`` is MATERIALIZED — the chain above it is
#: corpus-scale (the duckdb-cte-inlining guard).
_MIX_INST_CTES = f"""{_MIX_ALLOC_CTES},
    mavail AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS avail_tokens
      FROM documents GROUP BY 1),
    mtoks AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS BIGINT) AS n_tokens
      FROM documents),
    mcum AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before_tokens
      FROM mtoks),
    inst AS MATERIALIZED (
      SELECT c.source, c.doc_id, c.n_tokens,
             unnest(range(0,
               (a.alloc_tokens - c.cum_before_tokens
                + av.avail_tokens - 1) // av.avail_tokens)) AS epoch
      FROM mcum c
      JOIN alloc a USING (source)
      JOIN mavail av USING (source)
      WHERE c.cum_before_tokens < a.alloc_tokens)"""


def _mix_instances_frame(
    spark: SparkSession,
    sf_dir: str,
    alloc: DataFrame | None = None,
    cum: DataFrame | None = None,
) -> DataFrame:
    """(source, doc_id, n_tokens, epoch) — the Spark twin of the
    ``_MIX_INST_CTES`` oracle constant (see its docstring for the
    instance rule). The repeat count per document is closed-form,
    n_rep = ⌈(alloc − cum_before) / avail⌉ when positive, so the
    epoch explosion is a narrow ``sequence``+``explode`` map — no
    shuffle beyond the cum/alloc cores it builds on. avail_tokens is
    derived from the cum frame itself (its persisted per-doc token
    counts), not a second corpus scan+tokenize (r12 review)."""
    if alloc is None or cum is None:
        base = _mix_base(spark, sf_dir)
        if alloc is None:
            alloc = _mix_alloc_frame(spark, sf_dir, base=base)
        if cum is None:
            cum = _mix_cum_frame(spark, sf_dir, base=base)
    alloc = alloc.select("source", "alloc_tokens")
    avail = cum.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("avail_tokens")
    )
    return (
        cum
        .join(F.broadcast(alloc), "source")
        .join(F.broadcast(avail), "source")
        .filter(F.col("cum_before_tokens") < F.col("alloc_tokens"))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.expr(
                        "(alloc_tokens - cum_before_tokens + avail_tokens"
                        " - 1) div avail_tokens"
                    )
                    - F.lit(1),
                )
            ).alias("epoch"),
        )
    )


#: Tokens per packed training bin — same budget as
#: packing.pack_token_budget (the corpus-order packer this entry's
#: mixture-order variant composes with).
_PACK_BIN = 2048


@CAT.query(
    "mix_pack_sequences",
    oracle=f"""
    WITH {_MIX_INST_CTES},
    g AS (
      SELECT source, n_tokens,
             SUM(n_tokens) OVER (ORDER BY source, epoch, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM inst)
    SELECT CAST((cum_tokens - 1) // {_PACK_BIN} AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM g GROUP BY 1
    """,
)
def mix_pack_sequences(
    spark: SparkSession, sf_dir: str, inst: DataFrame | None = None
) -> DataFrame:
    """Pack the SELECTED MIXTURE into contiguous {_PACK_BIN}-token
    training bins — the composite that closes the weights → budget →
    selection → PACKING chain (VERDICT r11 #2): the epoched instance
    stream (each source's documents repeating per its Hamilton
    allocation, :func:`_mix_instances_frame`) is laid out in the
    deterministic (source, epoch, doc_id) order and cut into
    fixed-token bins exactly as :func:`packing.pack_token_budget`
    cuts the raw corpus — a document lands in the bin containing its
    LAST token, so every bin spans {_PACK_BIN} positions of the
    mixture's token stream.

    The invariant the composite exists to prove (pinned by a
    tests/test_round12.py invariant test): the packed token mass per
    source equals the Hamilton allocation up to the per-epoch
    boundary document — alloc ≤ mass < alloc + n_epochs·max_doc — and
    Σ bins.sum_tokens == Σ instance mass, so the budget the
    apportionment promised is the budget the packer ships (±boundary).

    Exactness: integer token counts, closed-form integer repeat
    counts, integer prefix sums — no floats anywhere.

    Plan: the allocation core's two corpus-scale exchanges, one
    tokenize pass for the prefix-sum scaffold, then the instance
    explosion is a narrow map and the global prefix sum is the
    two-phase scan partitioned by (source, epoch, doc-bucket) — the
    offset table is (corpus/{_SEL_BUCKET})·epochs rows (with the
    production bucket ~10⁶ docs and data-constrained epochs ≤ ~10,
    ~10⁶-row — single-task-window + broadcast safe); no corpus-wide
    single-partition window. Reference: no counterpart (converter.go
    is a per-file converter); SURVEY §2 LLM-dedup extension."""
    if inst is None:
        inst = _persist(
            _mix_instances_frame(spark, sf_dir).withColumn(
                "bucket", F.expr(f"doc_id div {_SEL_BUCKET}")
            )
        )
    else:
        # pipeline path: inst is already persisted upstream; the
        # bucket column is a narrow map over the cached rows
        inst = inst.withColumn("bucket", F.expr(f"doc_id div {_SEL_BUCKET}"))
    w_in = (
        Window.partitionBy("source", "epoch", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = inst.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    w_off = Window.orderBy("source", "epoch", "bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        inst.groupBy("source", "epoch", "bucket")
        .agg(F.sum("n_tokens").alias("bucket_sum"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_sum").over(w_off), F.lit(0))
        )
        .select("source", "epoch", "bucket", "offset")
    )
    cum = within.join(
        F.broadcast(offsets), ["source", "epoch", "bucket"]
    ).withColumn("cum_tokens", F.col("cum_in") + F.col("offset"))
    return (
        cum.withColumn(
            "bin_id",
            F.expr(f"(cum_tokens - 1) div {_PACK_BIN}").cast("bigint"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


#: Seed for the reproducible training-order shuffle — a run parameter
#: (the "data order seed" every published training config records),
#: not a corpus statistic.
_ORDER_SEED = "spark-graft-r12"


@CAT.query(
    "mix_training_order",
    oracle=f"""
    WITH {_MIX_INST_CTES},
    k AS (
      SELECT source, doc_id, CAST(epoch AS BIGINT) AS epoch,
             {md5_60_sql(
                 f"concat('{_ORDER_SEED}', ':', source, ':', "
                 "CAST(doc_id AS VARCHAR), ':', CAST(epoch AS VARCHAR))"
             )} AS shuffle_key
      FROM inst)
    SELECT source, doc_id, epoch, shuffle_key,
           CAST(ROW_NUMBER() OVER (
             ORDER BY epoch, shuffle_key, source, doc_id)
             AS BIGINT) AS train_order
    FROM k
    """,
)
def mix_training_order(
    spark: SparkSession, sf_dir: str, inst: DataFrame | None = None
) -> DataFrame:
    """Deterministic training-order curriculum over the selected
    mixture (VERDICT r11 #4 — the step between selection and packing
    in published pipelines): every document instance of the epoched
    mixture stream gets a globally consecutive, REPRODUCIBLE training
    position. Order = (epoch, seeded hash): within an epoch band the
    mixture is hash-shuffled (md5 of seed:source:doc_id:epoch — a new
    deterministic permutation per epoch, the "reshuffle each epoch"
    convention), and epoch bands ascend, so data-constrained sources'
    repeats land progressively later in training — the curriculum
    published data-constrained recipes use. Changing ``_ORDER_SEED``
    changes the permutation; re-running does not (determinism test).

    Exactness: the sort key (epoch, shuffle_key, source, doc_id) is
    unique (md5 collisions broken by the id columns), so the global
    rank is engine-independent.

    Plan: the instance stream's exchanges, then the distributed
    zipWithIndex scaffold (:func:`rank_global_two_phase`):
    range-repartition on the full sort key, per-partition
    ``row_number`` (parallel), |partitions|-row broadcast offsets — no
    single-task global window over the 10¹²-instance stream; the
    sampled range boundaries are nondeterministic but the unique total
    order makes the FINAL rank exact. Reference: no counterpart
    (converter.go is a per-file converter); SURVEY §2 LLM-dedup
    extension."""
    if inst is None:
        inst = _mix_instances_frame(spark, sf_dir)
    k = inst.select(
        "source",
        "doc_id",
        "epoch",
        md5_60(
            F.concat_ws(
                ":", F.lit(_ORDER_SEED), "source", "doc_id", "epoch"
            )
        ).alias("shuffle_key"),
    )
    r = _persist(
        k.repartitionByRange(
            32, "epoch", "shuffle_key", "source", "doc_id"
        ).withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid").orderBy(
        "epoch", "shuffle_key", "source", "doc_id"
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        r.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("off", F.coalesce(F.sum("c").over(w_off), F.lit(0)))
        .select("pid", "off")
    )
    return (
        r.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "pid")
        .select(
            "source",
            "doc_id",
            "epoch",
            "shuffle_key",
            (F.col("rn") + F.col("off")).cast("bigint").alias("train_order"),
        )
    )


def mix_pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The AMORTIZED mixing chain — all five ``mix_*`` entry outputs
    from one pass over shared persisted cores, the way a production
    run would execute the pipeline (each catalog entry deliberately
    stays standalone for per-entry driver independence; this is the
    compute-the-chain-once path those entries' docstrings promise).

    Shared exactly once here (vs once PER ENTRY standalone):
      - the corpus-scale DISTINCT (fp, source) fingerprint exchange
        (``_source_effective_frame`` — feeds weights + allocation +
        selection + both epoched consumers through ``alloc``),
      - the tokenize + two-phase prefix-sum scaffold
        (``_mix_cum_frame`` — feeds selection, avail-tokens, and the
        instance stream),
      - the epoched instance explosion (``_mix_instances_frame`` —
        feeds packing and training order).

    Returns ``{"weights", "allocation", "selection", "sequences",
    "order"}`` — each DataFrame is row-identical to its standalone
    catalog entry (pinned by tests/test_round12.py, which also pins
    that each core function is invoked exactly once). Persisted
    intermediates are registered with the tracked cache; call
    ``operators.cache.release_caches`` when done, as bench does.

    Scale: identical per-stage plans to the audited standalone
    entries — sharing removes repeated corpus scans/exchanges without
    adding any new shuffle; the persisted cores are the frames the
    entries already persist (the tokenized base proxy, the per-fp
    source sets) plus the |selected|·epochs
    instance stream, which production would land to disk between
    stages anyway. Reference: no counterpart (converter.go is a
    per-file converter); SURVEY §2 LLM-dedup extension (non-entry
    composition API)."""
    base = _mix_base(spark, sf_dir)
    eff = _persist(_source_effective_frame(spark, sf_dir, base=base))
    alloc = _persist(_mix_alloc_frame(spark, sf_dir, eff=eff))
    cum = _persist(_mix_cum_frame(spark, sf_dir, base=base))
    inst = _persist(_mix_instances_frame(spark, sf_dir, alloc=alloc, cum=cum))
    return {
        "weights": mix_source_weights(spark, sf_dir, eff=eff),
        "allocation": mix_token_allocation(
            spark, sf_dir, alloc=alloc, cum=cum
        ),
        "selection": mix_select_documents(spark, sf_dir, alloc=alloc, cum=cum),
        "sequences": mix_pack_sequences(spark, sf_dir, inst=inst),
        "order": mix_training_order(spark, sf_dir, inst=inst),
    }
