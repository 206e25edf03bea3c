#!/usr/bin/env python
"""Regenerate PLANS.md — curated physical-plan evidence for a
representative slice of the catalog, so plan-level claims (pushdown,
broadcast choice, exchange counts, codegen coverage) are reviewable
without running Spark. Run from the repo root:

    python scripts/dump_plans.py > PLANS.md

The mechanical tripwire lives in tests/test_plans.py (bans
CartesianProduct / unexpected BNLJ catalog-wide); this file is the
human-readable companion, not the enforcement.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.01"

# query -> (what the plan should show, regexes to surface)
SHOWCASE = {
    "filter_project_pushdown": (
        "filters + projection reach the parquet scan",
        [r"PushedFilters: \[[^\]]+\]", r"ReadSchema: [^\n]+"],
    ),
    "q8_market_share": (
        "dims broadcast; fact filtered before its shuffle",
        [r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"Arguments: hashpartitioning\([^,]+,[^,]+\)[^\n]{0,30}"],
    ),
    "bucketed_join_order_revenue": (
        "bucketed co-located join: zero Exchange",
        [r"\(\d+\) SortMergeJoin[^\n]*", r"!\(\d+\) Exchange",
         r"SelectedBucketsCount[^\n]*"],
    ),
    "topk_orders": (
        "top-k plans as TakeOrderedAndProject, not global sort",
        [r"TakeOrderedAndProject[^\n]*"],
    ),
    "agg_weighted_median_cents": (
        "window + final agg share ONE hash exchange",
        [r"\(\d+\) Exchange[^\n]*", r"\(\d+\) Window[^\n]*",
         r"\(\d+\) Sort[^\n]*"],
    ),
    "embedding_gram_matrix": (
        "one Python crossing (mapInPandas), d^2-bounded shuffle",
        [r"\(\d+\) MapInPandas[^\n]{0,40}",
         r"Arguments: hashpartitioning\(i[^\n]{0,40}"],
    ),
    "dedup_minhash_lsh": (
        "band-key join ships ids only (no text columns in exchanges)",
        [r"Arguments: hashpartitioning\([^\n]{0,60}",
         r"\(\d+\) Project[^\n]*"],
    ),
    "partition_pruned_year_revenue": (
        "partition pruning: only the selected year's files scanned",
        [r"PartitionFilters: \[[^\]]*\]"],
    ),
    "pack_token_budget": (
        "two-phase prefix sum: no single-partition global window over rows",
        [r"\(\d+\) Exchange[^\n]*", r"\(\d+\) Window[^\n]*"],
    ),
    "text_cdc_chunks": (
        "narrow map work; the single Exchange is spread()'s conditional "
        "widen-parallelism round-robin on the one-file local fixture "
        "(skipped on a production many-split scan — sources/tables.py)",
        [r"\(\d+\) Exchange[^\n]*", r"\(\d+\) Project[^\n]*"],
    ),
    "dedup_jaccard_prefix_filter": (
        "prefix-prefix candidate join carries (doc_id, sh) only; full "
        "shingle arrays appear solely in the verification joins",
        [r"Arguments: hashpartitioning\(sh[^\n]{0,50}",
         r"Arguments: hashpartitioning\(doc_[ab][^\n]{0,50}"],
    ),
    "knn_pq_adc": (
        "corpus side is codes-only after ONE Python crossing; the LUT "
        "is broadcast (no vector column in any exchange)",
        [r"\(\d+\) MapInPandas[^\n]{0,60}",
         r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"Arguments: hashpartitioning\(query_id[^\n]{0,40}"],
    ),
    "text_heavy_hitters_mg": (
        "bounded-memory candidate pass (MapInPandas) + broadcast "
        "candidate semi-join; the only corpus-keyed exchange is the "
        "exact recount groupBy",
        [r"\(\d+\) MapInPandas[^\n]{0,60}",
         r"\(\d+\) BroadcastHashJoin[^\n]{0,60}",
         r"Arguments: hashpartitioning\(t[#,][^\n]{0,40}"],
    ),
    "quality_model_score": (
        "model inference is ONE zero-shuffle projection: hash -> weight "
        "-> sum entirely inside the expression (the one Exchange is "
        "spread()'s fixture-only widen; no Python, no join)",
        [r"\(\d+\) Project[^\n]{0,40}", r"\(\d+\) Exchange[^\n]*"],
    ),
    "sample_weighted_priority": (
        "weighted top-k plans as TakeOrderedAndProject (per-partition "
        "heaps), never a global sort of the keyed corpus",
        [r"TakeOrderedAndProject[^\n]{0,80}"],
    ),
    "skyline_parts": (
        "two-phase running max: the partitioned per-range window plus a "
        "broadcast cross-range maxima join; the only unpartitioned "
        "window input is the |domain|/range offsets table",
        [r"\(\d+\) Window[^\n]*", r"\(\d+\) BroadcastHashJoin[^\n]*"],
    ),
    "join_bloom_prefilter": (
        "the literal-array bitmap makes the screen a scan-side Filter "
        "that Catalyst cannot reorder past the semi join (a 1-row "
        "broadcast attach WAS reordered — measured); the exact semi "
        "join that removes false positives follows",
        [r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"Join type: LeftSemi[^\n]*",
         r"Condition : \(\(\(NOT \(\(element_at\(\[\d+,\d+",
         r"\(\d+\) Scan parquet[^\n]{0,40}"],
    ),
    "events_interval_coverage": (
        "islands-and-gaps sweep: ONE user_id exchange feeds both "
        "windows and every downstream aggregate",
        [r"\(\d+\) Exchange[^\n]*", r"\(\d+\) Window[^\n]*"],
    ),
    "events_bitmap_dau_rollup": (
        "bitmap-tile distinct: three hash aggregates over shrinking "
        "tile frames, NO Expand/count-distinct of raw user ids",
        [r"\(\d+\) HashAggregate[^\n]*", r"\(\d+\) Expand[^\n]*"],
    ),
    "stats_ks_two_sample": (
        "global ECDF via the bucketed two-phase prefix sum: the "
        "per-value window partitions by bucket (parallel) and the "
        "offsets+totals attach is ONE broadcast hash join — no "
        "single-partition window over the value frame, no nested-loop "
        "scalar join",
        [r"\(\d+\) Window[^\n]*", r"\(\d+\) BroadcastHashJoin[^\n]*"],
    ),
    "stats_spearman_rank": (
        "rank maps join back onto the joint histogram: the bounded-"
        "domain side (quantity, 1..50) is broadcast; only the high-"
        "cardinality side shuffles",
        [r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"Arguments: hashpartitioning\(x[#,][^\n]{0,40}"],
    ),
    "variant_events_shred": (
        "VARIANT path extraction stays entirely JVM-side: parse_json + "
        "variant_get inside the projection, no Python nodes, one "
        "map-side-combined aggregate",
        [r"\(\d+\) HashAggregate[^\n]*", r"variant_get[^\n]{0,60}"],
    ),
    "mapinarrow_norm_audit": (
        "ONE Arrow crossing (PythonMapInArrow), zero shuffles: the "
        "kernel consumes the scan and emits final rows",
        [r"\(\d+\) (PythonMapInArrow|MapInArrow)[^\n]{0,50}",
         r"\(\d+\) Exchange[^\n]*"],
    ),
    "mm_phash_near_dup": (
        "band-key candidate join ships (doc_id, band, key) only; the "
        "64-bit hashes join back for the popcount verify — binary "
        "payloads never enter an exchange",
        [r"Arguments: hashpartitioning\((band|key|doc_)[^\n]{0,50}",
         r"\(\d+\) (PythonMapInArrow|MapInPandas)[^\n]{0,50}"],
    ),
    "recursive_doc_ancestry": (
        "each recursion step is a narrow map (filter + integer div) "
        "over the previous frame — the UnionLoop body contains no "
        "join; the terminal groupBy is the single shuffle",
        [r"\(\d+\) [^\n]*UnionLoop[^\n]{0,40}",
         r"\(\d+\) HashAggregate[^\n]*"],
    ),
    "dedup_embedding_cosine": (
        "r7 de-broadcast: block-pair keys make the O(n²) baseline a "
        "ShuffledHashJoin over uniform bucket-pair tasks — NO "
        "BroadcastExchange anywhere (the r6 shape broadcast the corpus)",
        [r"\(\d+\) ShuffledHashJoin[^\n]*",
         r"Arguments: hashpartitioning\(bi[#,][^\n]{0,40}"],
    ),
    "join_collation_ci_segments": (
        "the UTF8_LCASE collation keeps the case-insensitive join a "
        "plain broadcast hash equi-join (Catalyst hashes the collation "
        "key) — no lower() wrapper, no nested-loop fallback",
        [r"\(\d+\) BroadcastHashJoin[^\n]*"],
    ),
    "knn_ivf_pq_ann": (
        "composite ANN: probed-cell screen and LUT scoring are both "
        "broadcast joins over the codes-only corpus (one Python "
        "crossing to encode; no vector column in any exchange)",
        [r"\(\d+\) MapInPandas[^\n]{0,60}",
         r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"Arguments: hashpartitioning\(query_id[^\n]{0,40}"],
    ),
    "dedup_semdedup_keep": (
        "keep-policy centroids: the (cluster_id, dim) exchange carries "
        "exploded cluster MEMBERS only (bounded by the duplicate-pair "
        "population, never the corpus); the member-centroid join reuses "
        "the same key so d2 accumulates co-partitioned",
        [r"Arguments: hashpartitioning\(cluster_id[^\n]{0,50}",
         r"\(\d+\) Window[^\n]*"],
    ),
    "text_mojibake_repair": (
        "detection + repair is ONE zero-shuffle codegen projection "
        "(chained replace/length arithmetic; the one Exchange is "
        "spread()'s fixture-only widen — no UDF, no explode, no join)",
        [r"\(\d+\) Project[^\n]{0,40}", r"\(\d+\) Exchange[^\n]*"],
    ),
    "text_ccnet_buckets": (
        "held-out LM scoring: vocabulary-sized model frames BROADCAST "
        "into the token stream; tertiles come from a bucketed two-phase "
        "prefix sum over the score histogram — no corpus-wide orderBy, "
        "no per-lang single-task window",
        [r"\(\d+\) BroadcastHashJoin[^\n]*",
         r"keys \[\d+\]: \[lang[^\n]{0,60}",
         r"\(\d+\) Window[^\n]*"],
    ),
    "sample_dsir_importance": (
        "importance model (256 rows) broadcasts into the hashed-token "
        "stream; global selection rank is the two-phase range-"
        "partition scaffold (no single-task sort over documents)",
        [r"keys \[1\]: \[b#[^\n]{0,30}",
         r"rangepartitioning\(weight_micro[^\n]{0,60}"],
    ),
    "knn_pq_rerank": (
        "two-stage ANN: ADC screen (broadcast LUT join over codes) "
        "then exact rerank via broadcast candidate list — the "
        "full-precision vectors are scanned once, never shuffled",
        [r"\(\d+\) BroadcastHashJoin[^\n]{0,40}",
         r"\(\d+\) MapInPandas[^\n]{0,40}",
         r"WindowGroupLimit[^\n]{0,60}"],
    ),
    "dedup_ccnet_lines": (
        "CCNet paragraph dedup: lines fingerprint map-side, ONE "
        "fp-keyed exchange with a map-side-combined MIN picks first "
        "occurrences, survivors join back fp-keyed and one doc-keyed "
        "agg rewrites documents (n_lines carried from segmentation — "
        "no second per-doc aggregation)",
        [r"\(\d+\) HashAggregate[^\n]{0,60}",
         r"hashpartitioning\(fp[^\n]{0,40}",
         r"hashpartitioning\(doc_id[^\n]{0,60}"],
    ),
    "tokenizer_fertility_report": (
        "fertility report: the merge cascade is a zero-shuffle codegen "
        "projection; the ONLY exchange is the per-language agg whose "
        "map-side partials reduce each partition to |langs| rows",
        [r"\(\d+\) HashAggregate[^\n]{0,80}",
         r"hashpartitioning\(lang[^\n]{0,40}"],
    ),
    "text_langid_model": (
        "trained langid scoring is a ZERO-SHUFFLE codegen projection "
        "(inlined weight-array literals; buckets hashed once per doc; "
        "the one Exchange is spread()'s fixture-only widen — no join, "
        "no Python in the scoring plan)",
        [r"\(\d+\) Project[^\n]{0,40}",
         r"!\(\d+\) BroadcastHashJoin",
         r"!MapInPandas"],
    ),
    "text_url_domain_filter": (
        "URL parse + blocklist are map-side; the RefinedWeb cap is "
        "exactly ONE domain-keyed window exchange (the other Exchange "
        "is spread()'s fixture-only widen)",
        [r"hashpartitioning\(domain[^\n]{0,60}",
         r"\(\d+\) Window[^\n]{0,60}"],
    ),
    "mix_pack_sequences": (
        "epoched mixture packing: every Window is partitioned — the "
        "within-(source, epoch, bucket) running sums run parallel and "
        "the offset cumulate is the (corpus/bucket)·epochs-row frame; "
        "offsets and the model-sized alloc frames attach by broadcast",
        [r"\(\d+\) Window[^\n]{0,90}",
         r"\(\d+\) BroadcastHashJoin[^\n]{0,60}"],
    ),
    "mix_training_order": (
        "reproducible training order: range repartition on the full "
        "(epoch, shuffle_key, source, doc_id) sort key, per-partition "
        "row_number (pid-partitioned Window), |partitions|-row "
        "broadcast offsets — no single-task global window",
        [r"rangepartitioning\(epoch[^\n]{0,80}",
         r"\(\d+\) Window[^\n]{0,80}",
         r"\(\d+\) BroadcastHashJoin[^\n]{0,60}"],
    ),
    "tokenizer_unigram_fertility": (
        "unigram fertility: Viterbi segmentation is a zero-Python "
        "codegen fold over word types (no MapInPandas anywhere); the "
        "corpus appears as two map-side-combined histogram aggs and "
        "the (lang, word) join strategy is left to AQE",
        [r"\(\d+\) HashAggregate[^\n]{0,80}",
         r"hashpartitioning\(lang[^\n]{0,40}",
         r"!MapInPandas"],
    ),
    "text_stupid_backoff_lm": (
        "stupid-backoff scoring: the trigram model and every derived "
        "denominator are vocabulary-sized; scoring joins are "
        "key-shuffles (a web-scale trigram table does not broadcast "
        "by assumption — AQE may still choose to); the 1-row (N, V) "
        "frame is broadcast; no Python anywhere",
        [r"\(\d+\) HashAggregate[^\n]{0,80}",
         r"hashpartitioning\(doc_id[^\n]{0,40}",
         r"!EvalPython"],
    ),
}


def main() -> int:
    from csv_to_parquet_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    print("# PLANS — curated physical-plan evidence\n")
    print(
        "Generated by `python scripts/dump_plans.py` at sf0.01. Each entry\n"
        "states the property the plan must exhibit, then the matching\n"
        "physical-plan lines (deduplicated). The catalog-wide mechanical\n"
        "enforcement is tests/test_plans.py; this file makes the evidence\n"
        "reviewable at a glance.\n"
    )
    for name, (claim, pats) in SHOWCASE.items():
        fn = queries.get(name)
        if fn is None:
            continue
        df = fn(spark, SF_DIR)
        # formatted mode prints full scan metadata (PushedFilters is
        # truncated out of executedPlan().toString()'s field limit)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        print(f"## {name}\n\n**Claim:** {claim}\n")
        seen: list[str] = []
        for pat in pats:
            if pat.startswith("!"):  # must-be-absent assertion
                if re.search(pat[1:], plan):
                    seen.append(f"VIOLATION: /{pat[1:]}/ present in plan")
                else:
                    seen.append(f"confirmed absent: /{pat[1:]}/")
                continue
            hits = re.findall(pat, plan)
            uniq = []
            for h in hits:
                h = h.strip()
                if h not in uniq:
                    uniq.append(h)
            if not uniq:
                seen.append(f"(no match for /{pat}/ — absent from plan)")
            else:
                seen.extend(uniq[:4])
        print("```")
        for line in seen:
            print(line)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        print(f"-- total Exchange operators in plan: {n_ex}")
        print("```\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
