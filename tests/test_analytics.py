"""Invariant tests for the event-analytics operators.

Oracle parity proves cross-engine equality; these pin the semantics:
funnel counts are monotonically non-increasing down the steps and step
anchors are strictly ordered per user, retention is 1.0 at week 0 and
never exceeds the cohort size, and RFM scores respect their band
definitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_funnel_steps_monotone(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import events_funnel_steps

    rows = {r["step"]: r for r in events_funnel_steps(spark, sf_smoke).collect()}
    assert set(rows) == {"view", "click_after_view", "purchase_after_click"}
    n_view = rows["view"]["n_users"]
    n_click = rows["click_after_view"]["n_users"]
    n_purch = rows["purchase_after_click"]["n_users"]
    assert n_view >= n_click >= n_purch >= 0
    assert rows["view"]["pct_of_first"] == 1.0


def test_retention_week0_is_full(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import events_retention_cohort

    rows = events_retention_cohort(spark, sf_smoke).collect()
    assert rows, "no cohort rows"
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cohort, rs in by_cohort.items():
        week0 = [r for r in rs if r["week_offset"] == 0]
        assert len(week0) == 1, f"cohort {cohort} missing week 0"
        assert week0[0]["retention"] == 1.0
        for r in rs:
            assert 0 < r["retention"] <= 1.0
            assert r["n_active"] <= week0[0]["n_active"]
            assert r["week_offset"] >= 0


def test_rfm_scores_respect_bands(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import (
        _F_BANDS,
        _M_BANDS,
        _R_BANDS,
        events_user_rfm,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    df = events_user_rfm(spark, sf_smoke)
    # one row per user
    n_users = (
        load_table(spark, sf_smoke, "events").select("user_id").distinct().count()
    )
    rows = df.collect()
    assert len(rows) == n_users
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
        # spot-check band edges (recency: lower is better)
        if r["recency_days"] <= _R_BANDS[0]:
            assert r["r_score"] == 4
        elif r["recency_days"] > _R_BANDS[2]:
            assert r["r_score"] == 1
        if r["frequency"] >= _F_BANDS[0]:
            assert r["f_score"] == 4
        if r["monetary_cents"] < _M_BANDS[2]:
            assert r["m_score"] == 1
        assert r["monetary_cents"] >= 0
        assert r["recency_days"] >= 0


def test_bigram_colloc_lift_definition(spark, sf_smoke):
    """Spot-verify one reported collocation against counts recomputed
    from the raw corpus, and check ordering/threshold invariants."""
    from csv_to_parquet_spark.operators.textops import (
        _COLLOC_MIN_COUNT,
        _COLLOC_TOP_K,
        text_bigram_colloc,
    )
    from csv_to_parquet_spark.functions import tokenize
    from csv_to_parquet_spark.sources.tables import load_table

    rows = text_bigram_colloc(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _COLLOC_TOP_K
    lifts = [(r["lift"], r["bigram"]) for r in rows]
    assert lifts == sorted(lifts, key=lambda t: (-t[0], t[1]))
    for r in rows:
        assert r["c_bi"] >= _COLLOC_MIN_COUNT
        assert r["c_w1"] >= r["c_bi"] and r["c_w2"] >= r["c_bi"]
    # recompute the top row's constituent counts exactly
    top = rows[0]
    w1, w2 = top["bigram"].split(" ")
    toks = load_table(spark, sf_smoke, "documents").select(
        F.explode(tokenize("text")).alias("tok")
    )
    assert toks.filter(F.col("tok") == w1).count() == top["c_w1"]
    assert toks.filter(F.col("tok") == w2).count() == top["c_w2"]


def test_shard_assignment_covers_corpus(spark, sf_smoke):
    from csv_to_parquet_spark.operators.textops import (
        _N_SHARDS,
        shard_assign_training,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    rows = shard_assign_training(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # partition, no loss
    shards = [r["shard"] for r in rows]
    assert len(set(shards)) == len(shards)
    assert all(0 <= s < _N_SHARDS for s in shards)
    # hash balance: no shard wildly above the mean
    mean = n_docs / len(rows)
    assert max(r["n_docs"] for r in rows) <= mean * 3


def test_keep_best_one_representative_per_cluster(spark, sf_smoke):
    from csv_to_parquet_spark.operators.dedup import (
        dedup_cluster_keep_best,
        dedup_connected_components,
    )

    rows = dedup_cluster_keep_best(spark, sf_smoke).collect()
    assert rows
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [r for r in members if r["is_kept"]]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} representatives"
        best = kept[0]
        for r in members:
            # representative dominates on (n_chars DESC, doc_id ASC)
            assert (-best["n_chars"], best["doc_id"]) <= (
                -r["n_chars"],
                r["doc_id"],
            )
    # same doc/cluster universe as the components op
    cc = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup_connected_components(spark, sf_smoke).collect()
    }
    assert {(r["doc_id"], r["cluster_id"]) for r in rows} == cc


def test_time_range_window_matches_bruteforce(spark, sf_smoke):
    """Recompute a few events' trailing-hour sums by brute force."""
    from csv_to_parquet_spark.operators.analytics import (
        _TRAIL_US,
        window_time_range_sum,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {r["event_id"]: r for r in window_time_range_sum(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    sample = ev.orderBy("event_id").limit(20).collect()
    by_user: dict = {}
    for r in ev.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    for s in sample:
        lo = s["ts"].timestamp() * 1_000_000 - _TRAIL_US
        hi = s["ts"].timestamp() * 1_000_000
        peers = [
            r
            for r in by_user[s["user_id"]]
            if lo <= r["ts"].timestamp() * 1_000_000 <= hi
        ]
        want_cents = sum(round(r["value"] * 100) for r in peers)
        assert got[s["event_id"]]["trail_1h_events"] == len(peers)
        assert got[s["event_id"]]["trail_1h_cents"] == want_cents


def test_time_rollup_grains_consistent(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import events_time_rollup

    rows = events_time_rollup(spark, sf_smoke).collect()
    hourly = [r for r in rows if r["grain"] == 0]
    daily = [r for r in rows if r["grain"] == 1]
    total = [r for r in rows if r["grain"] == 3]
    assert len(total) == 1
    assert sum(r["n_events"] for r in hourly) == total[0]["n_events"]
    assert sum(r["value_cents"] for r in daily) == total[0]["value_cents"]
    # each day's rollup equals the sum of its hourly cells
    for d in daily:
        cells = [r for r in hourly if r["day_start"] == d["day_start"]]
        assert sum(r["n_events"] for r in cells) == d["n_events"]
        assert sum(r["value_cents"] for r in cells) == d["value_cents"]


def test_count_min_estimate_upper_bounds_truth(spark, sf_smoke):
    from csv_to_parquet_spark.operators.textops import (
        _CM_TOP_K,
        sketch_count_min_tokens,
    )

    rows = sketch_count_min_tokens(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _CM_TOP_K
    for r in rows:
        # count-min error is one-sided
        assert r["cm_estimate"] >= r["true_count"]
        assert r["is_exact"] == (r["cm_estimate"] == r["true_count"])
