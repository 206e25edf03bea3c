"""Round-6 second-wave operator invariants — properties the DuckDB
oracle parity cannot express (structural guarantees, negative
controls, independent Python recomputation), on the smoke corpus."""

from __future__ import annotations

import glob
import math
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# join_bloom_prefilter
# ---------------------------------------------------------------------------


def test_bloom_prefilter_no_false_negatives_and_prunes(spark, sf_smoke):
    """The Bloom screen must pass EVERY true-match order (no false
    negatives — exactness depends on it) while actually pruning a
    meaningful share of non-matching orders (otherwise the prefilter
    is dead weight). Reconstructs the screen's surviving key set by
    re-running the operator's internal pipeline shape."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.relational4 import (
        join_bloom_prefilter,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        out = {
            r.o_orderpriority: (r.n_orders, r.revenue_cents)
            for r in join_bloom_prefilter(spark, sf_smoke).collect()
        }
        # exact ground truth, computed independently with a plain join
        orders = load_table(spark, sf_smoke, "orders")
        cust = load_table(spark, sf_smoke, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        truth = {
            r.o_orderpriority: (r.n, r.rev)
            for r in orders.join(
                cust, orders.o_custkey == cust.c_custkey, "semi"
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).alias("rev"),
            )
            .collect()
        }
        assert out == truth
    finally:
        release_caches()


def test_bloom_bitmap_false_positive_rate_bounded(spark):
    """On an adversarial keyspace (probe keys disjoint from inserted
    keys) the 3-hash / 2^16-bit bitmap must screen out almost
    everything: fp rate for 500 inserted keys is (1-e^{-kn/m})^k ≈
    0.04%%; assert < 1%% so the margin survives hash quirks."""
    m_bits = 1 << 16
    inserted = spark.range(0, 500).select(F.col("id").alias("k"))
    probes = spark.range(10_000, 20_000).select(F.col("id").alias("k"))

    def positions(seed):
        return f"CAST(pmod(xxhash64(k, {seed}), {m_bits}) AS INT)"

    bitmap = (
        inserted.selectExpr(
            f"explode(array({positions(101)}, {positions(202)}, "
            f"{positions(303)})) AS pos"
        )
        .selectExpr(
            "shiftright(pos, 6) AS widx",
            "shiftleft(CAST(1 AS BIGINT), pmod(pos, 64)) AS mask",
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("widx", "word"))
            ).alias("bm")
        )
    )
    tests = [
        F.expr(
            f"coalesce((element_at(bm, CAST(shiftright(pmod(xxhash64("
            f"k, {seed}), {m_bits}), 6) AS INT)) & shiftleft("
            f"CAST(1 AS BIGINT), pmod(pmod(xxhash64(k, {seed}),"
            f" {m_bits}), 64))) != 0, false)"
        )
        for seed in (101, 202, 303)
    ]
    fp = (
        probes.crossJoin(F.broadcast(bitmap))
        .filter(tests[0] & tests[1] & tests[2])
        .count()
    )
    assert fp < 100, f"false-positive rate {fp / 10_000:.2%} >= 1%"
    # and every inserted key passes its own screen (no false negatives)
    kept = (
        inserted.crossJoin(F.broadcast(bitmap))
        .filter(tests[0] & tests[1] & tests[2])
        .count()
    )
    assert kept == 500


# ---------------------------------------------------------------------------
# source_utf16_csv_scan
# ---------------------------------------------------------------------------


def test_utf16_stage_is_really_utf16_and_misdecode_fails(spark, sf_smoke):
    """Negative control: the staged bytes must actually be 2-byte
    code units (NUL bytes present; '中' encoded LE), and reading the
    same files WITHOUT the charset option must NOT reproduce the
    data — otherwise the query could pass with the decode dead."""
    from csv_to_parquet_spark.operators.formats import (
        _STAGE,
        source_utf16_csv_scan,
    )

    good = source_utf16_csv_scan(spark, sf_smoke)
    n_good = good.count()
    assert n_good > 0
    assert good.filter(F.col("s_name").contains("中")).count() > 0

    tag = os.path.basename(os.path.normpath(sf_smoke)).replace(".", "_")
    path = os.path.join(_STAGE, f"supplier_utf16_{tag}.csvdir")
    part = sorted(glob.glob(os.path.join(path, "part-*.csv")))[0]
    raw = open(part, "rb").read()
    assert b"\x00" in raw, "no NUL bytes — not a 2-byte charset"
    assert "中".encode("utf-16-le") in raw

    # default-charset read of the same files: the UTF-8 misdecode
    # cannot reproduce the typed rows (header never matches, names
    # are NUL-riddled) — count of correctly-decoded names must be 0
    bad = (
        spark.read.schema(
            "s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, "
            "s_acctbal DOUBLE"
        )
        .option("header", True)
        .csv(path)
    )
    assert bad.filter(F.col("s_name").contains("中")).count() == 0


# ---------------------------------------------------------------------------
# events_interval_coverage
# ---------------------------------------------------------------------------


def test_interval_coverage_matches_python_sweep(spark, sf_smoke):
    """Independent recomputation: a plain Python interval-merge per
    user must produce identical island counts and union lengths."""
    from csv_to_parquet_spark.operators.analytics import (
        events_interval_coverage,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in events_interval_coverage(spark, sf_smoke).collect()
    }
    rows = (
        load_table(spark, sf_smoke, "events")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.s)
    want = {}
    for uid, starts in by_user.items():
        starts.sort()
        islands = 0
        covered = 0
        cur_s = cur_e = None
        for s in starts:
            e = s + 600_000_000
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        want[uid] = (islands, covered)
    assert got == want


# ---------------------------------------------------------------------------
# stats_benford_digits / events_chisq_independence
# ---------------------------------------------------------------------------


def test_benford_shares_form_a_distribution(spark, sf_smoke):
    """Digits are 1..9, observed shares sum to 1 (±9 ppm floor loss),
    expected shares are the Benford constants, chi2 cells nonneg."""
    from csv_to_parquet_spark.operators.analytics import (
        _BENFORD_P,
        stats_benford_digits,
    )

    rows = stats_benford_digits(spark, sf_smoke).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    total_ppm = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - 9 <= total_ppm <= 1_000_000
    for r in rows:
        assert r.exp_ppm == math.floor(float(_BENFORD_P[r.digit]) * 1e6)
        assert r.chi2_cell_micro >= 0
    assert sum(r.n_obs for r in rows) > 0


def test_chisq_independence_matches_python(spark, sf_smoke):
    """Exact recomputation of the fixed-point statistic from the raw
    contingency grid (same per-cell floor-to-micros then integer
    sum)."""
    from csv_to_parquet_spark.operators.analytics import (
        events_chisq_independence,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = events_chisq_independence(spark, sf_smoke).collect()[0]
    ev = (
        load_table(spark, sf_smoke, "events")
        .select(
            "event_type",
            (
                (
                    F.datediff(
                        F.to_date("ts"), F.lit("1970-01-01").cast("date")
                    )
                    % 7
                    + 3
                )
                % 7
                + 1
            ).alias("dow"),
        )
        .collect()
    )
    cells: dict = {}
    for r in ev:
        cells[(r.event_type, r.dow)] = cells.get((r.event_type, r.dow), 0) + 1
    n = sum(cells.values())
    rt: dict = {}
    ct: dict = {}
    for (t, d), o in cells.items():
        rt[t] = rt.get(t, 0) + o
        ct[d] = ct.get(d, 0) + o
    chi2 = 0
    for (t, d), o in cells.items():
        e = float(rt[t]) * ct[d] / n
        chi2 += math.floor((o - e) ** 2 / e * 1_000_000)
    assert got.n_events == n
    assert got.n_cells == len(cells)
    assert got.chi2_micro == chi2


# ---------------------------------------------------------------------------
# text_js_divergence
# ---------------------------------------------------------------------------


def test_js_divergence_bounds_and_python_recompute(spark, sf_smoke):
    """JSD is bounded by [0, ln 2] and symmetric by construction
    (unordered pairs). One pair is recomputed exactly in Python with
    the same nano-nat fixed point."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.textops import text_js_divergence
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        rows = text_js_divergence(spark, sf_smoke).collect()
    finally:
        release_caches()
    assert rows
    ln2_nano = math.log(2) * 1e9
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b  # unordered, deduped
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert -len(r.source_a) * 0 <= r.jsd_nano <= ln2_nano + 1
        assert r.jsd_nano >= -2  # floor can undershoot 0 by quantization

    # exact recompute of the first pair
    pick = rows[0]
    docs = load_table(spark, sf_smoke, "documents").collect()
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for d in docs:
        txt = d.text.strip()
        if not txt:
            continue
        toks = txt.split()
        if d.source == pick.source_a:
            ca.update(toks)
        elif d.source == pick.source_b:
            cb.update(toks)
    na, nb = sum(ca.values()), sum(cb.values())
    sa = sb = 0
    union = set(ca) | set(cb)
    for t in union:
        p = ca.get(t, 0) / na
        q = cb.get(t, 0) / nb
        if p > 0:
            sa += math.floor(p * math.log(2 * p / (p + q)) * 1e9)
        if q > 0:
            sb += math.floor(q * math.log(2 * q / (p + q)) * 1e9)
    assert pick.n_union_terms == len(union)
    assert pick.jsd_nano == (sa + sb) // 2


# ---------------------------------------------------------------------------
# stats_bootstrap_ci_poisson
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_point_and_python_recompute(spark, sf_smoke):
    """The interval must bracket the point estimate and be ordered;
    the replicate means are recomputed exactly in Python from the
    same md5 draws and integer thresholds."""
    import hashlib

    from csv_to_parquet_spark.operators.analytics import (
        _BOOT_B,
        _POIS_T,
        stats_bootstrap_ci_poisson,
    )
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        got = stats_bootstrap_ci_poisson(spark, sf_smoke).collect()[0]
        assert got.ci_lo_micro <= got.ci_hi_micro
        assert got.ci_lo_micro <= got.point_mean_micro <= got.ci_hi_micro
        assert got.n_replicates == _BOOT_B

        per_user = (
            load_table(spark, sf_smoke, "events")
            .groupBy("user_id")
            .agg(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).alias("k")
            )
            .collect()
        )
    finally:
        release_caches()
    means = []
    for b in range(_BOOT_B):
        wk = sw = 0
        for r in per_user:
            h = int(
                hashlib.md5(f"{r.user_id}:{b}".encode()).hexdigest()[:15],
                16,
            )
            w = sum(1 for t in _POIS_T if h >= t)
            wk += w * r.k
            sw += w
        if sw > 0:
            means.append(math.floor(wk * 1_000_000.0 / sw))
    means.sort()
    nb = len(means)
    assert got.ci_lo_micro == means[math.ceil(nb * 0.025) - 1]
    assert got.ci_hi_micro == means[math.ceil(nb * 0.975) - 1]


# ---------------------------------------------------------------------------
# orders_theilsen_trend
# ---------------------------------------------------------------------------


def test_theilsen_robust_to_outlier_month(spark, sf_smoke):
    """Structural sanity on the smoke corpus plus the defining
    robustness property on an engineered fixture: corrupting ONE
    month by 1000x moves OLS wildly but leaves the Theil-Sen median
    slope essentially unchanged."""
    from csv_to_parquet_spark.operators.analytics import (
        orders_theilsen_trend,
    )
    from csv_to_parquet_spark.operators.cache import release_caches

    try:
        got = orders_theilsen_trend(spark, sf_smoke).collect()[0]
    finally:
        release_caches()
    assert got.n_pairs == got.n_months * (got.n_months - 1) // 2

    # engineered: y = 10x + noise-free, one outlier month
    def ts_median_slope(points):
        slopes = sorted(
            (yb - ya) / (xb - xa)
            for i, (xa, ya) in enumerate(points)
            for (xb, yb) in points[i + 1 :]
        )
        n = len(slopes)
        return (slopes[(n - 1) // 2] + slopes[n // 2]) / 2

    clean = [(x, 10 * x) for x in range(12)]
    dirty = [(x, 10 * x if x != 6 else 60_000) for x in range(12)]
    assert ts_median_slope(clean) == 10
    assert abs(ts_median_slope(dirty) - 10) < 1e-9  # median unmoved
    ols = lambda pts: (  # noqa: E731
        (len(pts) * sum(x * y for x, y in pts) - sum(x for x, _ in pts) * sum(y for _, y in pts))
        / (len(pts) * sum(x * x for x, _ in pts) - sum(x for x, _ in pts) ** 2)
    )
    assert abs(ols(dirty) - 10) > 100  # OLS dragged by 3 orders


# ---------------------------------------------------------------------------
# text_bm25_scores
# ---------------------------------------------------------------------------


def test_bm25_scores_cover_query_postings_exactly(spark, sf_smoke):
    """Every scored doc contains >= 1 query term, every doc containing
    a query term is scored, scores are positive (idf +1 smoothing),
    and more query terms never hurts: a doc with all NQ terms
    outscores the same doc restricted to any subset (monotone sum of
    positive terms — checked structurally via n_query_terms >= 1)."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.textops import (
        _BM25_NQ,
        text_bm25_scores,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        rows = text_bm25_scores(spark, sf_smoke).collect()
        docs = load_table(spark, sf_smoke, "documents").collect()
    finally:
        release_caches()
    got = {r.doc_id: r for r in rows}
    # recompute query terms: top-NQ document frequency, tie by token
    from collections import Counter

    dfc: Counter = Counter()
    toks = {}
    for d in docs:
        ts = d.text.strip().split() if d.text.strip() else []
        toks[d.doc_id] = ts
        dfc.update(set(ts))
    q = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_NQ]
    qset = {t for t, _ in q}
    for d in docs:
        present = len(qset & set(toks[d.doc_id]))
        if present:
            assert d.doc_id in got
            assert got[d.doc_id].n_query_terms == present
            assert got[d.doc_id].bm25_micro > 0
        else:
            assert d.doc_id not in got


# ---------------------------------------------------------------------------
# dq_freshness_report / events_copresence_topk / orders_ewma_monthly
# ---------------------------------------------------------------------------


def test_freshness_report_covers_full_range_and_flags_gaps(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import dq_freshness_report
    from csv_to_parquet_spark.sources.tables import load_table

    rows = sorted(
        dq_freshness_report(spark, sf_smoke).collect(), key=lambda r: r.day
    )
    # dense daily spine: consecutive days, no holes in the report itself
    days = [r.day for r in rows]
    for a, b in zip(days, days[1:]):
        assert (b - a).days == 1
    # totals reconcile with the raw table; the freshest day has zero lag
    n_total = load_table(spark, sf_smoke, "events").count()
    assert sum(r.n_events for r in rows) == n_total
    assert min(r.staleness_us for r in rows if r.staleness_us is not None) == 0
    for r in rows:
        if r.is_gap:
            assert r.n_events == 0 and r.day_max_us is None
        else:
            assert r.n_events > 0 and r.staleness_us >= 0


def test_copresence_overlaps_match_python(spark, sf_smoke):
    """Exact recomputation: sessionize in Python with the same 30-min
    gap, then brute-force the interval overlaps for the same top-K
    anchors."""
    from csv_to_parquet_spark.operators.analytics import (
        _COPRES_K,
        _SESS_GAP_US,
        events_copresence_topk,
    )
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        got = {
            (r.anchor_user, r.other_user): (r.n_overlaps, r.total_overlap_us)
            for r in events_copresence_topk(spark, sf_smoke).collect()
        }
        rows = (
            load_table(spark, sf_smoke, "events")
            .select(
                "user_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            )
            .collect()
        )
    finally:
        release_caches()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.us)
    sessions: dict = {}
    counts = {}
    for uid, ts in by_user.items():
        ts.sort()
        counts[uid] = len(ts)
        cur = [ts[0], ts[0]]
        out = []
        for t in ts[1:]:
            if t - cur[1] > _SESS_GAP_US:
                out.append(tuple(cur))
                cur = [t, t]
            else:
                cur[1] = t
        out.append(tuple(cur))
        sessions[uid] = out
    topk = sorted(counts, key=lambda u: (-counts[u], u))[:_COPRES_K]
    want: dict = {}
    for a in topk:
        for (a0, a1) in sessions[a]:
            for o, os_ in sessions.items():
                if o == a:
                    continue
                for (s0, s1) in os_:
                    if a0 <= s1 and s0 <= a1:
                        k = (a, o)
                        n, tot = want.get(k, (0, 0))
                        want[k] = (
                            n + 1,
                            tot + min(a1, s1) - max(a0, s0),
                        )
    assert got == want


def test_ewma_is_exact_integer_recurrence(spark, sf_smoke):
    """The dyadic unrolled form must equal the per-term integer
    recomputation, and (floor effects aside) track the float
    recurrence s_t = x_t/2 + s_{t-1}/2 within the accumulated floor
    loss (t+1 terms, < 1 micro-cent each)."""
    from csv_to_parquet_spark.operators.analytics import orders_ewma_monthly
    from csv_to_parquet_spark.operators.cache import release_caches

    try:
        rows = sorted(
            orders_ewma_monthly(spark, sf_smoke).collect(),
            key=lambda r: r.month_index,
        )
    finally:
        release_caches()
    revs = [r.rev_cents for r in rows]
    for t, r in enumerate(rows):
        want = 0
        for j, x in enumerate(revs[: t + 1]):
            k = t - j if j == 0 else t - j + 1
            want += 0 if k >= 62 else (x * 1_000_000) >> k
        assert r.ewma_cents_micro == want
    s = revs[0] * 1_000_000.0
    for t, r in enumerate(rows):
        if t:
            s = revs[t] * 1_000_000.0 / 2 + s / 2
        assert abs(r.ewma_cents_micro - s) <= (t + 1) + s * 1e-12


def test_label_propagation_matches_python_sync_lpa(spark, sf_smoke):
    """Exact recomputation of 3 synchronous rounds with the same
    (count DESC, label ASC) tie order over the same edge list, plus
    the partition property (community sizes sum to |V|)."""
    from collections import Counter

    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.graph import (
        _LPA_ITERS,
        _edges,
        graph_label_propagation,
    )

    try:
        got = {
            r.community: (r.n_vertices, r.min_vertex)
            for r in graph_label_propagation(spark, sf_smoke).collect()
        }
        edges = [(r.a, r.b) for r in _edges(spark, sf_smoke).collect()]
    finally:
        release_caches()
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(_LPA_ITERS):
        new = {}
        for v, ns in nbrs.items():
            c = Counter(lab[u] for u in ns)
            new[v] = min(
                c, key=lambda candidate: (-c[candidate], candidate)
            )
        lab = new
    want: dict = {}
    for v, community in lab.items():
        n, mv = want.get(community, (0, None))
        want[community] = (n + 1, v if mv is None else min(mv, v))
    assert got == want
    assert sum(n for n, _ in got.values()) == len(nbrs)


# ---------------------------------------------------------------------------
# events_bitmap_dau_rollup / events_markov_stationary
# ---------------------------------------------------------------------------


def test_bitmap_rollup_equals_count_distinct(spark, sf_smoke):
    """The bitmap popcount must equal the plain count(DISTINCT user)
    per week — the whole point of the tile encoding."""
    from csv_to_parquet_spark.operators.analytics import (
        events_bitmap_dau_rollup,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {
        r.week: r.n_active_users
        for r in events_bitmap_dau_rollup(spark, sf_smoke).collect()
    }
    want = {
        r.week: r.n
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(
            F.date_trunc("week", F.to_date("ts"))
            .cast("timestamp")
            .alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and got


def test_markov_stationary_conserves_mass_and_matches_python(spark, sf_smoke):
    """Mass conservation (the floor loses < |states|² micro-units per
    step) and an exact Python recomputation of the integer fixed
    point from the raw transition counts."""
    from csv_to_parquet_spark.operators.analytics import (
        _MC_ITERS,
        _MC_SCALE,
        events_markov_stationary,
    )
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.sources.tables import load_table

    try:
        got = {
            r.event_type: r.pi_micro
            for r in events_markov_stationary(spark, sf_smoke).collect()
        }
        rows = (
            load_table(spark, sf_smoke, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        )
    finally:
        release_caches()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    trans: dict = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans} | {b for _, b in trans})
    rowtot = {}
    for (a, _), c in trans.items():
        rowtot[a] = rowtot.get(a, 0) + c
    p = {s: _MC_SCALE // len(states) for s in states}
    for _ in range(_MC_ITERS):
        new = {s: 0 for s in states}
        for (a, b), c in trans.items():
            new[b] += (p[a] * c) // rowtot[a]
        for s in states:
            if s not in rowtot:  # dangling: retain own mass
                new[s] += p[s]
        p = new
    assert got == p
    total = sum(got.values())
    # floor losses only: never gains, bounded per step
    assert _MC_SCALE - _MC_ITERS * len(states) ** 2 <= total <= _MC_SCALE


# ---------------------------------------------------------------------------
# orders_kaplan_meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_matches_python_estimator(spark, sf_smoke):
    """Exact recomputation of the fixed-point KM curve, plus the
    structural invariants: risk sets telescope (n_{i+1} = n_i - d_i -
    c_i), subjects are partitioned, and log-survival is
    non-increasing."""
    from csv_to_parquet_spark.operators.analytics import orders_kaplan_meier
    from csv_to_parquet_spark.sources.tables import load_table

    rows = sorted(
        orders_kaplan_meier(spark, sf_smoke).collect(),
        key=lambda r: r.t_days,
    )
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    ).collect()
    by_cust: dict = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append((r.d, r.o_orderkey))
    dmax = max(d for d, _ in sum(by_cust.values(), []))
    subj = []
    for ds in by_cust.values():
        ds.sort()
        if len(ds) >= 2:
            subj.append(((ds[1][0] - ds[0][0]).days, 1))
        else:
            subj.append(((dmax - ds[0][0]).days, 0))
    km: dict = {}
    for t, ev in subj:
        d, c = km.get(t, (0, 0))
        km[t] = (d + ev, c + (1 - ev))
    n = len(subj)
    cum = 0
    dead = False
    want = []
    for t in sorted(km):
        d, c = km[t]
        if d >= n:
            dead = True
        if not dead:
            cum += math.floor(math.log(1 - d / n) * 1_000_000)
        want.append((t, n, d, c, None if dead else cum))
        n -= d + c
    got = [
        (r.t_days, r.n_risk, r.n_events, r.n_censored, r.cum_log_surv_micro)
        for r in rows
    ]
    assert got == want
    assert sum(r.n_events + r.n_censored for r in rows) == len(subj)
    logs = [r.cum_log_surv_micro for r in rows if r.cum_log_surv_micro is not None]
    assert all(a >= b for a, b in zip(logs, logs[1:]))
