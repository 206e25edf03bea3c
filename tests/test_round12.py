"""Round-12 invariants.

- catalog rotation: an entry whose DuckDB oracle was added AFTER its
  last driver-green (rows-only) row is oracle-stale and re-enters the
  correctness window ahead of never-checked entries (VERDICT r11 #1).
- get_spark no longer mutates the process-global PYTHONPATH — the
  worker export is scoped via spark.executorEnv.PYTHONPATH
  (ADVICE r11).
- bench.py writes the committed BENCH_LOCAL.json artifact only at the
  canonical sf0.1; other scales go to a suffixed sidecar
  (VERDICT r11 #3).
"""

from __future__ import annotations

import os


def test_oracle_stale_entries_reenter_window():
    """knn_ivf_pq_ann and mm_phash_near_dup were driver-greened in
    rows-only form (r7) and converted to oracle entries in r9 — the
    driver has never DuckDB-compared them. The rotation must rank
    them inside the 50-slot window until a hash_match row lands."""
    from csv_to_parquet_spark import catalog

    rows_only = catalog.load_rows_only_verified()
    cat = catalog.build_catalog()
    stale = {n for n in rows_only if n in cat.oracle}
    names = list(cat.queries)
    window = set(names[:50])
    for n in stale:
        assert n in window, f"oracle-stale {n} outside driver window"
    # the three by-design rows-only sketches have no oracle and must
    # NOT be dragged back into the urgent tier
    for n in (
        "agg_approx_count_distinct",
        "approx_percentile_sketch",
        "sketch_hll_daily_rollup",
    ):
        assert n in rows_only and n not in stale


def test_oracle_stale_sort_key_tier():
    """The oracle-stale class sits in tier 0 (urgent) just behind true
    red rows and ahead of never-checked entries, regardless of module
    position or FRONTLOAD membership."""
    from csv_to_parquet_spark import catalog

    module_pos = {"red_q": 9, "stale_q": 8, "new_q": 0, "green_q": 1}
    verified = {"stale_q": 7, "green_q": 3}
    attempted = {"red_q", "stale_q", "green_q"}
    key = lambda n: catalog.rotation_sort_key(  # noqa: E731
        n, verified, attempted, module_pos, {"new_q": 0}, {"stale_q"}
    )
    assert key("red_q") < key("stale_q")
    assert key("stale_q") < key("new_q")
    assert key("new_q") < key("green_q")


def test_get_spark_does_not_mutate_global_pythonpath(spark):
    """ADVICE r11: the repo root must reach executor workers via
    spark.executorEnv.PYTHONPATH, not a process-global os.environ
    mutation that leaks into every subprocess the caller spawns."""
    pkg_root = os.path.dirname(
        os.path.dirname(
            os.path.abspath(
                __import__("csv_to_parquet_spark").__file__
            )
        )
    )
    before = os.environ.get("PYTHONPATH")
    from csv_to_parquet_spark.session import get_spark

    s = get_spark(app_name="envcheck")
    assert os.environ.get("PYTHONPATH") == before
    # the conf is set when THIS call created the session; under
    # getOrCreate-reuse the context's environment already carries it
    # from the creating call (the conftest fixture also uses get_spark)
    env_pp = s.sparkContext.environment.get("PYTHONPATH", "") or s.conf.get(
        "spark.executorEnv.PYTHONPATH", ""
    )
    assert pkg_root in env_pp.split(os.pathsep), env_pp


def test_bench_artifact_name_is_scale_guarded():
    """VERDICT r11 #3: a /verify smoke run at sf0.001 must not
    overwrite the committed sf0.1 headline artifact."""
    import re

    with open(os.path.join(os.path.dirname(__file__), "..", "bench.py")) as f:
        src = f.read()
    assert 'if sf == 0.1 else f"BENCH_LOCAL_sf{sf}.json"' in src
    # exactly one unconditional BENCH_LOCAL.json writer would be a
    # regression; the only occurrences must be the guarded expression
    # and prose/comments
    writes = re.findall(r'open\([^)]*BENCH_LOCAL\.json[^)]*\)', src)
    assert not writes, writes


def test_mix_pack_mass_matches_allocation(spark, sf_smoke):
    """The composite invariant the packing entry exists to prove
    (VERDICT r11 #2): packed token mass per source equals the Hamilton
    allocation up to one boundary document per epoch, and the bins
    conserve the instance stream's mass exactly."""
    from csv_to_parquet_spark.operators.dedup import (
        _mix_alloc_frame,
        _mix_instances_frame,
        mix_pack_sequences,
    )

    alloc = {
        r.source: r.alloc_tokens
        for r in _mix_alloc_frame(spark, sf_smoke).collect()
    }
    inst = _mix_instances_frame(spark, sf_smoke).collect()
    mass: dict = {}
    max_tok: dict = {}
    n_epochs: dict = {}
    for r in inst:
        mass[r.source] = mass.get(r.source, 0) + r.n_tokens
        max_tok[r.source] = max(max_tok.get(r.source, 0), r.n_tokens)
        n_epochs[r.source] = max(n_epochs.get(r.source, 0), r.epoch + 1)
    for src, a in alloc.items():
        if a == 0:
            assert src not in mass
            continue
        assert a <= mass[src], (src, a, mass[src])
        assert mass[src] < a + n_epochs[src] * max_tok[src], (
            src,
            a,
            mass[src],
        )
    bins = sorted(
        mix_pack_sequences(spark, sf_smoke).collect(),
        key=lambda r: r.bin_id,
    )
    assert [b.bin_id for b in bins] == list(range(len(bins)))
    assert sum(b.sum_tokens for b in bins) == sum(mass.values())
    assert all(b.n_docs >= 1 and b.n_sources >= 1 for b in bins)


def test_mix_training_order_deterministic_bijection(spark, sf_smoke):
    """VERDICT r11 #4 Done-clause: the training order is a
    reproducible bijection over the epoched instance stream, epochs
    ascend along it (the curriculum), and epoch 0 is exactly the
    mix_select_documents selected set (composite reconciliation)."""
    from csv_to_parquet_spark.operators.dedup import (
        mix_select_documents,
        mix_training_order,
    )

    a = sorted(
        mix_training_order(spark, sf_smoke).collect(),
        key=lambda r: r.train_order,
    )
    b = sorted(
        mix_training_order(spark, sf_smoke).collect(),
        key=lambda r: r.train_order,
    )
    assert [
        (r.source, r.doc_id, r.epoch, r.shuffle_key, r.train_order)
        for r in a
    ] == [
        (r.source, r.doc_id, r.epoch, r.shuffle_key, r.train_order)
        for r in b
    ]
    assert [r.train_order for r in a] == list(range(1, len(a) + 1))
    # curriculum: epoch bands ascend with training position
    assert all(x.epoch <= y.epoch for x, y in zip(a, a[1:]))
    # within an epoch band the order follows the seeded hash
    for x, y in zip(a, a[1:]):
        if x.epoch == y.epoch:
            assert (x.shuffle_key, x.source, x.doc_id) < (
                y.shuffle_key,
                y.source,
                y.doc_id,
            )
    epoch0 = {(r.source, r.doc_id) for r in a if r.epoch == 0}
    selected = {
        (r.source, r.doc_id)
        for r in mix_select_documents(spark, sf_smoke).collect()
        if r.selected
    }
    assert epoch0 == selected and len(epoch0) > 0
