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
