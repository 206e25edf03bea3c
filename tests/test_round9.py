"""Round-9 unit tests: the mojibake digraph table's encoding
faithfulness + repair properties, and the SemDeDup keep-policy
invariants over the semantic clusters."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from csv_to_parquet_spark.operators.textops import _MOJI_PLANT, _MOJIBAKE_MAP


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def _repair(s: str) -> str:
    for clean, moji in _MOJIBAKE_MAP:
        s = s.replace(moji, clean)
    return s


def _corrupt(s: str) -> str:
    for clean, moji in _MOJIBAKE_MAP:
        s = s.replace(clean, moji)
    return s


def test_mojibake_table_is_real_utf8_as_latin1():
    """Each digraph must BE the UTF-8-read-as-Latin-1 corruption of
    its clean character — the table can't drift into made-up pairs.
    (Python str.replace shares the left-to-right non-overlapping
    semantics of Spark/DuckDB replace, so these properties transfer.)
    """
    for clean, moji in _MOJIBAKE_MAP:
        assert clean.encode("utf-8").decode("latin-1") == moji
        assert len(clean) == 1 and len(moji) == 2 and moji[0] == "Ã"


def test_mojibake_repair_roundtrip_and_idempotence():
    s = "el quéry de dáta soñó con cañón über façade"
    corrupted = _corrupt(s)
    assert corrupted != s
    assert _repair(corrupted) == s
    # repair of already-clean text is a no-op
    assert _repair(s) == s
    # repair is idempotent
    assert _repair(_repair(corrupted)) == _repair(corrupted)


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            "abc dataquery" + "".join(c for c, _ in _MOJIBAKE_MAP)
        ),
        max_size=40,
    )
)
def test_mojibake_repair_inverts_corruption(s):
    """Property: repair ∘ corrupt == identity on any text whose only
    non-ASCII characters are table entries (no digraph shares its
    clean char with another entry's, and 'Ã' never occurs clean)."""
    assert _repair(_corrupt(s)) == s


def test_mojibake_count_multi_hit():
    corrupted = _corrupt("dáta dáta quéry")  # 3 mojibake sequences
    hits = sum(
        (len(corrupted) - len(corrupted.replace(moji, ""))) // 2
        for _, moji in _MOJIBAKE_MAP
    )
    assert hits == 3


def test_mojibake_entry_plants_and_repairs(spark, sf_smoke, queries):
    out = queries["text_mojibake_repair"](spark, sf_smoke).collect()
    assert len(out) > 0
    planted = [r for r in out if r.doc_id % 3 == 0]
    clean = [r for r in out if r.doc_id % 3 != 0]
    # every planted doc that contained a plant word is flagged AND
    # repaired exactly; clean docs are untouched
    assert all(r.repaired_ok for r in out)
    assert all(not r.is_mojibake and r.chars_saved == 0 for r in clean)
    flagged = [r for r in planted if r.is_mojibake]
    assert flagged, "fixture must contain plant words in doc_id%3==0 docs"
    assert all(r.chars_saved == r.n_mojibake for r in flagged)
    plant_words = {w for w, _ in _MOJI_PLANT}
    assert plant_words == {"data", "query"}


def test_semdedup_keep_invariants(spark, sf_smoke, queries):
    from csv_to_parquet_spark.operators.cache import release_caches

    rows = queries["dedup_semdedup_keep"](spark, sf_smoke).collect()
    clusters = queries["dedup_semantic_clusters"](spark, sf_smoke).collect()
    release_caches()
    assert rows, "smoke corpus must produce at least one semantic cluster"
    # same membership as the clusters entry
    assert {(r.vec_id, r.cluster_id) for r in rows} == {
        (r.vec_id, r.cluster_id) for r in clusters
    }
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keeps = [r for r in members if r.keep]
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keeps"
        # the keep is the (max dist, min vec_id) member — the paper's
        # farthest-from-centroid rule with a deterministic tiebreak
        expected = sorted(members, key=lambda r: (-r.dist_micro2, r.vec_id))[0]
        assert keeps[0].vec_id == expected.vec_id
        assert all(r.dist_micro2 >= 0 for r in members)
