"""Round-13 (optimization round 2) invariants.

- bench.py's drift_index payload field (VERDICT r12 #2): an
  additions-only host-load gauge — the median timing/floor ratio —
  computed correctly and robust to per-entry outliers; the existing
  payload contract (metric/value/unit/queries names) is untouched.
"""

from __future__ import annotations

import os


def test_drift_index_median_semantics():
    import bench

    floors = {"a": 1.0, "b": 2.0, "c": 4.0}
    # calm window: every entry at its floor
    assert bench.drift_index_of({"a": 1.0, "b": 2.0, "c": 4.0}, floors) == 1.0
    # uniform 1.5x drift
    assert bench.drift_index_of({"a": 1.5, "b": 3.0, "c": 6.0}, floors) == 1.5
    # one genuine 10x regression must NOT move the median (robustness:
    # the gauge tracks the host, not the code)
    assert bench.drift_index_of({"a": 1.0, "b": 2.0, "c": 40.0}, floors) == 1.0
    # even-count median is the midpoint of the two central ratios
    assert (
        bench.drift_index_of({"a": 1.0, "b": 4.0}, {"a": 1.0, "b": 2.0})
        == 1.5
    )
    # entries without a floor are skipped; no floors at all -> None
    assert bench.drift_index_of({"x": 3.0}, floors) is None
    assert bench.drift_index_of({}, {}) is None
    # a zero/negative floor must never divide
    assert bench.drift_index_of({"a": 1.0}, {"a": 0.0}) is None


def test_drift_index_is_additions_only():
    """The new field must be ADDED to the payload without renaming or
    removing any existing key, and the timing loop itself must not
    reference it (methodology untouched)."""
    with open(
        os.path.join(os.path.dirname(__file__), "..", "bench.py")
    ) as f:
        src = f.read()
    for key in (
        '"metric"',
        '"value"',
        '"unit"',
        '"sf"',
        '"convert_csv_mb"',
        '"convert_mbps"',
        '"recall_at_10"',
        '"floor_violations"',
        '"queries"',
    ):
        assert key in src, f"existing payload key {key} disappeared"
    assert '"drift_index": drift_index' in src
    # the timing decision logic still keys ONLY on floors/FLOOR_TOLERANCE
    assert "FLOOR_TOLERANCE * floor" in src
