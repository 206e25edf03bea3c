"""Tracked persist registry shared by operators that cache an
intermediate their returned (lazy) plan references.

Such operators cannot unpersist before the caller materializes, so
sweep harnesses (bench.py, the oracle-parity tests, long-lived
sessions) call :func:`release_caches` between queries — nothing stays
memory-resident across a catalog sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _ACTIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked cache (idempotent)."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()
