"""Tracked persist registry shared by operators that cache an
intermediate their returned (lazy) plan references.

Such operators cannot unpersist before the caller materializes, so
sweep harnesses (bench.py, the oracle-parity tests, long-lived
sessions) call :func:`release_caches` between queries — nothing stays
memory-resident across a catalog sweep.

Operators that release mid-pipeline (the connected-components wrappers,
whose edge materialization ends the life of their upstream LSH caches)
must NOT drain the global registry — another operator's
still-unmaterialized plan may reference earlier caches, and dropping
those silently recomputes its whole DAG. They instead take a
:func:`scope_token` before building their pipeline and release only
the caches registered after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _ACTIVE_CACHES.append(df)
    return df


def scope_token() -> int:
    """Position marker delimiting the caches owned by the pipeline
    about to be built: ``release_caches(scope_token_taken_before)``
    unpersists only what was registered afterwards."""
    return len(_ACTIVE_CACHES)


def release_caches(since_token: int = 0) -> None:
    """Unpersist tracked caches registered at or after ``since_token``
    (default 0 = every tracked cache; idempotent)."""
    while len(_ACTIVE_CACHES) > since_token:
        _ACTIVE_CACHES.pop().unpersist()
