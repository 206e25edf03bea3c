"""Operator catalog plumbing.

Each operator module declares a module-level ``CAT = Catalog()`` and
registers queries with ``@CAT.query(name, oracle=...)``. A query is a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle`` is the equivalent
DuckDB SQL over the same parquet tables (omitted only for genuinely
non-SQL-expressible ops — the driver then records a rows-only check).

Determinism conventions (these make the driver's order-insensitive
value-hash reproducible across engines AND across Spark's own
partition-merge orders):

- Money/quantity sums go through integer cents (``cents()`` /
  ``CENTS_SQL``): cast-to-bigint sums are exact in any accumulation
  order, unlike double sums.
- Every computed column is aliased identically in the DataFrame code
  and the oracle SQL.
- ``date_trunc``/``window`` results are cast to ``timestamp_ntz`` to
  match DuckDB's naive TIMESTAMP.
- Top-k orderings always include a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Catalog:
    queries: dict[str, QueryFn] = field(default_factory=dict)
    oracle: dict[str, str] = field(default_factory=dict)

    def query(self, name: str, oracle: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r}")
            self.queries[name] = fn
            if oracle is not None:
                self.oracle[name] = oracle
            return fn

        return deco

    def merge(self, other: "Catalog") -> None:
        for name in other.queries:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r} on merge")
        self.queries.update(other.queries)
        self.oracle.update(other.oracle)
