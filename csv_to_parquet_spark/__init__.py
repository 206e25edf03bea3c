"""csv_to_parquet_spark — a PySpark-native analytics engine.

Re-implements the full capability surface of the reference tool
``ddominici/csv-to-parquet`` (a Go CSV→Parquet batch converter; see
SURVEY.md for the complete operator inventory) as an idiomatic Spark
engine, and extends it with the relational, streaming, and
LLM-data-pipeline operators a 100 TB training-data platform needs.

Layout
------
- ``session``    SparkSession construction tuned for scale (AQE, Arrow).
- ``config``     YAML + CLI configuration with reference-parity precedence
                 (reference: config/config.go:22-85).
- ``convert``    the conversion core: source discovery, exact-semantics
                 schema inference, header normalization, parquet sink
                 (reference: converter/converter.go).
- ``sources``    table registry over the parquet star schema + CSV source.
- ``operators``  DataFrame → DataFrame operator catalog (relational,
                 dedup, similarity, text, multimodal) — each entry is
                 oracle-tested against DuckDB.
- ``streaming``  Structured Streaming mode: watch-folder conversion,
                 event-time windows, streaming dedup.
- ``plans``      plan-inspection helpers (pushdown / broadcast asserts).
- ``functions``  reusable column expressions (cosine, tokenize, minhash).
"""

__version__ = "0.1.0"
