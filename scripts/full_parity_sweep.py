#!/usr/bin/env python
"""Full-catalog oracle-parity sweep — local mirror of the driver's
correctness gate, over EVERY catalog entry instead of the driver's
50-query rotation window (VERDICT r5 ADVICE: every query should have
recorded cross-engine evidence each round, not just the sampled 50).

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the same sf (default sf0.01, the driver's gate scale),
compares rows/schema/values with the same harness the parity tests
use, and writes ``CORRECTNESS_LOCAL.json`` at the repo root in the
driver's row format. Rows-only (no-oracle) entries are executed and
recorded with ``err: "no_oracle"`` exactly like the driver does.

Usage: python scripts/full_parity_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.oracle import compare_frames, duckdb_connection
    from csv_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="full_parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb_connection(sf_dir)

    results: dict[str, dict] = {}
    t_start = time.time()
    for i, (name, fn) in enumerate(queries.items(), 1):
        row: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if name in oracles:
                duck_pdf = con.execute(oracles[name]).df()
                row["oracle_rows"] = len(duck_pdf)
                problems = compare_frames(spark_pdf, duck_pdf)
                row["rows_match"] = len(spark_pdf) == len(duck_pdf)
                row["schema_match"] = sorted(spark_pdf.columns) == sorted(
                    duck_pdf.columns
                )
                row["hash_match"] = not problems
                if problems:
                    row["err"] = "; ".join(problems)[:400]
            else:
                row["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(exc).__name__}: {exc}"[:400]
        finally:
            release_caches()
        results[name] = row
        status = "ok" if row["hash_match"] or row["err"] == "no_oracle" else "FAIL"
        print(f"[{i}/{len(queries)}] {name}: {status}", flush=True)

    out = os.path.join(_ROOT, "CORRECTNESS_LOCAL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    n_oracle = sum(1 for r in results.values() if r["err"] != "no_oracle")
    n_green = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    print(
        f"wrote {out}: {n_green}/{n_oracle} oracle-exact, "
        f"{n_rows_only} rows-only, {len(results)} total, "
        f"{time.time() - t_start:.0f}s @ {sf_dir}"
    )
    return 0 if n_green == n_oracle else 1


if __name__ == "__main__":
    sys.exit(main())
