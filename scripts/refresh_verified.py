#!/usr/bin/env python
"""Persist the driver's CORRECTNESS_r*.json green rows into the
committed ``csv_to_parquet_spark/verified_rounds.json`` snapshot.

``catalog.load_verified_rounds`` already merges the repo-root
CORRECTNESS files at build time, so running this is optional — it just
bakes the current state into the committed JSON so the rotation holds
even if the repo-root artifacts are ever pruned.

Usage: python scripts/refresh_verified.py   (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_parquet_spark import catalog


def main() -> None:
    verified = catalog.load_verified_rounds()
    with open(catalog._VERIFIED_JSON, "w") as f:
        json.dump(dict(sorted(verified.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(verified)} verified names -> {catalog._VERIFIED_JSON}")


if __name__ == "__main__":
    main()
