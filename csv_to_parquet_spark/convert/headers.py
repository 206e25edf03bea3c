"""Header normalization — reference parity.

Mirrors the cleaning pipeline in the reference's ``detectSchema``
(converter/converter.go:201-211): strip UTF-8 BOM → trim → spaces to
underscores → dots to underscores → empty name falls back to
``column_<i>``. Pure metadata — applied via ``df.toDF(*names)``, no
data movement.
"""

from __future__ import annotations

_BOM = "﻿"


def clean_header(name: str, index: int) -> str:
    """Clean one header cell (reference converter/converter.go:201-211)."""
    h = name.removeprefix(_BOM)
    h = h.strip()
    h = h.replace(" ", "_")
    h = h.replace(".", "_")
    if h == "":
        h = f"column_{index}"
    return h


def clean_headers(names: list[str]) -> list[str]:
    cleaned = [clean_header(n, i) for i, n in enumerate(names)]
    # Spark requires unique column names; the reference never dedups
    # (parquet-go tolerates dup fields) — disambiguate with a suffix.
    seen: dict[str, int] = {}
    out = []
    for c in cleaned:
        if c in seen:
            seen[c] += 1
            out.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 0
            out.append(c)
    return out
