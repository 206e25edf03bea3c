#!/usr/bin/env python
"""Maintain ``bench_floors.json`` — each headline entry's historical
per-query minimum, the reference point for bench.py's automated
variance check (VERDICT r10 #2: the hand-curated VARIANCE_FLAGGED set
lagged a round behind every new drifter; the floor file makes the
check data-driven and committed).

Policy: a floor only ever goes DOWN via this script (min-merge of the
existing file with every source artifact), because the floor means
"this code has demonstrably run this fast on this host". When a
deliberate change makes an entry slower by design (e.g. a bigger
trainer budget bought recall), rebase that entry explicitly:

    python scripts/refresh_bench_floors.py --rebase knn_ivf_ann

which resets the named entry to the minimum of the SOURCE artifacts
only (dropping the stale pre-change floor). The default source is
BENCH_LOCAL.json (the latest current-code payload) plus any extra
payload paths given as positional args — deliberately NOT the
archived calm-window snapshot (BENCH_LOCAL_CALM.json seeded the
initial floors but is r10-code: keeping it as a perpetual source
would re-introduce stale pre-change floors after every --rebase).
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS = os.path.join(_ROOT, "bench_floors.json")
DEFAULT_SOURCES = ["BENCH_LOCAL.json"]


def main() -> int:
    args = sys.argv[1:]
    rebase: set[str] = set()
    sources = list(DEFAULT_SOURCES)
    while "--rebase" in args:
        i = args.index("--rebase")
        if i + 1 >= len(args):
            print("error: --rebase requires an entry name", file=sys.stderr)
            return 2
        rebase.add(args[i + 1])
        del args[i : i + 2]
    sources.extend(args)

    fresh: dict[str, float] = {}
    for src in sources:
        path = src if os.path.isabs(src) else os.path.join(_ROOT, src)
        try:
            with open(path) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            continue
        for name, t in payload.get("queries", {}).items():
            if isinstance(t, (int, float)) and t > 0:
                fresh[name] = min(fresh.get(name, t), float(t))

    floors: dict[str, float] = {}
    try:
        with open(FLOORS) as f:
            floors = json.load(f)
    except (OSError, ValueError):
        pass

    for name in rebase:
        # ADVICE r11: a typo'd --rebase used to silently no-op and
        # leave the stale floor in place under a success message.
        if name not in floors and name not in fresh:
            print(
                f"warning: --rebase {name!r} matches no floor and no "
                "source artifact entry — check the spelling",
                file=sys.stderr,
            )
        floors.pop(name, None)
    for name, t in fresh.items():
        floors[name] = min(floors.get(name, t), t)

    with open(FLOORS, "w") as f:
        json.dump(dict(sorted(floors.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(floors)} floors to {FLOORS}"
          + (f" (rebased: {sorted(rebase)})" if rebase else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
