#!/usr/bin/env python
"""Per-query bench comparison: new record vs the best prior committed record.

Usage:
    python docs/compare_bench.py NEW.json OLD.json [OLD2.json ...]

Each file is a bench.py record ({"queries": {...}, "queries_warm": {...}}).
The baseline per query is the MINIMUM across all OLD records (cold and warm
pooled — the best any prior committed run achieved); the comparison column is
the NEW record's warm (min-of-2) time, per BASELINE.md's standing methodology.
Prints queries sorted worst-ratio-first and flags ratios > 2.0 (the driver
target) and > 1.3 (watch list).

A REGRESSION (exit code 1) requires ratio > 2.0 AND an absolute delta above
0.3 s. The absolute floor exists because per-job fixed overhead on this host
(scheduler + plan compile, ~0.15-0.3 s) swings by host window for IDENTICAL
code: replaying round-7 code (df55df4) against its own committed 08:36Z
bests measured scalar_posexplode 0.292 s vs 0.124 s and set_intersect
0.399 s vs 0.247 s — 2.3-2.5x "regressions" with zero code delta. A ratio of
scheduler overhead is not plan signal; a real micro-query plan regression
that matters (0.1 s -> 1 s) still trips the floor.
"""

from __future__ import annotations

import json
import sys

ABS_DELTA_FLOOR_S = 0.3


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    new = _load(argv[1])
    new_warm = new.get("queries_warm") or new["queries"]
    best: dict[str, float] = {}
    for p in argv[2:]:
        old = _load(p)
        for key in ("queries", "queries_warm"):
            for q, t in (old.get(key) or {}).items():
                if q not in best or t < best[q]:
                    best[q] = t

    rows = []
    for q, t in new_warm.items():
        if q in best and best[q] > 0:
            rows.append((t / best[q], q, t, best[q]))
    rows.sort(reverse=True)

    fails = 0
    print(f"{'ratio':>7}  {'new_warm':>9}  {'best_prior':>10}  query")
    for ratio, q, t, b in rows:
        is_reg = ratio > 2.0 and (t - b) > ABS_DELTA_FLOOR_S
        if is_reg:
            flag = " <-- >2x REGRESSION"
            fails += 1
        elif ratio > 2.0:
            flag = " (>2x ratio, sub-floor absolute delta)"
        elif ratio > 1.3:
            flag = " (watch)"
        else:
            flag = ""
        print(f"{ratio:7.2f}  {t:9.3f}  {b:10.3f}  {q}{flag}")
    new_only = sorted(set(new_warm) - set(best))
    if new_only:
        print(f"\n{len(new_only)} queries with no prior record (first-time benched):")
        for q in new_only:
            print(f"    {new_warm[q]:8.3f}  {q}")
    print(f"\n{len(rows)} compared, {fails} regressions past 2x")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
