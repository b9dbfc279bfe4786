#!/usr/bin/env python
"""Fold the durable bench record: per-query MIN across ALL committed history.

Usage:
    python docs/fold_bench.py NEW_RUN.json HIST.json [HIST2.json ...] > folded.json

Produces the committed `.benchmarks/bench_sf0.1.json` per BASELINE.md's
standing methodology (adopted r08 per the r07 verdict, which caught a fold
that replaced history with one loaded-machine run):

- `queries` (cold)  = per-query min over the new run's cold and every
  historical record's cold;
- `queries_warm`    = per-query min over the new run's warm and every
  historical record's cold AND warm pooled — so warm <= cold by
  construction and no warm>1.3x-cold artifact can enter the record;
- only queries present in the NEW run (the current catalog) are kept —
  renamed/removed entries drop out;
- totals are recomputed from the folded values; the new run's environment
  stamps are kept and a `fold` stamp records how many source records the
  minimum was taken over.

SURVEY §7 / README prose must quote THIS record, byte-sourced.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def fold(new: dict, hist: list[dict]) -> dict:
    cold = dict(new["queries"])
    warm = dict(new.get("queries_warm") or new["queries"])
    # the new run's own cold belongs in the warm pool too (pooled best)
    for q, t in cold.items():
        if t < warm.get(q, float("inf")):
            warm[q] = t
    n_sources = 1
    for old in hist:
        # a history file that is itself a fold carries the provenance of
        # every record it already pooled — propagate the cumulative count
        n_sources += (old.get("fold") or {}).get("n_source_records", 1)
        oc = old.get("queries") or {}
        ow = old.get("queries_warm") or {}
        for q in cold:
            for pool, src in ((cold, (oc,)), (warm, (oc, ow))):
                for s in src:
                    t = s.get(q)
                    if t is not None and t < pool[q]:
                        pool[q] = t
    out = dict(new)
    out["queries"] = {q: round(t, 3) for q, t in cold.items()}
    out["queries_warm"] = {q: round(t, 3) for q, t in warm.items()}
    headline = [q for q in _headline() if q in cold]
    out["value"] = round(sum(cold[q] for q in headline), 3)
    out["value_warm"] = round(sum(warm[q] for q in headline), 3)
    out["full_catalog_total"] = round(sum(cold.values()), 3)
    out["full_catalog_total_warm"] = round(sum(warm.values()), 3)
    out["fold"] = {
        "method": "per-query min across all committed records; warm pools cold",
        "n_source_records": n_sources,
    }
    return out


def _headline() -> list[str]:
    sys.path.insert(0, ".")
    import bench

    return bench.HEADLINE


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    new = _load(argv[1])
    hist = [_load(p) for p in argv[2:]]
    json.dump(fold(new, hist), sys.stdout, indent=1)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
