"""Plan inspector CLI: dump the formatted physical plan of any catalog query.

    python -m tmapreduce_spark.plans q1_pricing_summary [sf_dir]
    python -m tmapreduce_spark.plans --list

The fast way to answer "did this plan broadcast / push down / partial-agg?"
without writing a script — the same check tests/test_plans.py automates.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    from tmapreduce_spark.catalog import build_catalog

    catalog = build_catalog()
    if not argv or argv[0] in ("--list", "-l"):
        for name, spec in sorted(catalog.items()):
            print(f"{name}  [{spec.category}]{'' if spec.oracle else '  (no oracle)'}")
        return 0

    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    if name not in catalog:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2

    from tmapreduce_spark.plans.explain import physical_plan
    from tmapreduce_spark.session import get_spark

    spark = get_spark(app_name="plan-inspect")
    spark.sparkContext.setLogLevel("ERROR")
    print(physical_plan(catalog[name].fn(spark, sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
