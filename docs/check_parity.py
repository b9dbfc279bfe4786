#!/usr/bin/env python
"""Per-change oracle parity check: run named catalog queries on Spark AND
their DuckDB oracles at one SF (default sf0.001; pass --sf-dir for sf0.01),
compare row counts, column names, and exact values after column-name sort +
row sort — the same contract as tests/test_oracle_parity.py, isolated so a
candidate optimization can be parity-checked in seconds without the full
suite.

Usage:
    PYTHONPATH=/root/repo python docs/check_parity.py NAME [NAME ...] \
        [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.session import get_spark

    spark = get_spark(app_name="tmapreduce-parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = build_catalog()
    unknown = [n for n in args.names if n not in catalog]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype(float)
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    failed = []
    for name in args.names:
        spec = catalog[name]
        if spec.oracle is None:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        s = normalize(spec.fn(spark, args.sf_dir).toPandas())
        d = normalize(con.execute(spec.oracle).df())
        ok = (
            len(s) == len(d)
            and list(s.columns) == list(d.columns)
            and s.astype(str).equals(d.astype(str))
        )
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s)} rows)")
        if not ok:
            failed.append(name)
            print("  spark:", s.head(3).to_dict("records"), file=sys.stderr)
            print("  duck: ", d.head(3).to_dict("records"), file=sys.stderr)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
