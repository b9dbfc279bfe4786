"""Bucketed at-rest layout: pre-shuffled tables so repeated joins and
aggregations on the bucket key run with NO exchange at query time.

This is the single biggest at-rest lever for the 100 TB fact-fact join
(orders ⋈ lineitem on orderkey): bucket BOTH tables into the same number of
buckets on the join key when they are written, and every subsequent join on
that key is bucket-to-bucket — Spark plans a SortMergeJoin with zero
Exchange nodes, so the 100 TB shuffle is paid once at ingest instead of on
every query. (The reference has no storage layer at all — payloads live in
the master's RAM and every job re-ships them, ``src/tmapreduce/job.h:86-88``.)

Rules that make bucketing effective (asserted by tests/test_plans.py):
- same bucket count on both sides (or a divisor — Spark 3+ can coalesce);
- ``sortBy`` the bucket key inside each bucket so SMJ skips its sort;
- bucket count chosen for target-SF bucket size ~128-256 MB; at 100 TB with
  ~1000 executors, thousands of buckets (it also caps join parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tmapreduce_spark.sources.catalog import load_table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``key`` at an explicit external ``path``."""
    writer = df.write.mode("overwrite").format("parquet").option("path", path)
    writer = writer.bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucket_order_tables(
    spark: SparkSession, sf_dir: str, base_path: str, num_buckets: int = 8
) -> tuple[str, str]:
    """Write orders and lineitem co-bucketed on the order key; returns the
    two table names. One-time ingest cost; afterwards every orderkey join or
    aggregation over them is exchange-free."""
    o_tbl, l_tbl = "orders_bkt", "lineitem_bkt"
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        o_tbl, "o_orderkey", num_buckets, f"{base_path}/orders_bkt",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        l_tbl, "l_orderkey", num_buckets, f"{base_path}/lineitem_bkt",
    )
    return o_tbl, l_tbl


def bucketed_order_revenue(spark: SparkSession, o_tbl: str, l_tbl: str) -> DataFrame:
    """Per-order revenue over the co-bucketed tables — the plan must contain
    a SortMergeJoin and ZERO Exchange nodes (test_plans asserts this)."""
    from pyspark.sql import functions as F

    from tmapreduce_spark.parity import SPARK, msum2

    o = spark.table(o_tbl)
    l = spark.table(l_tbl)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.expr(msum2("l_extendedprice * (1 - l_discount)", SPARK)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Catalog entry: the bucketed fact-fact join, driver-proven — round 9
# ---------------------------------------------------------------------------

from tmapreduce_spark.catalog import QuerySpec  # noqa: E402
from tmapreduce_spark.parity import SPARK, msum2  # noqa: E402


def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end proof of the at-rest bucketing strategy THROUGH the
    oracle gate: orders and lineitem are written co-bucketed on the order
    key, the fact-fact join + per-priority rollup runs over the bucketed
    tables (SortMergeJoin with ZERO Exchange on the join key —
    tests/test_plans.py pins the plan; broadcast is disabled for the join
    so the bucket-to-bucket path is what actually executes), and the
    result is hash-checked against a plain-parquet DuckDB join. The entry
    deliberately pays the one-time ingest inside the timed window — at
    100 TB that cost amortizes over every subsequent orderkey join, which
    is the whole argument for bucketing.

    Exactness: revenue is msum2 (integer micro, order-free)."""
    from pyspark.sql import functions as F

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    base = f"/tmp/tmrs_bucketed/{sf_tag}"
    o_tbl, l_tbl = f"orders_bkt_{sf_tag}", f"lineitem_bkt_{sf_tag}"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        o_tbl, "o_orderkey", 8, f"{base}/{o_tbl}",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        l_tbl, "l_orderkey", 8, f"{base}/{l_tbl}",
    )
    j = spark.table(l_tbl).join(
        spark.table(o_tbl).hint("MERGE"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.expr(msum2("l_extendedprice * (1 - l_discount)", SPARK)).alias(
            "revenue"
        ),
    )


from tmapreduce_spark.parity import DUCK  # noqa: E402

LAYOUT_BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {msum2("l_extendedprice * (1 - l_discount)", DUCK)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

QUERIES: dict[str, QuerySpec] = {
    "layout_bucketed_join": QuerySpec(
        layout_bucketed_join, LAYOUT_BUCKETED_JOIN_SQL, "layout"
    ),
}
