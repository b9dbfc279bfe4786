"""Set operations: union/union all, intersect, except, distinct.

Reference status: the only set-shaped behavior is the ordered concatenation of
reduce-subjob outputs (UNION ALL analog, ``/root/reference/src/tmapreduce/
job.cc:68-77``); everything else is absent (SURVEY §2B). Spark's set ops
compile to unions / hash-aggregates / anti-joins — all shuffle-on-key,
AQE-managed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.sources.catalog import load_table


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + count: nation frequency across both roles."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n_rows"))


SET_UNION_ALL_SQL = """
SELECT nationkey, count(*) AS n_rows
FROM (SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier) t
GROUP BY nationkey
"""


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


SET_UNION_DISTINCT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have BOTH customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).exceptAll(
        _supp_nations(spark, sf_dir)
    ).distinct()


SET_EXCEPT_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier) t
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — multiplicities survive, unlike
    set_except's distinct): per nation, how many MORE customers than
    suppliers, counted bag-wise."""
    diff = _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))
    return diff.groupBy("nationkey").agg(F.count("*").alias("surplus"))


SET_EXCEPT_ALL_SQL = """
SELECT nationkey, count(*) AS surplus
FROM (SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier) t
GROUP BY nationkey
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): per nation,
    min(#customers, #suppliers) occurrences survive."""
    both = _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))
    return both.groupBy("nationkey").agg(F.count("*").alias("n_common"))


SET_INTERSECT_ALL_SQL = """
SELECT nationkey, count(*) AS n_common
FROM (SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier) t
GROUP BY nationkey
"""


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (hash-aggregate with partial combine)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


QUERIES: dict[str, QuerySpec] = {
    "set_union_all": QuerySpec(set_union_all, SET_UNION_ALL_SQL, "setop"),
    "set_union_distinct": QuerySpec(set_union_distinct, SET_UNION_DISTINCT_SQL, "setop"),
    "set_intersect": QuerySpec(set_intersect, SET_INTERSECT_SQL, "setop"),
    "set_except": QuerySpec(set_except, SET_EXCEPT_SQL, "setop"),
    "set_except_all": QuerySpec(set_except_all, SET_EXCEPT_ALL_SQL, "setop"),
    "set_intersect_all": QuerySpec(set_intersect_all, SET_INTERSECT_ALL_SQL, "setop"),
    "distinct_pairs": QuerySpec(distinct_pairs, DISTINCT_SQL, "setop"),
}
