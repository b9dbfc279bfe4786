"""SQL front door: the engine's tables are queryable through `spark.sql`
over registered views — the SQL layer the reference lacks entirely (its
computable surface is two C functions, SURVEY §2). Each SQL statement must
produce the SAME rows as its DataFrame-API catalog twin (same Catalyst
plans underneath), so users can pick either surface interchangeably."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tmapreduce_spark.sources.catalog import register_views


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_equals_dataframe_q6(spark):
    from tmapreduce_spark.operators.relational import q6_forecast_revenue

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
                 AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """
    )
    [(got,)] = sql.collect()
    [row] = q6_forecast_revenue(spark, SF_SMOKE).collect()
    want = row["revenue"]
    # both sum in exact micro-units; the catalog twin additionally presents
    # at 2 decimals, so agreement is bounded by that display rounding
    assert abs(got - float(want)) < 0.005


def test_sql_equals_dataframe_topn_window(spark):
    from tmapreduce_spark.operators.windows import window_rank_topn

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               floor(o_totalprice * 100 + 0.5) / 100 AS total_price,
               CAST(rn AS BIGINT) AS rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
        WHERE rn <= 3
        """
    )
    assert _rows(sql) == _rows(window_rank_topn(spark, SF_SMOKE))


def test_sql_join_agg_matches_dataframe(spark):
    from pyspark.sql import functions as F
    from tmapreduce_spark.sources.catalog import load_table

    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT n.n_name AS nation, count(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    c = load_table(spark, SF_SMOKE, "customer")
    n = load_table(spark, SF_SMOKE, "nation")
    df = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )
    assert _rows(sql) == _rows(df)
