"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's central catalog
(:mod:`tmapreduce_spark.catalog`): every implemented operator from
SURVEY.md §2 has a ``queries()`` entry, and every SQL-expressible one has a
matching DuckDB ``oracle_sql()`` string with identical column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _pin_session_confs(spark: SparkSession) -> None:
    """Oracle parity holds for ANY caller-provided session: date functions
    must evaluate in UTC (DuckDB's timestamps are zone-naive) and the events
    TIMESTAMP(NANOS) footer needs the legacy long read."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's golden
    char-histogram workload (SURVEY §2A item 17) as one exploded, partially
    aggregated DataFrame plan."""
    from tmapreduce_spark.functions.text import charcount

    _pin_session_confs(spark)
    return charcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tmapreduce_spark.catalog import build_catalog

    def bind(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: bind(spec.fn) for name, spec in build_catalog().items()}


def oracle_sql() -> dict[str, str]:
    from tmapreduce_spark.catalog import build_catalog

    return {
        name: spec.oracle
        for name, spec in build_catalog().items()
        if spec.oracle is not None
    }
