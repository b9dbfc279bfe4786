"""Central query catalog: every implemented operator from SURVEY.md §2 has an
entry here — a Spark callable ``(spark, sf_dir) -> DataFrame`` and (where
SQL-expressible) an equivalent DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports this catalog to the correctness driver.

Parity conventions (keep these or hashes break):
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded (2 decimals for money sums, 6 for ratios/avgs) on
  BOTH sides so engine-order summation noise cancels;
- timestamps/dates surfaced as formatted strings, never raw temporal types;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT, Spark keeps
  LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str


def build_catalog() -> dict[str, QuerySpec]:
    from tmapreduce_spark.operators import (
        advanced,
        mapreduce_queries,
        relational,
        setops,
        tpch_extra,
        windows,
    )
    from tmapreduce_spark.functions import dedup, multimodal, scale, similarity, text, udfs

    catalog: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch_extra,
        advanced,
        windows,
        setops,
        text,
        dedup,
        similarity,
        multimodal,
        udfs,
        scale,
        mapreduce_queries,
    ):
        for name, spec in mod.QUERIES.items():
            if name in catalog:
                raise ValueError(f"duplicate query name {name!r}")
            catalog[name] = spec
    return catalog
