"""User-defined function surface: scalar pandas UDF (Arrow fast path),
row-at-a-time Python UDF (the slow path, kept for API parity), grouped
applyInPandas, and a Python UDTF.

This is the DataFrame-era analog of the reference's entire extensibility
story: C functions resolved per job type via ``dlopen``/``dlsym``
(``/root/reference/src/tmapreduce/worker.cc:107,225,270``, ABI
``wrapper.h:10-19``). The registry analog for MapReduce jobs lives in
:mod:`tmapreduce_spark.registry`; here the same user-code capability is
exposed at the SQL/DataFrame layer.

Performance ranking (keep in docstrings because the 100 TB plan depends on
it): built-in expressions >> pandas UDF (Arrow, vectorized) >> Python UDF
(per-row pickling). The catalog entries below intentionally compute things
expressible as built-ins so the DuckDB oracle can verify the UDF machinery
itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.sources.catalog import load_table


@pandas_udf(DoubleType())
def net_price_pandas(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized net-price: identical IEEE ops to the SQL expression, so the
    result is bit-identical to the oracle (np.floor == SQL floor)."""
    x = price * (1.0 - discount) * (1.0 + tax)
    return np.floor(x * 100.0 + 0.5) / 100.0


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over lineitem — the Arrow-vectorized Python path."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        net_price_pandas("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


UDF_PANDAS_SQL = """
SELECT l_orderkey,
       floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0 + 0.5) / 100.0
         AS net_price
FROM lineitem
WHERE l_linenumber = 1
"""


def _priority_class(p: str) -> str:
    return "urgent" if p in ("1-URGENT", "2-HIGH") else "normal"


def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (slow path — each row crosses the JVM↔Python
    boundary pickled; ~10-100x slower than the pandas UDF; never use in a
    100 TB hot path, shown for API-surface completeness)."""
    prio_udf = F.udf(_priority_class, StringType())
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(prio_udf("o_orderpriority").alias("prio_class"))
        .groupBy("prio_class")
        .agg(F.count("*").alias("n_orders"))
    )


UDF_PYTHON_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'urgent' ELSE 'normal' END AS prio_class,
       count(*) AS n_orders
FROM orders
GROUP BY 1
"""


def _demean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: per-segment balance deviation from the segment
    mean. The mean divides an exact integer-cents sum so it is
    order-independent; all subsequent ops are elementwise IEEE."""
    cents = np.floor(pdf["c_acctbal"].to_numpy() * 1000000.0 + 0.5).astype("int64")
    mean = float(cents.sum()) / 1000000.0 / len(cents)
    dev = pdf["c_acctbal"] - mean
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_mktsegment": pdf["c_mktsegment"],
            "bal_dev": np.floor(dev * 100.0 + 0.5) / 100.0,
        }
    )


def udf_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map UDF): the faithful Spark tool for the
    reference's flatMap-shaped Reduce (SURVEY §7 hard-part 1) — full group in
    one pandas frame, arbitrary n-rows-out."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").groupBy(
        "c_mktsegment"
    ).applyInPandas(_demean_group, "c_custkey bigint, c_mktsegment string, bal_dev double")


UDF_GROUPED_SQL = """
WITH m AS (
  SELECT c_mktsegment,
         CAST(sum(CAST(floor(c_acctbal * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000.0 / count(*) AS seg_mean
  FROM customer GROUP BY c_mktsegment)
SELECT c_custkey, c.c_mktsegment,
       floor((c_acctbal - seg_mean) * 100.0 + 0.5) / 100.0 AS bal_dev
FROM customer c JOIN m ON c.c_mktsegment = m.c_mktsegment
"""


def udf_mapinpandas_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (iterator-of-batches UDF): per-partition streaming pass —
    here a partition-local row counter proving batch iteration; aggregated to
    a deterministic total so the oracle can check it."""
    o = load_table(spark, sf_dir, "orders")

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "o_orderstatus": pdf["o_orderstatus"],
                    "one": np.ones(len(pdf), dtype="int64"),
                }
            )

    return (
        o.select("o_orderstatus")
        .mapInPandas(count_batches, "o_orderstatus string, one bigint")
        .groupBy("o_orderstatus")
        .agg(F.sum("one").alias("n_rows"))
    )


UDF_MAPINPANDAS_SQL = """
SELECT o_orderstatus, count(*) AS n_rows
FROM orders
GROUP BY o_orderstatus
"""


def udf_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row → n rows, the exact shape of the reference's Map
    UDF, ``mrf.h:9``) applied laterally per document: positional tokens.
    Kept off the hot path by design — the same result as posexplode(split()),
    which is what production pipelines should use; this entry verifies the
    UDTF machinery itself."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            # ASCII \s+ split with empties dropped — exactly the oracle's
            # list_filter(string_split_regex(text,'\s+'), x -> x <> '')
            # (RE2 \s is ASCII-only; Python str.split() is not, and DuckDB
            # trim() strips only spaces — both were latent mismatches).
            pos = 0
            for tok in re.split(r"\s+", text or "", flags=re.ASCII):
                if tok:
                    yield pos, tok
                    pos += 1

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.tok
           FROM documents_udtf_v d, LATERAL tokenize_udtf(d.text) t"""
    )


UDF_UDTF_SQL = r"""
SELECT doc_id,
       CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
       unnest(toks) AS tok
FROM (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents)
WHERE len(toks) > 0
"""


def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python batch path — RecordBatches
    straight from the JVM, no pandas conversion. Same IEEE op chain as the
    SQL expression, so oracle-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    l = load_table(spark, sf_dir, "lineitem")

    def net_price(batches):
        for b in batches:
            net = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            net = pc.divide(
                pc.floor(pc.add(pc.multiply(net, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.scalar(100.0),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), net], ["l_orderkey", "net_price"]
            )

    return (
        l.filter(F.col("l_linenumber") == 2)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .mapInArrow(net_price, "l_orderkey bigint, net_price double")
    )


UDF_MAPINARROW_SQL = """
SELECT l_orderkey,
       floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) / 100.0 AS net_price
FROM lineitem
WHERE l_linenumber = 2
"""


@pandas_udf(LongType())  # type object, not a DDL string: decoration happens at
# import time, before any SparkSession exists to parse "long"
def _cents_sum_udaf(cents: pd.Series) -> int:
    """GROUPED_AGG pandas UDAF: exact int64 fold over pre-quantized cents —
    the custom-aggregate API with arithmetic the oracle can replay
    (integer sum is reduction-order independent; a float sum here would
    drift vs DuckDB's ordered fold)."""
    return int(cents.sum())


def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF (the 4th pandas-UDF variant beside
    scalar / applyInPandas / mapInPandas): per return-flag total of exact
    price cents. Spark plans a full shuffle per group for pandas UDAFs (no
    partial aggregation — unlike built-ins, documented trade-off): fine for
    bounded group counts, the wrong tool for high-cardinality keys."""
    l = load_table(spark, sf_dir, "lineitem")
    cents = l.select(
        "l_returnflag",
        F.expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    return cents.groupBy("l_returnflag").agg(
        _cents_sum_udaf("cents").alias("total_cents")
    )


UDF_GROUPED_AGG_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM lineitem GROUP BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "udf_pandas_grouped_agg": QuerySpec(udf_pandas_grouped_agg, UDF_GROUPED_AGG_SQL, "udf"),
    "udf_pandas_scalar": QuerySpec(udf_pandas_scalar, UDF_PANDAS_SQL, "udf"),
    "udf_mapinarrow": QuerySpec(udf_mapinarrow, UDF_MAPINARROW_SQL, "udf"),
    "udf_udtf_tokens": QuerySpec(udf_udtf_tokens, UDF_UDTF_SQL, "udf"),
    "udf_python_scalar": QuerySpec(udf_python_scalar, UDF_PYTHON_SQL, "udf"),
    "udf_grouped_demean": QuerySpec(udf_grouped_demean, UDF_GROUPED_SQL, "udf"),
    "udf_mapinpandas_running": QuerySpec(udf_mapinpandas_running, UDF_MAPINPANDAS_SQL, "udf"),
}


# ---------------------------------------------------------------------------
# Polymorphic UDTF: output schema derived by analyze() from a constant arg
# ---------------------------------------------------------------------------

UDTF_NGRAM_N = 3


def udf_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 POLYMORPHIC Python UDTF: the static `analyze()` hook receives
    the call's arguments at plan time and derives the output schema from the
    constant n — one registered function serves every n-gram width with a
    correctly typed, column-pruned schema (the table-function analogue of a
    generic UDF). The catalog pins n=3: per document, positional word
    trigrams as (pos, w0, w1, w2) rows.

    The reference's UDF surface is a fixed-signature C ABI pair
    (mrf.h:9-11, one Map shape forever); `analyze()` is the Spark-native
    answer to schema-varying user operators.

    Exactness: tokenization is the ASCII \\s+ split shared with
    `udf_udtf_tokens` (RE2/Java/Python agree on ASCII classes); everything
    emitted is strings/ints.

    Scale: a lateral UDTF is a per-row generator — Arrow-batched, no
    shuffle; the n-wide slide is bounded by document length. Production
    n-gram counting should fold to the `wordcount` shape immediately after
    (the `text_bigram_topk` plan); this entry verifies the polymorphic
    machinery itself."""
    import re as _re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not n.isConstantExpression:
                raise ValueError("n must be a constant")
            width = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField("pos", IntegerType())]
                    + [StructField(f"w{i}", StringType()) for i in range(width)]
                )
            )

        def eval(self, text: str, n: int):
            toks = [
                t for t in _re.split(r"\s+", text or "", flags=_re.ASCII) if t
            ]
            for i in range(len(toks) - n + 1):
                yield (i, *toks[i : i + n])

    spark.udtf.register("ngrams_udtf", NGrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_ngram_v"
    )
    return spark.sql(
        f"""SELECT d.doc_id, g.pos, g.w0, g.w1, g.w2
            FROM documents_ngram_v d,
                 LATERAL ngrams_udtf(d.text, {UDTF_NGRAM_N}) g"""
    )


UDF_UDTF_ANALYZE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts
  FROM documents)
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
       ts[u.i] AS w0, ts[u.i + 1] AS w1, ts[u.i + 2] AS w2
FROM toks, unnest(range(1, len(ts) - {UDTF_NGRAM_N} + 2)) AS u(i)
WHERE len(ts) >= {UDTF_NGRAM_N}
"""


QUERIES["udf_udtf_analyze"] = QuerySpec(udf_udtf_analyze, UDF_UDTF_ANALYZE_SQL, "udf")
