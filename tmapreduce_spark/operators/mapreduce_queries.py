"""Catalog entries that exercise the reference-parity MapReduce path itself
(:mod:`tmapreduce_spark.mapreduce`) end-to-end over the documents table, with
SQL oracles expressing the reference's observable output contract.

The reference's charcount job emits, per char key, the flat strings
``[key, str(total)]`` (``/root/reference/example/word_count/word_count.cc:24-34``,
consumed pairwise by ``word_count_client.cc:63-65``). ``apply_df`` surfaces
that as rows ``(key, result)`` — so for every char there are exactly two rows:
``(ch, ch)`` and ``(ch, str(total))``. The oracle reproduces that contract
relationally (histogram UNION ALL histogram-as-strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.mapreduce import MapReduceEngine
from tmapreduce_spark.sources.catalog import load_table


def _kv_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )


def mr_charcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only shipped job (char histogram), run through the
    distributed MapReduce path (Python map/reduce fns over RDDs)."""
    engine = MapReduceEngine(spark)
    return engine.apply_df(_kv_documents(spark, sf_dir), "charcount")


MR_CHARCOUNT_SQL = """
WITH counts AS (
  SELECT ch, count(*) AS total
  FROM (SELECT unnest(string_split(regexp_replace(text, '[^a-z0-9]', '', 'g'), '')) AS ch
        FROM documents) t
  WHERE ch <> ''
  GROUP BY ch)
SELECT ch AS key, ch AS result FROM counts
UNION ALL
SELECT ch AS key, CAST(total AS VARCHAR) AS result FROM counts
"""


def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count through the MapReduce path (map emits (token,'1'), reduce
    sums — the canonical MapReduce program on this engine)."""
    engine = MapReduceEngine(spark)
    return engine.apply_df(_kv_documents(spark, sf_dir), "wordcount")


MR_WORDCOUNT_SQL = r"""
WITH counts AS (
  SELECT tok, count(*) AS total
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents) t
  WHERE tok <> ''
  GROUP BY tok)
SELECT tok AS key, tok AS result FROM counts
UNION ALL
SELECT tok AS key, CAST(total AS VARCHAR) AS result FROM counts
"""


def mr_charcount_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char histogram through the MapReduce path WITH the map-side combiner
    ('charcount+c'): identical results, but the shuffle carries one partial
    count per (partition, char) instead of one record per char occurrence —
    the optimization the reference structurally lacks (all map output
    transits the master and its raft log, ``worker.cc:311-315``)."""
    engine = MapReduceEngine(spark)
    return engine.apply_df(_kv_documents(spark, sf_dir), "charcount+c")


def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep through the MapReduce path — the second canonical
    program from the original MapReduce paper: map emits matching (doc,
    text) pairs (pattern 'spark' baked into the job type, exactly like a
    reference .so), reduce is identity; output is the matching documents
    under the reference's (key, result) contract."""
    engine = MapReduceEngine(spark)
    return engine.apply_df(_kv_documents(spark, sf_dir), "grep-spark")


MR_GREP_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS key, text AS result
FROM documents
WHERE contains(text, 'spark')
"""


def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index through the MapReduce path — the third canonical
    program from the MapReduce paper (§2.3): map emits (word, doc_id),
    reduce emits the word plus its deduped, sorted posting list as one
    comma-joined string, under the reference's flat (key, result) output
    contract. The relational twin is `text_inverted_index` (tf/df
    postings); this entry proves the UDF-pair path produces the same
    index."""
    engine = MapReduceEngine(spark)
    return engine.apply_df(_kv_documents(spark, sf_dir), "invertedindex")


MR_INVERTED_INDEX_SQL = r"""
WITH pairs AS (
  SELECT DISTINCT tok, CAST(doc_id AS VARCHAR) AS d
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents) t
  WHERE tok <> ''),
agg AS (
  SELECT tok, string_agg(d, ',' ORDER BY d) AS ids FROM pairs GROUP BY tok)
SELECT tok AS key, tok AS result FROM agg
UNION ALL
SELECT tok AS key, ids AS result FROM agg
"""


def mr_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed sort through the MapReduce path — the fourth canonical
    program from the MapReduce paper (§2.3 "Distributed Sort", the TeraSort
    shape): map and reduce are both identity; ORDERING comes entirely from
    the framework's key-sort contract (the reference merge-sorts reduce
    input by key, `job.cc:45-66`, and the engine's Finish stage range-
    partitions by key so the concatenated output is globally ordered —
    `tests/test_mapreduce.py` pins that contract; the driver's hash compare
    is order-blind, so the oracle here checks the SET and the ordering
    lives in the test). Sort key = zero-padded (n_chars, doc_id) — the
    composite-key trick that makes numeric order collate lexically."""
    d = load_table(spark, sf_dir, "documents")
    # lpad TRUNCATES strings longer than the pad width, which would corrupt
    # the numeric collation silently — 12/19 digits cover int32 n_chars and
    # the full int64 doc_id range
    kv = d.selectExpr(
        "concat(lpad(CAST(n_chars AS STRING), 12, '0'), ':', "
        "lpad(CAST(doc_id AS STRING), 19, '0')) AS key",
        "CAST(doc_id AS STRING) AS value",
    )
    engine = MapReduceEngine(spark)
    return engine.apply_df(kv, "identity", ordered=True)


MR_SORT_SQL = """
SELECT lpad(CAST(n_chars AS VARCHAR), 12, '0') || ':'
         || lpad(CAST(doc_id AS VARCHAR), 19, '0') AS key,
       CAST(doc_id AS VARCHAR) AS result
FROM documents
"""


def mr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side (repartition) join through the MapReduce path — THE
    canonical join pattern of the MapReduce era (tag each relation in map,
    co-locate on the join key, cross the tagged groups in reduce): nation
    joined to customer on nationkey, emitting "nation|customer" rows under
    the reference's flat (key, result) contract. The relational twin is any
    `join_*` catalog entry; this one proves the two-UDF surface expresses
    joins at all — and documents WHY the relational engine wins: the reduce
    buffer holds one key's entire fan-in (the skew trap `join_salted_skew`
    exists to solve), while Catalyst picks broadcast/SMJ per side and never
    materializes per-key groups."""
    n = load_table(spark, sf_dir, "nation").selectExpr(
        "CAST(n_nationkey AS STRING) AS key", "concat('N:', n_name) AS value"
    )
    c = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_nationkey AS STRING) AS key", "concat('C:', c_name) AS value"
    )
    engine = MapReduceEngine(spark)
    return engine.apply_df(n.unionByName(c), "reducejoin")


MR_JOIN_SQL = """
SELECT CAST(n_nationkey AS VARCHAR) AS key,
       n_name || '|' || c_name AS result
FROM nation JOIN customer ON c_nationkey = n_nationkey
"""


def mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort through the MapReduce path (the canonical pattern the
    reference's key-sorted merge alone cannot provide, `job.cc:45-66`:
    value order within a key is partition-dependent there): per customer,
    the order-status letters concatenated in (order date, zero-padded
    orderkey) order. The sort key travels INSIDE the value
    ("yyyy-MM-dd%012d|payload" — the fixed-width date + zero-padded key
    concatenation sorts lexicographically = chronologically)
    and the reduce sorts its value list — explicit, deterministic under any
    shuffle order, and exactly what Hadoop's composite-key partitioner
    trick achieves implicitly."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(o_custkey AS STRING) AS key",
        "concat(date_format(o_orderdate, 'yyyy-MM-dd'),"
        " lpad(CAST(o_orderkey AS STRING), 12, '0'), '|',"
        " o_orderstatus) AS value",
    )
    engine = MapReduceEngine(spark)
    return engine.apply_df(o, "secondarysort")


MR_SECONDARY_SORT_SQL = """
WITH seq AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key,
         string_agg(o_orderstatus, ''
           ORDER BY strftime(o_orderdate, '%Y-%m-%d'),
                    lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS agg
  FROM orders GROUP BY o_custkey)
SELECT key, key AS result FROM seq
UNION ALL
SELECT key, agg AS result FROM seq
"""


QUERIES: dict[str, QuerySpec] = {
    "mr_sort": QuerySpec(mr_sort, MR_SORT_SQL, "mapreduce"),
    "mr_inverted_index": QuerySpec(mr_inverted_index, MR_INVERTED_INDEX_SQL, "mapreduce"),
    "mr_grep": QuerySpec(mr_grep, MR_GREP_SQL, "mapreduce"),
    "mr_charcount": QuerySpec(mr_charcount, MR_CHARCOUNT_SQL, "mapreduce"),
    "mr_wordcount": QuerySpec(mr_wordcount, MR_WORDCOUNT_SQL, "mapreduce"),
    "mr_charcount_combined": QuerySpec(mr_charcount_combined, MR_CHARCOUNT_SQL, "mapreduce"),
    "mr_join": QuerySpec(mr_join, MR_JOIN_SQL, "mapreduce"),
    "mr_secondary_sort": QuerySpec(
        mr_secondary_sort, MR_SECONDARY_SORT_SQL, "mapreduce"
    ),
}
