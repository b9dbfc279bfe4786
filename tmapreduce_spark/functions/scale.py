"""Scale-path operators: LSH-bucketed ANN (the sub-linear similarity-search
variant), salted two-phase aggregation (hot-key mitigation), and sketch
aggregates (approx distinct / approx quantiles).

These exist because the brute-force / direct formulations elsewhere in the
catalog stop being viable at 100 TB:

- brute-force ANN is O(|corpus| x |queries|); the LSH variant prunes to
  same-bucket candidates (8 deterministic hyperplanes -> 256 buckets);
- a single hot group key funnels an entire aggregation into one reducer;
  salting fans the partial aggregation across SALT_N sub-keys first;
- exact countDistinct shuffles every distinct value; HyperLogLog ships
  fixed-size sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.functions.similarity import TOP_K, _dot_duck, _dot_spark
from tmapreduce_spark.sources.catalog import load_table

N_PLANES = 8
SALT_N = 16
ANN_QUERIES = 5


def _plane_dot_spark(j: int) -> str:
    # deterministic integer hyperplane weights w(i,j) = ((i*31 + j*17) % 7) - 3;
    # Spark arrays are 0-based.
    return (
        f"aggregate(sequence(0, size(embedding) - 1), CAST(0 AS DOUBLE), "
        f"(acc, i) -> acc + CAST(embedding[i] AS DOUBLE) * "
        f"CAST((i * 31 + {j} * 17) % 7 - 3 AS DOUBLE))"
    )


def _plane_dot_duck(j: int) -> str:
    # DuckDB lists are 1-based: weight index shifts by one.
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len(embedding) + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * "
        f"CAST(((i - 1) * 31 + {j} * 17) % 7 - 3 AS DOUBLE))), (acc, v) -> acc + v)"
    )


def _bucket_spark() -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_spark(j)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )


def _bucket_duck() -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_duck(j)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-linear ANN: random-hyperplane LSH buckets (deterministic planes so
    the oracle reproduces them), candidates restricted to the query's bucket,
    exact cosine + top-k inside the bucket.

    At 100 TB this is a bucket equi-join instead of a crossJoin: the corpus
    side shuffles once on bucket id (or is written bucketed at rest), and each
    query probes ~1/256th of the data. Recall is tunable by multi-probe
    (querying neighboring buckets) — not needed for the parity check."""
    e = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "embedding",
        f"({_bucket_spark()}) AS bucket",
        f"sqrt({_dot_spark('embedding', 'embedding')}) AS nrm",
    )
    q = e.filter(F.col("vec_id") < ANN_QUERIES).selectExpr(
        "vec_id AS query_id", "embedding AS q_emb", "bucket AS q_bucket", "nrm AS q_norm"
    )
    scored = (
        e.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")))
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"floor(({_dot_spark('q_emb', 'embedding')} / (q_norm * nrm))"
            " * 1000000 + 0.5) / 1000000 AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         ({_bucket_duck()}) AS bucket,
         sqrt({_dot_duck('embedding', 'embedding')}) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket, nrm AS q_norm
      FROM e WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         floor(({_dot_duck('q_emb', 'e.embedding')} / (q_norm * e.nrm)) * 1000000 + 0.5) / 1000000
           AS cosine
  FROM e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


def salted_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: tokens counted per (token, salt) first,
    then merged per token. The result is identical to a direct groupBy; the
    point is the SHAPE — with a pathologically hot key (a stop-word at 100 TB)
    phase one spreads that key across SALT_N reducers, and phase two merges
    SALT_N tiny partials. AQE's skew handling covers joins; salting is the
    equivalent lever for aggregations when a single key dominates.

    Salt derives from doc_id (deterministic) rather than rand() so the
    pipeline stays replayable and oracle-checkable — the merged result is
    salt-invariant anyway."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.selectExpr(
        "doc_id",
        r"explode(split(trim(text), '\\s+')) AS tok",
    ).filter(F.col("tok") != "")
    phase1 = (
        toks.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(SALT_N)))
        .groupBy("tok", "salt")
        .agg(F.count("*").alias("partial_cnt"))
    )
    return phase1.groupBy("tok").agg(F.sum("partial_cnt").alias("total"))


SALTED_SQL = r"""
SELECT tok, count(*) AS total
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents) t
WHERE tok <> ''
GROUP BY tok
"""


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per event type. NO oracle entry:
    sketch estimates are engine-specific by construction (DuckDB's HLL would
    disagree); accuracy is asserted in tests against the exact count (rsd 5%).
    At 100 TB this replaces an exact countDistinct whose shuffle would carry
    every distinct user id."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles of order totals. NO oracle
    (sketch-specific); tests bound the error against exact percentiles."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").alias("pcts")
    )


QUERIES: dict[str, QuerySpec] = {
    "ann_lsh_topk": QuerySpec(ann_lsh_topk, ANN_LSH_SQL, "similarity"),
    "salted_token_counts": QuerySpec(salted_token_counts, SALTED_SQL, "aggregation"),
    "approx_distinct_sketch": QuerySpec(approx_distinct_sketch, None, "sketch"),
    "approx_quantiles_sketch": QuerySpec(approx_quantiles_sketch, None, "sketch"),
}
