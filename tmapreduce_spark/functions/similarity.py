"""Similarity search over the ``embeddings`` table (``array<float>``):
brute-force cosine top-k (the exact baseline) and blocked threshold pairs.

Cosine is computed as an explicit index-ordered left fold in double precision
on BOTH engines (Spark ``aggregate``/``zip_with``, DuckDB
``list_reduce``/``list_transform``), so results are bit-identical — float32
elements cast exactly to double, IEEE mult/add/sqrt/divide are deterministic
given identical operation order.

Scale path: brute-force top-k is a broadcast of the query set against a full
scan of the corpus — linear, shuffle-free, embarrassingly parallel; this is
the correct exact-ANN baseline even at 100 TB when the query set is small.
The sub-linear variant (LSH / IVF bucketing to prune candidates) follows the
same skeleton with a bucket equi-join instead of the crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.sources.catalog import load_table

N_QUERIES = 5  # ann query set: vec_id 0..4
TOP_K = 10


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector stats: dimensionality, L2 norm, mean component."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.selectExpr(
        "vec_id",
        "size(embedding) AS dim",
        f"floor((sqrt({_dot_spark('embedding', 'embedding')})) * 1000000 + 0.5) / 1000000 AS l2_norm",
        "floor((aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE))"
        " / size(embedding)) * 1000000 + 0.5) / 1000000 AS mean_val",
        "label",
    )


EMBEDDING_NORMS_SQL = f"""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       floor((sqrt({_dot_duck('embedding', 'embedding')})) * 1000000 + 0.5) / 1000000 AS l2_norm,
       floor((list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(embedding, v -> CAST(v AS DOUBLE))),
             (acc, v) -> acc + v) / len(embedding)) * 1000000 + 0.5) / 1000000 AS mean_val,
       label
FROM embeddings
"""


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (vec_id < N_QUERIES):
    broadcast queries × scan corpus → per-query top-k via window. Ordering is
    on the rounded score with vec_id tiebreak so ranks are reproducible."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # per-vector norms computed ONCE on each side (not per pair) — same
    # binary value as inlining sqrt(dot(x,x)) at every pair, ~half the flops.
    cand = e.selectExpr(
        "vec_id AS neighbor_id",
        "embedding AS c_emb",
        f"sqrt({_dot_spark('embedding', 'embedding')}) AS c_norm",
    )
    q = q.selectExpr(
        "query_id", "q_emb", f"sqrt({_dot_spark('q_emb', 'q_emb')}) AS q_norm"
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"floor(({_dot_spark('q_emb', 'c_emb')} / (q_norm * c_norm))"
            " * 1000000 + 0.5) / 1000000 AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


ANN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                  sqrt({_dot_duck('embedding', 'embedding')}) AS q_norm
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb,
             sqrt({_dot_duck('embedding', 'embedding')}) AS c_norm
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         floor(({_dot_duck('q_emb', 'c_emb')} / (q_norm * c_norm)) * 1000000 + 0.5) / 1000000
           AS cosine
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


def similarity_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by embedding cosine within a label block
    (cosine >= 0.3). The label acts as the IVF-style bucket: only intra-bucket
    pairs are scored, bounding the quadratic term."""
    e = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "label",
        "embedding",
        f"sqrt({_dot_spark('embedding', 'embedding')}) AS nrm",
    )
    a = e.selectExpr("vec_id AS vec_a", "embedding AS emb_a", "label AS lab_a", "nrm AS nrm_a")
    b = e.selectExpr("vec_id AS vec_b", "embedding AS emb_b", "label AS lab_b", "nrm AS nrm_b")
    return (
        a.join(b, (F.col("lab_a") == F.col("lab_b")) & (F.col("vec_a") < F.col("vec_b")))
        .selectExpr(
            "vec_a",
            "vec_b",
            "lab_a AS label",
            f"floor(({_dot_spark('emb_a', 'emb_b')} / (nrm_a * nrm_b))"
            " * 1000000 + 0.5) / 1000000 AS cosine",
        )
        .filter(F.col("cosine") >= 0.3)
    )


SIMILARITY_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         sqrt({_dot_duck('embedding', 'embedding')}) AS nrm
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         floor(({_dot_duck('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000
           AS cosine
  FROM e a JOIN e b
    ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, label, cosine FROM pairs WHERE cosine >= 0.3
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_norms": QuerySpec(embedding_norms, EMBEDDING_NORMS_SQL, "similarity"),
    "ann_topk_cosine": QuerySpec(ann_topk_cosine, ANN_TOPK_SQL, "similarity"),
    "similarity_pairs_blocked": QuerySpec(similarity_pairs_blocked, SIMILARITY_PAIRS_SQL, "similarity"),
}
