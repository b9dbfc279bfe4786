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

from tmapreduce_spark.functions.similarity import N_QUERIES as ANN_QUERIES

N_PLANES = 8
SALT_N = 16


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


# ---------------------------------------------------------------------------
# IVF ANN: coarse-quantizer buckets (inverted file) + exact re-rank in-bucket
# ---------------------------------------------------------------------------

IVF_K = 8  # centroids; "training" stand-in: the first K vectors ARE the
           # centroids (deterministic, oracle-reproducible — production runs
           # k-means and broadcasts the learned centroids the same way)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of IVF_K centroids
    by quantized-exact cosine (int64 dots, ties to the lowest centroid id),
    then answer each query from its own centroid's bucket only (nprobe=1)
    with exact cosine top-k.

    Scale path: assignment is ONE mapInPandas pass over the corpus against
    broadcast centroids (tiny model in the closure — not a data-path
    collect); the query set's own assignments are computed driver-side from
    the already-collected centroid rows (the deterministic query set
    vec_id < ANN_QUERIES is a subset of vec_id < IVF_K), so no second corpus
    scan happens. The inverted file is the `centroid` column: the candidate
    join is a bucket equi-join exactly like the LSH variant, and the corpus
    can be written partitioned/bucketed by centroid at rest. Recall is tuned
    by nprobe (probing the q nearest centroids) — 1 suffices here."""
    import numpy as np
    import pandas as pd

    assert ANN_QUERIES <= IVF_K, "query assignments derive from the centroid collect"

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_rows = e.filter(F.col("vec_id") < IVF_K).orderBy("vec_id").collect()
    C = np.floor(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows])
        * 1_000_000 + 0.5
    ).astype(np.int64)
    c_nrm = np.sqrt(np.einsum("ij,ij->i", C, C).astype(np.float64))

    def nearest_centroids(Q: "np.ndarray") -> "np.ndarray":
        dots = Q @ C.T  # exact int64
        nrm = np.sqrt(np.einsum("ij,ij->i", Q, Q).astype(np.float64))
        cos = dots.astype(np.float64) / (nrm[:, None] * c_nrm[None, :])
        # np.argmax returns the FIRST maximum → ties go to the lowest
        # centroid id, matching the oracle's (cosine DESC, cid ASC).
        return np.argmax(cos, axis=1)

    def assign(batches):
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = nearest_centroids(np.floor(E * 1_000_000 + 0.5).astype(np.int64))
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"), "centroid": best.astype("int32")}
            )

    assigned = e.mapInPandas(assign, "vec_id bigint, centroid int")
    corpus = e.join(assigned, "vec_id")

    # query-side assignment driver-side (queries ⊂ collected centroid rows)
    q_best = nearest_centroids(C[:ANN_QUERIES])
    q = spark.createDataFrame(
        [
            (int(r["vec_id"]), list(r["embedding"]), int(q_best[i]))
            for i, r in enumerate(cent_rows[:ANN_QUERIES])
        ],
        "query_id bigint, q_emb array<float>, q_centroid int",
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("centroid") == F.col("q_centroid")) & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "embedding")

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.floor(np.stack(pdf["q_emb"].to_numpy()).astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
            B = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
            dots = np.einsum("ij,ij->i", A, B)
            na = np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
            nb = np.sqrt(np.einsum("ij,ij->i", B, B).astype(np.float64))
            cos = dots.astype(np.float64) / (na * nb)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype("int64"),
                    "neighbor_id": pdf["neighbor_id"].astype("int64"),
                    "cosine": np.floor(cos * 1e6 + 0.5) / 1e6,
                }
            )

    scored = cand.mapInPandas(score, "query_id bigint, neighbor_id bigint, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def _ivf_sql() -> str:
    from tmapreduce_spark.functions.similarity import _qdot_duck, _quant_duck

    qd = _qdot_duck
    return f"""
WITH q AS (
  SELECT vec_id, {_quant_duck("embedding")} AS qe FROM embeddings),
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id < {IVF_K}),
assign AS (
  SELECT vec_id, cid AS centroid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST({qd('v.qe', 'c.ce')} AS DOUBLE)
                      / (sqrt(CAST({qd('v.qe', 'v.qe')} AS DOUBLE))
                         * sqrt(CAST({qd('c.ce', 'c.ce')} AS DOUBLE))) DESC,
                      c.cid ASC) AS rn
    FROM q v CROSS JOIN cent c) t
  WHERE rn = 1),
corpus AS (SELECT q.vec_id, q.qe, a.centroid FROM q JOIN assign a ON q.vec_id = a.vec_id),
queries AS (SELECT vec_id AS query_id, qe AS q_qe, centroid AS q_centroid
            FROM corpus WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         floor((CAST({qd('q_qe', 'c.qe')} AS DOUBLE)
                / (sqrt(CAST({qd('q_qe', 'q_qe')} AS DOUBLE))
                   * sqrt(CAST({qd('c.qe', 'c.qe')} AS DOUBLE))))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM corpus c JOIN queries ON c.centroid = q_centroid AND c.vec_id <> query_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "ann_lsh_topk": QuerySpec(ann_lsh_topk, ANN_LSH_SQL, "similarity"),
    "ann_ivf_topk": QuerySpec(ann_ivf_topk, _ivf_sql(), "similarity"),
    "salted_token_counts": QuerySpec(salted_token_counts, SALTED_SQL, "aggregation"),
    "approx_distinct_sketch": QuerySpec(approx_distinct_sketch, None, "sketch"),
    "approx_quantiles_sketch": QuerySpec(approx_quantiles_sketch, None, "sketch"),
}
