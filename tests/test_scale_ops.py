"""Tests for scale-path operators: LSH ANN recall vs brute force, salted
aggregation equivalence, sketch accuracy bounds."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tmapreduce_spark.functions.scale import (
    ann_lsh_topk,
    sketch_kmv_distinct,
    sketch_sample_quantiles,
    salted_token_counts,
)
from tmapreduce_spark.functions.similarity import ann_topk_cosine
from tmapreduce_spark.functions.text import wordcount
from tmapreduce_spark.sources.catalog import load_table


def test_lsh_bucket_prunes_but_finds_near_neighbors(spark):
    """LSH top-k must be a subset of each query's bucket and overlap the
    brute-force top-k on the nearest ranks (same-bucket vectors are the
    similar ones by construction)."""
    lsh = ann_lsh_topk(spark, SF_CORRECT).collect()
    brute = ann_topk_cosine(spark, SF_CORRECT).collect()
    assert lsh, "LSH returned nothing"
    lsh_best = {r["query_id"]: r["cosine"] for r in lsh if r["rank"] == 1}
    brute_all = {}
    for r in brute:
        brute_all.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # every LSH rank-1 neighbor should be among brute-force's top-10 OR have a
    # cosine no worse than brute's rank-10 (bucket may exclude some top hits).
    brute_rank10 = {
        r["query_id"]: r["cosine"] for r in brute if r["rank"] == 10
    }
    for qid, best in lsh_best.items():
        assert best >= brute_rank10[qid] - 0.2


def test_salted_equals_direct(spark):
    a = {(r["tok"], r["total"]) for r in salted_token_counts(spark, SF_CORRECT).collect()}
    b = {(r["tok"], r["total"]) for r in wordcount(spark, SF_CORRECT).collect()}
    assert a == b


def test_approx_distinct_within_rsd(spark):
    """KMV estimate (k=32) within 30% of the exact per-type distinct count
    (theory rsd ~ 1/sqrt(k-2) ~ 18%), and the sketch's own calibration
    column agrees with an independently computed exact count."""
    e = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = sketch_kmv_distinct(spark, SF_CORRECT).collect()
    for r in rows:
        n = exact[r["event_type"]]
        assert r["exact_users"] == n
        assert abs(r["kmv_users"] - n) <= max(0.30 * n, 2), (r, n)
        # exact branch: with fewer distinct values than k the sketch IS the set
        if r["k_used"] < 32:
            assert r["kmv_users"] == float(r["exact_users"])


def test_approx_quantiles_close_to_exact(spark):
    """Bottom-k-hash sample quantiles within 5% of exact, and the entry's
    own exact column agrees with Spark's percentile() on the p50 row."""
    o = load_table(spark, SF_CORRECT, "orders")
    exact = {
        r["o_orderstatus"]: r["p"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p"))
        .collect()
    }
    rows = sketch_sample_quantiles(spark, SF_CORRECT).collect()
    assert {tuple(sorted(r.asDict())) for r in rows} == {
        tuple(sorted(("o_orderstatus", "pct", "sample_n", "est_value",
                      "exact_value", "rel_err")))
    }
    assert {r["pct"] for r in rows} == {"p50", "p90", "p99"}
    for r in rows:
        assert abs(r["est_value"] - r["exact_value"]) / r["exact_value"] < 0.05
        if r["pct"] == "p50":
            # type-1 discrete median within one grid step of the interpolated one
            assert abs(r["exact_value"] - exact[r["o_orderstatus"]]) / exact[
                r["o_orderstatus"]
            ] < 0.02


def test_ivf_bucket_finds_near_neighbors(spark):
    """IVF (nprobe=1) rank-1 neighbors must be competitive with brute-force:
    in-bucket vectors share the query's nearest centroid, so the best
    in-bucket cosine should not trail brute-force rank-10 by much."""
    from tmapreduce_spark.functions.scale import ann_ivf_topk

    ivf = ann_ivf_topk(spark, SF_CORRECT).collect()
    brute = ann_topk_cosine(spark, SF_CORRECT).collect()
    assert ivf, "IVF returned nothing"
    ivf_best = {r["query_id"]: r["cosine"] for r in ivf if r["rank"] == 1}
    brute_rank10 = {r["query_id"]: r["cosine"] for r in brute if r["rank"] == 10}
    for qid, best in ivf_best.items():
        assert best >= brute_rank10[qid] - 0.2


def test_hash_sample_invariant_under_repartitioning(spark):
    """The hash-bucket sample must be identical regardless of physical
    partitioning — the reproducibility property rand()-based sampling lacks."""
    from tmapreduce_spark.functions.text import SAMPLE_KEEP, sample_bucket_col
    from pyspark.sql import functions as F

    d = load_table(spark, SF_CORRECT, "documents")
    base = {
        r["doc_id"]
        for r in d.withColumn("b", sample_bucket_col()).filter(F.col("b") < SAMPLE_KEEP).select("doc_id").collect()
    }
    shuffled = {
        r["doc_id"]
        for r in d.repartition(17, "lang").withColumn("b", sample_bucket_col()).filter(F.col("b") < SAMPLE_KEEP).select("doc_id").collect()
    }
    assert base == shuffled and base

def _recall_at_10(approx_rows, exact_rows):
    """Mean per-query |approx top-10 ∩ exact top-10| / 10."""
    ex, ap = {}, {}
    for r in exact_rows:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx_rows:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ap.get(q, set()) & ns) / len(ns) for q, ns in ex.items()]
    return sum(recalls) / len(recalls)


def test_ann_recall_knobs_monotone_and_floored(spark):
    """The recall knobs must actually buy recall: multi-probe LSH (probe_bits)
    and IVF nprobe candidate sets are supersets of their base variants, so
    recall@10 vs the exact baseline is monotone non-decreasing — and the
    widened settings must clear an absolute floor."""
    from tmapreduce_spark.functions.scale import ann_ivf_topk

    exact = ann_topk_cosine(spark, SF_CORRECT).collect()

    r_lsh = {
        p: _recall_at_10(ann_lsh_topk(spark, SF_CORRECT, probe_bits=p).collect(), exact)
        for p in (0, 1, 2)
    }
    assert r_lsh[0] <= r_lsh[1] <= r_lsh[2], r_lsh
    # measured on this testdata: 0.04 / 0.26 / 0.46 — 8 sign-planes are a
    # coarse partition; the knob's job is the monotone climb.
    assert r_lsh[2] >= 0.4, r_lsh

    r_ivf = {
        n: _recall_at_10(ann_ivf_topk(spark, SF_CORRECT, nprobe=n).collect(), exact)
        for n in (1, 2, 4, 8)
    }
    assert r_ivf[1] <= r_ivf[2] <= r_ivf[4] <= r_ivf[8], r_ivf
    # nprobe=8 probes every centroid => candidate set == full corpus => exact.
    assert r_ivf[8] == 1.0, r_ivf
    assert r_ivf[4] >= 0.5, r_ivf

    from tmapreduce_spark.functions.scale import ann_pq_topk

    r_pq = _recall_at_10(ann_pq_topk(spark, SF_CORRECT).collect(), exact)
    # PQ compresses 64 floats to 4 codeword ids from an UNTRAINED 16-word
    # sampled codebook over near-random synthetic vectors — measured 0.32,
    # i.e. 16x the random-ranking baseline (10/500 = 0.02). The floor guards
    # against the scoring pipeline regressing to noise; real recall comes
    # from k-means-trained codebooks, which the plumbing is agnostic to.
    assert r_pq >= 0.15, r_pq
    print("recall@10:", {"lsh": r_lsh, "ivf": r_ivf, "pq": r_pq})


def test_shard_output_is_balanced_and_deterministic(spark):
    """pipeline_shard_output: every shard populated, hash balance within the
    bound a loader can schedule around (md5 uniformity: max/min < 3x at 500
    docs / 64 shards; the ratio tightens as corpus/shard grows), and the
    assignment is replayable — two runs produce identical membership."""
    from tmapreduce_spark.functions.text import N_SHARDS, pipeline_shard_output

    rows = {r["shard"]: r for r in pipeline_shard_output(spark, SF_CORRECT).collect()}
    assert len(rows) == N_SHARDS
    counts = [r["n_docs"] for r in rows.values()]
    # 500 docs / 64 shards is deep in Poisson territory (mean ~7.8) — bound
    # each tail against the mean, not min/max against each other
    mean = sum(counts) / len(counts)
    assert max(counts) < 2.5 * mean, sorted(counts)
    assert min(counts) > 0.2 * mean, sorted(counts)
    again = {r["shard"]: r for r in pipeline_shard_output(spark, SF_CORRECT).collect()}
    assert {k: v["min_doc"] for k, v in rows.items()} == {
        k: v["min_doc"] for k, v in again.items()
    }


def test_hll_partition_merge_accuracy_and_consistency(spark):
    """sketch_hll_md5_merge: the day-merged md5-register HLL estimates
    true per-type distinct users within HLL(m=256) error (~6.5% rsd in the
    raw branch, tighter in linear counting; allow 15%), and merging is
    LOSSLESS — registers built per day and max-merged equal registers built
    directly over the unpartitioned data (max is associative), so the
    merged estimate equals the direct estimate exactly."""
    from pyspark.sql import functions as F
    from tmapreduce_spark.functions.scale import _hll_sql, SPARK
    from tmapreduce_spark.functions.scale import sketch_hll_md5_merge
    from tmapreduce_spark.sources.catalog import load_table

    rows = sketch_hll_md5_merge(spark, SF_CORRECT).collect()
    merged = {r["event_type"]: r["hll_users"] for r in rows}
    e = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    # direct (no daily grain): same registers built in one pass over all rows
    e.createOrReplaceTempView("_hll_events")
    direct_sql = _hll_sql(SPARK, "_hll_events").replace(
        "CAST(ts AS DATE) AS day", "CAST('1970-01-01' AS DATE) AS day"
    )
    direct = {r["event_type"]: r["hll_users"] for r in spark.sql(direct_sql).collect()}
    assert set(merged) == set(exact)
    for t, est in merged.items():
        assert abs(est - exact[t]) / exact[t] < 0.15, (t, est, exact[t])
        assert est == direct[t], (t, est, direct[t])  # lossless max-merge
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]


def test_mg_candidates_superset_under_decrement(spark):
    """Misra-Gries candidate pass with vocab ≫ k (the decrement branch the
    tiny-vocab testdata never hits): the surviving candidate set must still
    be a superset of every token with global count > total/(k+1), on a
    skewed synthetic stream spread across partitions."""
    from tmapreduce_spark.functions.text import mg_candidates

    rows = []
    # 5 hot tokens (600 each), 3000 unique cold tokens: total = 6000
    for h in range(5):
        rows += [(f"hot{h}",)] * 600
    rows += [(f"cold{i}",) for i in range(3000)]
    # deterministic interleave so hot tokens span all partitions — crc32,
    # not hash(): Python's str hash is salted per process (PYTHONHASHSEED),
    # which would make the layout unreproducible across runs
    rows.sort(key=lambda r: zlib.crc32(r[0].encode()) % 997)
    toks = spark.createDataFrame(rows, "tok string").repartition(8)

    k = 10
    cands = {r["tok"] for r in mg_candidates(toks, k).collect()}
    assert len(cands) <= 8 * k + 5  # bounded by k per partition
    total = len(rows)
    exact = {
        r["tok"]
        for r in toks.groupBy("tok").count().filter(F.col("count") * (k + 1) > total).collect()
    }
    assert exact  # the 5 hot tokens qualify: 600 * 11 > 6000
    assert exact <= cands, f"MG dropped true heavy hitters: {exact - cands}"


def test_zorder_key_bijective_and_local(spark):
    """The Morton key must decode back to exactly (cust_bucket, price_bucket)
    for every row (bijectivity on the 20-bit domain), and the top-level
    quadrant of the key must equal the top bit of each dimension — the
    property that makes zkey ranges prune BOTH dimensions' parquet stats."""
    from tmapreduce_spark.operators.advanced import layout_zorder_key

    rows = layout_zorder_key(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        z, x, y = r["zkey"], r["cust_bucket"], r["price_bucket"]
        dx = dy = 0
        for i in range(10):
            dx |= ((z >> (2 * i)) & 1) << i
            dy |= ((z >> (2 * i + 1)) & 1) << i
        assert (dx, dy) == (x, y), f"decode mismatch for zkey {z}"
        # top-level quadrant = (bit9 of x, bit9 of y)
        assert (z >> 18) & 1 == (x >> 9) & 1
        assert (z >> 19) & 1 == (y >> 9) & 1


def test_ann_ivf_pq_recall_floor(spark):
    """IVFPQ composes both approximations, so its recall sits at or below
    single-probe IVF (same bucket restriction, plus lossy codes) while
    clearing an absolute floor well above random ranking (10/500 = 0.02).
    Measured on this testdata: IVFPQ 0.40 vs IVF(1) 0.90, PQ-only 0.32."""
    from tmapreduce_spark.functions.scale import ann_ivf_pq_topk, ann_ivf_topk

    exact = ann_topk_cosine(spark, SF_CORRECT).collect()
    r_ivfpq = _recall_at_10(ann_ivf_pq_topk(spark, SF_CORRECT).collect(), exact)
    r_ivf = _recall_at_10(ann_ivf_topk(spark, SF_CORRECT).collect(), exact)
    assert r_ivfpq >= 0.2, r_ivfpq
    assert r_ivfpq <= r_ivf, (r_ivfpq, r_ivf)


def test_kmeans_fit_converges_and_is_deterministic(spark):
    """The full Lloyd loop must (a) assign every vector each round,
    (b) reduce the max centroid shift to below the first iteration's, and
    (c) reproduce bit-identical centroids on a second fit."""
    import numpy as np

    from tmapreduce_spark.functions.scale import kmeans_fit

    C1, hist1 = kmeans_fit(spark, SF_CORRECT, max_iter=5)
    assert len(hist1) >= 2
    n_vecs = load_table(spark, SF_CORRECT, "embeddings").count()
    for _, _, sizes in hist1:
        assert sum(sizes.values()) == n_vecs
    first_shift = hist1[0][1]
    last_shift = hist1[-1][1]
    assert last_shift < first_shift, hist1
    C2, hist2 = kmeans_fit(spark, SF_CORRECT, max_iter=5)
    assert np.array_equal(C1, C2)
    assert [h[1] for h in hist1] == [h[1] for h in hist2]
