"""Block-size guard for ``blocked_pair_cosines`` (VERDICT r02 #5): a label
block larger than ``max_block`` must be sub-split by hyperplane LSH bucket so
the intra-block quadratic stays bounded when one label dominates, with the
DuckDB oracle applying the identical rule."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from tmapreduce_spark.functions.similarity import (
    QUANT,
    _buckets_of,
    _pairs_sql,
    blocked_pair_cosines,
)


def _as_pairs(df):
    return {(r["vec_a"], r["vec_b"]): r["cosine"] for r in df.collect()}


@pytest.fixture(scope="module")
def skewcorpus_dir(spark, tmp_path_factory):
    """Synthetic embeddings with one dominant label: label 0 holds 60 vectors
    (30 engineered near-identical pairs: v and a tiny perturbation of v),
    labels 1..3 hold 5 each. dim=16, deterministic values."""
    out = str(tmp_path_factory.mktemp("skewcorpus"))
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for i in range(30):
        v = rng.uniform(-1, 1, 16).astype(np.float32)
        w = (v + np.float32(0.001) * np.sign(v)).astype(np.float32)
        rows.append((vid, [float(x) for x in v], 0))
        rows.append((vid + 1, [float(x) for x in w], 0))
        vid += 2
    for lbl in (1, 2, 3):
        for _ in range(5):
            v = rng.uniform(-1, 1, 16).astype(np.float32)
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_default_guard_inactive_on_testdata(spark):
    """Testdata's largest block (218 at sf0.1) is below MAX_BLOCK: the
    guarded engine must produce the identical pair set to an effectively
    unguarded run."""
    guarded = _as_pairs(blocked_pair_cosines(spark, SF_SMOKE, 0.3))
    unguarded = _as_pairs(blocked_pair_cosines(spark, SF_SMOKE, 0.3, max_block=1 << 30))
    assert guarded == unguarded
    assert guarded  # non-vacuous


def test_dominant_label_subblocked_matches_oracle(spark, duck, skewcorpus_dir):
    """With max_block=8 the 60-vector label is LSH-sub-blocked; the Spark
    result must match the oracle running the identical rule, and every
    emitted pair must keep its exact unguarded cosine (canopy = subset
    semantics, never a changed score)."""
    blocked = _as_pairs(blocked_pair_cosines(spark, skewcorpus_dir, 0.3, max_block=8))
    unblocked = _as_pairs(
        blocked_pair_cosines(spark, skewcorpus_dir, 0.3, max_block=1 << 30)
    )

    duck.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{skewcorpus_dir}/embeddings.parquet/*.parquet'"
    )
    oracle = {
        (a, b): c
        for a, b, _lbl, c in duck.execute(_pairs_sql(0.3, max_block=8)).fetchall()
    }
    assert set(blocked) == set(oracle)
    for p, c in blocked.items():
        assert math.isclose(c, oracle[p], rel_tol=0, abs_tol=0), p

    # subset of the unguarded pairs with identical scores
    assert set(blocked) <= set(unblocked)
    for p, c in blocked.items():
        assert c == unblocked[p], p


def test_subblocking_bounds_quadratic_and_keeps_near_dups(spark, skewcorpus_dir):
    """The dominant label's pair candidates drop from 60*59/2 to the sum of
    per-bucket quadratics, and the engineered near-identical pairs — which
    share a bucket by construction (perturbation preserves every coordinate
    sign, hence every plane-dot sign) — all survive with cosine >= 0.3."""
    rows = (
        spark.read.parquet(f"{skewcorpus_dir}/embeddings.parquet")
        .filter("label = 0")
        .orderBy("vec_id")
        .collect()
    )
    E = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Q = np.floor(E * QUANT + 0.5).astype(np.int64)
    buckets = _buckets_of(Q)
    ids = np.array([r["vec_id"] for r in rows])

    # engineered pairs land in one bucket
    for i in range(0, 60, 2):
        assert buckets[i] == buckets[i + 1], (ids[i], ids[i + 1])

    from collections import Counter

    sizes = Counter(buckets.tolist())
    bounded = sum(k * (k - 1) // 2 for k in sizes.values())
    assert bounded < 60 * 59 // 2  # the quadratic actually shrank
    assert max(sizes.values()) < 60  # the dominant label really split

    blocked = _as_pairs(blocked_pair_cosines(spark, skewcorpus_dir, 0.3, max_block=8))
    for i in range(0, 60, 2):
        assert (int(ids[i]), int(ids[i + 1])) in blocked


def test_pca_power_direction_quality_and_exact_diag(spark):
    """The fixed-point power-iteration direction must capture >= 85% of
    the true top eigenvalue on the SAME quantized Gram (numpy eigh as the
    reference — the random fixture's near-flat spectrum bounds what 8
    rounds can reach; see the operator docstring), must beat a random
    direction's expectation (trace/64 = the mean eigenvalue; the fixture
    spectrum is near-flat, so the top eig is < 2x the mean), and gram_diag must equal
    the exact integer diagonal."""
    import numpy as np

    from tmapreduce_spark.functions.similarity import (
        PCA_Q,
        embedding_pca_power,
    )

    from tmapreduce_spark.sources.catalog import load_table

    rows = embedding_pca_power(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    e = load_table(spark, SF_SMOKE, "embeddings").select("embedding").collect()
    m = np.stack([r["embedding"] for r in e])
    q = np.floor(m.astype(np.float64) * PCA_Q + 0.5).astype(np.int64)
    g = (q.T @ q).astype(np.float64)
    diag = {int(r["dim"]): r["gram_diag"] for r in rows}
    for d in range(64):
        assert diag[d] == int(g[d, d])
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    rayleigh = float(v @ g @ v) / float(v @ v)
    lam_max = float(np.linalg.eigvalsh(g)[-1])
    assert rayleigh >= 0.85 * lam_max, (rayleigh, lam_max)
    assert rayleigh > np.trace(g) / 64
