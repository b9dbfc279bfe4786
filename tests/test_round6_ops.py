"""Semantic invariants for the round-6 operators: BPE merge training vs an
independent pure-Python reference (including greedy non-overlap edge cases on
a crafted corpus), Welch t-test vs numpy moments, CUPED theta/adjustment vs
the textbook definition."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tmapreduce_spark.functions.text import BPE_MERGES, tokenizer_bpe_merges
from tmapreduce_spark.operators.analytics import (
    CUPED_SPLIT_TS,
    agg_welch_ttest,
    events_cuped_adjusted_lift,
)
from tmapreduce_spark.sources.catalog import load_table


def _bpe_reference(word_freq: dict[str, int], k: int):
    """Textbook BPE trainer: adjacent pair counts over the vocabulary,
    deterministic (count DESC, a, b) top-1, greedy left-to-right merge."""
    syms = {w: list(w) for w in word_freq}
    rules = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + word_freq[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, a, b, a + b, cnt))
        for w, s in syms.items():
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return rules


def test_bpe_merges_match_python_reference(spark):
    """The distributed trainer must reproduce the textbook algorithm on the
    real corpus word-frequency table."""
    wf = {
        r["w"]: r["c"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .selectExpr(r"explode(split(trim(lower(text)), '\\s+')) AS w")
        .filter("w != ''")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    expect = _bpe_reference(wf, BPE_MERGES)
    got = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"])
        for r in tokenizer_bpe_merges(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_bpe_greedy_nonoverlap_on_crafted_corpus(spark, tmp_path):
    """Greedy left-to-right non-overlap: a corpus dominated by 'aaaa' must
    merge (a,a) counting 3 adjacent pairs per word but apply it as
    [aa, aa] (2 non-overlapping), so round 2's top pair is (aa, aa)."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa b")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(os.path.join(tmp_path, "documents.parquet"))
    rules = tokenizer_bpe_merges(spark, str(tmp_path)).collect()
    assert (rules[0]["sym_a"], rules[0]["sym_b"], rules[0]["pair_count"]) == ("a", "a", 9)
    assert (rules[1]["sym_a"], rules[1]["sym_b"], rules[1]["pair_count"]) == ("aa", "aa", 3)


def test_welch_matches_numpy_moments(spark):
    """t statistic and Welch–Satterthwaite df recomputed from the raw cents
    samples with numpy must agree to the mround(6) grid."""
    import numpy as np

    e = load_table(spark, SF_SMOKE, "events")
    vals = {
        t: np.array(
            [
                int(math.floor(r["value"] * 100 + 0.5))
                for r in e.filter(
                    (F.col("event_type") == t) & F.col("value").isNotNull()
                ).collect()
            ],
            dtype=np.int64,
        )
        for t in ("click", "view")
    }
    a, b = vals["click"] / 100.0, vals["view"] / 100.0
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 * se2 / (
        va * va / (len(a) ** 2 * (len(a) - 1)) + vb * vb / (len(b) ** 2 * (len(b) - 1))
    )
    row = agg_welch_ttest(spark, SF_SMOKE).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["t_stat"] - t) < 2e-6
    assert abs(row["welch_df"] - df) < 2e-6


def test_cuped_theta_and_adjustment_definition(spark):
    """theta must equal pooled cov(pre, post)/var(pre) over per-user cents
    sums, and each arm's adjusted mean must equal
    mean_post − θ·(mean_pre − global mean_pre)."""
    import numpy as np

    e = load_table(spark, SF_SMOKE, "events")
    rows = e.filter(F.col("value").isNotNull()).selectExpr(
        "user_id",
        f"CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS pre",
        f"CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS post",
    ).groupBy("user_id").agg(F.sum("pre").alias("pre"), F.sum("post").alias("post")).collect()
    pre = np.array([r["pre"] for r in rows], dtype=np.float64)
    post = np.array([r["post"] for r in rows], dtype=np.float64)
    arm = np.array([r["user_id"] % 2 for r in rows])
    n = len(pre)
    theta = ((n * (pre * post).sum() - pre.sum() * post.sum())
             / (n * (pre * pre).sum() - pre.sum() ** 2))
    out = {r["arm"]: r for r in events_cuped_adjusted_lift(spark, SF_SMOKE).collect()}
    assert abs(out[0]["theta"] - theta) < 2e-6
    for g in (0, 1):
        m_post = post[arm == g].mean() / 100
        m_pre = pre[arm == g].mean() / 100
        adj = m_post - theta * (m_pre - pre.mean() / 100)
        assert abs(out[g]["mean_post_adjusted"] - adj) < 2e-6
        assert abs(out[g]["mean_post"] - m_post) < 2e-6


def test_wav_decoder_walks_chunks_honestly():
    """The WAV parser must tolerate an extra chunk before fmt/data and
    odd-size chunk padding, reject non-RIFF payloads, and gate compressed
    formats behind NotImplementedError — never silently misread."""
    import struct

    import pytest

    from tmapreduce_spark.functions.multimodal import decode_wav, encode_wav

    samples = [0, 1000, -1000, 32767, -32768, 7]
    wav = encode_wav(8000, samples)
    rate, got = decode_wav(wav)
    assert (rate, got) == (8000, samples)

    # splice an odd-size LIST chunk between WAVE and fmt: parsers that
    # assume the canonical 44-byte layout break here
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # padded
    spliced = wav[:12] + extra + wav[12:]
    rate2, got2 = decode_wav(spliced)
    assert (rate2, got2) == (8000, samples)

    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))

    # format tag 2 = ADPCM → honest gate
    bad = bytearray(wav)
    bad[20] = 2
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_wav_energy_frame_split_boundaries(spark):
    """A clip whose length is NOT a WAV_FRAME multiple must count its
    ragged tail frame against a proportionally smaller threshold (mean
    rule), matching the oracle's least() bound — recompute by hand a doc
    PROVEN to have a ragged tail (a doc whose n is a frame multiple would
    silently skip the boundary branch this test exists to pin)."""
    from tmapreduce_spark.functions.multimodal import (
        WAV_ACTIVE_MEAN,
        WAV_FRAME,
        _wav_params,
        _wav_sample,
        multimodal_wav_energy,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").orderBy("doc_id").limit(8).collect()
    d = next(x for x in docs if _wav_params(x["text"].encode())[1] % WAV_FRAME != 0)
    row = next(
        r
        for r in multimodal_wav_energy(spark, SF_SMOKE).collect()
        if r["doc_id"] == d["doc_id"]
    )
    seed, n = _wav_params(d["text"].encode())
    assert n % WAV_FRAME != 0
    a = [abs(_wav_sample(seed, i)) for i in range(n)]
    frames = [a[f : f + WAV_FRAME] for f in range(0, n, WAV_FRAME)]
    active = sum(1 for fr in frames if sum(fr) >= WAV_ACTIVE_MEAN * len(fr))
    assert row["n_samples"] == n
    assert row["peak_abs"] == max(a)
    assert row["sum_abs"] == sum(a)
    assert row["n_frames"] == len(frames)
    assert row["active_frames"] == active


def test_pass_at_k_estimator_properties(spark):
    """Estimator sanity on real data: bounded in [0, 1], monotone
    non-decreasing in k (drawing more samples can only help), and the mean
    over tasks exactly equals the hand-computed combinatorial definition
    1 − C(n−c, k)/C(n, k)."""
    from math import comb

    from tmapreduce_spark.operators.analytics import PASS_AT_KS, eval_pass_at_k

    rows = {r["k"]: r for r in eval_pass_at_k(spark, SF_SMOKE).collect()}
    means = [rows[k]["mean_pass_at_k"] for k in sorted(rows)]
    assert all(0.0 <= m <= 1.0 for m in means)

    tasks = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")).alias("c"),
        )
        .collect()
    )
    for k in PASS_AT_KS:
        vals = [
            1.0 - comb(r["n"] - r["c"], k) / comb(r["n"], k)
            for r in tasks
            if r["n"] >= k
        ]
        # the engine pre-rounds each estimator to the 1e-9 grid
        grid = [int(math.floor(v * 1e9 + 0.5)) for v in vals]
        expect = math.floor(sum(grid) / 1e9 / len(grid) * 1e6 + 0.5) / 1e6
        assert rows[k]["n_tasks"] == len(vals)
        assert abs(rows[k]["mean_pass_at_k"] - expect) < 1e-9
    # monotone in k on the shared task subset (n >= max k)
    big = [r for r in tasks if r["n"] >= max(PASS_AT_KS)]
    for k1, k2 in zip(sorted(PASS_AT_KS), sorted(PASS_AT_KS)[1:]):
        m1 = sum(1 - comb(r["n"] - r["c"], k1) / comb(r["n"], k1) for r in big)
        m2 = sum(1 - comb(r["n"] - r["c"], k2) / comb(r["n"], k2) for r in big)
        assert m2 >= m1


def test_seasonal_decomposition_identity(spark):
    """observed − trend − seasonal must equal residual on every row (to the
    mround grid), and each (type, hour-of-day) group's residual must be
    centered: the seasonal term absorbed the hour-of-day mean."""
    from collections import defaultdict

    from tmapreduce_spark.operators.analytics import events_seasonal_decompose

    rows = events_seasonal_decompose(spark, SF_SMOKE).collect()
    assert rows
    by_hod = defaultdict(list)
    for r in rows:
        assert abs((r["observed"] - r["trend"] - r["seasonal"]) - r["residual"]) < 2e-6
        by_hod[(r["event_type"], r["hour_of_day"])].append(
            r["observed"] - r["trend"]
        )
    for (_t, _h), detr in by_hod.items():
        seas = [r["seasonal"] for r in rows if (r["event_type"], r["hour_of_day"]) == (_t, _h)][0]
        assert abs(sum(detr) / len(detr) - seas) < 2e-5


def test_wav_vectorized_samples_equal_scalar():
    """The numpy-vectorized synthesis must equal the scalar shared formula
    element-for-element (including the negative wrap at the int16 fold)."""
    from tmapreduce_spark.functions.multimodal import _wav_sample, _wav_samples

    for seed in (0, 1, 65535, 12345):
        vec = _wav_samples(seed, 300)
        assert vec == [_wav_sample(seed, i) for i in range(300)]


def test_countmin_overestimate_invariant_for_every_token(spark):
    """CM guarantee on the WHOLE vocabulary (the catalog query audits only
    the top-10): estimate >= true count for every token, with the python
    md5 mirror independently reproducing the engine's hash/cell layout."""
    import hashlib
    from collections import Counter

    from tmapreduce_spark.functions.scale import CM_D, CM_W

    wf = Counter()
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .selectExpr(r"explode(split(trim(lower(text)), '\\s+')) AS tok")
        .filter("tok != ''")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    ):
        wf[r["tok"]] = r["c"]

    def col(tok: str, row: int) -> int:
        return int(hashlib.md5(f"{tok}#{row}".encode()).hexdigest()[:8], 16) % CM_W

    cells = Counter()
    for tok, c in wf.items():
        for r in range(CM_D):
            cells[(r, col(tok, r))] += c
    for tok, c in wf.items():
        est = min(cells[(r, col(tok, r))] for r in range(CM_D))
        assert est >= c, (tok, est, c)

    # and the python mirror must agree with the engine's audit rows
    from tmapreduce_spark.functions.scale import sketch_countmin_exact

    for row in sketch_countmin_exact(spark, SF_SMOKE).collect():
        est = min(cells[(r, col(row["tok"], r))] for r in range(CM_D))
        assert row["cm_estimate"] == est
        assert row["true_cnt"] == wf[row["tok"]]
        assert row["overestimate"] >= 0


def test_ndcg_bounds_and_perfect_ranking(spark):
    """NDCG must land in [0, 1]; a query whose IVF list reproduces the
    exact list rank-for-rank must score exactly 1."""
    from tmapreduce_spark.functions.scale import ann_ivf_topk, eval_ndcg_ivf
    from tmapreduce_spark.functions.similarity import ann_topk_cosine

    rows = {r["query_id"]: r for r in eval_ndcg_ivf(spark, SF_SMOKE).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["n_exact_hits"] <= 10

    # full independent recompute (same 1e-9 grid) from the two rankings —
    # covers every query, and by construction a rank-for-rank match would
    # hit the compile-time ideal DCG exactly (ndcg = 1)
    from tmapreduce_spark.functions.scale import NDCG_DISCOUNTS, NDCG_IDCG9

    exact = {}
    for r in ann_topk_cosine(spark, SF_SMOKE).collect():
        exact.setdefault(r["query_id"], {})[r["neighbor_id"]] = 11 - r["rank"]
    approx = {}
    for r in ann_ivf_topk(spark, SF_SMOKE).collect():
        approx.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    for q, ranked in approx.items():
        dcg9 = sum(
            int(
                exact[q].get(nb, 0) * NDCG_DISCOUNTS[rank - 1] * 1_000_000_000
                + 0.5
            )
            for rank, nb in ranked.items()
        )
        want = math.floor(dcg9 / NDCG_IDCG9 * 1e6 + 0.5) / 1e6
        assert rows[q]["ndcg"] == want, (q, rows[q]["ndcg"], want)
