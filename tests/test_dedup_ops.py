"""Dedup-family scale guards: the stop-shingle document-frequency cap in
``dedup_ngram_jaccard`` (VERDICT r01's one perf-weak flag) must bound the
pair-join fan-out without changing any answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tmapreduce_spark.functions.dedup import SHINGLE_DF_CAP, dedup_ngram_jaccard


def _as_sorted_tuples(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def hotcorpus_dir(spark, tmp_path_factory):
    """Synthetic documents table with an engineered hot shingle: every doc in
    source 'hot' shares the boilerplate prefix 'x y z' (DF = 40 docs), and
    near-duplicate pairs (2i, 2i+1) additionally share a rare per-pair body.
    Docs in source 'solo' contain ONLY boilerplate — their pairwise overlap is
    entirely the hot shingle."""
    out = str(tmp_path_factory.mktemp("hotcorpus"))
    rows = []
    for i in range(20):
        body = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((2 * i, f"x y z {body}", "en", "hot", 0))
        rows.append((2 * i + 1, f"x y z {body} extra{i}", "en", "hot", 0))
    for i in range(6):
        rows.append((100 + i, "x y z", "en", "solo", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_cap_result_identical_on_testdata(spark):
    """Default cap (256) drops nothing at parity scale: identical pair set to
    an effectively-uncapped run."""
    capped = _as_sorted_tuples(dedup_ngram_jaccard(spark, SF_SMOKE))
    uncapped = _as_sorted_tuples(
        dedup_ngram_jaccard(spark, SF_SMOKE, max_shingle_df=1 << 30)
    )
    assert capped == uncapped
    assert capped  # non-vacuous: testdata has passing pairs


def test_hot_shingle_correction_is_exact(spark, hotcorpus_dir):
    """With a cap small enough to classify the boilerplate shingles as hot
    (DF 40 > cap 8), every near-dup pair that shares at least one rare shingle
    must keep its EXACT uncapped jaccard — the hot-array correction restores
    the hot shingles' contribution to the intersection."""
    uncapped = dedup_ngram_jaccard(spark, hotcorpus_dir, max_shingle_df=1 << 30)
    capped = dedup_ngram_jaccard(spark, hotcorpus_dir, max_shingle_df=8)

    un = {(a, b): j for a, b, j in _as_sorted_tuples(uncapped)}
    cp = {(a, b): j for a, b, j in _as_sorted_tuples(capped)}

    # The engineered near-dup pairs (2i, 2i+1) share 12+ rare shingles and
    # must survive with bit-identical scores.
    near_dups = {(2 * i, 2 * i + 1) for i in range(20)}
    assert near_dups <= set(cp)
    for p in near_dups:
        assert cp[p] == un[p]

    # Pairs the cap may drop are exactly those whose whole overlap is hot
    # (the 'solo' boilerplate-only docs) — nothing else may differ.
    dropped = set(un) - set(cp)
    assert all(a >= 100 and b >= 100 for a, b in dropped)
    assert set(cp) <= set(un)


def test_cap_bounds_pair_join_fanout(spark, hotcorpus_dir):
    """The pair-generation join must not explode on the hot shingle: with the
    cap active, the 46-document 'x y z' shingle contributes zero join rows
    (46*45/2 = 1035 would otherwise dominate)."""
    from tmapreduce_spark.functions.dedup import _shingle_rows

    ex = _shingle_rows(spark, hotcorpus_dir, with_source=True)
    dfreq = ex.groupBy("source", "sh").agg(F.count("*").alias("df"))
    hot = dfreq.filter(F.col("df") > 8).select("source", "sh")
    cold = ex.join(F.broadcast(hot), ["source", "sh"], "left_anti")
    a = cold.selectExpr("doc_id AS doc_a", "source AS src_a", "sh AS sh_a")
    b = cold.selectExpr("doc_id AS doc_b", "source AS src_b", "sh AS sh_b")
    join_rows = a.join(
        b,
        (F.col("src_a") == F.col("src_b"))
        & (F.col("sh_a") == F.col("sh_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    ).count()
    # Rare shingles are shared by at most the 2 docs of one engineered pair:
    # the join is bounded by the number of rare shingles, not any DF^2 term.
    assert join_rows <= 20 * 16
    assert SHINGLE_DF_CAP == 256  # default documented in the docstring


# ---------------------------------------------------------------------------
# dedup_span_exact occurrence cap (VERDICT r02 item #1 — the last scale-killer)
# ---------------------------------------------------------------------------


def _spans_as_tuples(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["n_matches"], r["longest_span_tokens"])
        for r in df.collect()
    )


def test_span_cap_identical_on_testdata(spark):
    """Default cap (256) drops nothing at parity scale: identical span set to
    an effectively-uncapped run."""
    from tmapreduce_spark.functions.dedup import SPAN_OCC_CAP, dedup_span_exact

    capped = _spans_as_tuples(dedup_span_exact(spark, SF_SMOKE))
    uncapped = _spans_as_tuples(dedup_span_exact(spark, SF_SMOKE, max_span_occ=1 << 30))
    assert capped == uncapped
    assert capped  # non-vacuous: testdata has shared spans
    assert SPAN_OCC_CAP == 256


@pytest.fixture(scope="module")
def spancorpus_dir(spark, tmp_path_factory):
    """Documents with an engineered hot SPAN: all 46 docs of source 'web'
    open with the same 8-token boilerplate header, so its 5 pure-boilerplate
    windows occur 46 times each. Near-dup pairs (2i, 2i+1) additionally share
    a rare 12-token body; 6 'solo' docs are boilerplate-ONLY."""
    out = str(tmp_path_factory.mktemp("spancorpus"))
    boiler = " ".join(f"b{j}" for j in range(8))
    rows = []
    for i in range(20):
        body = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((2 * i, f"{boiler} {body}", "en", "web", 0))
        rows.append((2 * i + 1, f"{boiler} {body} extra{i}", "en", "web", 0))
    for i in range(6):
        rows.append((100 + i, boiler, "en", "web", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_span_cap_bounds_fanout_and_truncation_semantics(spark, spancorpus_dir):
    """With a cap that classifies the boilerplate windows as hot (46 occ >
    cap 8), pairs whose ENTIRE overlap is boilerplate (1035 - 20 of the 1035
    uncapped pairs) vanish, while the engineered near-dup pairs keep their
    rare-window runs truncated by exactly the hot prefix."""
    from tmapreduce_spark.functions.dedup import SPAN_W, dedup_span_exact

    uncapped = dedup_span_exact(spark, spancorpus_dir, max_span_occ=1 << 30)
    capped = dedup_span_exact(spark, spancorpus_dir, max_span_occ=8)
    un = {(a, b): (n, s) for a, b, n, s in _spans_as_tuples(uncapped)}
    cp = {(a, b): (n, s) for a, b, n, s in _spans_as_tuples(capped)}

    # Uncapped: every same-source doc pair shares the boilerplate windows —
    # the quadratic blowup the cap exists to kill.
    assert len(un) == 46 * 45 // 2
    # Capped: ONLY the engineered near-dup pairs survive; every
    # boilerplate-only overlap is gone.
    near_dups = {(2 * i, 2 * i + 1) for i in range(20)}
    assert set(cp) == near_dups
    for p in near_dups:
        n_cp, s_cp = cp[p]
        n_un, s_un = un[p]
        assert n_cp < n_un and s_cp < s_un  # truncated, not dropped
        # The 20-token shared prefix (8 boiler + 12 rare) has 17 windows;
        # 5 are pure-boilerplate (hot), the 12 touching a rare token survive
        # as one consecutive run -> span of 12 + SPAN_W - 1 = 15 tokens.
        assert n_cp == 12
        assert s_cp == 12 + SPAN_W - 1
        assert s_un == 20  # uncapped sees the full 20-token shared prefix


# ---------------------------------------------------------------------------
# SimHash banding: pigeonhole recall + band-key cardinality
# ---------------------------------------------------------------------------

def test_simhash_band_cardinality_widened():
    """r04 verdict: the 32-bit/8-bit scheme had only 1,024 (band, value)
    buckets, so at 10^9 docs each bucket held ~10^6 candidates and the band
    join went quadratic within buckets. Pin the widened geometry: a 60-bit
    signature in 4x15-bit bands gives 131,072 buckets, and the bands tile
    the signature exactly (no dead bits for the pigeonhole to miss)."""
    from tmapreduce_spark.functions.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_MASK,
        SIMHASH_BITS,
        SIMHASH_PAIR_BANDS,
    )

    assert SIMHASH_PAIR_BANDS * SIMHASH_BAND_BITS == SIMHASH_BITS
    assert SIMHASH_PAIR_BANDS * (SIMHASH_BAND_MASK + 1) == 131072
    # Non-negative BIGINT in both engines: the top bit must stay clear.
    assert SIMHASH_BITS <= 63


def test_simhash_pigeonhole_recall_property():
    """Hypothesis pin of the recall guarantee the banding rests on: for ANY
    pair of 60-bit signatures within hamming <= SIMHASH_PAIR_MAXHAM + 1
    (= the pigeonhole bound for 4 bands), at least one exact band matches,
    so the band equi-join generates the candidate. We generate a signature
    and flip up to 3 random bit positions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tmapreduce_spark.functions.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_MASK,
        SIMHASH_BITS,
        SIMHASH_PAIR_BANDS,
    )

    @settings(max_examples=500, deadline=None)
    @given(
        sig=st.integers(min_value=0, max_value=(1 << SIMHASH_BITS) - 1),
        flips=st.lists(
            st.integers(min_value=0, max_value=SIMHASH_BITS - 1),
            min_size=0,
            max_size=SIMHASH_PAIR_BANDS - 1,
        ),
    )
    def check(sig: int, flips: list[int]) -> None:
        other = sig
        for j in flips:
            other ^= 1 << j
        assert bin(sig ^ other).count("1") <= SIMHASH_PAIR_BANDS - 1
        shared = [
            b
            for b in range(SIMHASH_PAIR_BANDS)
            if (sig >> (b * SIMHASH_BAND_BITS)) & SIMHASH_BAND_MASK
            == (other >> (b * SIMHASH_BAND_BITS)) & SIMHASH_BAND_MASK
        ]
        assert shared, (
            f"hamming<={SIMHASH_PAIR_BANDS - 1} pair shares no band: "
            f"{sig:x} vs {other:x}"
        )

    check()


def test_interval_two_level_banding_complete_property():
    """Hypothesis pin of the two-level interval banding's completeness: for
    ANY interval [s, s+dur] (dur <= the coarse width) and ANY probe ts
    inside it, the probe's single bucket at the interval's level is one of
    the <= 2 buckets the interval explodes into — i.e. the two equi-joins
    of `events_interval_join_mixed` generate every qualifying
    (interval, probe) candidate. Mirrors the exact bucket arithmetic of
    the implementation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tmapreduce_spark.operators.advanced import _IVM_COARSE_US, _IVM_FINE_US

    @settings(max_examples=500, deadline=None)
    @given(
        start=st.integers(min_value=0, max_value=10**15),
        dur=st.integers(min_value=0, max_value=_IVM_COARSE_US - 1),
        frac=st.floats(min_value=0.0, max_value=1.0),
    )
    def check(start: int, dur: int, frac: float) -> None:
        end = start + dur
        ts = start + int(dur * frac)
        assert start <= ts <= end
        width = _IVM_FINE_US if dur <= _IVM_FINE_US else _IVM_COARSE_US
        iv_buckets = set(range(start // width, end // width + 1))
        # the interval overlaps <= 2 buckets of its level (emission bound)
        assert len(iv_buckets) <= 2
        # completeness: the probe's single bucket at that width is one of them
        assert ts // width in iv_buckets

    check()


def test_interval_overlap_canonical_bucket_exactly_once_property():
    """Hypothesis pin of `join_interval_overlap`'s exactly-once guarantee:
    for ANY overlapping pair, the canonical bucket (max(start) div W) lies
    in BOTH intervals' exploded bucket sets (completeness), and it is by
    construction unique (no double-count) — so the equi-join + canonical
    filter emits each overlapping pair exactly once, with no DISTINCT."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tmapreduce_spark.operators.advanced import (
        _OVL_ERR_US,
        _OVL_PUR_US,
        _OVL_W_US,
    )

    @settings(max_examples=500, deadline=None)
    @given(
        sa=st.integers(min_value=0, max_value=10**15),
        sb_off=st.integers(min_value=-2 * _OVL_W_US, max_value=2 * _OVL_W_US),
    )
    def check(sa: int, sb_off: int) -> None:
        sb = max(0, sa + sb_off)
        ea, eb = sa + _OVL_ERR_US, sb + _OVL_PUR_US
        if not (sa <= eb and sb <= ea):
            return  # non-overlapping pairs never pass the residual predicate
        canon = max(sa, sb) // _OVL_W_US
        a_buckets = set(range(sa // _OVL_W_US, ea // _OVL_W_US + 1))
        b_buckets = set(range(sb // _OVL_W_US, eb // _OVL_W_US + 1))
        assert len(a_buckets) <= 2 and len(b_buckets) <= 2  # emission bound
        assert canon in a_buckets and canon in b_buckets

    check()
