"""Hypothesis property tests for the round-10 operator cores: the pure
mathematical identities the engines' shared SQL text relies on, checked on
random inputs in plain Python (no Spark session needed)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --- Haar energy core (events_haar_energy) --------------------------------


def _haar_energies(counts: list[int]) -> dict[int, int]:
    n = len(counts)
    levels = n.bit_length() - 1
    out = {}
    for lvl in range(1, levels + 1):
        blk, half = 1 << lvl, 1 << (lvl - 1)
        d = [
            sum(counts[b : b + half]) - sum(counts[b + half : b + blk])
            for b in range(0, n, blk)
        ]
        out[lvl] = sum(x * x for x in d)
    return out


@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=64, max_size=64))
@settings(max_examples=200, deadline=None)
def test_haar_parseval_identity(counts):
    """Orthogonality of the unnormalized Haar basis: sum over levels of
    energy_j / 2^j plus S^2/n equals sum c^2 exactly — the invariant that
    makes the per-level integer energies a true decomposition and not just
    ad-hoc statistics. Exact in rationals: checked with integer
    cross-multiplication (common denominator n = 2^levels)."""
    n = len(counts)
    energies = _haar_energies(counts)
    s = sum(counts)
    # n * sum(c^2) == sum_j (n / 2^j) * E_j + s^2
    lhs = n * sum(c * c for c in counts)
    rhs = sum((n >> j) * e for j, e in energies.items()) + s * s
    assert lhs == rhs


@given(st.lists(st.integers(min_value=0, max_value=100), min_size=64, max_size=64),
       st.integers(min_value=0, max_value=1000))
@settings(max_examples=100, deadline=None)
def test_haar_dc_shift_leaves_detail_invariant(counts, shift):
    """Adding a constant to every cell leaves every DETAIL energy unchanged
    (Haar details are differences) — the property that makes the levels a
    pure variability readout independent of the base rate."""
    assert _haar_energies(counts) == _haar_energies([c + shift for c in counts])


# --- Runs-test core (agg_runs_test) ----------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=1), min_size=2, max_size=400))
@settings(max_examples=200, deadline=None)
def test_runs_count_identity(signs):
    """R = 1 + number of adjacent sign changes (the lag formulation both
    engines run) equals the direct run-length-encoding count."""
    lag_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    rle_runs = len([1 for i, s in enumerate(signs) if i == 0 or s != signs[i - 1]])
    assert lag_runs == rle_runs
    # bounds: 1 <= R <= n, and R <= 2*min(n1,n2)+1
    n1 = sum(signs)
    n2 = len(signs) - n1
    assert 1 <= lag_runs <= len(signs)
    assert lag_runs <= 2 * min(n1, n2) + 1


# --- Equalization core (multimodal_hist_equalize) ---------------------------


@given(st.dictionaries(st.integers(min_value=0, max_value=255),
                       st.integers(min_value=1, max_value=50),
                       min_size=2, max_size=64))
@settings(max_examples=200, deadline=None)
def test_equalize_map_properties(hist):
    """The integer CDF map ((cdf-cmin)*510 + (n-cmin)) div (2*(n-cmin)) is
    monotone non-decreasing in pixel value, starts at 0 for the smallest
    present level, ends at exactly 255 for the largest, and preserves the
    pixel count."""
    n = sum(hist.values())
    acc, cdf = 0, {}
    for v in sorted(hist):
        acc += hist[v]
        cdf[v] = acc
    cm = min(cdf.values())
    den = 2 * (n - cm)
    eq = {v: ((c - cm) * 510 + (n - cm)) // den for v, c in cdf.items()}
    vals = [eq[v] for v in sorted(hist)]
    assert vals == sorted(vals)  # monotone
    assert vals[0] == 0 and vals[-1] == 255
    assert sum(hist.values()) == n  # count preserved by construction
    assert all(0 <= x <= 255 for x in vals)


# --- KMV core (sketch_kmv_jaccard) ------------------------------------------


@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40),
       st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_kmv_exact_when_union_fits(a, b):
    """When |A union B| <= k the KMV estimate IS the exact Jaccard — the
    sketch degrades gracefully to truth on small sets (k=64 here, inputs
    capped at 40+40). Hashes are the identity map: KMV's guarantee is
    about ORDER STATISTICS of the hash values, so any injective map
    exhibits it."""
    k = 64
    union = sorted(a | b)[:k]
    est = sum(1 for h in union if h in a and h in b) / len(union)
    exact = len(a & b) / len(a | b)
    if len(a | b) <= k:
        assert math.isclose(est, exact)
    else:
        assert 0 <= est <= 1


# --- Burrows-delta core (text_burrows_delta) --------------------------------


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**6),
                         min_size=10, max_size=10),
                min_size=3, max_size=8))
@settings(max_examples=100, deadline=None)
def test_burrows_delta_is_a_metric_on_z_grid(freq_rows):
    """On the 1e-6-grid z-scores the pairwise delta is symmetric,
    zero-diagonal, and satisfies the triangle inequality (it is 1/K times
    an L1 distance) — the properties that make the matrix usable for
    clustering sources."""
    import statistics

    k = len(freq_rows[0])
    # z-scores per column over rows (population sd, zero-sd -> 0)
    cols = list(zip(*freq_rows))
    z = [[0.0] * k for _ in freq_rows]
    for j, col in enumerate(cols):
        mu = statistics.mean(col)
        sd = math.sqrt(sum((x - mu) ** 2 for x in col) / len(col))
        for i, x in enumerate(col):
            z[i][j] = math.floor(((x - mu) / sd if sd else 0.0) * 1e6 + 0.5)

    def delta(i, j):
        return sum(abs(z[i][t] - z[j][t]) for t in range(k)) / k / 1e6

    n = len(freq_rows)
    for i in range(n):
        assert delta(i, i) == 0
        for j in range(n):
            assert delta(i, j) == delta(j, i)
            for m in range(n):
                assert delta(i, j) <= delta(i, m) + delta(m, j) + 1e-12
