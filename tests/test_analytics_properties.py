"""Property-based verification (hypothesis) of the algorithmic cores behind
the analytics operators, against brute-force models — pure Python, no Spark:

- interval-contribution rolling-distinct (events_active_users_rolling): the
  per-user cover intervals are disjoint and reproduce trailing-K distinct
  membership for ANY activity pattern;
- sweep-line interval concurrency (lineitem_open_daily): delta running sums
  equal per-day brute-force interval counting for ANY interval set;
- two-level pareto sweep (skyline_pareto_orders): month-local strictly
  -earlier max + prior-month max reproduces global strict 2-D dominance for
  ANY point set;
- Misra-Gries-style fixed-point rescale (embedding_pca_power): the integer
  rescale keeps every component in [-SCALE, SCALE] and preserves sign.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

WINDOW = 7


@given(
    st.dictionaries(
        st.integers(0, 5),
        st.sets(st.integers(0, 40), min_size=1, max_size=25),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_interval_contribution_equals_trailing_distinct(activity):
    """For any (user -> active day set): the operator's cover intervals
    [d, min(next-1, d+6)] are per-user disjoint, and counting covers per
    day over OBSERVED days equals the brute-force trailing-7 distinct-user
    count."""
    covers = defaultdict(int)
    for _user, days in activity.items():
        ds = sorted(days)
        prev_end = None
        for i, d in enumerate(ds):
            nxt = ds[i + 1] if i + 1 < len(ds) else None
            end = d + WINDOW - 1 if nxt is None else min(d + WINDOW - 1, nxt - 1)
            assert prev_end is None or d > prev_end, "covers must be disjoint"
            prev_end = end
            for x in range(d, end + 1):
                covers[x] += 1
    observed = sorted({d for days in activity.values() for d in days})
    for d in observed:
        brute = sum(
            1
            for days in activity.values()
            if any(d - WINDOW + 1 <= x <= d for x in days)
        )
        assert covers[d] == brute, (d, covers[d], brute)


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 30)),  # (start, length)
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_sweepline_concurrency_equals_bruteforce(intervals):
    """+1/-1 delta running sum at each day equals brute-force counting of
    intervals [s, s+len) covering that day, for any interval multiset."""
    deltas = defaultdict(int)
    for s, ln in intervals:
        deltas[s] += 1
        deltas[s + ln] -= 1
    run, open_at = 0, {}
    for day in sorted(deltas):
        run += deltas[day]
        open_at[day] = run
    assert run == 0, "every interval closes"
    for day in open_at:
        brute = sum(1 for s, ln in intervals if s <= day < s + ln)
        assert open_at[day] == brute


@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 10_000)),  # (day, price)
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_two_level_pareto_sweep_equals_global_dominance(points):
    """Month-partitioned strictly-earlier running max + prior-month max
    (the skyline_pareto_orders plan) must reproduce brute-force strict 2-D
    dominance for any point set, including same-day and same-price ties."""
    month = lambda d: d // 31
    loc_max = {}
    for i, (d, p) in enumerate(points):
        m = max(
            (p2 for d2, p2 in points if month(d2) == month(d) and d2 < d),
            default=None,
        )
        loc_max[i] = m
    mmax = defaultdict(lambda: None)
    for d, p in points:
        m = month(d)
        mmax[m] = p if mmax[m] is None else max(mmax[m], p)
    months = sorted(mmax)
    prior = {}
    run = None
    for m in months:
        prior[m] = run
        run = mmax[m] if run is None else max(run, mmax[m])
    frontier_sweep = {
        i
        for i, (d, p) in enumerate(points)
        if (loc_max[i] is None or loc_max[i] <= p)
        and (prior[month(d)] is None or prior[month(d)] <= p)
    }
    frontier_brute = {
        i
        for i, (d, p) in enumerate(points)
        if not any(d2 < d and p2 > p for d2, p2 in points)
    }
    assert frontier_sweep == frontier_brute


@given(
    st.lists(st.integers(-(10**15), 10**15), min_size=1, max_size=64).filter(
        lambda xs: any(x != 0 for x in xs)
    )
)
@settings(max_examples=300, deadline=None)
def test_fixed_point_rescale_bounds_and_sign(gv):
    """The PCA iteration's rescale v' = floor(gv * S / max|gv| + 0.5) keeps
    every component within [-S, S] and preserves the sign of the dominant
    component exactly (|winner| maps to ±S)."""
    S = 16384
    m = max(abs(x) for x in gv)
    import math

    out = [math.floor(x * S / m + 0.5) for x in gv]
    assert all(-S <= y <= S for y in out)
    for x, y in zip(gv, out):
        if abs(x) == m:
            assert y == (S if x > 0 else -S)
