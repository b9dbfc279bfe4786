"""Semantic invariants for the second analytics wave: rolling active users,
drawdown, burstiness, diversity, skyline dominance, BFS layering, OOV
bounds, FK integrity — each pinned against a brute-force recomputation or a
mathematical identity, independent of the DuckDB oracle."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tmapreduce_spark.functions.dedup import (
    _BFS_MAX_HOPS,
    _BFS_SEED_MOD,
    dedup_minhash_pairs,
    graph_reachability_bfs,
)
from tmapreduce_spark.functions.text import text_vocab_oov_rate
from tmapreduce_spark.operators.analytics import (
    diag_referential_orphans,
    events_active_users_rolling,
    events_drawdown_max,
    events_funnel_ttc,
    events_gap_burstiness,
    events_type_diversity,
    skyline_pareto_orders,
)
from tmapreduce_spark.sources.catalog import load_table


def test_active_users_matches_bruteforce(spark):
    """WAU from the interval-contribution trick must equal the naive
    per-day COUNT(DISTINCT user over trailing 7 days), and DAU <= WAU."""
    rows = {r["day"]: r for r in events_active_users_rolling(spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    raw = e.selectExpr("user_id", "CAST(ts AS DATE) AS day").distinct().collect()
    by_day: dict = defaultdict(set)
    for r in raw:
        by_day[r["day"]].add(r["user_id"])
    days = sorted(by_day)
    assert len(rows) == len(days)
    for d in days:
        wau = len({u for off in range(7) for u in by_day.get(d - timedelta(days=off), ())})
        got = rows[d.strftime("%Y-%m-%d")]
        assert got["dau"] == len(by_day[d])
        assert got["wau7"] == wau, (d, got["wau7"], wau)
        assert got["dau"] <= got["wau7"]


def test_drawdown_bruteforce_and_bounds(spark):
    """max_drawdown recomputed from the raw per-user running series; always
    >= 0 and peak >= final."""
    got = {r["user_id"]: r for r in events_drawdown_max(spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    per_user: dict = defaultdict(list)
    for r in e.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id", "value"
    ).collect():
        per_user[r["user_id"]].append((r["us"], r["event_id"], r["value"]))
    for uid, evs in per_user.items():
        evs.sort()
        cum, peak, dd = 0, None, 0
        for _, _, v in evs:
            import math

            cum += math.floor(v * 1_000_000 + 0.5)
            peak = cum if peak is None else max(peak, cum)
            dd = max(dd, peak - cum)
        r = got[uid]
        assert round(r["max_drawdown"] * 1e6) == dd
        assert r["max_drawdown"] >= 0
        assert r["peak_value"] >= r["final_value"]


def test_type_diversity_bounds(spark):
    """Simpson diversity lives in [0, 1); exactly 0 iff one event type."""
    for r in events_type_diversity(spark, SF_SMOKE).collect():
        assert 0 <= r["simpson_diversity"] < 1
        assert (r["simpson_diversity"] == 0) == (r["n_types"] == 1)
        assert r["n_types"] <= r["n_events"]


def test_burstiness_cv2_nonnegative(spark):
    """Cauchy-Schwarz: n*sum(g^2) >= sum(g)^2, so CV^2 >= 0 whenever
    defined; n_gaps is exactly the user's event count minus one."""
    e = load_table(spark, SF_SMOKE, "events")
    n_by_user = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    rows = events_gap_burstiness(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] == n_by_user[r["user_id"]] - 1
        if r["cv2"] is not None:
            assert r["cv2"] >= 0
        assert r["mean_gap_s"] >= 0


def test_skyline_is_exactly_the_nondominated_set(spark):
    """Brute-force strict 2-D dominance over ALL orders must reproduce the
    two-level sweep's frontier exactly."""
    o = load_table(spark, SF_SMOKE, "orders")
    pts = [
        (r["o_orderdate"], int(r["o_totalprice"] * 100 + 0.5), r["o_orderkey"])
        for r in o.select("o_orderkey", "o_orderdate", "o_totalprice").collect()
    ]
    expect = {
        k
        for d, p, k in pts
        if not any(d2 < d and p2 > p for d2, p2, _ in pts)
    }
    got = {r["o_orderkey"] for r in skyline_pareto_orders(spark, SF_SMOKE).collect()}
    assert got == expect


def test_bfs_layering_invariants(spark):
    """Hop 0 rows are exactly the seed set; every hop-h node (h >= 1) has at
    least one neighbor at hop h-1 and no neighbor at hop < h-1 (BFS min-hop
    proof); hops bounded at _BFS_MAX_HOPS."""
    hops = {r["doc_id"]: r["hop"] for r in graph_reachability_bfs(spark, SF_SMOKE).collect()}
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_pairs(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    ]
    nbr: dict = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    seeds = {n for n in nbr if n % _BFS_SEED_MOD == 0}
    assert seeds, "fixture must yield a non-empty seed set"
    assert {n for n, h in hops.items() if h == 0} == seeds
    for n, h in hops.items():
        assert 0 <= h <= _BFS_MAX_HOPS
        if h > 0:
            best = min(hops.get(m, _BFS_MAX_HOPS + 1) for m in nbr[n])
            assert best == h - 1, (n, h, best)


def test_oov_rate_bounds_and_hit_consistency(spark):
    """OOV rate in [0, 1]; a source with zero distinct OOV tokens must have
    rate 0 and vice versa."""
    rows = text_vocab_oov_rate(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert (r["n_distinct_oov"] == 0) == (r["oov_rate"] == 0.0)
        assert r["total_toks"] > 0


def test_referential_integrity_holds_on_fixture(spark):
    """TPC-H-ish generators keep FKs consistent — every edge must audit to
    zero orphans, and distinct FKs can't exceed child rows."""
    rows = diag_referential_orphans(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_orphans"] == 0, r
        assert 0 < r["n_distinct_fk"] <= r["n_child"]


def test_funnel_ttc_bucket_consistency(spark):
    """Mean delay must sit inside its bucket's bounds and conversions can't
    exceed the purchase count."""
    bounds = {
        "0_lt_1m": (0, 60),
        "1_lt_1h": (60, 3600),
        "2_lt_6h": (3600, 21600),
        "3_lt_24h": (21600, 86400),
    }
    e = load_table(spark, SF_SMOKE, "events")
    n_purchases = e.filter("event_type = 'purchase'").count()
    rows = events_funnel_ttc(spark, SF_SMOKE).collect()
    assert rows
    assert sum(r["n_conversions"] for r in rows) <= n_purchases
    for r in rows:
        lo, hi = bounds[r["bucket"]]
        assert lo <= r["mean_delay_s"] <= hi, r


def test_abc_classes_partition_and_pareto_shape(spark):
    """A/B/C partition all parts; class revenue shares bracket their
    definitions (A >= ~80% only if enough concentration — at minimum A's
    per-part mean revenue must exceed C's)."""
    from tmapreduce_spark.operators.analytics import agg_abc_classification
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = {r["abc_class"]: r for r in agg_abc_classification(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        lt(spark, SF_SMOKE, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    mean = {k: rows[k]["revenue"] / rows[k]["n_parts"] for k in rows}
    assert mean["A"] > mean["B"] > mean["C"]


def test_equidepth_bins_cover_and_order(spark):
    """Bins tile the value range in order (bin k's max <= bin k+1's min),
    rows sum to the table count, and depths are near-equal on the
    mostly-distinct price column (within 2% of n/10)."""
    from tmapreduce_spark.operators.analytics import agg_equidepth_histogram
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = sorted(
        agg_equidepth_histogram(spark, SF_SMOKE).collect(), key=lambda r: r["bin"]
    )
    n = lt(spark, SF_SMOKE, "orders").count()
    assert sum(r["n_rows"] for r in rows) == n
    for a, b in zip(rows, rows[1:]):
        assert a["bin_max"] <= b["bin_min"]
    for r in rows:
        assert abs(r["n_rows"] - n / 10) <= max(2, 0.02 * n), r


def test_hourweek_shares_sum_to_one(spark):
    """Traffic shares over the <=168 cells must sum to ~1 and every count
    is positive."""
    from tmapreduce_spark.operators.analytics import events_hourweek_profile

    rows = events_hourweek_profile(spark, SF_SMOKE).collect()
    assert 1 < len(rows) <= 168
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hod"] <= 23 for r in rows)
    assert abs(sum(r["traffic_share"] for r in rows) - 1.0) < 1e-3


def test_snapshot_asof_is_latest_before_cutoff(spark):
    """Brute-force: per user, the reported row is the max-(us, event_id)
    event at or before the cutoff, and users with no prior events are
    absent."""
    from tmapreduce_spark.operators.analytics import _SNAPSHOT_TS, events_snapshot_asof
    from tmapreduce_spark.sources.catalog import load_table as lt

    got = {r["user_id"]: r for r in events_snapshot_asof(spark, SF_SMOKE).collect()}
    e = lt(spark, SF_SMOKE, "events")
    pre = e.filter(f"ts <= TIMESTAMP '{_SNAPSHOT_TS}'").selectExpr(
        "user_id", "event_id", "event_type", "unix_micros(ts) AS us"
    ).collect()
    best: dict = {}
    for r in pre:
        k = (r["us"], r["event_id"])
        if r["user_id"] not in best or k > best[r["user_id"]][0]:
            best[r["user_id"]] = (k, r["event_type"])
    assert set(got) == set(best)
    for uid, ((us, _), ety) in best.items():
        assert got[uid]["last_us"] == us
        assert got[uid]["last_type"] == ety


def test_component_sizes_conserve_docs(spark):
    """Size histogram re-aggregates the CC labels exactly: sum(size *
    n_clusters) = clustered docs = sum(n_docs); sizes >= 2."""
    from tmapreduce_spark.functions.dedup import (
        dedup_cluster_resolve,
        graph_component_sizes,
    )

    rows = graph_component_sizes(spark, SF_SMOKE).collect()
    n_docs_labeled = dedup_cluster_resolve(spark, SF_SMOKE).count()
    assert sum(r["n_docs"] for r in rows) == n_docs_labeled
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_nucleus_vocab_minimality_and_coverage(spark):
    """The nucleus must cover >= p of occurrences, and dropping its LAST
    (smallest-count) member must fall below p — i.e. it is the minimal
    head; nucleus_size <= vocab_size."""
    from collections import Counter, defaultdict

    from tmapreduce_spark.functions.text import text_nucleus_vocab
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = {r["source"]: r for r in text_nucleus_vocab(spark, SF_SMOKE).collect()}
    docs = lt(spark, SF_SMOKE, "documents").select("source", "text").collect()
    by_src: dict = defaultdict(Counter)
    for r in docs:
        by_src[r["source"]].update(t for t in r["text"].strip().split() if t)
    assert set(rows) == set(by_src)
    for src, ctr in by_src.items():
        r = rows[src]
        total = sum(ctr.values())
        ordered = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        head = ordered[: r["nucleus_size"]]
        covered = sum(c for _, c in head)
        assert 10 * covered >= 9 * total, (src, covered, total)
        assert 10 * (covered - head[-1][1]) < 9 * total, "nucleus not minimal"
        assert r["nucleus_size"] <= r["vocab_size"] == len(ctr)
        assert r["total_toks"] == total


def test_open_daily_sweep_conserves_and_stays_nonnegative(spark):
    """Sum(opened) = sum(closed) = lineitem count (every synthesized
    interval both opens and closes), the running concurrency is never
    negative, and a spot-day brute-force recount matches."""
    from tmapreduce_spark.operators.analytics import lineitem_open_daily
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = sorted(lineitem_open_daily(spark, SF_SMOKE).collect(), key=lambda r: r["day"])
    n = lt(spark, SF_SMOKE, "lineitem").count()
    assert sum(r["opened"] for r in rows) == n
    assert sum(r["closed"] for r in rows) == n
    assert all(r["open_end"] >= 0 for r in rows)
    assert rows[-1]["open_end"] == 0, "all intervals must close by the last day"
    # brute-force the middle day
    mid = rows[len(rows) // 2]["day"]
    ivs = lt(spark, SF_SMOKE, "lineitem").selectExpr(
        "CAST(l_shipdate AS DATE) AS s",
        "date_add(CAST(l_shipdate AS DATE),"
        " CAST(1 + (l_orderkey + l_linenumber) % 30 AS INT)) AS e",
    ).collect()
    from datetime import date

    md = date.fromisoformat(mid)
    expect = sum(1 for r in ivs if r["s"] <= md < r["e"])
    assert {r["day"]: r["open_end"] for r in rows}[mid] == expect


def test_ols2_recovers_planted_coefficients(spark):
    """Fit on a synthetic exactly-linear frame: y = 7*x1 - 3*x2 + 11 must
    come back with the planted coefficients to the mround grid."""
    import pandas as pd

    from tmapreduce_spark.operators.analytics import _ols2_exprs

    pdf = pd.DataFrame(
        {
            "l_returnflag": ["X"] * 60,
            "l_quantity": [float(i % 13 + 1) for i in range(60)],
            "l_discount": [((i * 7) % 11) / 100.0 for i in range(60)],
        }
    )
    pdf["l_extendedprice"] = 7 * pdf["l_quantity"] - 3 * (pdf["l_discount"] * 100) + 11
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as SF

    out = df.groupBy("l_returnflag").agg(
        *[SF.expr(sql).alias(name) for name, sql in _ols2_exprs().items()]
    ).collect()[0]
    assert abs(out["beta_qty"] - 7) < 1e-4
    assert abs(out["beta_disc_pt"] - (-3)) < 1e-4
    assert abs(out["intercept"] - 11) < 1e-3


def test_rolling_median_bruteforce(spark):
    """Sorted-frame median must equal Python statistics.median over the
    same trailing 20-row frame per user."""
    import statistics

    from tmapreduce_spark.operators.analytics import _RMED_FRAME, window_rolling_median
    from tmapreduce_spark.sources.catalog import load_table as lt

    got = {
        (r["user_id"], r["event_id"]): r["roll_med"]
        for r in window_rolling_median(spark, SF_SMOKE).collect()
    }
    e = lt(spark, SF_SMOKE, "events")
    per_user: dict = defaultdict(list)
    for r in e.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "value"
    ).collect():
        per_user[r["user_id"]].append((r["us"], r["event_id"], r["value"]))
    for uid, evs in per_user.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [v for _, _, v in evs[max(0, i - _RMED_FRAME) : i + 1]]
            exp = statistics.median(frame)
            assert abs(got[(uid, evs[i][1])] - exp) <= 1e-6, (uid, i)


def test_pk_uniqueness_fixture_is_clean(spark):
    """Every keyed fixture table must audit to zero duplicate surplus and
    zero null keys."""
    from tmapreduce_spark.operators.analytics import diag_pk_uniqueness

    rows = diag_pk_uniqueness(spark, SF_SMOKE).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["n_dup_surplus"] == 0, r
        assert r["n_null_keys"] == 0, r
        assert r["n_rows"] == r["n_distinct"]


def test_rate_spike_bruteforce_baseline(spark):
    """spike_ratio recomputed from the raw hourly counts with the same
    wall-clock RANGE baseline; warmup rows (< 6 baseline buckets) are
    absent; is_spike iff ratio >= 3 on the exact-integer comparison."""
    from tmapreduce_spark.operators.analytics import (
        _SPIKE_LOOKBACK,
        _SPIKE_WARMUP,
        events_rate_spike,
    )
    from tmapreduce_spark.sources.catalog import load_table as lt

    e = lt(spark, SF_SMOKE, "events")
    hourly: dict = {}
    for r in e.selectExpr(
        "event_type",
        "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT) AS h",
    ).collect():
        hourly[(r["event_type"], r["h"])] = hourly.get((r["event_type"], r["h"]), 0) + 1
    got = {(r["event_type"], r["hidx"]): r for r in events_rate_spike(spark, SF_SMOKE).collect()}
    for (ety, h), n in hourly.items():
        base = [
            hourly[(ety, h2)]
            for h2 in range(h - _SPIKE_LOOKBACK, h)
            if (ety, h2) in hourly
        ]
        if len(base) < _SPIKE_WARMUP:
            assert (ety, h) not in got
            continue
        r = got[(ety, h)]
        assert r["n"] == n
        exp = n * len(base) / sum(base)
        assert abs(r["spike_ratio"] - exp) < 2e-6
        assert r["is_spike"] == (3 * sum(base) <= n * len(base))


def test_mr_inverted_index_contract_and_postings(spark):
    """Reference (key, result) contract: exactly two rows per token — the
    token itself and its posting list; postings are sorted distinct doc ids
    that really contain the token."""
    from collections import defaultdict as dd

    from tmapreduce_spark.operators.mapreduce_queries import mr_inverted_index
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = mr_inverted_index(spark, SF_SMOKE).collect()
    by_key: dict = dd(list)
    for r in rows:
        by_key[r["key"]].append(r["result"])
    docs = lt(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    postings: dict = dd(set)
    for d in docs:
        for w in d["text"].strip().split():
            postings[w].add(str(d["doc_id"]))
    assert set(by_key) == set(postings)
    for tok, results in by_key.items():
        assert len(results) == 2
        assert tok in results
        ids = next(x for x in results if x != tok or results.count(tok) == 2)
        if ids == tok and ",".join(sorted(postings[tok])) != tok:
            ids = [x for x in results if x != tok][0]
        assert ",".join(sorted(postings[tok])) in results


def test_rolling_mad_flag_bruteforce(spark):
    """Baseline median/MAD and the outlier decision recomputed in Python
    over the same strictly-preceding 21-row frames; warmup rows absent."""
    import statistics

    from tmapreduce_spark.operators.analytics import (
        _RMAD_FRAME,
        _RMAD_WARMUP,
        window_rolling_mad_flag,
    )
    from tmapreduce_spark.sources.catalog import load_table as lt

    got = {
        (r["user_id"], r["event_id"]): r
        for r in window_rolling_mad_flag(spark, SF_SMOKE).collect()
    }
    e = lt(spark, SF_SMOKE, "events")
    per_user: dict = defaultdict(list)
    for r in e.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "value"
    ).collect():
        per_user[r["user_id"]].append((r["us"], r["event_id"], r["value"]))
    n_expected = 0
    for uid, evs in per_user.items():
        evs.sort()
        for i, (_, eid, v) in enumerate(evs):
            frame = [x for _, _, x in evs[max(0, i - _RMAD_FRAME) : i]]
            if len(frame) < _RMAD_WARMUP:
                assert (uid, eid) not in got
                continue
            n_expected += 1
            med = statistics.median(frame)
            mad = statistics.median([abs(x - med) for x in frame])
            r = got[(uid, eid)]
            assert abs(r["baseline_med"] - med) <= 1e-6
            assert abs(r["baseline_mad"] - mad) <= 1e-6
            assert r["is_outlier"] == (abs(v - med) > 3 * mad)
    assert len(got) == n_expected


def test_cohort_repeat_rate_consistency(spark):
    """Cohort sizes partition the customer base; repeat_rate in [0, 1];
    orders_per_customer >= 1; total orders conserved."""
    from tmapreduce_spark.operators.analytics import orders_cohort_repeat_rate
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = orders_cohort_repeat_rate(spark, SF_SMOKE).collect()
    o = lt(spark, SF_SMOKE, "orders")
    assert sum(r["n_customers"] for r in rows) == o.select("o_custkey").distinct().count()
    assert sum(r["total_orders"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["repeat_rate"] <= 1
        assert r["orders_per_customer"] >= 1


def test_holt_forecast_matches_python_fold(spark):
    """The array-accumulator Holt fold must equal the reference recursion
    (l' = (l+b)/2 + x/2 ; b' = b/2 + (l'-l)/2, seeded l0 = first frame
    value, b0 = 0) computed in Python over the same 16-row frames."""
    from tmapreduce_spark.operators.windows import EWMA_LAGS, window_holt_forecast
    from tmapreduce_spark.sources.catalog import load_table as lt

    rows = window_holt_forecast(spark, SF_SMOKE).collect()
    e = lt(spark, SF_SMOKE, "events")
    per_user: dict = defaultdict(list)
    for r in e.selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_id", "value"
    ).collect():
        per_user[r["user_id"]].append((r["us"], r["event_id"], r["value"]))
    expect = {}
    for uid, evs in per_user.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [v for _, _, v in evs[max(0, i - EWMA_LAGS + 1) : i + 1]]
            l, b = frame[0], 0.0
            for x in frame[1:]:
                l2 = (l + b) * 0.5 + x * 0.5
                b = b * 0.5 + (l2 - l) * 0.5
                l = l2
            expect[(uid, evs[i][1])] = (l, b)
    assert rows
    for r in rows:
        l, b = expect[(r["user_id"], r["event_id"])]
        assert abs(r["level"] - l) <= 1e-6
        assert abs(r["trend"] - b) <= 1e-6
        assert abs(r["forecast_next"] - (l + b)) <= 2e-6


def test_change_point_split_equals_cusum_peak(spark):
    """Estimator identity: the change-point objective |S_t*(n-t) -
    (S_n-S_t)*t| equals |n*S_t - t*S_n| — the CUSUM statistic — so
    events_change_point's split position must coincide with
    window_cusum_detect's peak position for every user (both break ties to
    the earliest index; the fixture has no NULL values, so both operators
    index the same event sequence)."""
    from tests.conftest import SF_SMOKE
    from tmapreduce_spark.operators.analytics import events_change_point
    from tmapreduce_spark.operators.windows import window_cusum_detect

    split = {
        r["user_id"]: int(r["split_t"])
        for r in events_change_point(spark, SF_SMOKE).collect()
    }
    peak_col = next(
        c for c in window_cusum_detect(spark, SF_SMOKE).columns
        if c in ("peak_rn", "rn", "peak_pos", "peak_t")
    )
    peak = {
        r["user_id"]: int(r[peak_col])
        for r in window_cusum_detect(spark, SF_SMOKE).collect()
    }
    assert split, "no users"
    for u, t in split.items():
        assert peak[u] == t, (u, peak[u], t)
