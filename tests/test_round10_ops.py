"""Round-10 operator semantics: independent pandas/numpy/scipy-free
recomputes of the statistical identities behind the new entries. Oracle
hash-parity is covered by test_oracle_parity's catalog replica; these pin
what the hash can't explain."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from tmapreduce_spark.catalog import build_catalog

CAT = build_catalog()


def _run(spark, name: str) -> pd.DataFrame:
    return CAT[name].fn(spark, SF_SMOKE).toPandas()


def _orders() -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    ).df()


def _events() -> pd.DataFrame:
    return duckdb.sql(f"SELECT * FROM '{SF_SMOKE}/events.parquet'").df()


def test_bucketed_groupby_equals_plain_groupby(spark):
    got = _run(spark, "layout_bucketed_groupby").set_index("n_items")
    li = duckdb.sql(
        f"""SELECT l_orderkey, count(*) AS n_items,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000
                                  + 0.5) AS BIGINT)) AS rev_micro
            FROM '{SF_SMOKE}/lineitem.parquet' GROUP BY l_orderkey"""
    ).df()
    hist = li.groupby("n_items").agg(n=("l_orderkey", "size"),
                                     rev=("rev_micro", "sum"))
    assert got["n_orders"].sum() == li.shape[0]
    for k, row in hist.iterrows():
        assert got.loc[k, "n_orders"] == row["n"]
        # presentation: micro sum -> half-up at cents grid -> dollars
        want = ((row["rev"] + 5000) // 10000) / 100
        assert got.loc[k, "revenue"] == want


def test_mad_robust_bruteforce(spark):
    got = _run(spark, "agg_mad_robust").set_index("o_orderpriority")
    o = _orders()
    o["c"] = np.floor(o.o_totalprice * 100 + 0.5).astype("int64")
    for prio, g in o.groupby("o_orderpriority"):
        c = np.sort(g.c.values)
        med = c[(len(c) - 1) // 2] if len(c) % 2 else c[len(c) // 2 - 1]
        # percentile_disc(0.5): smallest value with cume_dist >= 0.5
        med = np.sort(c)[int(np.ceil(0.5 * len(c))) - 1]
        adev = np.sort(np.abs(g.c.values - med))
        mad = adev[int(np.ceil(0.5 * len(adev))) - 1]
        assert got.loc[prio, "median_price"] == med / 100
        assert got.loc[prio, "mad_price"] == mad / 100
        n_out = int((np.abs(g.c.values - med) * 10000 > 44478 * mad).sum())
        assert got.loc[prio, "n_robust_outliers"] == n_out
        assert got.loc[prio, "n"] == len(g)


def test_gtest_identities(spark):
    got = _run(spark, "agg_gtest_independence").iloc[0]
    o = _orders()
    tab = o.groupby(["o_orderpriority", "o_orderstatus"]).size()
    n = len(o)
    r = o.groupby("o_orderpriority").size()
    c = o.groupby("o_orderstatus").size()
    g = 2 * sum(
        obs * math.log(obs * n / (r[p] * c[s]))
        for (p, s), obs in tab.items()
    )
    assert got["n"] == n
    assert got["dof"] == (r.size - 1) * (c.size - 1)
    assert abs(got["g_stat"] - g) < 1e-4
    assert got["g_stat"] >= 0 or abs(got["g_stat"]) < 1e-6


def test_runs_test_bruteforce(spark):
    got = _run(spark, "agg_runs_test").iloc[0]
    o = _orders()
    o["c"] = np.floor(o.o_totalprice * 100 + 0.5).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index()
    med = np.sort(days.values)[int(np.ceil(0.5 * len(days))) - 1]
    s = (days[days != med] > med).astype(int).values
    runs = 1 + int((s[1:] != s[:-1]).sum())
    n1, n2 = int(s.sum()), int(len(s) - s.sum())
    n = n1 + n2
    assert got["n_days"] == n and got["n_above"] == n1 and got["n_below"] == n2
    assert got["n_runs"] == runs
    mu = 1 + 2 * n1 * n2 / n
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert abs(got["expected_runs"] - mu) < 1e-5
    assert abs(got["z_stat"] - (runs - mu) / math.sqrt(var)) < 1e-5


def test_durbin_watson_bruteforce(spark):
    got = _run(spark, "agg_durbin_watson").iloc[0]
    o = _orders()
    o["c"] = np.floor(o.o_totalprice * 100 + 0.5).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index().values.astype(float)
    e = days - days.mean()
    dw = float((np.diff(e) ** 2).sum() / (e**2).sum())
    assert got["n_days"] == len(days)
    assert abs(got["dw_stat"] - dw) < 1e-5
    assert 0 < got["dw_stat"] < 4


def test_cume_dist_bruteforce(spark):
    got = _run(spark, "window_cume_dist")
    o = _orders()
    for prio, g in o.groupby("o_orderpriority"):
        sub = got[got.o_orderpriority == prio].sort_values("rn")
        assert len(sub) == 8
        top = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(8)
        assert list(sub.o_orderkey) == list(top.o_orderkey)
        n = len(g)
        for _, row in sub.iterrows():
            n_le = int((g.o_totalprice <= row.o_totalprice).sum())
            n_lt = int((g.o_totalprice < row.o_totalprice).sum())
            assert row.cume_dist == math.floor(n_le / n * 1e6 + 0.5) / 1e6
            assert row.percent_rank == math.floor(n_lt / (n - 1) * 1e6 + 0.5) / 1e6


def test_select_scalar_identities(spark):
    got = _run(spark, "subquery_select_scalar")
    o = _orders()
    assert (got.global_max_price == o.o_totalprice.max()).all()
    assert abs(got.revenue_share.sum() - 1) < 1e-4
    assert got.n_orders.sum() == len(o)


def test_circadian_identities(spark):
    got = _run(spark, "events_circadian_profile").set_index("event_type")
    e = _events()
    e["hod"] = pd.to_datetime(e.ts).dt.hour
    for t, g in e.groupby("event_type"):
        ang = 2 * np.pi * g.hod.values / 24
        x, y = np.cos(ang).mean(), np.sin(ang).mean()
        r = math.hypot(x, y)
        assert got.loc[t, "n"] == len(g)
        assert abs(got.loc[t, "mean_x"] - x) < 1e-5
        assert abs(got.loc[t, "mean_y"] - y) < 1e-5
        assert abs(got.loc[t, "resultant_r"] - r) < 1e-5
        assert abs(got.loc[t, "circ_variance"] - (1 - r)) < 1e-5
        assert 0 <= got.loc[t, "resultant_r"] <= 1


def test_haar_energy_bruteforce(spark):
    got = _run(spark, "events_haar_energy").set_index("level")
    e = _events()
    # force ns resolution: the parquet ts is us-resolution and pandas keeps
    # it, so a bare astype(int64) would be microseconds
    hidx = (
        pd.to_datetime(e.ts).astype("datetime64[ns]").astype("int64")
        // (3600 * 10**9)
    ).values
    lo = hidx.min()
    counts = np.zeros(512, dtype="int64")
    for h in hidx:
        if h - lo < 512:
            counts[h - lo] += 1
    total = 0
    energies = {}
    for lvl in range(1, 10):
        blk = 1 << lvl
        half = blk >> 1
        d = [
            counts[b : b + half].sum() - counts[b + half : b + blk].sum()
            for b in range(0, 512, blk)
        ]
        energies[lvl] = int(sum(x * x for x in d))
        total += energies[lvl]
        assert got.loc[lvl, "energy"] == energies[lvl]
        assert got.loc[lvl, "n_blocks"] == 512 // blk
        assert got.loc[lvl, "block_hours"] == blk
    for lvl in range(1, 10):
        assert (
            got.loc[lvl, "energy_share"]
            == math.floor(energies[lvl] / total * 1e6 + 0.5) / 1e6
        )


def test_slo_burn_identities(spark):
    got = _run(spark, "events_slo_burn_rate")
    e = _events()
    widx = (
        pd.to_datetime(e.ts).astype("datetime64[ns]").astype("int64")
        // (6 * 3600 * 10**9)
    )
    grp = e.assign(w=widx).groupby("w")
    assert got.n_events.sum() == len(e)
    err = grp.apply(
        lambda g: int((g.event_type == "error").sum()), include_groups=False
    )
    n = grp.size()
    assert got.n_errors.sum() == int(err.sum())
    # burn and flag consistency on every window
    for _, row in got.iterrows():
        assert row.fast_burn == (1 if 40 * row.n_errors > 12 * row.n_events else 0)
        want = math.floor(4 * row.n_errors / row.n_events * 1e6 + 0.5) / 1e6
        assert row.burn_rate == want
    # non-degenerate: both healthy and breaching windows exist at smoke SF
    assert 0 < got.fast_burn.sum() < len(got)
