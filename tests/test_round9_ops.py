"""Round-9 operator semantics: one-way ANOVA, DiD lift with placebo, and
Cohen's kappa. Oracle hash-parity is covered by test_oracle_parity's catalog
replica; these pin the statistical identities the hash can't explain."""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.conftest import SF_SMOKE
from tmapreduce_spark.catalog import build_catalog

CAT = build_catalog()


def _run(spark, name: str) -> pd.DataFrame:
    return CAT[name].fn(spark, SF_SMOKE).toPandas()


def test_anova_identities(spark):
    got = _run(spark, "agg_anova_oneway").iloc[0]
    # recompute from raw data: cells partition the table
    o = duckdb.sql(
        f"SELECT o_orderpriority, o_totalprice FROM '{SF_SMOKE}/orders.parquet'"
    ).df()
    assert got["n_total"] == len(o)
    assert got["k_groups"] == o["o_orderpriority"].nunique() == 5
    # SSB + SSW = SST and both are non-negative
    grand = o["o_totalprice"].mean()
    sst = ((o["o_totalprice"] - grand) ** 2).sum()
    ssb = sum(
        len(g) * (g["o_totalprice"].mean() - grand) ** 2
        for _, g in o.groupby("o_orderpriority")
    )
    assert got["ss_between"] >= 0 and got["ss_within"] >= 0
    assert abs(got["ss_between"] - ssb) / ssb < 1e-6
    assert abs((got["ss_between"] + got["ss_within"]) - sst) / sst < 1e-6
    # eta^2 = SSB / SST and F consistency
    assert abs(got["eta_squared"] - ssb / sst) < 1e-5
    f = (ssb / 4) / ((sst - ssb) / (len(o) - 5))
    assert abs(got["f_stat"] - f) / f < 1e-5


def test_did_cells_partition_and_contrast(spark):
    got = _run(spark, "events_did_lift").iloc[0]
    e = duckdb.sql(
        f"""SELECT user_id % 2 = 0 AS treat, epoch_us(ts) AS us, value
            FROM '{SF_SMOKE}/events.parquet' WHERE event_type = 'purchase'"""
    ).df()
    post = 1_705_363_200_000_000
    # the four count cells partition the purchase slice
    n_cells = (
        got["n_treat_pre"] + got["n_treat_post"]
        + got["n_ctrl_pre"] + got["n_ctrl_post"]
    )
    assert n_cells == len(e)
    assert got["n_treat_pre"] == ((e.treat) & (e.us < post)).sum()
    assert got["n_ctrl_post"] == ((~e.treat) & (e.us >= post)).sum()
    # the DiD contrast equals the rounded-mean recombination to rounding slack
    did = (got["mean_treat_post"] - got["mean_treat_pre"]) - (
        got["mean_ctrl_post"] - got["mean_ctrl_pre"]
    )
    assert abs(did - got["did_estimate"]) < 4e-6
    # independent float-path recompute of the estimate itself
    def mean(t, lo, hi):
        s = e[(e.treat == t) & (e.us >= lo) & (e.us < hi)]
        return s.value.mean()

    ind = (mean(True, post, 1 << 62) - mean(True, 0, post)) - (
        mean(False, post, 1 << 62) - mean(False, 0, post)
    )
    assert abs(ind - got["did_estimate"]) < 1e-4


def test_cohens_kappa_identity(spark):
    got = _run(spark, "eval_cohens_kappa").iloc[0]
    po, pe, k = got["observed_agreement"], got["expected_agreement"], got["kappa"]
    # kappa = (po - pe) / (1 - pe), to the 1e-6 output rounding
    assert abs(k - (po - pe) / (1 - pe)) < 5e-6
    assert 0 <= po <= 1 and 0 <= pe <= 1 and -1 <= k <= 1
    assert got["agree_n"] == round(po * got["n_items"])
    # the raters are genuinely non-degenerate on the synthetic corpus:
    # observed agreement is strictly inside (0, 1)
    assert 0 < got["agree_n"] < got["n_items"]
