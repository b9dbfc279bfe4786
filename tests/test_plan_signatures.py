"""Catalog-wide physical-plan shape regression gate: every query's plan must
match the committed operator-count signature (`plans/signatures.json`). This
is the enforcement layer behind docs/SCALE.md — a broadcast silently falling
back to sort-merge, an extra exchange, a Python stage appearing in a JVM
path, or a cartesian product sneaking into a fuzzy join changes the
signature and fails here, BEFORE it costs a 100 TB shuffle in production.

After an intentional plan change, regenerate with
``python -m tmapreduce_spark.plans.signatures`` and review the JSON diff
like code.
"""

from __future__ import annotations

import json
import os

import pytest

from tmapreduce_spark.plans.signatures import BASELINE_PATH, SIG_SF, compute_signatures

# Default gate: the shape-critical subset — every query whose plan carries a
# join strategy, iteration, skew treatment, or Python boundary the SCALE
# story depends on. PLAN_SIG_FULL=1 widens to the whole catalog (~90 s).
CRITICAL = [
    "q3_shipping_priority",
    "q9_product_profit",
    "join_broadcast_dim",
    "join_salted_skew",
    "join_bloom_prefilter",
    "join_fuzzy_name",
    "join_interval_overlap",
    "join_asof_nearest",
    "join_lateral_topn",
    "topk_orders",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_span_exact",
    "dedup_methods_overlap",
    "graph_component_sizes",
    "ann_topk_cosine",
    "ann_ivf_topk",
    "embedding_pca_power",
    "tokenizer_bpe_merges",
    "tokenizer_apply_fertility",
    "eval_pass_at_k",
    "agg_hdr_latency_percentiles",
    "agg_equidepth_histogram",
    "events_seasonal_decompose",
    "window_forecast_backtest",
    "window_holt_forecast",
    "multimodal_wav_energy",
    "multimodal_embed_ann",
    "pipeline_corpus_e2e",
    "pipeline_decontaminate",
    "text_heavy_hitters_mg",
    "udf_pandas_scalar",
]


def test_plan_signatures_match_baseline(spark):
    # The committed signatures include the spread() fan-out Exchange, which
    # sources/catalog.py only inserts when defaultParallelism exceeds the
    # scan's partition count — on a 1-core runner spread() is a no-op and
    # every pinned Exchange count would be off by one (r11 advice). The
    # pins are defined for multi-core execution; skip rather than fail on
    # an environment that cannot reproduce them.
    if spark.sparkContext.defaultParallelism < 2:
        pytest.skip(
            "plan-shape pins require defaultParallelism >= 2 (spread() "
            "fan-out is a no-op on a 1-core runner)"
        )
    baseline = json.loads(BASELINE_PATH.read_text())
    full = os.environ.get("PLAN_SIG_FULL") == "1"
    names = None if full else CRITICAL
    missing = [n for n in (names or []) if n not in baseline]
    assert not missing, f"baseline missing {missing} — regenerate signatures"
    got = compute_signatures(spark, SIG_SF, names=names)
    diffs = {
        n: (baseline.get(n), got[n])
        for n in got
        if got[n] != baseline.get(n)
    }
    assert not diffs, (
        "plan shape drifted (intentional? regenerate via "
        "`python -m tmapreduce_spark.plans.signatures` and review the diff):\n"
        + json.dumps(diffs, indent=1, sort_keys=True, default=str)
    )


def test_baseline_covers_whole_catalog():
    """The committed baseline must have one signature per catalog entry —
    an added query without a recorded plan shape is unpinned surface."""
    from tmapreduce_spark.catalog import build_catalog

    baseline = json.loads(BASELINE_PATH.read_text())
    cat = set(build_catalog())
    assert set(baseline) == cat, (
        f"missing: {sorted(cat - set(baseline))}; "
        f"stale: {sorted(set(baseline) - cat)}"
    )


def test_no_forbidden_operators_anywhere():
    """No committed signature may contain a CartesianProduct, catalog-wide.
    (BroadcastNestedLoopJoin is NOT globally forbidden: a
    crossJoin(broadcast(<one-row scalar table>)) — Benford constants,
    percentile cut rows, pooled-moment rows — legitimately plans as BNLJ
    with a 1-row build side, which is a per-partition constant lookup, not
    a pair enumeration. The fuzzy/interval/lateral joins where BNLJ would
    mean quadratic fan-out are pinned BNLJ-free per-query in
    test_plans.py, and their baseline rows here keep them that way.)"""
    baseline = json.loads(BASELINE_PATH.read_text())
    offenders = {n: s for n, s in baseline.items() if "CartesianProduct" in s}
    assert not offenders, offenders
    # the pair-generating families must stay BNLJ-free in the baseline too
    for n, s in baseline.items():
        if n.startswith(("join_fuzzy", "dedup_minhash", "dedup_simhash", "dedup_span")):
            assert "BroadcastNestedLoopJoin" not in s, (n, s)


@pytest.mark.skipif(
    os.environ.get("PLAN_SIG_FULL") != "1",
    reason="full-catalog signature sweep is opt-in (PLAN_SIG_FULL=1, ~90 s)",
)
def test_plan_signatures_full_marker():
    """Marker so `pytest -k plan_signatures` under PLAN_SIG_FULL=1 shows the
    full sweep ran (the real work happens in the parametrized test above,
    which widens to the whole catalog under the same flag)."""
