"""Central query catalog: every implemented operator from SURVEY.md §2 has an
entry here — a Spark callable ``(spark, sf_dir) -> DataFrame`` and (where
SQL-expressible) an equivalent DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports this catalog to the correctness driver.

Parity conventions (keep these or hashes break):
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded (2 decimals for money sums, 6 for ratios/avgs) on
  BOTH sides so engine-order summation noise cancels;
- timestamps/dates surfaced as formatted strings, never raw temporal types;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT, Spark keeps
  LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str


# Names with a green driver CORRECTNESS row from rounds 1-3 (r01 ∪ r02 ∪ r03
# — 50 rows each round; enumeration is capped at ~50 rows/round).  Refreshed
# each round so the driver's budget always lands on never-checked entries
# first.
_DRIVER_COVERED: frozenset[str] = frozenset(
    {
        # --- round 1 (CORRECTNESS_r01.json, all green) ---
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "filter_project", "join_broadcast_dim",
        "join_left_outer", "join_semi", "join_anti", "join_full_outer",
        "join_range_theta", "agg_distinct", "agg_rollup", "agg_cube",
        "agg_conditional", "agg_stats", "topk_orders", "scalar_string",
        "scalar_date", "scalar_math", "scalar_json", "events_tumbling_10min",
        "agg_grouping_sets", "scalar_array_map", "agg_decimal_exact",
        "scalar_date_trunc", "scalar_null_semantics", "events_sliding_10x5",
        "events_sessions", "q2_min_cost_supplier", "q11_important_stock",
        "q20_part_promotion", "q4_order_priority", "q7_volume_shipping",
        "q8_market_share", "q9_product_profit", "q12_ship_delay",
        "q13_customer_distribution", "q15_top_supplier", "q17_small_quantity",
        "q21_waiting_supplier", "q22_sales_opportunity", "join_asof_events",
        "pivot_status_priority", "percentiles_price", "subquery_above_avg",
        "subquery_exists", "q18_large_orders", "q14_promo_share",
        "q16_supplier_part_count",
        # --- round 2 (CORRECTNESS_r02.json: 48 green + approx_distinct_sketch
        # whose rows-only no_oracle row is its terminal state) ---
        "dedup_ngram_jaccard", "scalar_struct", "agg_string_agg",
        "events_pattern_burst", "join_null_safe", "sample_weighted_bernoulli",
        "q19_disjunctive", "q10_returned_items", "window_running_distinct",
        "agg_mode", "agg_histogram", "agg_percentile_disc", "ann_topk_cosine",
        "approx_distinct_sketch", "charcount", "dedup_cc_twophase",
        "dedup_cluster_resolve", "dedup_span_exact", "embedding_norms",
        "events_funnel", "events_gapfill_ffill", "events_retention",
        "join_fuzzy_name", "join_fuzzy_symdel", "join_lateral_topn",
        "mr_charcount", "mr_charcount_combined", "mr_wordcount",
        "multimodal_decode_stats", "multimodal_embed_ann",
        "multimodal_feature_extract", "pipeline_chunk_documents",
        "pipeline_merge_scd", "pipeline_pack_sequences", "scalar_bitwise",
        "scalar_posexplode", "scalar_url_parse", "set_intersect",
        "set_union_all", "set_union_distinct", "similarity_pairs_blocked",
        "text_bigram_topk", "text_inverted_index", "udf_mapinarrow",
        "udf_pandas_grouped_agg", "udf_pandas_scalar", "window_ignore_nulls",
        "window_rank_topn", "wordcount",
        # --- round 3 (CORRECTNESS_r03.json: 49 green + the clean rows-only
        # no_oracle row for approx_quantiles_sketch, its terminal state) ---
        "approx_quantiles_sketch", "pipeline_corpus_e2e",
        "text_repetition_stats", "graph_pagerank_neardup",
        "ann_ivf_topk_probe2", "pipeline_pii_scrub",
        "window_range_frame", "set_except", "token_stats",
        "dedup_embedding_cosine", "ann_lsh_topk", "multimodal_meta_stats",
        "udf_udtf_tokens", "scalar_regex", "salted_token_counts",
        "events_time_rollup", "join_salted_skew", "pipeline_decontaminate",
        "window_frame_following", "set_except_all", "token_bpe_ish",
        "dedup_exact_groups", "ann_ivf_topk", "multimodal_resize",
        "udf_python_scalar", "sample_stratified_fixed", "window_range_centered",
        "set_intersect_all", "text_quality", "dedup_exact_keep_first",
        "ann_pq_topk", "multimodal_frame_sample", "udf_grouped_demean",
        "pipeline_upsert_latest", "window_percentiles", "distinct_pairs",
        "lang_id_heuristic", "dedup_minhash_signature",
        "udf_mapinpandas_running", "pipeline_quality_filter",
        "window_rank_dense", "doc_fingerprint", "dedup_minhash_pairs",
        "sample_hash_bucket", "window_running_sum", "dedup_simhash",
        "pipeline_clean_corpus", "window_lag_lead", "window_moving_avg",
        "window_ntile",
    }
)
# After round 3 only three entries lack a driver row (round-3 additions that
# missed the 50-row budget): text_tfidf_topk, pipeline_domain_filter,
# sample_domain_mix — plus anything added this round.


def _round_robin(by_cat: dict[str, list[str]]) -> list[str]:
    out: list[str] = []
    while any(by_cat.values()):
        for cat in list(by_cat):
            if by_cat[cat]:
                out.append(by_cat[cat].pop(0))
    return out


def _driver_priority_order(catalog: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Reorder the catalog for driver enumeration (the driver verifies ~the
    first 50 entries): entries without any driver CORRECTNESS row yet come
    first, round-robin across categories so family coverage survives any cap;
    the already-proven entries follow in their original order."""
    backlog_by_cat: dict[str, list[str]] = {}
    for name, spec in catalog.items():
        if name not in _DRIVER_COVERED:
            backlog_by_cat.setdefault(spec.category, []).append(name)

    ordered = _round_robin(backlog_by_cat)
    ordered.extend(n for n in catalog if n in _DRIVER_COVERED)
    return {name: catalog[name] for name in ordered}


def build_catalog() -> dict[str, QuerySpec]:
    from tmapreduce_spark.operators import (
        advanced,
        mapreduce_queries,
        relational,
        setops,
        tpch_extra,
        windows,
    )
    from tmapreduce_spark.functions import dedup, multimodal, scale, similarity, text, udfs

    catalog: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch_extra,
        advanced,
        windows,
        setops,
        text,
        dedup,
        similarity,
        multimodal,
        udfs,
        scale,
        mapreduce_queries,
    ):
        for name, spec in mod.QUERIES.items():
            if name in catalog:
                raise ValueError(f"duplicate query name {name!r}")
            catalog[name] = spec
    return _driver_priority_order(catalog)
