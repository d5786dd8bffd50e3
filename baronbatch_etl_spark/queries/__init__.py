"""Named query registry — the engine's public query catalog.

Every operator from SURVEY §2 ships here as a ``QuerySpec``: a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB-ANSI oracle string over the
same parquet tables. ``__spark_entry__.queries()/oracle_sql()`` are
thin views over this registry; ``tools/check_oracle.py`` replays the
driver's row-count + schema + order-insensitive value-hash check
locally.

Determinism rules every entry follows (so hashes match across
engines):
  * window/row_number orderings always include a unique tiebreaker;
  * double SUMs go through DECIMAL(18,x) (exact, order-independent)
    and come back as DOUBLE;
  * every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


# Registry iteration order. External checkers run the catalog front to
# back under a bounded per-run budget (~50 queries). Round-4 goal:
# ROTATE THE STALE ROWS — 46 queries' newest driver row was r01 and 42
# more were last checked in r02 (round 3 spent its window on the
# then-new entries, all now green in CORRECTNESS_r03). So the oldest
# rows lead: every r01-last query except p1/p2 (trivial projections
# whose machinery every other window query re-exercises — parked at
# 51-52), then the r02 stragglers the round-3 review called out by
# name (j_salted_skew_join, f_url_encode, the st_* streaming twins)
# plus mm_features — the catalog's only driver-checked exerciser of
# the mapInPandas/Arrow Python-worker path, kept in-window per the
# round-3 advice. Everything r03-green sits after the r02 remainder:
# freshest rows last. tests/test_registry.py re-derives this invariant
# from the CORRECTNESS_r0*.json files so the rotation can't silently
# rot.
_PRIORITY: tuple[str, ...] = (
    # --- r4 window (50): newest driver row r01 — TPC-H shapes checked
    # only in round 1 first ---
    "h_local_supplier_volume",
    "h_order_priority",
    "h_returned_items",
    "h_small_qty_revenue",
    "h_disjunctive_revenue",
    "h_nation_volume",
    "h_promo_revenue",
    # joins (r01)
    "j2_staged_resolution",
    "j3_anti_orphans",
    "j4_semi_user_matches",
    "j5_ingest_dedup",
    "j6_lookup_with_default",
    "j7_membership_scan",
    "j1_broadcast_dim_lookup",
    "j_asof_join",
    # aggregations (r01)
    "a2_grouped_rollup",
    "a3_champion_rollup",
    "a5_scalar_aggs",
    "a6_distinct_sorted",
    "a7_table_counts",
    "a8_keep_first_dedup",
    "a_count_distinct",
    "a_percentiles",
    "a_rollup_hierarchy",
    # kept TPC-H five (r01)
    "h_pricing_summary",
    "h_shipping_priority",
    "h_large_volume_customer",
    "h_forecast_revenue",
    "h_top_supplier",
    # SQL-surface reshapes (r01)
    "q_pivot_status",
    "q_cube_status_priority",
    "q_unpivot",
    # scalar-function families (r01)
    "f_string_ops",
    "f_norm_concat",
    "f_derived_metrics",
    "f_date_ops",
    "f_array_ops",
    "f_map_lookup",
    "f_json_extract",
    "f_rlike_match",
    # filters/projections (r01)
    "p3_ci_name_lookup",
    "p4_membership",
    "p5_array_first_match",
    "p12_posexplode",
    # --- r02 stragglers named by the round-3 review ---
    "j_salted_skew_join",
    "f_url_encode",
    "mm_features",  # the mapInPandas/Arrow-worker path exerciser
    "st_dedup_ingest",
    "st_session_window",
    "st_stream_join",
    # --- 51-52: the two parked r01 rows (trivial, plan-asserted;
    # every window query runs the same scan/project machinery) ---
    "p1_projection",
    "p2_filter_eq",
    # --- new this round (no driver row yet; first overflow slot
    # after the parked pair, window next round) ---
    "mm_audio_stats",
    "mm_resize_stats",
    "mm_pixel_ahash",
    "t_mixture_plan",
    "h_order_count_distribution",
    "h_waiting_suppliers",
    "h_dormant_customers",
    "t_weighted_sample",
    "w_funnel",
    "w_cohort_retention",
    "w_event_transitions",
    "t_domain_quota",
    "t_split_leakage_safe",
    "t_perplexity_bucket",
    "t_source_entropy",
    "s_mips_topk",
    "s_pq_codes",
    "s_pq_adc_topk",
    "g_pagerank",
    "s_ivfpq_topk",
    "w_rfm_segment",
    "g_hits",
    "s_pq_recall",
    "w_peak_concurrency",
    "j_interval_overlap",
    "w_m4_downsample",
    "w_attribution",
    "a_value_histogram",
    "a_gini_concentration",
    "g_pagerank_weighted",
    "g_triangle_count",
    "a_basket_pairs",
    "h_market_share",
    "w_anomaly_zscore",
    "w_streak_islands",
    "g_adamic_adar",
    "q_snapshot_diff",
    "w_percent_of_total",
    "d_containment",
    "w_time_to_convert",
    "h_profit_by_nation",
    "a_correlation",
    "a_linear_trend",
    "w_ab_test",
    "g_degree_distribution",
    "s_hybrid_rrf",
    "w_seasonal_residual",
    "w_cusum_changepoint",
    "h_parts_supplier_count",
    # --- r02-last remainder: next-oldest rows ---
    "a1_dup_finder",
    "a_approx_distinct",
    "d_exact_dedup",
    "d_dup_clusters",
    "d_embedding_neardup",
    "d_ngram_jaccard",
    "d_simhash_pairs",
    "d_span_dedup",
    "q_sql_exists",
    "q_sql_grouping_sets",
    "q_sql_lateral",
    "q_sql_scalar_subquery",
    "s_batch_topk",
    "s_ivf_recall",
    "s_label_centroids",
    "s_quantize_int8",
    "s_srp_topk",
    "set_ops",
    "t_bpe_tokens",
    "t_contamination",
    "t_corpus_dedup",
    "t_fingerprint",
    "t_lang_id",
    "t_length_filter",
    "t_mixture_sample",
    "t_pack_sequences",
    "t_pii_redact",
    "t_quality_score",
    "t_repetition",
    "t_tfidf",
    "t_token_topk",
    "w1_retention_trim",
    "w_range_frame",
    "w_rank_lag_lead",
    "w_resample_ffill",
    "w_sessionize",
)
# Everything else (all r03-green — freshest rows) follows in
# registration order via load_all().


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (idempotent) and return the registry
    in checker-priority order (see ``_PRIORITY``)."""
    from baronbatch_etl_spark.queries import (  # noqa: F401
        catalog_aggs,
        catalog_core,
        catalog_corpus,
        catalog_curation,
        catalog_graph,
        catalog_heavy,
        catalog_joins,
        catalog_llm,
        catalog_sql,
        catalog_streaming,
        catalog_windows,
    )

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update(
        (n, s) for n, s in REGISTRY.items() if n not in ordered
    )
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
