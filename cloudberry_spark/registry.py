"""Query registry: the single source of truth wiring operators to the
driver contract (__spark_entry__.py) and to tests.

Each implemented operator from SURVEY.md §2 registers a named ``Query``:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when the semantics are
SQL-expressible) the equivalent DuckDB SQL oracle. This mirrors the
reference's pg_regress strategy (SURVEY.md §5): every operator has a
golden-comparable end-to-end query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.catalog import ensure_views

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    The wrapper registers the fixture temp views first, so query bodies
    may freely use ``spark.sql`` over the canonical table names.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from cloudberry_spark.session import configure_session

            configure_session(spark)
            ensure_views(spark, sf_dir)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc, tags=tags)
        return wrapped

    return deco


def register_sql(
    name: str,
    sql: str,
    oracle: str | None = "same",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> None:
    """Register a query whose Spark side is a SQL string. When the text is
    dialect-portable, ``oracle='same'`` reuses it verbatim for DuckDB."""

    @register(name, oracle=sql if oracle == "same" else oracle, doc=doc, tags=tags)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        return spark.sql(_sql)

    _q.__name__ = name


def _load_all() -> None:
    """Import every operator module for registration side effects."""
    import cloudberry_spark.operators.tpch  # noqa: F401
    import cloudberry_spark.operators.aggregates  # noqa: F401
    import cloudberry_spark.operators.joins  # noqa: F401
    import cloudberry_spark.operators.windows  # noqa: F401
    import cloudberry_spark.operators.setops  # noqa: F401
    import cloudberry_spark.operators.scalars  # noqa: F401
    import cloudberry_spark.operators.json_ops  # noqa: F401
    import cloudberry_spark.operators.arrays  # noqa: F401
    import cloudberry_spark.operators.recursive  # noqa: F401
    import cloudberry_spark.operators.sampling  # noqa: F401
    import cloudberry_spark.operators.dml  # noqa: F401
    import cloudberry_spark.operators.ddl  # noqa: F401
    import cloudberry_spark.operators.distribution  # noqa: F401
    import cloudberry_spark.operators.rewrites  # noqa: F401
    import cloudberry_spark.operators.sketches  # noqa: F401
    import cloudberry_spark.operators.contrib  # noqa: F401
    import cloudberry_spark.operators.textsearch  # noqa: F401
    import cloudberry_spark.operators.pgtypes  # noqa: F401
    import cloudberry_spark.operators.reports  # noqa: F401
    import cloudberry_spark.operators.maps  # noqa: F401
    import cloudberry_spark.sources.external  # noqa: F401
    import cloudberry_spark.sources.pyfdw  # noqa: F401
    import cloudberry_spark.functions.udx  # noqa: F401
    import cloudberry_spark.sql.compat_queries  # noqa: F401
    import cloudberry_spark.pipeline.dedup  # noqa: F401
    import cloudberry_spark.pipeline.similarity  # noqa: F401
    import cloudberry_spark.pipeline.text  # noqa: F401
    import cloudberry_spark.pipeline.multimodal  # noqa: F401
    import cloudberry_spark.pipeline.composed  # noqa: F401
    import cloudberry_spark.pipeline.components  # noqa: F401
    import cloudberry_spark.pipeline.curation  # noqa: F401
    import cloudberry_spark.pipeline.classify  # noqa: F401
    import cloudberry_spark.pipeline.graph  # noqa: F401
    import cloudberry_spark.streaming.windows  # noqa: F401
    import cloudberry_spark.streaming.ivm  # noqa: F401
    import cloudberry_spark.streaming.stateful  # noqa: F401


_LOADED = False


def all_queries() -> dict[str, Query]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return dict(_REGISTRY)



#: Queries that must lead their family in interleaved_queries():
#: recently fixed or newly added operators whose correctness most
#: needs external (driver-sample) confirmation.
_LEAD = [
        # round 5 additions first: these most need driver confirmation
        "ml_multiple_regression",
        "ml_logistic_regression",
        "ml_auc_roc",
        "ml_decision_stump",
        "ml_pca_power_iteration",
        "ml_knn_classifier",
        "ml_t_test_welch",
        "ml_lift_deciles",
        "text_bpe_merge_round",
        "graph_link_prediction",
        "dedup_source_cap",
        "events_attribution_last_touch",
        "multimodal_image_bmp_decode",
        "recursive_shortest_path",
        "analytics_rfm_segments",
        "emb_product_quantization",
        "events_pattern_vshape",
        "copy_fixedwidth_parse",
        "events_ohlc_bars",
        "ml_correlation_matrix",
        "ivm_count_distinct_refresh",
        "win_moving_median",
        "ml_kmeans_silhouette",
        "multimodal_video_frame_decode",
        "array_basic_ops",
        "array_set_operations",
        "map_hstore_ops",
        "analytics_association_rules",
        "sketch_minhash_set_algebra",
        "events_changepoint_cusum",
        "ml_linear_svm_gd",
        "ml_feature_hashing",
        "graph_degree_assortativity",
        "join_asof_nearest",
        "win_gap_islands",
        "ml_gmm_em_1d",
        "stream_append_mode_finalized",
        "ml_precision_recall_curve",
        "events_cohort_ltv",
        "dml_scd2_history_build",
        "ddl_check_constraints",
        "ddl_rebucket_expand",
        "pipeline_dataset_card",
        "events_slo_burn_rate",
        "misc_dense_row_ids",
        "agg_mean_family",
        "events_session_duration_histogram",
        "events_dau_wau_mau",
        "ml_split_stability_audit",
        "multimodal_image_resize",
        "tpcds_store_sales_profile",
        "ml_text_classifier_e2e",
        "graph_kcore_peel",
        "ml_item_item_recommender",
        "events_forecast_backtest",
        "dedup_cross_source_leakage",
        "agg_distinct_rollup",
        "ml_bot_detection_composite",
        "scalar_regexp_pg15",
        "agg_bitmap_distinct",
        "join_null_safe_eq",
        "ml_kaplan_meier",
        "ml_ipw_treatment_effect",
        "graph_pagerank",
        "graph_triangle_count",
        "sketch_countmin_freq",
        "sketch_bloom_membership",
        "stream_session_window_native",
        "stream_static_join",
        "text_token_shards",
        "events_peak_concurrency",
        "text_sequence_pack",
        # round 4 additions: these most need driver confirmation
        "agg_heavy_hitters_mg",
        "sample_weighted_ares",
        "scalar_date_bin",
        "array_generate_subscripts",
        "win_named_window_clause",
        "text_bpeish_tokens_re2",
        "events_time_weighted_avg",
        "win_gapfill_locf",
        "win_filter_clause",
        "scalar_crypto_digests",
        "scalar_citext_semantics",
        "scalar_earth_distance",
        "ltree_hierarchy_ops",
        "scalar_unaccent",
        "scalar_orafce_compat",
        "sql_plan_hints",
        "join_scd2_point_in_time",
        "emb_matryoshka_recall",
        "ml_naive_bayes_langid",
        "ml_mad_outliers",
        "events_markov_transition",
        "text_zipf_fit",
        "ml_chi2_independence",
        "ml_event_entropy",
        "scalar_format_sprintf",
        "dedup_containment_pairs",
        "scalar_regexp_backrefs",
        "scalar_horology_fields",
        "agg_weighted_median",
        "pipeline_curate_to_sequences",
        "tpcds_rank_delta",
        "win_cumulative_distinct",
        "diag_gini_coefficient",
        "diag_hhi_concentration",
        "diag_pareto_8020",
        "ml_halfsample_bootstrap",
        "dedup_minhash_estimator_audit",
        "events_ewma_smoothing",
        "dml_cascade_delete",
        "events_funnel_time_bounded",
        "agg_higher_moments",
        "events_autocorr_lag1",
        "events_interarrival_buckets",
        "scalar_url_parse",
        # round 3 additions: these most need driver confirmation
        "scalar_geometric_ops",
        "scalar_inet_ops",
        "scalar_money_cash",
        "scalar_bitstring_ops",
        "scalar_uuid_format",
        "xml_xpath_table",
        "sample_hash_split",
        "text_chunk_windows",
        "dedup_substring_chunks",
        "text_quality_tiers",
        "dedup_canonical_pick",
        "sim_lsh_recall",
        "stream_foreachbatch_upsert",
        "join_spatial_grid",
        "join_inet_lpm",
        "text_bigram_surprisal",
        "win_percentile_partition",
        "sink_multilevel_partitions",
        "sim_ivf_recall",
        "tpcds_rollup_rank",
        "tpcds_channel_union",
        "tpcds_moving_avg",
        "tpcds_cross_shop",
        "events_hierarchical_rollup",
        "diag_key_skew",
        # round 2 additions
        "agg_array_agg",
        "agg_approx_distinct",
        "agg_percentile_approx",
        "agg_hll_union_rollup",
        "stream_live_tumbling",
        "stream_stream_join",
        "stream_stateful_sessionize",
        "sim_cosine_neardup",
        "sim_neardup_lsh_banded",
        "copy_execute_pipe",
        "fdw_jdbc",
        "scalar_soundex_fuzzy",
        "scalar_interval_column",
        "json_path_filter_predicate",
]


def interleaved_queries() -> dict[str, Query]:
    """All queries, round-robin-interleaved across operator families.

    Harnesses that sample a prefix of the query dict (e.g. a correctness
    driver checking the first N) should see one representative of every
    SURVEY §2 family before seeing the second of any — so the ordering
    groups by each query's first tag and interleaves. Within a family,
    registration order is preserved (most canonical example first).
    """
    fams: dict[str, list[Query]] = {}
    for q in all_queries().values():
        fams.setdefault(q.tags[0] if q.tags else "misc", []).append(q)
    lead = _LEAD
    rank = {n: i for i, n in enumerate(lead)}
    for b in fams.values():
        b.sort(key=lambda q: rank.get(q.name, len(rank)))
    out: dict[str, Query] = {}
    depth = max(len(b) for b in fams.values())
    for i in range(depth):
        for b in fams.values():
            if i < len(b):
                out[b[i].name] = b[i]
    return out


def get_query(name: str) -> Query:
    return all_queries()[name]
