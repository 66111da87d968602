"""Generate COVERAGE.md: every registered query, its module, oracle status,
and one-line description — the line-by-line answer to SURVEY.md §2."""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import incubator_paimon_trino_spark.operators as ops
from incubator_paimon_trino_spark.operators.registry import ORACLES, QUERIES

ops.load_all()

FAMILY_NOTES = {
    "tpch": "TPC-H query shapes (engine-delegated SQL surface, SURVEY §2.B)",
    "tpch2": "TPC-H query shapes (continued)",
    "relational": "scan/projection/filter/limit/cast/scalar/nested/subqueries (§2.A4-A8, §2.B)",
    "aggregates": "aggregation surface incl. rollup/cube/grouping-sets/approx (§2.B)",
    "joins": "join surface: equi/outer/semi/anti/cross/theta/asof/range (§2.B)",
    "windows": "window functions & frames (§2.B)",
    "setops": "UNION/INTERSECT/EXCEPT [ALL] (§2.B)",
    "hof": "array higher-order fns, ordinality, quantified subqueries (§2.B)",
    "udfs": "UDF/UDAF/UDTF via Arrow-vectorized pandas UDFs (§2.B)",
    "patterns": "MATCH_RECOGNIZE-shaped sequential patterns (§2.B gap, closed)",
    "lake": "lake catalog: merge-on-read, time travel, snapshots, evolution (§2.A9-A19)",
    "merge_on_read": "PK-table merge engines (§2.A9)",
    "events": "event-time tumbling/sliding windows",
    "streaming": "Structured Streaming analogs",
    "dedup": "training-pipeline dedup (exact/jaccard/minhash/simhash/cosine/clusters)",
    "similarity": "ANN similarity search (brute-force + LSH-bucketed)",
    "text": "text analysis (lang-id, quality, tokens, fingerprints)",
    "multimodal": "binary columns + typed metadata, stubbed codecs",
    "sampling": "deterministic/stratified/reservoir sampling + splits",
    "packing": "sequence packing + deterministic shard layout for training",
    "clustering": "Lloyd's k-means + blocked embedding dedup",
}

rows = []
for name, fn in sorted(QUERIES.items()):
    mod = fn.__module__.rsplit(".", 1)[-1]
    doc = ((fn.__doc__ or "").strip().splitlines() or [""])[0]
    oracle = "full (hash)" if name in ORACLES else "rows-only"
    rows.append((mod, name, oracle, doc))

SURVEY_2B = [
    ("Scan + SELECT *", "scan_select_star"),
    ("Projection", "projection_pushdown"),
    ("Filter: comparisons / ranges", "filter_equality, filter_range_bounds, filter_between"),
    ("Filter: IN / IS [NOT] NULL / OR-of-ranges / LIKE", "filter_in_list, filter_null_checks, filter_not_null, filter_or_of_ranges, filter_like, filter_rlike"),
    ("LIMIT (+ OFFSET)", "limit_rowcount, limit_topk_deterministic, limit_offset_pagination, limit_fetch_with_ties"),
    ("Aggregation: SUM global", "agg_sum_global"),
    ("GROUP BY multi-key + ORDER BY", "agg_group_multi_key_orderby, agg_having, agg_conditional_sum"),
    ("count/min/max/avg/count-distinct", "agg_min_max_count, agg_count_distinct_multi, agg_collect_sorted, agg_pivot"),
    ("Approximate aggs (HLL / percentile sketches)", "agg_approx_count_distinct, agg_approx_percentile, agg_approx_count_distinct_bounded; exact twins agg_percentile_exact, agg_count_distinct_multi"),
    ("Statistical aggs", "agg_stddev_variance, agg_corr_covar_closed_form, agg_histogram_width_bucket, agg_bool_bitwise, agg_most_frequent, agg_max_by_min_by, agg_listagg_ordered"),
    ("Joins: inner/outer/semi/anti/cross/theta", "join_inner_equi, join_left_outer, join_right_outer, join_full_outer, join_left_semi, join_left_anti, join_cross, join_theta_inequality, join_skew_salted"),
    ("Joins: as-of / range / banded", "join_asof, join_range_banded"),
    ("Subqueries: correlated/uncorrelated/quantified/LATERAL", "subquery_correlated_exists, subquery_correlated_scalar, subquery_uncorrelated_scalar, subquery_not_in, subquery_all_quantified, subquery_lateral_topn"),
    ("Window: ranking / frames / top-N / sessionize", "window_row_number_rank, window_topn_per_group, window_lag_lead, window_running_sum_frame, window_range_frame, window_ntile_percent, window_global_rank_scalable (scale path), window_first_last_value, window_sessionization, window_nth_value_ignore_nulls, window_time_range_frame"),
    ("Sort / Top-K", "sort_multi_key, sort_nulls_ordering, limit_topk_deterministic"),
    ("Set ops", "setop_union_all, setop_union_distinct, setop_intersect, setop_intersect_all, setop_except, setop_except_all, setop_chained_union_order_limit"),
    ("Grouping sets / CUBE / ROLLUP / GROUPING_ID", "agg_grouping_sets, agg_cube, agg_rollup, agg_grouping_id"),
    ("DISTINCT", "distinct_values"),
    ("CAST / coercion", "cast_roundtrip, cast_try_invalid"),
    ("Scalar functions (string/date/math/regexp/json/url/hash/bitwise/conditional)", "scalar_string_functions, scalar_string_date_functions2, scalar_string_bit_functions3, scalar_date_functions, scalar_date_trunc_interval, scalar_math_functions, scalar_regexp_functions, scalar_json_functions, scalar_variant_json, scalar_conditional, scalar_url_functions, scalar_hash_functions, scalar_bitwise_ops"),
    ("Nested: row/map/array access, UNNEST [WITH ORDINALITY]", "nested_struct_access, nested_map_access, nested_array_ops, nested_array_set_ops, nested_explode_unnest, nested_unnest_multi, nested_posexplode_ordinality"),
    ("Array higher-order functions", "hof_transform_filter, hof_reduce_aggregate, hof_zip_with_weighted"),
    ("SHOW / DDL / information_schema", "WarehouseCatalog APIs + cat.sql() + information_schema.{schemata,tables,columns} (tests/test_catalog.py); lake_snapshots_system_table"),
    ("EXPLAIN", "plans/ helpers + tests/test_plan_quality.py"),
    ("Time travel / system tables / merge-on-read (connector A9-A13)", "lake_time_travel_v1, lake_snapshots_system_table, lake_merge_on_read, lake_schema_evolution, lake_partition_pruned_scan, lake_bucket_point_lookup, lake_clustered_scan, lake_incremental_read, lake_changelog_producer_lookup, lake_limit_pushdown_partition_scoped, lake_orc_scan, lake_tag_time_travel, lake_audit_log, lake_expire_snapshots, lake_rollback_to_snapshot, lake_sort_compacted_range_scan, lake_information_schema_columns, lake_sequence_field_merge, lake_partial_update_merge, lake_first_row_merge, lake_aggregation_merge_engine"),
    ("Streaming (beyond reference)", "streaming_tumbling_counts, streaming_session_windows, streaming_stateful_running_counts, streaming_dedup_keys, streaming_enrich_static_join, streaming_changelog_startup_from_snapshot, events_tumbling_window, events_sliding_window, events_cohort_retention"),
    ("UDF/UDAF/UDTF", "udf_pandas_scalar, udaf_pandas_grouped, udf_grouped_map_normalize, udtf_expand_priorities"),
    ("MATCH_RECOGNIZE (full Trino surface: measures/skip/exclusions/anchors/empty/unmatched/SUBSET)", "pattern_match_recognize_funnel, pattern_measures_one_row, pattern_running_measures_all_rows, pattern_exclusion_funnel_edges, pattern_unmatched_rows_coverage, pattern_end_anchor_trailing_run, pattern_show_empty_matches, pattern_alternation_funnel, pattern_bounded_quantifier_funnel, pattern_prev_navigation_runs, pattern_skip_to_last_overlap, pattern_funnel_view_click_purchase, pattern_error_within_5min_of_purchase, pattern_longest_click_streak"),
    ("MATCH_RECOGNIZE as a SQL clause through cat.sql (r13)", "pattern_sql_match_recognize; SQL-vs-DataFrame equality twins in tests/test_match_recognize_sql.py"),
    ("Streaming CEP (WITHIN bound, skip modes, in-state + value-column measures)", "streaming_pattern_within_funnel, streaming_pattern_skip_next, streaming_pattern_value_measures"),
    ("TABLESAMPLE BERNOULLI/SYSTEM spelling (r13)", "cat.sql rewrite -> Spark row sample; bounds-pinned in tests/test_match_recognize_sql.py (nondeterministic by definition — deterministic sampling is the sample_* family)"),
    ("Dedup (pipeline)", "dedup_exact, dedup_ngram_jaccard, dedup_minhash_lsh, dedup_minhash_lsh_md5, dedup_simhash, dedup_simhash_md5, dedup_embedding_cosine, dedup_embedding_cosine_blocked (scale path), dedup_cluster_components, dedup_containment, dedup_chunk_repetition, dedup_keep_list, dedup_incremental_new_batch"),
    ("Similarity search (pipeline)", "ann_cosine_topk, ann_lsh_bucketed, ann_lsh_bucketed_md5, ann_ivf_probe, embedding_norm_stats, embedding_kmeans_assign"),
    ("Text analysis (pipeline)", "text_langid, text_quality_score, text_token_count, text_fingerprint, text_rolling_hash_shingles, text_pii_scrub, text_contamination_check, text_quality_funnel, text_rare_word_ratio, text_unigram_logprob"),
    ("Multimodal (pipeline)", "multimodal_binary_metadata, multimodal_feature_extract, multimodal_frame_sample, multimodal_audio_rms_window, multimodal_image_resize_plan"),
    ("Sampling / domain mixing (pipeline)", "sample_deterministic_hash, sample_stratified_by_lang, sample_reservoir_per_group, sample_train_val_test, mix_domain_weights"),
    ("Sequence packing / shard layout (pipeline)", "pack_concat_offsets, pack_sequence_stats, train_shuffle_shard"),
    ("SQL write facade (beyond reference)", "lake_dml_roundtrip (CTAS + INSERT + UPDATE + DELETE under the hash gate)"),
    ("File indexes: bloom/bitmap sidecar data skipping (Paimon file-index family)", "lake_bloom_index_point_lookup, lake_bitmap_index_lookup, lake_dynamic_file_pruning (join-driven); CALL sys.rebuild_file_index backfill (tests/test_file_index.py)"),
    ("Z-order / Hilbert sort compaction + write clustering (Paimon order_strategy / clustering.strategy)", "lake_zorder_compacted_scan (in-query plan asserts); tests/test_zorder.py (zorder + hilbert + write-clustering pins)"),
    ("Prefix-LIKE file skipping (beyond the reference's converter)", "lake_like_prefix_pruned_scan; like_prefix_domain edge pins in tests/test_types_predicates_plans.py"),
    ("Read-optimized table $ro + rowkind.field CDC ingestion", "lake_read_optimized_table, lake_rowkind_field_cdc; tests/test_ro_rowkind.py"),
    ("TPC-H suite", "q1..q22 (22 queries)"),
]

out = [
    "# COVERAGE — registry inventory vs SURVEY.md §2",
    "",
    f"{len(QUERIES)} registered queries, {len(ORACLES)} with a full DuckDB value-hash",
    "oracle (the rest are rows-only: sketch/hash ops with no SQL twin).",
    "Generated by `python tools/coverage_md.py > COVERAGE.md` — regenerate after",
    "adding queries.",
    "",
    "## SURVEY §2 rows → query names",
    "",
    "| SURVEY §2 row | queries |",
    "|---|---|",
]
out += [f"| {row} | {qs} |" for row, qs in SURVEY_2B]
out += [""]
cur = None
for mod, name, oracle, doc in sorted(rows):
    if mod != cur:
        cur = mod
        out += ["", f"## {mod} — {FAMILY_NOTES.get(mod, '')}", "", "| query | oracle | what |", "|---|---|---|"]
    out.append(f"| `{name}` | {oracle} | {doc} |")
print("\n".join(out))
