"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``incubator_paimon_trino_spark.operators.*``; this module
just re-exports the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import incubator_paimon_trino_spark.operators as _ops
from incubator_paimon_trino_spark.operators.registry import ORACLES, QUERIES

_ops.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _driver_verified() -> tuple[dict[str, int], set[str]]:
    """(verified → round of latest green verdict, red): queries any prior
    driver pass already verified (green hash or declared rows-only), and
    queries with a red verdict (hash/row mismatch or harness error). The
    driver checks a PREFIX of the registry each round, so verified ones go
    LAST, red ones go FIRST (the fix needs re-proving), and never-checked
    queries fill the middle round-robin across operator families — any
    prefix the driver takes then maximizes §2-family coverage. The verified
    round feeds the tail rotation: with full-registry closure every prefix
    slot re-proves a green row, so spend those slots on the STALEST verdicts
    (code keeps evolving under r1-era greens). Reads every
    CORRECTNESS_r*.json so the ordering keeps itself current round over
    round."""
    import glob
    import json
    import re

    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, green)
    for path in glob.glob(str(Path(_REPO) / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(Path(path).read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            green = bool(r.get("hash_match")) or r.get("err") == "no_oracle"
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, green)
    # the LATEST round's verdict wins: a red that a later round re-proved
    # green must not keep displacing never-checked queries from the prefix
    red = {n for n, (_, g) in latest.items() if not g}
    done = {n: rnd for n, (rnd, g) in latest.items() if g}
    for n in _R1_VERIFIED - red - set(done):
        done[n] = 1
    return done, red


# Fallback seed for the r1 verdicts (r1's json predates this logic's need,
# but keep the explicit set in case the file is pruned).
_R1_VERIFIED = {
    "agg_sum_global", "agg_min_max_count", "agg_group_multi_key_orderby",
    "agg_having", "agg_count_distinct_multi", "agg_approx_count_distinct",
    "agg_percentile_exact", "agg_stddev_variance", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_pivot", "agg_conditional_sum",
    "agg_collect_sorted", "agg_corr_covar_closed_form",
    "agg_histogram_width_bucket", "agg_bool_bitwise", "agg_grouping_id",
    "agg_approx_count_distinct_bounded", "agg_most_frequent",
    "agg_max_by_min_by", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_cluster_components", "dedup_simhash_md5", "dedup_containment",
    "events_tumbling_window", "events_sliding_window",
    "streaming_tumbling_counts", "streaming_session_windows",
    "streaming_stateful_running_counts", "events_cohort_retention",
    "join_inner_equi", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_left_semi", "join_left_anti", "join_cross",
    "join_theta_inequality", "join_range_banded", "join_asof",
    "join_skew_salted", "lake_time_travel_v1", "lake_merge_on_read",
}


# Never-checked queries that carry a disproportionate share of the §2 proof
# burden (r2 verdict items 2/4/6/7): the lake_* family proves A9/A16/A18/A8,
# the scale twins prove the documented anti-pattern rows have working
# replacements, and cast/udf/pattern complete their families. These jump the
# family round-robin so they all land inside the driver's ~50-query prefix.
_PRIORITY_PREFIXES = ("cast_", "lake_", "pattern_")
_PRIORITY_NAMES = {
    "window_global_rank_scalable",
    "ann_lsh_bucketed_md5",
    "ann_ivf_probe",
    "dedup_keep_list",
    "udf_grouped_map_normalize",
}

# Queries added in round 3+: they queue BEHIND the pre-existing never-checked
# backlog (r2 verdict item 3 — new additions must not displace the older
# unverified queries from the driver's prefix until that backlog drains).
# r5: the backlog is drained to 8 (all judge-verified locally) — the queue is
# empty and new surface may land at the front again (r4 verdict item 6).
_DEFER_NEW: set[str] = set()

# Verified-green queries whose CODE PATH changed since their last driver
# verdict — r10 amendment (VERDICT r9 item 2): changed-code greens outrank
# stale-but-unchanged greens in the prefix. ORDERED, most-changed first.
# r13's wave: every pattern query runs the CHUNK-WISE partition-batched
# matcher (open-key-span carry) with the rewritten empty-match emission
# (OMIT keeps gapped numbers — brief item 2 + ADVICE medium); the
# streaming CEP family runs the extended measures parser + widened state
# tuple (value-column projection, item 3); udf_grouped_map_normalize is
# freshly partition-batched (item 5); the two global-rank windows and the
# WITH TIES query carry the new one-valued partition spec (item 8); and
# EVERY lake read flows through the r13 cache key (predicated domains +
# honest LRU, item 4) — the lake family re-proves stalest-first behind
# the named heads. (pattern_sql_match_recognize and
# streaming_pattern_value_measures are NEW — they jump via the
# never-checked priority prefixes, not this list.)
_REPROOF: tuple[str, ...] = (
    # r13: chunk-wise matcher + empty-match emission rewrite
    "pattern_show_empty_matches",
    "pattern_unmatched_rows_coverage",
    "pattern_match_recognize_funnel",
    "pattern_measures_one_row",
    "pattern_running_measures_all_rows",
    "pattern_exclusion_funnel_edges",
    "pattern_end_anchor_trailing_run",
    "pattern_alternation_funnel",
    "pattern_bounded_quantifier_funnel",
    "pattern_prev_navigation_runs",
    "pattern_skip_to_last_overlap",
    "pattern_funnel_view_click_purchase",
    "pattern_error_within_5min_of_purchase",
    "pattern_longest_click_streak",
    # r13: streaming CEP measures parser + state tuple widened
    "streaming_pattern_skip_next",
    "streaming_pattern_within_funnel",
    # r13: partition-batched rewrite (item 5)
    "udf_grouped_map_normalize",
    # r13: one-valued partition spec on the metadata-scale windows (item 8)
    "window_ntile_percent",
    "window_global_rank_scalable",
    "limit_fetch_with_ties",
    # r13: plan cache rekeyed (predicated domains + honest LRU) — every
    # read_table consumer, riskiest first
    "lake_deletion_vector_read",
    "lake_delta_base_split_read",
    "lake_bloom_index_point_lookup",
    "lake_bitmap_index_lookup",
    "lake_dv_cdc_pipeline",
    "lake_dv_changelog_stream",
    "lake_merge_on_read",
    "lake_compacted_merge_free_read",
    "lake_time_travel_v1",
    "lake_tag_time_travel",
    "lake_dml_roundtrip",
    "lake_partition_delete",
    "lake_read_optimized_table",
    "lake_sort_compacted_range_scan",
    "lake_zorder_compacted_scan",
    "lake_clustered_scan",
    "lake_agg_collect_merge_map",
    "lake_agg_nested_update",
    "lake_agg_ignore_retract",
    "lake_aggregation_merge_engine",
    "lake_partial_update_sequence_group",
    "lake_partial_update_merge",
    "lake_partial_update_remove_on_delete",
    "lake_first_row_merge",
    "lake_sequence_field_merge",
    "lake_rowkind_field_cdc",
    "lake_ignore_delete",
    "lake_dynamic_bucket",
    "lake_bucket_point_lookup",
    "lake_incremental_read",
    "lake_incremental_by_timestamp",
    "lake_consumer_incremental_dedup",
    "lake_consumer_resume",
    "lake_schema_evolution",
    "lake_orc_scan",
    "lake_avro_roundtrip",
    "lake_manifest_changelog_stream",
    "lake_timestamp_precision",
    "lake_char_padded_read",
    "lake_like_prefix_pruned_scan",
    "lake_dynamic_file_pruning",
    "lake_limit_pushdown_partition_scoped",
    "lake_partition_pruned_scan",
    "lake_partition_expiration",
    "lake_fallback_branch",
    # r11 invariant carriers (unchanged r12, still ahead of stale greens)
    "agg_approx_count_distinct",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "multimodal_feature_extract",
    "streaming_stateful_running_counts",
)


def _ordered_names() -> list[str]:
    """Red (fixed, re-prove) first, then priority never-checked, then the
    remaining never-checked interleaved round-robin by family, verified last
    — the verified tail ordered OLDEST verdict first (r6 verdict item 3:
    with full-registry closure the prefix's spare slots should refresh the
    stalest greens, not whatever the registry order happens to lead with)."""
    from itertools import zip_longest

    verified, red = _driver_verified()
    # a typo'd or renamed entry in the hand-kept sets would silently void the
    # ordering policy it encodes — make drift loud instead
    for n in _PRIORITY_NAMES | _DEFER_NEW | set(_REPROOF):
        assert n in QUERIES, f"ordering policy names unknown query {n!r}"
    order = [n for n in QUERIES if n in red]  # fixed red rows re-prove first
    pri = [
        n
        for n in QUERIES
        if n not in verified
        and n not in red
        and n not in _DEFER_NEW  # deferred additions never jump via a prefix
        and (n.startswith(_PRIORITY_PREFIXES) or n in _PRIORITY_NAMES)
    ]
    order.extend(pri)
    taken = set(order) | set(verified)
    fams: dict[str, list[str]] = {}
    for n in QUERIES:
        if n in taken or n in _DEFER_NEW:
            continue
        fams.setdefault(n.split("_")[0], []).append(n)
    for row in zip_longest(*fams.values()):
        order.extend(n for n in row if n is not None)
    order.extend(n for n in QUERIES if n in _DEFER_NEW and n not in verified and n not in red)
    # _REPROOF is ORDERED (most-changed code first) so the driver's prefix
    # spends its slots on the riskiest re-proofs
    emitted = set(order)
    order.extend(n for n in _REPROOF if n in verified and n not in emitted)
    reg_idx = {n: i for i, n in enumerate(QUERIES)}
    tail = [n for n in QUERIES if n in verified and n not in _REPROOF]
    tail.sort(key=lambda n: (verified[n], reg_idx[n]))  # stalest verdict first
    order.extend(tail)
    return order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
