"""Driver-verified coverage ledger.

Names the driver has already hash-checked in past rounds
(CORRECTNESS_r{N}.json keys).  ``__spark_entry__.queries()`` orders
UNCHECKED entries first so each round's 50-query driver sample lands
on the least-verified part of the battery - rotating coverage toward
241/241 driver-verified (VERDICT r1, "Next round" item 6).
Regenerate by unioning the keys of every CORRECTNESS_r*.json.
"""

DRIVER_CHECKED = {
    "agg_distinct",
    "anti_join_not_exists",
    "array_edit_functions",
    "array_functions",
    "array_set_operations",
    "arrow_python_udf",
    "asof_join",
    "cached_read_agg",
    "cogrouped_asof_enrich",
    "conditional_functions",
    "cube_agg",
    "engine_sql_agg",
    "engine_write_roundtrip",
    "events_rollup_hierarchy",
    "events_sessionize",
    "events_sliding_window",
    "events_tumbling_window",
    "exists_agg",
    "explode_outer_semantics",
    "global_topk",
    "having_filter",
    "map_entries_functions",
    "map_functions",
    "merge_upsert",
    "pandas_udaf_gini",
    "pandas_udf_iterator_scale",
    "pandas_udf_zscore",
    "pivot_status",
    "q10_returned_items",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "query_result_cache",
    "rollup_agg",
    "scan_filter_project",
    "semi_join_exists",
    "session_window_batch",
    "set_except",
    "set_intersect",
    "set_union",
    "skew_key_profile",
    "topk_per_group",
    "trig_functions",
    "unpivot_melt",
    "window_analytic_family",
    "window_lag_delta",
    "window_range_interval",
    "window_running_sum",
    "zorder_layout_key",
}
