package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and returns rows; every oracle key
  * refers to a declared query; the flagship entry is non-empty. (The
  * value-level check is the driver's DuckDB compare — scripts/local_verify.py
  * mirrors it for local runs.)
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle SQL for undeclared queries: $unknown")
  }

  test("the declared operator queries are all present (SURVEY §2)") {
    val declared = Set(
      // original 20-query contract
      "scan", "projection", "filter", "join_inner", "cross_join",
      "union_all", "agg_group", "distinct", "sort_limit", "window_rank",
      "scalar_funcs", "delta_scan", "delta_projection", "delta_filter",
      "delta_join", "delta_cross_join", "delta_union", "dedup_exact",
      "text_stats", "events_hourly",
      // round-2 surface
      "join_left", "join_semi", "join_anti", "multi_join", "agg_having",
      "scalar_subquery", "case_when", "events_json", "set_intersect",
      "set_except", "rollup_agg", "delta_agg", "sql_cte",
      "dedup_minhash", "dedup_simhash", "dedup_ngram", "neardup_embedding",
      "token_count", "quality_score", "lang_id", "fingerprint",
      "multimodal_meta", "multimodal_decode", "multimodal_frames",
      "similarity_topk", "ann_lsh",
      "ann_ivf", "sessions_gap", "delta_distinct", "window_funcs",
      // round-3 surface
      "events_asof", "doc_chunks", "sample_stratified", "approx_stats",
      "dedup_survivors", "top_tokens", "keywords",
      // round-4 surface
      "pivot_agg", "cube_agg", "unpivot_long", "agg_quantiles",
      "range_join", "events_funnel", "delta_semi_join", "delta_left_signed",
      "join_full", "delta_dedup", "bigram_coverage",
      "window_dist", "delta_keyscoped", "delta_topk", "delta_count_distinct",
      "window_range", "grouping_sets",
      // round-5 surface
      "delta_rollup", "stream_hourly", "delta_minhash",
      "embedding_centroids", "delta_lsh_candidates", "delta_distinct_join",
      "delta_intersect", "delta_except_signed", "delta_range_join",
      "stream_sessions", "seq_pack", "corpus_stats",
      // round-6 surface
      "delta_agg_join", "stream_correlate", "delta_centroids",
      "delta_ann_topk", "decontaminate", "delta_agg_agg",
      "gopher_quality", "domain_mix", "stream_dedup",
      "word_repetition", "delta_asof", "delta_two_level", "delta_gopher",
      "delta_static_dim", "delta_decontaminate", "dedup_passage",
      // round-7 surface
      "delta_minmax", "events_csv", "events_jsonl", "delta_group_distinct",
      "pii_scrub", "delta_survivors", "join_salted",
      // round-8 surface
      "delta_group_topk", "events_orc", "join_bucketed",
      "deltalake_scan", "deltalake_time_travel", "deltalake_appends",
      "delta_deltalake", "deltalake_skipping", "deltalake_evolution",
      // round-9 surface
      "delta_deltalake_delete", "delta_deltalake_skipping",
      "iceberg_scan", "iceberg_time_travel", "delta_iceberg",
      "delta_iceberg_delete", "iceberg_skipping",
      "delta_deltalake_rowview", "delta_deltalake_update",
      "delta_lake_dedup",
      // round-10 surface
      "deltalake_dv_scan", "delta_deltalake_dv", "iceberg_mor_scan",
      "iceberg_days_partition", "delta_deltalake_merge",
      "deltalake_column_mapping", "iceberg_eq_delete",
      "delta_deltalake_cdf", "deltalake_v2_checkpoint",
      // round-11 surface
      "delta_iceberg_mor", "iceberg_rename", "deltalake_id_mapping",
      "delta_deltalake_optimize", "deltalake_variant", "stream_deltalake",
      "stream_iceberg", "delta_iceberg_eq", "stream_deltalake_cdf",
      "stream_iceberg_changelog", "delta_iceberg_compact",
      "delta_iceberg_undelete", "iceberg_spec_evolution",
      "iceberg_dv_scan", "delta_iceberg_dv", "stream_deltalake_sink", "stream_iceberg_sink",
      "iceberg_name_mapping", "iceberg_tag_read",
      "deltalake_shallow_clone", "deltalake_vacuum", "iceberg_expire",
      "deltalake_compact", "iceberg_rewrite",
      // round-12 surface
      "deltalake_write", "deltalake_delete_dml", "deltalake_update_dml",
      "deltalake_merge_dml", "iceberg_write", "iceberg_delete_dml",
      "iceberg_update_dml", "deltalake_zorder", "iceberg_merge_dml",
      "deltalake_cdf_dml", "iceberg_zorder", "deltalake_restore",
      "iceberg_rollback",
      // round-13 surface
      "deltalake_reader_api", "iceberg_reader_api",
      "deltalake_writer_api", "sql_lake_identifier",
      "iceberg_branch_write", "iceberg_wap_publish", "iceberg_orc_scan",
      "catalog_sql_read", "catalog_multi_table_txn", "catalog_time_travel",
      "catalog_insert_sql",
      // round-14 surface
      "catalog_delete_sql", "catalog_update_sql", "catalog_merge_sql",
      "iceberg_avro_scan", "sql_path_dml", "catalog_create_sql",
      "iceberg_orcid_rename",
      // round-15 surface
      "catalog_merge_delete_sql", "catalog_alter_sql",
      "stream_catalog", "catalog_maintenance_sql",
      "catalog_constraint_sql", "catalog_identity_sql",
      // round-15 surface, second wave (previously mislabeled
      // round-16 — the section labels had drifted one ahead of the
      // driver's counter)
      "catalog_merge_identity_sql", "catalog_widen_sql",
      "catalog_nested_sql", "catalog_default_sql",
      "catalog_replace_sql",
      // round-16 surface
      "catalog_subquery_dml", "catalog_merge_evolve_sql",
      "catalog_nested_delta_sql", "catalog_backfill_default_sql",
      "approx_stats_exact", "catalog_nested_set_sql",
      "catalog_iceberg_default_sql", "catalog_merge_evolve_nested_sql",
      // round-17 surface
      "catalog_rename_delta_sql", "catalog_checkpoint_sql",
      "catalog_manifest_rewrite_sql", "ann_pq", "delta_pq_topk",
      "catalog_history_sql", "ann_ivfpq")
    assert(declared.size == 218)
    val missing = declared -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"missing declared queries: $missing")
    val undeclared = SparkEntry.queries.keySet -- declared
    assert(undeclared.isEmpty,
      s"queries not in the declared inventory (update SURVEY §2): $undeclared")
    // approx_stats is the one legitimately spec-pinned query left: its
    // output is sketch-internal (HLL/quantile-digest states are engine-
    // specific), pinned by the tolerance spec in PipelineSpec instead.
    // The ANN family graduated to full hash oracles in round 6
    // (integer-quantized scoring).
    val rowsOnly = Set("approx_stats")
    val missingOracle = (declared -- rowsOnly) -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty, s"missing oracles: $missingOracle")
  }

  test("entry (flagship delta_join) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' runs non-empty at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
