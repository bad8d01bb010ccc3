"""The contract registry: queries()/oracle_sql() dicts (driver checks ~50 per round IN DICT ORDER) and the e6 double-scaling wrappers.

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import Callable, DataFrame, F, SparkSession
from .seg01 import (
    _CLASSIFIER_CALIBRATION_ORACLE_SQL,
    _THRESHOLD_SWEEP_ORACLE_SQL,
    q_threshold_sweep,
    q_classifier_calibration,
    _SPAN_SENTINEL,
    _bpe_oracle_seg_sql,
    q_ann_topk,
    q_asof_join,
    q_benford,
    q_bloom_referential,
    q_bpe_pairs,
    q_bpe_token_counts,
    q_categorical_drift,
    q_category_churn,
    q_category_coverage,
    q_classifier_scores,
    q_clean_docs,
    q_column_entropy,
    q_column_profile,
    q_compare_polymorphism,
    q_conditional_rules,
    q_contamination,
    q_correlation_matrix,
    q_cross_field,
    q_curation,
    q_cusum_shift,
    q_dedup_exact,
    q_dedup_pipeline,
    q_distinct_rollup,
    q_drift_buckets,
    q_drift_psi_width,
    q_drift_stats,
    q_duplicate_keys,
    q_embedding_drift,
    q_embedding_neardups,
    q_emd_drift,
    q_fd_check,
    q_fd_discovery,
    q_freshness,
    q_fuzzy_match,
    q_gopher_quality,
    q_html_extract,
    q_incremental_dedup,
    q_incremental_validation,
    q_ingest_quarantine,
    q_interval_overlaps,
    q_ivf_ann,
    q_ivf_pq_ann,
    q_jaccard_pairs,
    q_join_profile,
    q_json_validation,
    q_k_anonymity,
    q_lang_id_counts,
    q_line_dedup_global,
    q_lm_perplexity,
    q_luhn_profile,
    q_metric_anomaly,
    q_minhash_lsh,
    q_monotonic,
    q_multimodal_magic,
    q_mutual_info,
    q_orphan_stats,
    q_outlier_stats,
    q_pack_sequences,
    q_pagerank,
    q_partition_summary,
    q_pii_scan,
    q_psi_report,
    q_quality_scores,
    q_quantile_rollup,
    q_range_join,
    q_reconcile,
    q_referential_orphans,
    q_rule_violations,
    q_salted_distinct,
    q_schema_evolution,
    q_segment_completeness,
    q_semantic_types,
    q_semdedup,
    q_sequence_gaps,
    q_sessions,
    q_setsim_exact,
    q_sha256_invariant,
    q_simhash_candidates,
    q_sketch_stats,
    q_snapshot_drift,
    q_span_dedup,
    q_srp_ann,
    q_stats_pruned_scan,
    q_stratified_sample,
    q_streaming_corpus_dedup,
    q_streaming_sessions,
    q_streaming_summary,
    q_string_rules_profile,
    q_suggest_constraints,
    q_table_diff,
    q_temperature_sample,
    q_text_profile,
    q_tfidf_keywords,
    q_time_rollup,
    q_token_budget_sample,
    q_tokenizer_fertility,
    q_unique_stats,
    q_url_dedup,
    q_url_filter,
    q_violation_messages,
    q_vocabulary,
    q_volume_anomaly,
    q_weighted_sample,
    q_zorder_key,
)
from .seg02 import (
    _CONFLICT_ORACLE_SQL,
    _INDENT_STYLE_ORACLE_SQL,
    _SHARD_LEAKAGE_ORACLE_SQL,
    _call_graph_oracle_sql,
    _identifier_casing_oracle_sql,
    _self_containment_oracle_sql,
    q_call_graph,
    q_check_suite,
    q_code_chunks,
    q_code_complexity,
    q_code_contamination,
    q_code_neardup,
    q_code_quality,
    q_conflict_markers,
    q_doc_chunks,
    q_drift_psi,
    q_edit_join,
    q_embedding_quality,
    q_fim_transform,
    q_fk_discovery,
    q_fork_dedup,
    q_function_clones,
    q_heavy_hitters,
    q_identifier_casing,
    q_identifier_vocab,
    q_import_cycles,
    q_indent_style,
    q_json_spec,
    q_ks_drift,
    q_license_scan,
    q_maintainability,
    q_merge_upsert,
    q_module_rank,
    q_repo_license,
    q_repo_profile,
    q_repo_similarity,
    q_secret_scan,
    q_self_containment,
    q_shard_assign,
    q_shard_leakage,
    q_shared_content,
    q_skew_join,
    q_strip_headers,
    q_type2_clones,
    q_value_patterns,
    q_winnow_pairs,
)
from .seg03 import (
    _BITEXT_ORACLE_SQL,
    _BLOCKED_TERMS_ORACLE_SQL,
    _BOILERPLATE_ORACLE_SQL,
    _CHAT_LINT_ORACLE_SQL,
    _IMAGE_AHASH_ORACLE_SQL,
    _IMAGE_NEARDUP_ORACLE_SQL,
    _OWNERSHIP_ORACLE_SQL,
    _PREFERENCE_ORACLE_SQL,
    _RANK_BUCKETS_ORACLE_SQL,
    _VIDEO_FRAMES_ORACLE_SQL,
    _chat_render_oracle_sql,
    _dsir_oracle_sql,
    _normalize_oracle_sql,
    _pack_sweep_oracle_sql,
    _split_assign_oracle_sql,
    q_bitext_pairs,
    q_blocked_terms,
    q_boilerplate,
    q_chat_lint,
    q_chat_render,
    q_dobf_pairs,
    q_domain_caps,
    q_dsir,
    q_halstead,
    q_hard_negatives,
    q_image_ahash,
    q_image_neardups,
    q_jsonspec_drift,
    q_ngram_saturation,
    q_normalize,
    q_ownership,
    q_pack_sweep,
    q_preference_lint,
    q_rank_buckets,
    q_repo_context,
    q_semantic_contamination,
    q_split_assign,
    q_synthetic_text,
    q_video_frames,
)
from .seg04 import (
    _API_DIFF_ORACLE_SQL,
    _AUDIO_ENVELOPE_ORACLE_SQL,
    _AUDIO_LANDMARKS_ORACLE_SQL,
    _AUDIO_MATCHES_ORACLE_SQL,
    _DEDUP_EVAL_ORACLE_SQL,
    _DOMAIN_CAPS_ORACLE_SQL,
    _HARD_NEGATIVES_ORACLE_SQL,
    _IMAGE_DHASH_ORACLE_SQL,
    _NGRAM_SATURATION_ORACLE_SQL,
    _READABILITY_ORACLE_SQL,
    _SEMCONTAM_ORACLE_SQL,
    _entropy_secrets_oracle_sql,
    _jsonspec_drift_oracle_sql,
    _synthtext_oracle_sql,
    _vocab_coverage_oracle_sql,
    _web_curation_oracle_sql,
    q_api_diff,
    q_audio_envelope,
    q_audio_landmarks,
    q_audio_matches,
    q_bm25_search,
    q_comment_lang,
    q_commit_pairs,
    q_dead_symbols,
    q_dedup_eval,
    q_docstring_coverage,
    q_edit_pairs,
    q_embedded_text,
    q_entropy_secrets,
    q_file_history,
    q_function_complexity,
    q_image_dhash,
    q_lang_detect,
    q_manifest_deps,
    q_mixture_plan,
    q_nlpl_pairs,
    q_notebook_pairs,
    q_public_api,
    q_readability,
    q_repo_debt,
    q_test_mapping,
    q_unsafe_apis,
    q_unused_imports,
    q_vocab_coverage,
    q_web_curation,
)
from .seg05 import (
    _ANN_TOP2_AUGMENTED_SQL,
    _DOC_VIOLATIONS_SQL,
    _OWNER_OPTOUT_ORACLE_SQL,
    _code_chunks_oracle_sql,
    _code_complexity_oracle_sql,
    _cross_lang_oracle_sql,
    _dobf_oracle_sql,
    _function_clones_oracle_sql,
    _halstead_oracle_sql,
    _identifier_vocab_oracle_sql,
    _markdown_oracle_sql,
    _pii_oracle_sql,
    _repo_license_oracle_sql,
    _repo_profile_oracle_sql,
    _secret_oracle_sql,
    _suggest_oracle_sql,
    _tree_stats_oracle_sql,
    _zorder_oracle_sql,
    q_blob_stats,
    q_code_curation,
    q_code_imports,
    q_comment_stats,
    q_cross_lang_pairs,
    q_curation_verdicts,
    q_dataset_card,
    q_encoding_stats,
    q_lang_mismatch,
    q_license_conflicts,
    q_markdown_pairs,
    q_notebook_cells,
    q_owner_optout,
    q_path_classes,
    q_repo_tree_stats,
    q_script_mix,
    q_strip_comments,
    q_unicode_audit,
)
from .seg06 import (
    _COMMIT_PAIRS_ORACLE_SQL,
    _EDIT_PAIRS_ORACLE_SQL,
    _FILE_HISTORY_ORACLE_SQL,
    _LANG_MISMATCH_ORACLE_SQL,
    _MIXTURE_PLAN_ORACLE_SQL,
    _NB_PAIRS_ORACLE_SQL,
    _NOTEBOOK_ORACLE_SQL,
    _code_contamination_oracle_sql,
    _code_neardup_oracle_sql,
    _codequality_oracle_sql,
    _comment_lang_oracle_sql,
    _dead_symbols_oracle_sql,
    _docstring_coverage_oracle_sql,
    _embedded_text_oracle_sql,
    _imports_oracle_sql,
    _lang_detect_oracle_sql,
    _license_oracle_sql,
    _maintainability_oracle_sql,
    _manifest_oracle_sql,
    _nlpl_oracle_sql,
    _public_api_oracle_sql,
    _repo_debt_oracle_sql,
    _strip_headers_oracle_sql,
    _test_mapping_oracle_sql,
    _type2_clones_oracle_sql,
    _unsafe_oracle_sql,
    _unused_imports_oracle_sql,
)
from .seg07 import (
    _DATASET_CARD_ORACLE_SQL,
    _FIM_ORACLE_SQL,
    _blob_stats_oracle_sql,
    _bm25_oracle_sql,
    _code_curation_oracle_sql,
    _comment_stats_oracle_sql,
    _corr_oracle_sql,
    _curation_verdicts_oracle_sql,
    _encoding_oracle_sql,
    _fd_discovery_oracle_sql,
    _function_complexity_oracle_sql,
    _html_oracle_sql,
    _import_cycles_oracle_sql,
    _license_conflicts_oracle_sql,
    _module_rank_oracle_sql,
    _pagerank_oracle_sql,
    _pathclass_oracle_sql,
    _repo_context_oracle_sql,
    _script_mix_oracle_sql,
    _semantic_oracle_sql,
    _strip_comments_oracle_sql,
    _unicode_oracle_sql,
)




# ---------------------------------------------------------------------------
# 6dp scaled-long hardening (round-2 VERDICT order #6): every double-valued
# oracle-checked output is compared as cast(round(x*1e6) as bigint) on BOTH
# sides, so a libm last-digit flip or double-representation difference on
# another platform can never break hash_match.  Maps each affected query to
# (passthrough columns, double columns); both the Spark DataFrame and the
# DuckDB SQL are wrapped mechanically from the same table.

_E6_COLS: dict[str, tuple[list[str], list[str]]] = {
    "drift_stats": (["l_returnflag", "n"], ["mean", "stddev", "min", "max"]),
    "sketch_stats": (["event_type", "n"], ["vmin", "vmax"]),
    "drift_psi_width": (["baseline", "curr"], ["psi"]),
    "cross_lang_pairs": (
        ["repo", "stem", "lang_a", "path_a", "n_chars_a",
         "lang_b", "path_b", "n_chars_b"],
        ["size_ratio"],
    ),
    "repo_tree_stats": (
        ["repo", "n_files", "max_depth", "n_root_files", "n_top_dirs",
         "has_src", "has_tests", "has_docs"],
        ["avg_depth"],
    ),
    "jaccard_pairs": (["id_a", "id_b"], ["jaccard"]),
    "setsim_exact": (["id_a", "id_b"], ["jaccard"]),
    "code_neardup": (["id_a", "id_b"], ["jaccard"]),
    "quality_scores": (["doc_id"], ["quality"]),
    "minhash_lsh": (["id_a", "id_b"], ["jaccard"]),
    "embedding_neardups": (["id_a", "id_b"], ["cosine"]),
    "semantic_contamination": (["vec_id", "eval_id"], ["cosine"]),
    "synthetic_text": (
        ["doc_id", "n_tokens", "n_sents", "phrase_hits", "slop_hits",
         "ai_flag"],
        ["slop_per_1k", "sent_len_cv"],
    ),
    "ngram_saturation": (["doc_id", "n_grams", "n_common"], ["saturation"]),
    "jsonspec_drift": (
        ["key", "status", "base_type", "curr_type", "type_changed"],
        ["base_presence", "curr_presence", "presence_delta"],
    ),
    "hard_negatives": (["query_id", "vec_id", "rank"], ["cosine"]),
    "readability": (
        ["doc_id", "n_words", "n_sents", "n_syllables"],
        ["flesch", "fk_grade"],
    ),
    "vocab_coverage": (["doc_id", "n_tokens", "n_oov"], ["oov_rate"]),
    "dedup_eval": (
        ["n_pred", "n_true", "n_hit"], ["precision", "recall", "f1"]
    ),
    "drift_psi": (["baseline", "curr"], ["psi"]),
    "snapshot_drift": (["baseline", "curr"], ["psi"]),
    "gopher_quality": (
        ["doc_id", "n_tokens", "stopword_hits", "keep"],
        ["mean_word_len", "symbol_ratio", "alpha_word_frac",
         "dup_line_frac", "dup_2gram_frac", "dup_3gram_frac"],
    ),
    "psi_report": (["curr"], ["psi"]),
    "time_rollup": (
        ["grain", "event_type", "bucket_us", "n"], ["vsum", "vmin", "vmax"]
    ),
    "tfidf_keywords": (["doc_id", "token", "tf", "rank"], ["score"]),
    "quantile_rollup": (
        ["grain", "event_type", "bucket_us", "n"], ["vmin", "vmax"]
    ),
    "fuzzy_match": (["id_a", "id_b"], ["jaccard"]),
    "ks_drift": (["baseline", "curr", "n_base", "n_curr"], ["ks"]),
    "emd_drift": (["baseline", "curr", "n_base", "n_curr"], ["w1"]),
    "benford": (["digit", "n_digit"], ["obs_p", "exp_p", "abs_dev"]),
    "monotonic": (["l_orderkey", "l_linenumber"], ["prev_value", "value"]),
    "stats_pruned_scan": (["event_type", "n"], ["sum_value"]),
    "metric_anomaly": (["snapshot_id", "metric", "anomalous"],
                       ["value", "prev", "rel_change"]),
    "pagerank": (["node"], ["rank"]),
    "module_rank": (["repo", "module"], ["rank"]),
    "function_complexity": (
        ["doc_id", "chunk_idx", "n_lines", "n_decisions", "n_bool_ops",
         "cyclomatic", "max_indent"],
        ["decision_density"],
    ),
    "pii_scan": (['"column"', "pii_type", "n_rows", "n_matched", "n_spans"],
                 ["match_rate"]),
    "k_anonymity": (["n_rows", "n_groups", "min_group_size",
                     "n_risky_groups", "n_risky_rows"], ["risky_row_rate"]),
    "semantic_types": (['"column"', "sem_type", "n_nonnull", "n_match"],
                       ["match_rate"]),
    "column_entropy": (['"column"', "n_rows", "n_nonnull", "n_distinct"],
                       ["entropy", "norm_entropy", "distinctness",
                        "unique_value_ratio"]),
    "volume_anomaly": (["day_us", "n_rows", "anomalous"], ["deviation"]),
    "category_coverage": (["rank", "value", "n"], ["share", "cum_share"]),
    "cusum_shift": (["day_us", "n_rows", "alarm"],
                    ["cusum_up", "cusum_down"]),
    "segment_completeness": (["event_type", '"column"', "n_rows", "n_nulls"],
                             ["null_rate"]),
    "reconcile": (["l_orderkey", "kind"], ["sum_left", "sum_right", "diff"]),
    "join_profile": (["n_left", "n_right", "n_left_keys", "n_right_keys",
                      "n_shared_keys", "max_mult_left", "max_mult_right",
                      "join_rows"],
                     ["left_match_rate", "right_match_rate"]),
    "categorical_drift": (["n_base", "n_cur", "n_categories", "dof"],
                          ["chi2", "jsd", "tvd"]),
    "embedding_drift": (["n_base", "n_cur", "dims"],
                        ["centroid_cosine", "centroid_shift",
                         "norm_base", "norm_cur"]),
    "correlation_matrix": (["col_a", "col_b", "n_rows"], ["corr"]),
    "mutual_info": (["n_rows", "card_a", "card_b"],
                    ["h_a", "h_b", "mi", "nmi"]),
    "check_suite": (['"check"', "metric", "subject", '"constraint"',
                     "status"], ["value"]),
    "embedding_quality": (
        ["n_rows", "n_null_vecs", "n_wrong_dim", "n_with_null_elem",
         "n_with_nan", "n_valid", "n_zero_vecs"],
        ["norm_min", "norm_mean", "norm_max"],
    ),
    "json_spec": (
        ['"key"', "vtype", "n_type", "n_key", "dominant", "n_obj",
         "n_corrupt"],
        ["presence_rate", "type_share"],
    ),
    "fk_discovery": (
        ["from_id", "to_id", "n_from", "n_common", "holds"],
        ["coverage"],
    ),
    "value_patterns": (
        ['"column"', "mask", "n", '"rank"'], ["share"]
    ),
    "code_quality": (
        ["doc_id", "n_chars", "n_lines", "max_line_len", "autogen",
         "ends_newline", "bracket_balance", "keep"],
        ["avg_line_len", "alnum_frac", "alpha_frac"],
    ),
    "license_scan": (["repo", "license", "n_files"], ["share"]),
    "comment_stats": (
        ["doc_id", "n_chars", "comment_chars", "n_line_comments",
         "n_block_comments"],
        ["comment_frac"],
    ),
    "path_classes": (["path_class", "n_files"], ["share"]),
    "repo_profile": (
        ["repo", "n_files", "n_bytes", "n_langs", "top_lang",
         "repo_license"],
        ["test_share", "vendored_share", "dup_share"],
    ),
    "code_complexity": (
        ["doc_id", "n_lines", "n_decisions", "n_bool_ops",
         "cyclomatic", "max_indent"],
        ["decision_density"],
    ),
    "maintainability": (
        ["doc_id", "lang", "cyclomatic", "n_lines"],
        ["volume", "mi"],
    ),
    "identifier_casing": (
        ["lang", "n_ids", "n_upper", "n_pascal", "n_snake", "n_camel",
         "n_lower", "n_other"],
        ["snake_share", "camel_share", "pascal_share"],
    ),
    "self_containment": (
        ["repo", "n_files", "n_modules", "n_import_edges", "n_internal",
         "n_external"],
        ["self_containment"],
    ),
    "file_history": (
        ["repo", "path", "n_versions", "n_distinct_versions",
         "first_version", "last_version", "head_sha"],
        ["churn_ratio"],
    ),
    "repo_similarity": (
        ["repo_a", "repo_b", "shared_files", "n_a", "n_b"],
        ["jaccard", "containment"],
    ),
    "docstring_coverage": (
        ["repo", "n_functions", "n_documented"],
        ["doc_coverage"],
    ),
    "test_mapping": (
        ["repo", "n_source_files", "n_test_files", "n_tested_sources",
         "n_orphan_tests"],
        ["test_coverage"],
    ),
    "entropy_secrets": (
        ["doc_id", "token", "token_len"], ["entropy"],
    ),
    "tokenizer_fertility": (
        ["lang", "n_docs", "n_bytes", "n_chars", "n_words",
         "n_bpe_tokens"],
        ["fertility", "bytes_per_token", "chars_per_token"],
    ),
    "indent_style": (
        ["lang", "n_files"],
        ["tabs_share", "spaces_share", "mixed_share"],
    ),
    "code_contamination": (
        ["doc_id", "n_grams", "n_shared"], ["share"],
    ),
    "repo_debt": (
        ["repo", "n_files", "n_lines", "n_todo", "n_fixme", "n_hack",
         "n_xxx", "n_debt_lines"],
        ["debt_per_kline"],
    ),
    "halstead_metrics": (
        ["doc_id", "lang", "n1", "n2", "big_n1", "big_n2"],
        ["volume", "difficulty", "effort"],
    ),
    "ownership": (
        ["repo", "path", "n_commits", "n_authors", "top_author",
         "bus_factor"],
        ["top_share", "hhi"],
    ),
    "dataset_card": (
        ["lang", "n_files", "n_repos", "n_chars", "n_distinct"],
        ["dup_frac", "file_share", "char_share"],
    ),
}


def _scale_doubles_df(df: DataFrame) -> DataFrame:
    cols = [
        F.round(F.col(f.name) * 1e6).cast("long").alias(f.name + "_e6")
        if f.dataType.typeName() in ("double", "float")
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _wrap_e6_query(fn):
    def wrapped(spark, sf_dir):
        return _scale_doubles_df(fn(spark, sf_dir))

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _wrap_e6_sql(sql: str, keep: list[str], dbls: list[str]) -> str:
    sel = ", ".join(
        keep + [f"cast(round(({c}) * 1e6) as bigint) as {c}_e6" for c in dbls]
    )
    return f"select {sel} from ({sql})"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_raw()
    for name in _E6_COLS:
        base[name] = _wrap_e6_query(base[name])
    return base


def _queries_raw() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver correctness gate checks ~50 queries per
    # round IN DICT ORDER.  Round-5 rotation (VERDICT.md round 4, order
    # #1): tier A = 50 of the 88 queries never driver-checked in r01-r04
    # (code-table + round-4 families); tier B = the remaining 38
    # never-checked (r06 rotation / wider windows); tier C = the 126
    # queries already driver-green in r01-r04, prior order preserved.
    return {
        # --- tier A: never driver-checked (r05 target window, 50) -------
        "strip_comments": q_strip_comments,
        "license_conflicts": q_license_conflicts,
        "dataset_card": q_dataset_card,
        "blob_stats": q_blob_stats,
        "script_mix": q_script_mix,
        "code_curation": q_code_curation,
        "lang_mismatch": q_lang_mismatch,
        "repo_license": q_repo_license,
        "code_chunks": q_code_chunks,
        "function_clones": q_function_clones,
        "identifier_vocab": q_identifier_vocab,
        "repo_profile": q_repo_profile,
        "code_complexity": q_code_complexity,
        "maintainability": q_maintainability,
        "conflict_markers": q_conflict_markers,
        "identifier_casing": q_identifier_casing,
        "call_graph": q_call_graph,
        "shard_leakage": q_shard_leakage,
        "self_containment": q_self_containment,
        "owner_optout": q_owner_optout,
        "markdown_pairs": q_markdown_pairs,
        "cross_lang_pairs": q_cross_lang_pairs,
        "repo_tree_stats": q_repo_tree_stats,
        "file_history": q_file_history,
        "nlpl_pairs": q_nlpl_pairs,
        "repo_similarity": q_repo_similarity,
        "unsafe_apis": q_unsafe_apis,
        "manifest_deps": q_manifest_deps,
        "public_api": q_public_api,
        "docstring_coverage": q_docstring_coverage,
        "test_mapping": q_test_mapping,
        "lang_detect": q_lang_detect,
        "fork_dedup": q_fork_dedup,
        "indent_style": q_indent_style,
        "type2_clones": q_type2_clones,
        "tokenizer_fertility": q_tokenizer_fertility,
        "api_diff": q_api_diff,
        "entropy_secrets": q_entropy_secrets,
        "curation_verdicts": q_curation_verdicts,
        "code_contamination": q_code_contamination,
        "unused_imports": q_unused_imports,
        "repo_debt": q_repo_debt,
        "embedded_text": q_embedded_text,
        "strip_headers": q_strip_headers,
        "code_neardup": q_code_neardup,
        "import_cycles": q_import_cycles,
        "module_rank": q_module_rank,
        "shard_assign": q_shard_assign,
        "bm25_search": q_bm25_search,
        "function_complexity": q_function_complexity,
        # --- new in round 5 (never driver-checked; after the A window) --
        "video_frames": q_video_frames,
        "classifier_calibration": q_classifier_calibration,
        "threshold_sweep": q_threshold_sweep,
        # --- tier B: never driver-checked, remaining 38 -----------------
        "edit_pairs": q_edit_pairs,
        "dead_symbols": q_dead_symbols,
        "comment_lang": q_comment_lang,
        "notebook_pairs": q_notebook_pairs,
        "commit_pairs": q_commit_pairs,
        "mixture_plan": q_mixture_plan,
        "fim_transform": q_fim_transform,
        "repo_context": q_repo_context,
        "dobf_pairs": q_dobf_pairs,
        "halstead_metrics": q_halstead,
        "ownership": q_ownership,
        "blocked_terms": q_blocked_terms,
        "boilerplate": q_boilerplate,
        "chat_lint": q_chat_lint,
        "split_assign": q_split_assign,
        "chat_render": q_chat_render,
        "normalize": q_normalize,
        "preference_lint": q_preference_lint,
        "rank_buckets": q_rank_buckets,
        "dsir": q_dsir,
        "bitext_pairs": q_bitext_pairs,
        "pack_sweep": q_pack_sweep,
        "image_ahash": q_image_ahash,
        "image_neardups": q_image_neardups,
        "audio_envelope": q_audio_envelope,
        "semantic_contamination": q_semantic_contamination,
        "synthetic_text": q_synthetic_text,
        "ngram_saturation": q_ngram_saturation,
        "jsonspec_drift": q_jsonspec_drift,
        "domain_caps": q_domain_caps,
        "hard_negatives": q_hard_negatives,
        "audio_landmarks": q_audio_landmarks,
        "audio_matches": q_audio_matches,
        "readability": q_readability,
        "vocab_coverage": q_vocab_coverage,
        "image_dhash": q_image_dhash,
        "dedup_eval": q_dedup_eval,
        "web_curation": q_web_curation,
        # --- tier C: driver-green in r01-r04 (126) ----------------------
        "semdedup": q_semdedup,
        "temperature_sample": q_temperature_sample,
        "time_rollup": q_time_rollup,
        "streaming_sessions": q_streaming_sessions,
        "incremental_dedup": q_incremental_dedup,
        "stats_pruned_scan": q_stats_pruned_scan,
        "zorder_key": q_zorder_key,
        "suggest_constraints": q_suggest_constraints,
        "metric_anomaly": q_metric_anomaly,
        "pagerank": q_pagerank,
        "pii_scan": q_pii_scan,
        "span_dedup": q_span_dedup,
        "pack_sequences": q_pack_sequences,
        "bpe_token_counts": q_bpe_token_counts,
        "tfidf_keywords": q_tfidf_keywords,
        "json_validation": q_json_validation,
        "url_dedup": q_url_dedup,
        "quantile_rollup": q_quantile_rollup,
        "streaming_corpus_dedup": q_streaming_corpus_dedup,
        "fuzzy_match": q_fuzzy_match,
        "distinct_rollup": q_distinct_rollup,
        "curation": q_curation,
        "classifier_scores": q_classifier_scores,
        "url_filter": q_url_filter,
        "lm_perplexity": q_lm_perplexity,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "skew_join": q_skew_join,
        "ks_drift": q_ks_drift,
        "heavy_hitters": q_heavy_hitters,
        "merge_upsert": q_merge_upsert,
        "ivf_pq_ann": q_ivf_pq_ann,
        "edit_join": q_edit_join,
        "check_suite": q_check_suite,
        "doc_chunks": q_doc_chunks,
        "embedding_quality": q_embedding_quality,
        "shared_content": q_shared_content,
        "winnow_pairs": q_winnow_pairs,
        "json_spec": q_json_spec,
        "fk_discovery": q_fk_discovery,
        "value_patterns": q_value_patterns,
        "code_quality": q_code_quality,
        "secret_scan": q_secret_scan,
        "license_scan": q_license_scan,
        "notebook_cells": q_notebook_cells,
        "code_imports": q_code_imports,
        "comment_stats": q_comment_stats,
        "path_classes": q_path_classes,
        "encoding_stats": q_encoding_stats,
        "unicode_audit": q_unicode_audit,
        "lang_id_counts": q_lang_id_counts,
        "quality_scores": q_quality_scores,
        "violation_messages": q_violation_messages,
        "multimodal_magic": q_multimodal_magic,
        "streaming_summary": q_streaming_summary,
        "conditional_rules": q_conditional_rules,
        "compare_polymorphism": q_compare_polymorphism,
        "cross_field": q_cross_field,
        "minhash_lsh": q_minhash_lsh,
        "simhash_candidates": q_simhash_candidates,
        "srp_ann": q_srp_ann,
        "ivf_ann": q_ivf_ann,
        "embedding_neardups": q_embedding_neardups,
        "drift_psi": q_drift_psi,
        "snapshot_drift": q_snapshot_drift,
        "clean_docs": q_clean_docs,
        "gopher_quality": q_gopher_quality,
        "incremental_validation": q_incremental_validation,
        "line_dedup_global": q_line_dedup_global,
        "token_budget_sample": q_token_budget_sample,
        "bpe_pairs": q_bpe_pairs,
        "outlier_stats": q_outlier_stats,
        "sessions": q_sessions,
        "fd_check": q_fd_check,
        "schema_evolution": q_schema_evolution,
        "psi_report": q_psi_report,
        "rule_violations": q_rule_violations,
        "partition_summary": q_partition_summary,
        "sha256_invariant": q_sha256_invariant,
        "string_rules_profile": q_string_rules_profile,
        "luhn_profile": q_luhn_profile,
        "unique_stats": q_unique_stats,
        "duplicate_keys": q_duplicate_keys,
        "referential_orphans": q_referential_orphans,
        "orphan_stats": q_orphan_stats,
        "bloom_referential": q_bloom_referential,
        "categorical_drift": q_categorical_drift,
        "html_extract": q_html_extract,
        "correlation_matrix": q_correlation_matrix,
        "ingest_quarantine": q_ingest_quarantine,
        "emd_drift": q_emd_drift,
        "benford": q_benford,
        "sequence_gaps": q_sequence_gaps,
        "freshness": q_freshness,
        "category_churn": q_category_churn,
        "weighted_sample": q_weighted_sample,
        "embedding_drift": q_embedding_drift,
        "k_anonymity": q_k_anonymity,
        "semantic_types": q_semantic_types,
        "column_entropy": q_column_entropy,
        "volume_anomaly": q_volume_anomaly,
        "fd_discovery": q_fd_discovery,
        "table_diff": q_table_diff,
        "join_profile": q_join_profile,
        "category_coverage": q_category_coverage,
        "cusum_shift": q_cusum_shift,
        "segment_completeness": q_segment_completeness,
        "reconcile": q_reconcile,
        "interval_overlaps": q_interval_overlaps,
        "monotonic": q_monotonic,
        "mutual_info": q_mutual_info,
        "drift_stats": q_drift_stats,
        "drift_buckets": q_drift_buckets,
        "column_profile": q_column_profile,
        "salted_distinct": q_salted_distinct,
        "sketch_stats": q_sketch_stats,
        "drift_psi_width": q_drift_psi_width,
        "dedup_exact": q_dedup_exact,
        "vocabulary": q_vocabulary,
        "contamination": q_contamination,
        "stratified_sample": q_stratified_sample,
        "dedup_pipeline": q_dedup_pipeline,
        "jaccard_pairs": q_jaccard_pairs,
        "setsim_exact": q_setsim_exact,
        "ann_topk": q_ann_topk,
        "text_profile": q_text_profile,
    }


def oracle_sql() -> dict[str, str]:
    base = _oracle_sql_raw()
    for name, (keep, dbls) in _E6_COLS.items():
        base[name] = _wrap_e6_sql(base[name], keep, dbls)
    return base


def _oracle_sql_raw() -> dict[str, str]:
    d = {
        "rule_violations": _DOC_VIOLATIONS_SQL,
        "partition_summary": f"""
            with v as ({_DOC_VIOLATIONS_SQL})
            select d.lang,
                   count(distinct d.doc_id) as n_rows,
                   count(distinct case when v.doc_id is not null then d.doc_id end) as n_rows_failed,
                   count(v.doc_id) as n_violations
            from documents d left join v on v.doc_id = d.doc_id
            group by d.lang
        """,
        "sha256_invariant": "select doc_id, sha256(text) as content_sha256 from documents",
        "string_rules_profile": r"""
            select 'ascii' as rule,
                   count(*) filter (where not regexp_matches(text, '^[\x00-\x7F]*$')) as n_failed
            from documents
            union all
            select 'lowercase', count(*) filter (where text <> lower(text)) from documents
            union all
            select 'contains', count(*) filter (where not contains(text, 'data')) from documents
            union all
            select 'startswith', count(*) filter (where not starts_with(text, 'key')) from documents
            union all
            select 'number', count(*) filter (where not regexp_matches(text, '^[\p{Nd}]*$')) from documents
            union all
            select 'alpha', count(*) filter (where not regexp_matches(text, '^\p{L}*$')) from documents
        """,
        "luhn_profile": """
            select count(*) as n_rows,
                   count(*) filter (where
                     s = '' or
                     list_sum(list_transform(string_split_regex(reverse(s), ''), (x, i) ->
                       case when i % 2 = 0 then
                         case when (ascii(x)-48)*2 > 9 then (ascii(x)-48)*2 - 9
                              else (ascii(x)-48)*2 end
                       else ascii(x)-48 end)) % 10 = 0
                   ) as n_luhn_valid
            from (select cast(o_orderkey as varchar) as s from orders)
        """,
        "unique_stats": """
            select sum(c)::bigint as n_rows,
                   count(*) as n_distinct_keys,
                   sum(case when c > 1 then c else 0 end)::bigint as n_rows_in_dup_groups,
                   sum(case when c > 1 then 1 else 0 end)::bigint as n_dup_keys
            from (select l_orderkey, count(*) as c from lineitem group by 1)
        """,
        "duplicate_keys": """
            select o_custkey, count(*) as dup_count
            from orders group by 1 having count(*) > 1
        """,
        "referential_orphans": """
            select o_orderkey, o_custkey from orders
            where o_custkey not in (
              select c_custkey from customer where c_custkey % 10 <> 3)
        """,
        "categorical_drift": """
            with tagged as (
              select event_type as v, 1 as b, 0 as c from events
              where user_id % 2 = 0
              union all
              select event_type as v, 0 as b, 1 as c from events
              where user_id % 2 = 1
            ), counts as (
              select v, sum(b) as b, sum(c) as c from tagged group by 1
            ), per as (
              select b, c, sum(b) over () as n_b, sum(c) over () as n_c
              from counts
            ), terms as (
              select n_b, n_c,
                     b / n_b as p, c / n_c as q,
                     (b / n_b + c / n_c) / 2 as m,
                     n_b * ((b + c) / (n_b + n_c)) as e_b,
                     n_c * ((b + c) / (n_b + n_c)) as e_c,
                     b, c
              from per
            )
            select cast(max(n_b) as bigint) as n_base,
                   cast(max(n_c) as bigint) as n_cur,
                   count(*) as n_categories,
                   count(*) - 1 as dof,
                   round(sum((b - e_b) * (b - e_b) / e_b
                           + (c - e_c) * (c - e_c) / e_c), 6) as chi2,
                   round(sum(
                     (case when p > 0 then p * ln(p / m) / 2 else 0 end)
                   + (case when q > 0 then q * ln(q / m) / 2 else 0 end)), 6)
                     as jsd,
                   round(sum(abs(p - q) / 2), 6) as tvd
            from terms
        """,
        "bloom_referential": """
            select l_orderkey, l_linenumber, l_suppkey from lineitem
            where l_suppkey not in (
              select s_suppkey from supplier where s_suppkey % 7 <> 2)
        """,
        "orphan_stats": """
            select count(*) as n_rows,
                   count(*) filter (where o_custkey not in (
                     select c_custkey from customer where c_custkey % 10 <> 3)) as n_orphans
            from orders
        """,
        "drift_stats": """
            select l_returnflag,
                   count(l_extendedprice) as n,
                   round(avg(l_extendedprice), 2) as mean,
                   round(stddev_samp(l_extendedprice), 2) as stddev,
                   round(min(l_extendedprice), 2) as min,
                   round(max(l_extendedprice), 2) as max
            from lineitem group by 1
        """,
        "drift_buckets": """
            select event_type,
                   cast(least(floor(value / 50.0), 9) as int) as bucket,
                   count(*) as n
            from events group by 1, 2
        """,
        "column_profile": """
            select 'lang' as column, count(*) as n_rows,
                   count(*) filter (where lang is null) as n_nulls,
                   count(distinct lang) as n_distinct,
                   cast(min(lang) as varchar) as min, cast(max(lang) as varchar) as max
            from documents
            union all
            select 'source', count(*), count(*) filter (where source is null),
                   count(distinct source),
                   cast(min(source) as varchar), cast(max(source) as varchar)
            from documents
            union all
            select 'n_chars', count(*), count(*) filter (where n_chars is null),
                   count(distinct n_chars),
                   cast(min(n_chars) as varchar), cast(max(n_chars) as varchar)
            from documents
        """,
        "salted_distinct": """
            select l_returnflag, count(distinct l_partkey) as l_partkey_n_distinct
            from lineitem group by 1
        """,
        "sketch_stats": """
            select event_type, count(value) as n,
                   round(min(value), 6) as vmin, round(max(value), 6) as vmax
            from events where value is not null group by 1
        """,
        "drift_psi_width": """
            with span as (
              select min(value) as lo, max(value) as hi from events
              where event_type = 'click' and value is not null
            ), b as (
              select event_type as g,
                     cast(least(greatest(floor((value - lo) / ((hi - lo) / 10.0)), 0), 9) as int) as bk
              from events, span
              where event_type in ('click','purchase') and value is not null
            ), pb as (
              select bk,
                     count(*) filter (where g = 'click') as cb,
                     count(*) filter (where g = 'purchase') as cc
              from b group by 1
            ), t as (select sum(cb) as tb, sum(cc) as tc from pb)
            select 'click' as baseline, 'purchase' as curr,
                   round(sum(
                     (greatest(cc / tc, 1e-6) - greatest(cb / tb, 1e-6))
                     * ln(greatest(cc / tc, 1e-6) / greatest(cb / tb, 1e-6))
                   ), 6) as psi
            from pb, t
        """,
        "dedup_exact": """
            with doubled as (
              select doc_id, text from documents
              union all
              select doc_id + 1000000, text from documents
            )
            select sha256(text) as content_sha256,
                   count(*) as n_docs,
                   min(doc_id) as min_doc_id,
                   max(doc_id) as max_doc_id
            from doubled group by text having count(*) > 1
        """,
        "vocabulary": r"""
            select token, count(*) as n from (
              select unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> '')) as token
              from documents)
            group by 1 order by n desc, token asc limit 200
        """,
        "contamination": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') as w
              from documents
            ), sh as (
              select doc_id,
                     case when len(w) >= 5
                          then list_distinct(list_transform(range(1, len(w) - 3),
                                 i -> array_to_string(w[i:i+4], ' ')))
                          else [array_to_string(w, ' ')] end as g
              from toks
            ), ev as (
              select distinct unnest(g) as gram from sh where doc_id < 5
            ), tr as (
              select doc_id, unnest(g) as gram from sh
            )
            select tr.doc_id, count(*) as n_shared_grams
            from tr join ev using (gram)
            group by 1
        """,
        "stratified_sample": """
            select doc_id, lang from (
              select doc_id, lang,
                     row_number() over (
                       partition by lang
                       order by md5(cast(doc_id as varchar) || 'v1'), doc_id
                     ) as rk
              from documents
            ) where rk <= 20
        """,
        "dedup_pipeline": """
            with doubled as (
              select doc_id, text from documents
              union all
              select doc_id + 1000000, text from documents
            )
            select min(doc_id) as doc_id from doubled group by text
        """,
        "jaccard_pairs": r"""
            with d as (
              select doc_id,
                     list_distinct(string_split_regex(trim(text), '\s+')) as w
              from documents where lang = 'fr'
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.w, b.w))::double
                         / len(list_distinct(list_concat(a.w, b.w))), 6) as jaccard
            from d a join d b on a.doc_id < b.doc_id
            where round(len(list_intersect(a.w, b.w))::double
                        / len(list_distinct(list_concat(a.w, b.w))), 6) >= 0.8
        """,
        "ann_topk": """
            with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
            q as (select vec_id as query_id, v as qv from e where vec_id < 5),
            scored as (
              select q.query_id, e.vec_id,
                     round(
                       list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * e.v[i]))
                       / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))
                          * sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i])))),
                     6) as cosine
              from q cross join e
            )
            select query_id, vec_id, rank from (
              select query_id, vec_id,
                     row_number() over (partition by query_id
                                        order by cosine desc, vec_id asc) as rank
              from scored)
            where rank <= 5
        """,
        "text_profile": r"""
            select doc_id,
                   len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) as n_tokens,
                   md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{Nd}\s]', '', 'g'),
                                           '\s+', ' ', 'g'))) as fingerprint,
                   list_reduce(
                     list_prepend(0::bigint,
                       list_transform(string_split_regex(text, ''), c -> ascii(c)::bigint)),
                     (acc, c) -> (acc * 131 + c) % 1000000007) as rolling_hash
            from documents
        """,
        "lang_id_counts": r"""
            with scored as (
              select lang, text,
                     list_distinct(list_transform(
                       list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''),
                       t -> lower(t))) as toks,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) as cjk,
                     length(text) as n
              from documents
            ), hits as (
              select lang, cjk, n,
                len(list_intersect(toks, ['the','and','of','to','is','in','that','it','for','with'])) as s_en,
                len(list_intersect(toks, ['el','la','de','que','y','los','en','un','una','por'])) as s_es,
                len(list_intersect(toks, ['der','die','und','das','ist','nicht','ein','mit','für','auf'])) as s_de,
                len(list_intersect(toks, ['le','la','et','les','des','est','une','dans','que','pour'])) as s_fr
              from scored
            ), lid as (
              select lang,
                case when cjk * 4 > n then 'zh'
                     when s_fr > s_de and s_fr > s_es and s_fr > s_en then 'fr'
                     when s_de > s_es and s_de > s_en then 'de'
                     when s_es > s_en then 'es'
                     when s_en > 0 then 'en'
                     else 'unknown' end as lid
              from hits
            )
            select lang, lid, count(*) as n from lid group by 1, 2
        """,
        "quality_scores": r"""
            with t as (
              select doc_id,
                     coalesce(text, '') as s,
                     length(coalesce(text, '')) as n_chars,
                     list_filter(string_split_regex(trim(coalesce(text,'')), '\s+'), x -> x <> '') as toks
              from documents
            ), m as (
              select doc_id, n_chars,
                     len(toks) as n_tokens,
                     len(list_distinct(toks)) as distinct_tokens,
                     length(regexp_replace(s, '[^\p{L}]', '', 'g')) as alpha_chars
              from t
            )
            select doc_id,
                   round(
                     0.25 * least(n_chars / 500.0, 1.0)
                   + 0.25 * (case when n_chars > 0 then alpha_chars::double / n_chars else 0 end)
                   + 0.2  * (case when n_tokens > 0 and
                                  (n_chars + 1.0) / (n_tokens + 1.0) between 3 and 12
                             then 1.0 else 0.4 end)
                   + 0.3  * (case when n_tokens > 0 then distinct_tokens::double / n_tokens else 0 end)
                   , 6) as quality
            from m
        """,
        "violation_messages": f"""
            with v as ({_DOC_VIOLATIONS_SQL})
            select doc_id, field, code,
                   case code
                     when 'required' then 'This field is required'
                     when 'oneof' then 'Must be one of: en,es,de,fr'
                     when 'startswith' then 'Must start with src'
                     when 'endswith' then 'Must end with 0'
                     when 'min' then 'Must be at least 1'
                     when 'max' then 'Must be at most 100000'
                   end as message
            from v
        """,
        "multimodal_magic": """
            select i as media_id,
                   case when i % 2 = 0 then 'png' else 'jpeg' end as declared_format
            from range(2000) t(i)
            where i % 2 = 0 and i % 17 = 3
        """,
        "streaming_summary": """
            with v as (
              select time_bucket(interval '1 hour', ts) as window_start,
                     event_type,
                     (case when event_type is null
                           or event_type not in ('click','view','signup','purchase')
                           then 1 else 0 end
                      + case when coalesce(value, 0) > 100 then 1 else 0 end) as nv
              from events
            )
            select window_start, event_type,
                   count(*) as n_rows,
                   count(*) filter (where nv > 0) as n_rows_failed,
                   sum(nv)::bigint as n_violations
            from v group by 1, 2
        """,
        "conditional_rules": """
            select field, code, n from (
              select 'value' as field, 'required_if' as code,
                     count(*) filter (where event_type = 'purchase'
                                      and (value is null or value = 0)) as n
              from events
              union all
              select 'value', 'max', count(*) filter (where coalesce(value,0) > 100) from events
              union all
              select 'event_type', 'oneof',
                     count(*) filter (where coalesce(event_type,'') not in
                       ('click','view','signup','purchase')) from events
            ) where n > 0
        """,
        "compare_polymorphism": """
            select field, code, n from (
              select 'c_name' as field, 'required' as code,
                     count(*) filter (where c_name is null or c_name = '') as n
              from customer
              union all
              select 'c_name', 'min',
                     count(*) filter (where strlen(coalesce(c_name,'')) < 12) from customer
              union all
              select 'c_acctbal', 'gte',
                     count(*) filter (where coalesce(c_acctbal,0) < 0) from customer
            ) where n > 0
        """,
        "cross_field": """
            select field, code, n from (
              select 'l_discount' as field, 'ltefield' as code,
                     count(*) filter (where not (coalesce(l_discount,0) <= coalesce(l_tax,0))) as n
              from lineitem
            ) where n > 0
        """,
        # ---- approximate-tier ground truths (exact re-derivations) ----
        "minhash_lsh": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') as w
              from documents
            ), sh as (
              select doc_id,
                     case when len(w) >= 3
                          then list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' ')))
                          else [array_to_string(w, ' ')] end as g
              from toks
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.g, b.g))::double
                         / len(list_distinct(list_concat(a.g, b.g))), 6) as jaccard
            from sh a join sh b on a.doc_id < b.doc_id
            where round(len(list_intersect(a.g, b.g))::double
                        / len(list_distinct(list_concat(a.g, b.g))), 6) >= 0.5
        """,
        "simhash_candidates": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') as w
              from documents
            ), md as (
              select doc_id, list_transform(w, t -> md5(t)) as ms from toks
            ), sig as (
              select doc_id,
                list_transform(
                  list_transform(range(0, 64), i ->
                    list_sum(list_transform(ms, m ->
                      (((strpos('0123456789abcdef', substr(m, (i // 4) + 1, 1)) - 1)
                        // ([1,2,4,8])[(i % 4) + 1]) % 2) * 2 - 1))),
                  v -> case when coalesce(v, 0) > 0 then 1 else 0 end) as s
              from md
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   cast(len(list_filter(range(1, 65), j -> a.s[j] <> b.s[j])) as int) as hamming
            from sig a join sig b on a.doc_id < b.doc_id
            where len(list_filter(range(1, 65), j -> a.s[j] <> b.s[j])) <= 3
        """,
        "srp_ann": _ANN_TOP2_AUGMENTED_SQL,
        "ivf_ann": _ANN_TOP2_AUGMENTED_SQL,
        "ivf_pq_ann": _ANN_TOP2_AUGMENTED_SQL,
        "edit_join": """
            select a.c_custkey as id_a, b.c_custkey as id_b,
                   cast(levenshtein(a.c_name, b.c_name) as int) as dist
            from customer a join customer b
              on a.c_custkey < b.c_custkey
             and abs(length(a.c_name) - length(b.c_name)) <= 1
            where levenshtein(a.c_name, b.c_name) <= 1
        """,
        "check_suite": """
            with m as (
              select
                (select cast(count(*) as double) from documents) as size_v,
                (select count(text) / cast(count(*) as double)
                   from documents) as comp_text,
                (select count(lang) / cast(count(*) as double)
                   from documents) as comp_lang,
                (select sum(case when coalesce(
                        n_chars between 1 and 100000, false)
                        then 1 else 0 end) / cast(count(*) as double)
                   from documents) as compl_nchars,
                (select avg(cast(n_chars as double)) from documents)
                   as mean_nchars,
                (select cast(max(n_chars) as double) from documents)
                   as max_nchars,
                (select count(*) from (
                   select doc_id from documents
                   group by doc_id having count(*) = 1)) as u_doc,
                (select count(*) from (
                   select lang from documents group by lang)) as g_lang,
                (select quantile_cont(cast(n_chars as double), 0.5)
                   from documents) as med_nchars,
                (select count(*) from (
                   select doc_id, source from documents
                   group by 1, 2 having count(*) = 1)) as u_ds,
                (select cast(count(*) as double) from documents) as nn
            )
            select 'has rows' as "check", 'size' as metric, '*' as subject,
                   round(size_v, 6) as value, '>= 100' as "constraint",
                   case when round(size_v, 6) is null then 'error'
                        when round(size_v, 6) >= 100.0 then 'pass'
                        else 'fail' end as status
            from m
            union all
            select 'text filled', 'completeness', 'text',
                   round(comp_text, 6), '>= 0.99',
                   case when round(comp_text, 6) is null then 'error'
                        when round(comp_text, 6) >= 0.99 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'lang filled', 'completeness', 'lang',
                   round(comp_lang, 6), '>= 0.999',
                   case when round(comp_lang, 6) is null then 'error'
                        when round(comp_lang, 6) >= 0.999 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'doc ids unique', 'uniqueness', 'doc_id',
                   round(u_doc / nn, 6), '== 1',
                   case when round(u_doc / nn, 6) is null then 'error'
                        when round(u_doc / nn, 6) = 1.0 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'langs are few', 'distinctness', 'lang',
                   round(g_lang / nn, 6), '<= 0.01',
                   case when round(g_lang / nn, 6) is null then 'error'
                        when round(g_lang / nn, 6) <= 0.01 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'n_chars in range', 'compliance',
                   'n_chars between 1 and 100000',
                   round(compl_nchars, 6), '>= 0.95',
                   case when round(compl_nchars, 6) is null then 'error'
                        when round(compl_nchars, 6) >= 0.95 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'mean doc length', 'mean', 'n_chars',
                   round(mean_nchars, 6), '>= 50',
                   case when round(mean_nchars, 6) is null then 'error'
                        when round(mean_nchars, 6) >= 50.0 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'max doc length', 'max', 'n_chars',
                   round(max_nchars, 6), '<= 100000',
                   case when round(max_nchars, 6) is null then 'error'
                        when round(max_nchars, 6) <= 100000.0 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'median doc length', 'quantile', 'n_chars q=0.5',
                   round(med_nchars, 6), '>= 50',
                   case when round(med_nchars, 6) is null then 'error'
                        when round(med_nchars, 6) >= 50.0 then 'pass'
                        else 'fail' end
            from m
            union all
            select 'doc keyed by id+source', 'uniqueness',
                   'doc_id,source',
                   round(u_ds / nn, 6), '== 1',
                   case when round(u_ds / nn, 6) is null then 'error'
                        when round(u_ds / nn, 6) = 1.0 then 'pass'
                        else 'fail' end
            from m
        """,
        "doc_chunks": """
            with toks as (
              select doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> t <> '') as tk
              from documents
            ), sized as (
              select doc_id, tk, len(tk) as n from toks where len(tk) > 0
            ), counted as (
              select doc_id, tk,
                     cast(ceil(greatest(n - 8, 1) / 24.0) as bigint) as k
              from sized
            ), expanded as (
              select doc_id, tk, cast(i as bigint) as chunk_id,
                     cast(i * 24 as bigint) as start_tok
              from counted, unnest(range(k)) as t(i)
            )
            select doc_id, chunk_id, start_tok,
                   cast(len(list_slice(tk, start_tok + 1, start_tok + 32))
                        as bigint) as n_tokens,
                   array_to_string(
                     list_slice(tk, start_tok + 1, start_tok + 32),
                     ' ') as chunk_text
            from expanded
        """,
        "shared_content": """
            with all_rc as (
              select source as repo, text from documents
              union all
              select 'fork_' || source, text from documents
              where doc_id % 3 = 0
            ), rc as (
              select distinct repo, text from all_rc
              where text is not null and text <> ''
            )
            select a.repo as repo_a, b.repo as repo_b,
                   cast(count(*) as bigint) as shared_files
            from rc a join rc b on a.text = b.text and a.repo < b.repo
            group by 1, 2
            having count(*) >= 2
        """,
        "repo_similarity": """
            with all_rc as (
              select source as repo, text from documents
              union all
              select 'fork_' || source, text from documents
              where doc_id % 3 = 0
            ), rc as (
              select distinct repo, text from all_rc
              where text is not null and text <> ''
            ), sizes as (
              select repo, cast(count(*) as bigint) as n
              from rc group by repo
            ), pairs as (
              select a.repo as repo_a, b.repo as repo_b,
                     cast(count(*) as bigint) as shared_files
              from rc a join rc b on a.text = b.text and a.repo < b.repo
              group by 1, 2
            )
            select repo_a, repo_b, shared_files,
                   sa.n as n_a, sb.n as n_b,
                   round(shared_files
                         / cast(sa.n + sb.n - shared_files as double), 6)
                     as jaccard,
                   round(shared_files
                         / cast(least(sa.n, sb.n) as double), 6)
                     as containment
            from pairs
            join sizes sa on sa.repo = pairs.repo_a
            join sizes sb on sb.repo = pairs.repo_b
            where round(shared_files
                        / cast(sa.n + sb.n - shared_files as double), 6)
                  >= 0.05
        """,
        "fork_dedup": """
            with recursive all_rc as (
              select source as repo, text from documents
              union all
              select 'fork_' || source, text from documents
              where doc_id % 3 = 0
              union all
              select 'fork2_' || source, text from documents
              where doc_id % 6 = 0
            ), rc as (
              select distinct repo, text from all_rc
              where text is not null and text <> ''
            ), sizes as (
              select repo, cast(count(*) as bigint) as n_files
              from rc group by repo
            ), rawp as (
              select a.repo as ra, b.repo as rb,
                     cast(count(*) as bigint) as sh
              from rc a join rc b on a.text = b.text and a.repo < b.repo
              group by 1, 2
            ), pairs as (
              select ra, rb from rawp
              join sizes sa on sa.repo = rawp.ra
              join sizes sb on sb.repo = rawp.rb
              where round(sh / cast(sa.n_files + sb.n_files - sh
                                    as double), 6) >= 0.25
            ), edges as (
              select ra as a, rb as b from pairs
              union
              select rb, ra from pairs
            ), reach(node, label) as (
              select repo, repo from sizes
              union
              select e.a, r.label from edges e
              join reach r on r.node = e.b
            ), comp as (
              select node as repo, min(label) as family
              from reach group by node
            ), canon as (
              select family, repo as canonical_repo from (
                select c.family, s.repo,
                       row_number() over (partition by c.family
                         order by s.n_files desc, s.repo desc) as rn
                from comp c join sizes s on s.repo = c.repo
              ) where rn = 1
            )
            select s.repo, s.n_files, k.canonical_repo,
                   cast(case when s.repo = k.canonical_repo
                        then 1 else 0 end as int) as is_canonical
            from sizes s
            join comp c on c.repo = s.repo
            join canon k on k.family = c.family
        """,
        "winnow_pairs": """
            with norm as (
              select doc_id, regexp_replace(lower(coalesce(text, '')),
                                            '\\s+', '', 'g') as nrm
              from documents
            ), grams as (
              select doc_id,
                     list_transform(range(1, length(nrm) - 12 + 2),
                       i -> ('0x' || substr(md5(substr(nrm, i, 12)), 1, 12))
                            ::bigint) as gh
              from norm where length(nrm) >= 12
            ), fps as (
              select doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(len(gh) - 10 + 1, 1) + 1),
                       j -> list_min(gh[j:j+9])))) as fp
              from grams
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   cast(count(*) as bigint) as shared_fps
            from fps a join fps b on a.fp = b.fp and a.doc_id < b.doc_id
            group by 1, 2
            having count(*) >= 2
        """,
        "json_spec": """
            with j as (
              select case
                when event_id % 97 = 0 then 'not json'
                when event_type = 'click' then
                  '{"k": ' || (event_id % 100) || ', "device": "m'
                  || (user_id % 3) || '", "active": true}'
                when event_type = 'view' then
                  '{"k": ' || (event_id % 100) || ', "score": '
                  || (event_id % 9) || '.5, "tags": ["t1","t2"]}'
                when event_type = 'purchase' then
                  '{"k": "' || (event_id % 100) || '", "amount": {"cents": '
                  || (user_id % 1000) || ', "cur": null}}'
                else '{"k": ' || (event_id % 100) || '}'
              end as js from events
            ), p as (
              select js, try_cast(js as json) as v from j
            ), tot as (
              select cast(count(*) filter (where json_type(v) = 'OBJECT')
                          as bigint) as n_obj,
                     cast(count(*) filter (where js is not null
                                           and v is null)
                          as bigint) as n_corrupt
              from p
            ), kv as (
              select unnest(json_keys(v)) as key, v
              from p where json_type(v) = 'OBJECT'
            ), typed as (
              select key,
                case json_type(v, '$.' || key)
                  when 'OBJECT' then 'object'
                  when 'ARRAY' then 'array'
                  when 'VARCHAR' then 'string'
                  when 'BOOLEAN' then 'bool'
                  when 'NULL' then 'null'
                  when 'DOUBLE' then 'float'
                  when 'BIGINT' then 'int'
                  when 'UBIGINT' then 'int'
                  else lower(json_type(v, '$.' || key))
                end as vtype
              from kv
            ), counts as (
              select key, vtype, cast(count(*) as bigint) as n_type
              from typed group by 1, 2
            ), wk as (
              select key, vtype, n_type,
                     cast(sum(n_type) over (partition by key) as bigint)
                       as n_key,
                     cast(max(n_type) over (partition by key) as bigint)
                       as max_type
              from counts
            )
            select key as "key", vtype, n_type, n_key,
                   round(cast(n_key as double) / n_obj, 6)
                     as presence_rate,
                   round(cast(n_type as double) / n_key, 6) as type_share,
                   (n_type = max_type
                    and round(cast(n_type as double) / n_key, 6) >= 0.9)
                     as dominant,
                   n_obj, n_corrupt
            from wk cross join tot
        """,
        "fk_discovery": """
            with d as (
              select distinct 'orders.o_custkey' as cid,
                     cast(o_custkey as varchar) as v
              from orders where o_custkey is not null
              union
              select distinct 'orders.o_orderkey',
                     cast(o_orderkey as varchar)
              from orders where o_orderkey is not null
              union
              select distinct 'customer.c_custkey',
                     cast(c_custkey as varchar)
              from customer where c_custkey is not null
              union
              select distinct 'customer.c_nationkey',
                     cast(c_nationkey as varchar)
              from customer where c_nationkey is not null
              union
              select distinct 'nation.n_nationkey',
                     cast(n_nationkey as varchar)
              from nation where n_nationkey is not null
              union
              select distinct 'lineitem.l_orderkey',
                     cast(l_orderkey as varchar)
              from lineitem where l_orderkey is not null
            ), na as (
              select cid, cast(count(*) as bigint) as n from d group by 1
            ), common as (
              select a.cid as from_id, b.cid as to_id,
                     cast(count(*) as bigint) as n_common
              from d a join d b on a.v = b.v and a.cid <> b.cid
              group by 1, 2
            )
            select f.cid as from_id, t.cid as to_id,
                   f.n as n_from,
                   coalesce(c.n_common, 0) as n_common,
                   round(cast(coalesce(c.n_common, 0) as double) / f.n, 6)
                     as coverage,
                   (coalesce(c.n_common, 0) = f.n) as holds
            from na f cross join na t
            left join common c on c.from_id = f.cid and c.to_id = t.cid
            where f.cid <> t.cid
        """,
        "value_patterns": """
            with masked as (
              select col as "column",
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(v, '[A-Z]+', 'A', 'g'),
                         '[a-z]+', 'a', 'g'),
                       '[0-9]+', '9', 'g') as mask
              from (
                select 'c_name' as col, cast(c_name as varchar) as v
                from customer
                union all
                select 'c_mktsegment', cast(c_mktsegment as varchar)
                from customer
              ) where v is not null
            ), counts as (
              select "column", mask, cast(count(*) as bigint) as n
              from masked group by 1, 2
            ), ranked as (
              select "column", mask, n,
                     round(cast(n as double) /
                           sum(n) over (partition by "column"), 6) as share,
                     cast(row_number() over (
                       partition by "column"
                       order by n desc, mask asc) as int) as "rank"
              from counts
            )
            select * from ranked where "rank" <= 5
        """,
        "code_quality": _codequality_oracle_sql(),
        "secret_scan": _secret_oracle_sql(),
        "license_scan": _license_oracle_sql(),
        "repo_license": _repo_license_oracle_sql(),
        "code_chunks": _code_chunks_oracle_sql(),
        "function_clones": _function_clones_oracle_sql(),
        "identifier_vocab": _identifier_vocab_oracle_sql(),
        "repo_profile": _repo_profile_oracle_sql(),
        "code_complexity": _code_complexity_oracle_sql(),
        "maintainability": _maintainability_oracle_sql(),
        "conflict_markers": _CONFLICT_ORACLE_SQL,
        "identifier_casing": _identifier_casing_oracle_sql(),
        "call_graph": _call_graph_oracle_sql(),
        "shard_leakage": _SHARD_LEAKAGE_ORACLE_SQL,
        "self_containment": _self_containment_oracle_sql(),
        "owner_optout": _OWNER_OPTOUT_ORACLE_SQL,
        "markdown_pairs": _markdown_oracle_sql(),
        "cross_lang_pairs": _cross_lang_oracle_sql(),
        "repo_tree_stats": _tree_stats_oracle_sql(),
        "file_history": _FILE_HISTORY_ORACLE_SQL,
        "nlpl_pairs": _nlpl_oracle_sql(),
        "unsafe_apis": _unsafe_oracle_sql(),
        "manifest_deps": _manifest_oracle_sql(),
        "public_api": _public_api_oracle_sql(),
        "docstring_coverage": _docstring_coverage_oracle_sql(),
        "test_mapping": _test_mapping_oracle_sql(),
        "lang_detect": _lang_detect_oracle_sql(),
        "indent_style": _INDENT_STYLE_ORACLE_SQL,
        "type2_clones": _type2_clones_oracle_sql(),
        "api_diff": _API_DIFF_ORACLE_SQL,
        "entropy_secrets": _entropy_secrets_oracle_sql(),
        "curation_verdicts": _curation_verdicts_oracle_sql(),
        "code_contamination": _code_contamination_oracle_sql(),
        "unused_imports": _unused_imports_oracle_sql(),
        "repo_debt": _repo_debt_oracle_sql(),
        "embedded_text": _embedded_text_oracle_sql(),
        "strip_headers": _strip_headers_oracle_sql(),
        "code_neardup": _code_neardup_oracle_sql(),
        "import_cycles": _import_cycles_oracle_sql(),
        "module_rank": _module_rank_oracle_sql(),
        "shard_assign": r"""
            with d as (
              select doc_id, cast(strlen(text) as bigint) as n,
                     md5(cast(doc_id as varchar) || 'v1') as h
              from documents
            ), k as (select * from d where n > 0),
            t as (select cast((sum(n) + 15) // 16 as bigint) as sb from k),
            cum as (
              select doc_id, n,
                     cast(coalesce(sum(n) over (
                       order by h, doc_id
                       rows between unbounded preceding and 1 preceding), 0)
                       as bigint) as g
              from k
            )
            select doc_id, cast(g // sb as bigint) as shard_id,
                   g as "offset", n as "size"
            from cum, t
        """,
        "bm25_search": _bm25_oracle_sql(),
        "function_complexity": _function_complexity_oracle_sql(),
        "edit_pairs": _EDIT_PAIRS_ORACLE_SQL,
        "commit_pairs": _COMMIT_PAIRS_ORACLE_SQL,
        "mixture_plan": _MIXTURE_PLAN_ORACLE_SQL,
        "fim_transform": _FIM_ORACLE_SQL,
        "repo_context": _repo_context_oracle_sql(),
        "dobf_pairs": _dobf_oracle_sql(),
        "halstead_metrics": _halstead_oracle_sql(),
        "ownership": _OWNERSHIP_ORACLE_SQL,
        "blocked_terms": _BLOCKED_TERMS_ORACLE_SQL,
        "boilerplate": _BOILERPLATE_ORACLE_SQL,
        "chat_lint": _CHAT_LINT_ORACLE_SQL,
        "split_assign": _split_assign_oracle_sql(),
        "chat_render": _chat_render_oracle_sql(),
        "normalize": _normalize_oracle_sql(),
        "preference_lint": _PREFERENCE_ORACLE_SQL,
        "rank_buckets": _RANK_BUCKETS_ORACLE_SQL,
        "dsir": _dsir_oracle_sql(),
        "bitext_pairs": _BITEXT_ORACLE_SQL,
        "pack_sweep": _pack_sweep_oracle_sql(),
        "image_ahash": _IMAGE_AHASH_ORACLE_SQL,
        "video_frames": _VIDEO_FRAMES_ORACLE_SQL,
        "classifier_calibration": _CLASSIFIER_CALIBRATION_ORACLE_SQL,
        "threshold_sweep": _THRESHOLD_SWEEP_ORACLE_SQL,
        "image_neardups": _IMAGE_NEARDUP_ORACLE_SQL,
        "audio_envelope": _AUDIO_ENVELOPE_ORACLE_SQL,
        "semantic_contamination": _SEMCONTAM_ORACLE_SQL,
        "synthetic_text": _synthtext_oracle_sql(),
        "ngram_saturation": _NGRAM_SATURATION_ORACLE_SQL,
        "jsonspec_drift": _jsonspec_drift_oracle_sql(),
        "domain_caps": _DOMAIN_CAPS_ORACLE_SQL,
        "hard_negatives": _HARD_NEGATIVES_ORACLE_SQL,
        "audio_landmarks": _AUDIO_LANDMARKS_ORACLE_SQL,
        "audio_matches": _AUDIO_MATCHES_ORACLE_SQL,
        "readability": _READABILITY_ORACLE_SQL,
        "vocab_coverage": _vocab_coverage_oracle_sql(),
        "image_dhash": _IMAGE_DHASH_ORACLE_SQL,
        "dedup_eval": _DEDUP_EVAL_ORACLE_SQL,
        "web_curation": _web_curation_oracle_sql(),
        "dead_symbols": _dead_symbols_oracle_sql(),
        "comment_lang": _comment_lang_oracle_sql(),
        "notebook_pairs": _NB_PAIRS_ORACLE_SQL,
        "lang_mismatch": _LANG_MISMATCH_ORACLE_SQL,
        "notebook_cells": _NOTEBOOK_ORACLE_SQL,
        "code_imports": _imports_oracle_sql(),
        "comment_stats": _comment_stats_oracle_sql(),
        "path_classes": _pathclass_oracle_sql(),
        "encoding_stats": _encoding_oracle_sql(),
        "unicode_audit": _unicode_oracle_sql(),
        "strip_comments": _strip_comments_oracle_sql(),
        "license_conflicts": _license_conflicts_oracle_sql(),
        "dataset_card": _DATASET_CARD_ORACLE_SQL,
        "blob_stats": _blob_stats_oracle_sql(),
        "script_mix": _script_mix_oracle_sql(),
        "code_curation": _code_curation_oracle_sql(),
        "embedding_quality": """
            with p as (
              select embedding as v,
                (embedding is null) as isnull_v,
                (embedding is not null and len(embedding) <> 64) as wrong,
                (embedding is not null and len(list_filter(embedding,
                    x -> x is null)) > 0) as nullel,
                (embedding is not null and len(list_filter(embedding,
                    x -> x is null)) = 0
                 and len(list_filter(embedding,
                    x -> isnan(x::DOUBLE))) > 0) as nan_v,
                (embedding is not null and len(embedding) = 64
                 and len(list_filter(embedding, x -> x is null)) = 0
                 and len(list_filter(embedding,
                    x -> isnan(x::DOUBLE))) = 0) as valid
              from embeddings
            ), q as (
              select *,
                case when valid then sqrt(list_sum(list_transform(
                    v, x -> x::DOUBLE * x::DOUBLE))) end as norm
              from p
            )
            select cast(count(*) as bigint) as n_rows,
                   cast(sum(case when isnull_v then 1 else 0 end)
                        as bigint) as n_null_vecs,
                   cast(sum(case when wrong then 1 else 0 end)
                        as bigint) as n_wrong_dim,
                   cast(sum(case when nullel then 1 else 0 end)
                        as bigint) as n_with_null_elem,
                   cast(sum(case when nan_v then 1 else 0 end)
                        as bigint) as n_with_nan,
                   cast(sum(case when valid then 1 else 0 end)
                        as bigint) as n_valid,
                   cast(sum(case when valid and norm = 0 then 1 else 0 end)
                        as bigint) as n_zero_vecs,
                   round(min(norm), 6) as norm_min,
                   round(avg(norm), 6) as norm_mean,
                   round(max(norm), 6) as norm_max
            from q
        """,
        "embedding_neardups": """
            with aug as (
              select vec_id, embedding::DOUBLE[] as v from embeddings
              union all
              select vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.5)
              from embeddings
            )
            select a.vec_id as id_a, b.vec_id as id_b,
                   round(
                     list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
                        * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))),
                   6) as cosine
            from aug a join aug b on a.vec_id < b.vec_id
            where round(
                     list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
                        * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))),
                  6) >= 0.95
        """,
        "drift_psi": """
            with e as (
              select list_transform(quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                                    x -> round(x, 6)) as edges
              from events where event_type = 'click' and value is not null
            ), b as (
              select event_type as g,
                     list_sum(list_transform(e.edges,
                       ed -> case when value > ed then 1 else 0 end)) as bk
              from events, e
              where event_type in ('click','purchase') and value is not null
            ), pb as (
              select bk,
                     count(*) filter (where g = 'click') as cb,
                     count(*) filter (where g = 'purchase') as cc
              from b group by 1
            ), t as (select sum(cb) as tb, sum(cc) as tc from pb)
            select 'click' as baseline, 'purchase' as curr,
                   round(sum(
                     (greatest(cc / tc, 1e-6) - greatest(cb / tb, 1e-6))
                     * ln(greatest(cc / tc, 1e-6) / greatest(cb / tb, 1e-6))
                   ), 6) as psi
            from pb, t
        """,
        "psi_report": """
            with e as (
              select list_transform(quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                                    x -> round(x, 6)) as edges
              from events where event_type = 'click' and value is not null
            ), b as (
              select event_type as g,
                     list_sum(list_transform(e.edges,
                       ed -> case when value > ed then 1 else 0 end)) as bk
              from events, e where value is not null
            ), pb as (
              select g, bk, count(*) as c from b group by 1, 2
            ), base as (
              select bk, c as cb from pb where g = 'click'
            ), tb as (
              select sum(c) as tbv from pb where g = 'click'
            ), tg as (
              select g, sum(c) as tgv from pb where g <> 'click' group by 1
            ), grid as (
              select gg.g, bb.bk
              from (select distinct g from pb where g <> 'click') gg
              cross join (select distinct bk from pb) bb
            )
            select grid.g as curr,
                   round(sum(
                     (greatest(coalesce(cur.c, 0) / tg.tgv, 1e-6)
                      - greatest(coalesce(base.cb, 0) / tb.tbv, 1e-6))
                     * ln(greatest(coalesce(cur.c, 0) / tg.tgv, 1e-6)
                          / greatest(coalesce(base.cb, 0) / tb.tbv, 1e-6))
                   ), 6) as psi
            from grid
            left join pb cur on cur.g = grid.g and cur.bk = grid.bk
            left join base on base.bk = grid.bk
            join tg on tg.g = grid.g
            cross join tb
            group by 1
        """,
        "schema_evolution": """
            with before as (
              select column_name as col,
                     case lower(column_type) when 'varchar' then 'string'
                          else lower(column_type) end as t
              from (describe select * from documents)
            ), after as (
              select column_name as col,
                     case lower(column_type) when 'varchar' then 'string'
                          else lower(column_type) end as t
              from (describe select * exclude(source)
                           replace (cast(n_chars as varchar) as n_chars),
                           cast(0.5 as double) as quality
                    from documents)
            )
            select col as "column", 'removed' as change,
                   b.t as from_type, cast(null as varchar) as to_type
            from before b where col not in (select col from after)
            union all
            select col, 'added', cast(null as varchar), a.t
            from after a where col not in (select col from before)
            union all
            select b.col, 'type_changed', b.t, a.t
            from before b join after a using (col) where b.t <> a.t
        """,
        "sessions": """
            with o as (
              select user_id, event_id, ts,
                     lag(ts) over (partition by user_id
                                   order by ts, event_id) as pts
              from events
            ), f as (
              select user_id, event_id, ts,
                     case when pts is null
                          or floor(epoch(ts)) - floor(epoch(pts)) > 1800
                          then 1 else 0 end as ns
              from o
            ), s as (
              select user_id, ts,
                     cast(sum(ns) over (partition by user_id
                                        order by ts, event_id
                                        rows between unbounded preceding
                                                 and current row) as bigint)
                       as session_idx
              from f
            )
            select user_id, session_idx,
                   count(*) as n_events,
                   cast(floor(epoch(max(ts))) - floor(epoch(min(ts))) as bigint)
                     as duration_sec
            from s group by 1, 2
        """,
        "fd_check": """
            select o_custkey,
                   count(*) as n_rows,
                   count(distinct {'v': o_orderpriority}) as n_distinct_dep
            from orders group by 1
            having count(distinct {'v': o_orderpriority}) > 1
        """,
        "bpe_pairs": r"""
            with words as (
              select w, count(*) as wn from (
                select unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                          t -> t <> '')) as w
                from documents) group by 1
            ), pairs as (
              select unnest(list_transform(range(1, length(w)),
                                           i -> substr(w, i, 2))) as pair, wn
              from words where length(w) >= 2
            )
            select pair, sum(wn)::bigint as n from pairs group by 1
            order by n desc, pair asc limit 100
        """,
        "bpe_token_counts": f"""
            with w as (
              select doc_id, unnest(list_filter(
                       string_split_regex(trim(text), '\\s+'), t -> t <> '')) as w
              from documents
            ), wc as (
              select doc_id, w, count(*) as c from w group by 1, 2
            ), vocab as (
              select w,
                     cast((length(seg) - length(replace(seg, chr(30), ''))) / 2
                          as bigint) as n_tok
              from (select w, {_bpe_oracle_seg_sql("w")} as seg
                    from (select distinct w from wc))
            )
            select wc.doc_id, cast(sum(wc.c * vocab.n_tok) as bigint) as n_bpe_tokens
            from wc join vocab using (w) group by 1
        """,
        "tokenizer_fertility": f"""
            with base as (
              select coalesce(lang, '') as lang, coalesce(text, '') as s
              from documents
            ), stats as (
              select lang, count(*) as n_docs,
                     cast(sum(strlen(s)) as bigint) as n_bytes,
                     cast(sum(length(s)) as bigint) as n_chars
              from base group by 1
            ), w as (
              select lang, unnest(list_filter(
                       string_split_regex(trim(s), '\\s+'), t -> t <> '')) as w
              from base
            ), wc as (
              select lang, w, count(*) as c from w group by 1, 2
            ), vocab as (
              select w,
                     cast((length(seg) - length(replace(seg, chr(30), ''))) / 2
                          as bigint) as n_tok
              from (select w, {_bpe_oracle_seg_sql("w")} as seg
                    from (select distinct w from wc))
            ), tok as (
              select lang, cast(sum(wc.c) as bigint) as n_words,
                     cast(sum(wc.c * vocab.n_tok) as bigint) as n_bpe_tokens
              from wc join vocab using (w) group by 1
            )
            select s.lang, s.n_docs, s.n_bytes, s.n_chars,
                   coalesce(t.n_words, 0) as n_words,
                   coalesce(t.n_bpe_tokens, 0) as n_bpe_tokens,
                   case when coalesce(t.n_words, 0) > 0
                        then t.n_bpe_tokens / cast(t.n_words as double)
                   end as fertility,
                   case when coalesce(t.n_bpe_tokens, 0) > 0
                        then s.n_bytes / cast(t.n_bpe_tokens as double)
                   end as bytes_per_token,
                   case when coalesce(t.n_bpe_tokens, 0) > 0
                        then s.n_chars / cast(t.n_bpe_tokens as double)
                   end as chars_per_token
            from stats s left join tok t using (lang)
        """,
        "curation": r"""
            with recursive valid as (
              select doc_id, coalesce(text, '') as s from documents
              where text is not null and text <> ''
                and lang is not null and lang <> ''
                and lang in ('en', 'es', 'de', 'fr')
            ), m as (
              select doc_id, s,
                     length(s) as n_chars,
                     len(list_filter(string_split_regex(trim(s), '\s+'),
                                     x -> x <> '')) as n_tokens,
                     len(list_distinct(list_filter(
                           string_split_regex(trim(s), '\s+'),
                           x -> x <> ''))) as distinct_tokens,
                     length(regexp_replace(s, '[^\p{L}]', '', 'g')) as alpha_chars
              from valid
            ), q as (
              select doc_id, s,
                     round(
                       0.25 * least(n_chars / 500.0, 1.0)
                     + 0.25 * (case when n_chars > 0
                               then alpha_chars::double / n_chars else 0 end)
                     + 0.2  * (case when n_tokens > 0 and
                                    (n_chars + 1.0) / (n_tokens + 1.0)
                                      between 3 and 12
                               then 1.0 else 0.4 end)
                     + 0.3  * (case when n_tokens > 0
                               then distinct_tokens::double / n_tokens
                               else 0 end)
                     , 6) as quality
              from m
            ), kept as (
              select * from q where quality >= 0.3
            ), fp as (
              select doc_id,
                     md5(trim(regexp_replace(regexp_replace(lower(s),
                       '[^\p{L}\p{Nd}\s]', '', 'g'), '\s+', ' ', 'g'))) as f
              from kept
            ), sh as (
              select doc_id,
                     case when len(w) >= 3
                          then list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' ')))
                          else [array_to_string(w, ' ')] end as g
              from (select doc_id,
                           list_filter(string_split_regex(trim(s), '\s+'),
                                       t -> t <> '') as w
                    from kept)
            ), e0 as (
              select a.doc_id as x, b.doc_id as y
              from fp a join fp b on a.doc_id < b.doc_id and a.f = b.f
              union
              select a.doc_id, b.doc_id
              from sh a join sh b on a.doc_id < b.doc_id
              where len(list_intersect(a.g, b.g))::double
                      / len(list_distinct(list_concat(a.g, b.g))) >= 0.5
            ), e as (
              select x, y from e0 union select y as x, x as y from e0
            ), reach(a, b) as (
              select x, y from e
              union
              select r.a, e.y from reach r join e on r.b = e.x
            ), lbl as (
              select a, min(b) as mn from reach group by a
            ), clustered as (
              select kept.doc_id, kept.quality,
                     least(coalesce(lbl.mn, kept.doc_id), kept.doc_id) as cl
              from kept left join lbl on kept.doc_id = lbl.a
            )
            select doc_id from (
              select doc_id,
                     row_number() over (partition by cl
                                        order by quality desc, doc_id) as rn
              from clustered
            ) where rn = 1
        """,
        "distinct_rollup": """
            select 'day' as grain, event_type,
                   epoch_us(date_trunc('day', ts)) as bucket_us,
                   count(distinct user_id) as n_distinct
            from events group by 2, 3
            union all
            select 'month', event_type,
                   epoch_us(date_trunc('month', ts)),
                   count(distinct user_id)
            from events group by 2, 3
        """,
        "fuzzy_match": """
            with ce as (
              select c_custkey,
                     c_name || ' ' ||
                       substr(md5('c' || cast(c_custkey as varchar)), 1, 12)
                       as entity
              from customer
            ), se as (
              select s_suppkey,
                     s_name || ' ' ||
                       substr(md5('s' || cast(s_suppkey as varchar)), 1, 12)
                       as entity
              from supplier
            ), right_side as (
              select s_suppkey as id_b, entity as nm from se
              union all
              select c_custkey + 100000,
                     substr(entity, 1, length(entity) - 1) || 'x'
              from ce where c_custkey % 50 = 0
            ), cg as (
              select c_custkey as id_a,
                     list_distinct(list_transform(
                       range(1, length(lower(entity)) - 1),
                       i -> lower(entity)[i:i+2])) as g
              from ce
            ), sg as (
              select id_b,
                     list_distinct(list_transform(
                       range(1, length(lower(nm)) - 1),
                       i -> lower(nm)[i:i+2])) as g
              from right_side
            )
            select id_a, id_b,
                   len(list_intersect(cg.g, sg.g))::double
                     / len(list_distinct(list_concat(cg.g, sg.g))) as jaccard
            from cg, sg
            where len(list_intersect(cg.g, sg.g))::double
                    / len(list_distinct(list_concat(cg.g, sg.g))) >= 0.6
        """,
        "streaming_corpus_dedup": """
            select doc_id, md5(coalesce(text, '')) as text_md5
            from documents
            where coalesce(text, '') not in (
              select coalesce(text, '') from documents where doc_id % 2 = 0)
        """,
        "quantile_rollup": """
            with base as (
              select event_type, ts, value from events where value is not null
            )
            select 'day' as grain, event_type,
                   epoch_us(date_trunc('day', ts)) as bucket_us,
                   count(*) as n, min(value) as vmin, max(value) as vmax
            from base group by 2, 3
            union all
            select 'month', event_type,
                   epoch_us(date_trunc('month', ts)),
                   count(*), min(value), max(value)
            from base group by 2, 3
        """,
        "url_dedup": """
            with d as (select doc_id, doc_id % 97 as page from documents)
            select 'https://news.example.com/art/' || page || '?id=' || page
                     as canon_url,
                   count(*) as n_docs,
                   min(doc_id) as min_doc_id
            from d group by 1
        """,
        "json_validation": """
            with k as (
              select props,
                     cast(json_extract(props, '$.k') as int) as kv
              from events
            )
            select field, code, n from (
              select 'props_s.k' as field, 'required' as code,
                     count(*) filter (where kv is null or kv = 0) as n
              from k
              union all
              select 'props_s.k', 'min',
                     count(*) filter (where coalesce(kv, 0) < 5)
              from k
              union all
              select 'props_s.k', 'max',
                     count(*) filter (where coalesce(kv, 0) > 90)
              from k
              union all
              select 'props', 'required',
                     count(*) filter (where props is null or props = '')
              from k
              union all
              select 'props', 'json',
                     count(*) filter (where not (
                       (starts_with(coalesce(props, ''), '{')
                        and ends_with(coalesce(props, ''), '}'))
                       or (starts_with(coalesce(props, ''), '[')
                           and ends_with(coalesce(props, ''), ']'))))
              from k
            ) where n > 0
        """,
        "tfidf_keywords": r"""
            with w as (
              select doc_id,
                     unnest(list_filter(string_split_regex(trim(coalesce(text, '')),
                                                           '\s+'),
                                        t -> t <> '')) as t
              from documents
            ), tf as (
              select doc_id, t, count(*) as tf from w group by 1, 2
            ), dfq as (
              select t, count(*) as df_t from tf group by 1
            ), nd as (
              select count(*) as n_docs from documents
            ), scored as (
              select tf.doc_id, tf.t, tf.tf,
                     round(tf.tf * ln(n_docs::double / df_t), 6) as score
              from tf join dfq using (t) cross join nd
            ), ranked as (
              select *, row_number() over (partition by doc_id
                                           order by score desc, t asc) as rank
              from scored
            )
            select doc_id, t as token, tf, score, rank
            from ranked where rank <= 3
        """,
        "classifier_scores": r"""
            with base as (
              select doc_id,
                     list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                                 t -> t <> '') as w
              from documents
            ), f as (
              select doc_id,
                     list_concat(w,
                       case when len(w) >= 2
                            then list_transform(range(1, len(w)),
                                                i -> w[i] || ' ' || w[i+1])
                            else [] end) as feats
              from base
            )
            select doc_id,
                   len(feats) as n_feats,
                   cast(round(
                     1.0 / (1.0 + exp(-(
                       coalesce(list_sum(list_transform(feats,
                         t -> (('0x' || substr(md5(t || 'qc-v1'), 1, 8))::bigint
                               ::double / 4294967296.0) - 0.5)), 0.0)
                       / greatest(len(feats), 1)))) * 1e6) as bigint) as score_e6
            from f
        """,
        "lm_perplexity": r"""
            with tok as (
              select doc_id, lang,
                     list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                                 t -> t <> '') as w
              from documents
            ), refbg as (
              select w[i] as prev, w[i+1] as cur from (
                select w, unnest(range(1, len(w))) as i
                from tok where lang = 'en' and len(w) >= 2)
            ), bg as (
              select prev, cur, count(*) as cbg from refbg group by 1, 2
            ), ug as (
              select tkn as wd, count(*) as cug from (
                select unnest(w) as tkn from tok where lang = 'en') group by 1
            ), vv as (
              select count(*) as v from ug
            ), tgt as (
              select doc_id, w[i] as prev, w[i+1] as cur from (
                select doc_id, w, unnest(range(1, len(w))) as i
                from tok where len(w) >= 2)
            )
            select doc_id, count(*) as n_bigrams,
                   cast(round(-avg(ln(
                     (coalesce(cbg, 0) + 0.1) / (coalesce(cug, 0) + 0.1 * v)
                   )) * 1e6) as bigint) as nll_e6
            from tgt
            left join bg using (prev, cur)
            left join ug on tgt.prev = ug.wd
            cross join vv
            group by 1
        """,
        "incremental_dedup": """
            with delta as (
              select doc_id, text from documents where doc_id % 2 = 1
              union all
              select doc_id + 10000, text from documents where doc_id % 2 = 0
              union all
              select doc_id + 20000, text from documents where doc_id % 2 = 1
            ), existing as (
              select distinct coalesce(text, '') as t
              from documents where doc_id % 2 = 0
            ), fresh as (
              select doc_id, text from delta
              where coalesce(text, '') not in (select t from existing)
            ), ranked as (
              select doc_id, text,
                     row_number() over (partition by coalesce(text, '')
                                        order by doc_id) as rn
              from fresh
            )
            select doc_id, md5(coalesce(text, '')) as text_md5
            from ranked where rn = 1
        """,
        "streaming_sessions": """
            with o as (
              select user_id, event_id, ts,
                     lag(ts) over (partition by user_id
                                   order by ts, event_id) as pts
              from events
            ), f as (
              select user_id, event_id, ts,
                     case when pts is null
                               or epoch_us(ts) - epoch_us(pts) > 1800000000
                          then 1 else 0 end as flag
              from o
            ), s as (
              select user_id, ts,
                     sum(flag) over (partition by user_id
                                     order by ts, event_id
                                     rows unbounded preceding) as sid
              from f
            )
            select user_id,
                   epoch_us(min(ts)) as session_start_us,
                   count(*) as n_events,
                   epoch_us(max(ts)) - epoch_us(min(ts)) as duration_us
            from s group by user_id, sid
        """,
        "time_rollup": """
            with base as (
              select event_type, ts, value from events where value is not null
            )
            select 'hour' as grain, event_type,
                   epoch_us(date_trunc('hour', ts)) as bucket_us,
                   count(*) as n, sum(value) as vsum,
                   min(value) as vmin, max(value) as vmax
            from base group by 2, 3
            union all
            select 'day', event_type, epoch_us(date_trunc('day', ts)),
                   count(*), sum(value), min(value), max(value)
            from base group by 2, 3
            union all
            select 'month', event_type, epoch_us(date_trunc('month', ts)),
                   count(*), sum(value), min(value), max(value)
            from base group by 2, 3
        """,
        "temperature_sample": """
            with c as (
              select lang, count(*) as ns from documents group by 1
            ), t as (
              select sum(pow(ns, 0.5)) as qsum, sum(ns) as ntot from c
            ), p as (
              select lang,
                     round(least(0.3 * ntot * pow(ns, 0.5) / (qsum * ns), 1.0),
                           6) as ps
              from c, t
            )
            select d.doc_id, d.lang
            from documents d join p on d.lang = p.lang
            where ('0x' || substr(md5(cast(d.doc_id as varchar) || 'v1'), 1, 8))
                  ::bigint::double / 4294967296.0 < p.ps
        """,
        "semdedup": """
            select vec_id, 1 as kept from embeddings
            union all
            select vec_id + 1000000, 0 from embeddings where vec_id % 3 = 0
            union all
            select vec_id + 2000000, 0 from embeddings where vec_id % 9 = 0
        """,
        "asof_join": """
            with u as (
              select user_id, ts, max(event_id) as update_id
              from events where event_id % 10 = 0 group by 1, 2
            ), uu as (
              select user_id, ts, update_id, update_id % 3 as tier from u
            ), p as (
              select event_id, user_id, ts from events
              where event_type = 'purchase'
            )
            select p.event_id, p.user_id,
                   coalesce(uu.update_id, -1) as update_id,
                   coalesce(uu.tier, -1) as tier,
                   coalesce(epoch_us(uu.ts), -1) as matched_ts_us
            from p asof left join uu
              on p.user_id = uu.user_id and p.ts >= uu.ts
        """,
        "range_join": """
            select c.event_id as click_id, p.event_id as purchase_id,
                   c.user_id,
                   epoch_us(p.ts) - epoch_us(c.ts) as delta_us
            from (select * from events where event_type = 'click') c
            join (select * from events where event_type = 'purchase') p
              on c.user_id = p.user_id
             and p.ts >= c.ts
             and epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        """,
        "url_filter": """
            with u as (
              select doc_id,
                     (['www.example.com', 'ads.tracker.co.uk', 'good.site.org',
                       'blog.example.co.jp', 'cdn.tracker.co.uk', 'weird.hostlocal',
                       'co.uk', 'sub.deep.example.ac.uk'])[(doc_id % 8) + 1] as host
              from documents
            ), p as (
              select doc_id, host, string_split(host, '.') as pp from u
            ), d as (
              select doc_id, host,
                     case
                       when len(pp) >= 2 and array_to_string(pp[-2:], '.')
                            in ('co.uk', 'ac.uk', 'co.jp')
                         then case when len(pp) >= 3
                                   then array_to_string(pp[-3:], '.') end
                       when pp[-1] in ('com', 'org', 'net', 'io', 'uk', 'jp')
                         then case when len(pp) >= 2
                                   then array_to_string(pp[-2:], '.') end
                     end as reg_domain
              from p
            )
            select doc_id, host, reg_domain,
                   case when reg_domain in ('example.com', 'tracker.co.uk')
                        then 0 else 1 end as kept
            from d
        """,
        "outlier_stats": """
            with s as (
              select event_type,
                     round(avg(value), 6) as m,
                     round(stddev_samp(value), 6) as sd,
                     round(quantile_cont(value, 0.25), 6) as q1,
                     round(quantile_cont(value, 0.75), 6) as q3
              from events where value is not null group by 1
            )
            select e.event_type, count(*) as n,
                   count(*) filter (where sd is not null and sd > 0
                                    and abs(value - m) > 3.0 * sd) as n_outliers_z,
                   count(*) filter (where value < q1 - 1.5 * (q3 - q1)
                                    or value > q3 + 1.5 * (q3 - q1)) as n_outliers_iqr
            from events e join s using (event_type)
            where e.value is not null
            group by 1
        """,
        "line_dedup_global": """
            with synth as (
              select doc_id,
                     string_split(concat_ws(chr(10), text,
                       'shared boilerplate footer line', text), chr(10)) as ls
              from documents
            ), lines as (
              select doc_id, u['idx'] as idx, u['line'] as line
              from (select doc_id,
                           unnest(list_transform(range(1, len(ls)+1),
                             i -> {'idx': i, 'line': ls[i]})) as u
                    from synth)
            ), ranked as (
              select doc_id, idx, line,
                     row_number() over (partition by line
                                        order by doc_id, idx) as rn
              from lines
            ), rebuilt as (
              select doc_id,
                     count(*) as n_kept,
                     string_agg(line, chr(10) order by idx) as txt
              from ranked where rn = 1
              group by doc_id
            )
            select d.doc_id,
                   cast(coalesce(r.n_kept, 0) as bigint) as n_lines_kept,
                   md5(coalesce(r.txt, '')) as dedup_md5
            from documents d left join rebuilt r using (doc_id)
        """,
        "span_dedup": f"""
            with src as (
              select doc_id,
                     case when doc_id % 7 = 0
                          then text || ' {_SPAN_SENTINEL}'
                          else text end as text
              from documents
            ), base as (
              select doc_id, string_split(coalesce(text, ''), ' ') as toks
              from src
            ), occ as (
              select doc_id, unnest(range(1, len(toks) - 6)) as pos
              from base where len(toks) >= 8
            ), fp as (
              select o.doc_id, o.pos,
                     md5(array_to_string(b.toks[o.pos:o.pos+7], ' ')) as f
              from occ o join base b using (doc_id)
            ), ranked as (
              select doc_id, pos,
                     row_number() over (partition by f order by doc_id, pos) as rn,
                     count(*) over (partition by f) as c
              from fp
            ), cov as (
              select distinct doc_id, unnest(range(pos, pos + 8)) as cpos
              from ranked where c >= 2 and rn > 1
            ), covn as (
              select doc_id, count(*) as n_removed from cov group by doc_id
            ), toku as (
              select doc_id, unnest(toks) as tok,
                     unnest(range(1, len(toks)+1)) as p
              from base
            ), kept as (
              select t.doc_id, t.tok, t.p
              from toku t left join cov
                on t.doc_id = cov.doc_id and t.p = cov.cpos
              where cov.cpos is null
            ), reb as (
              select doc_id, string_agg(tok, ' ' order by p) as txt
              from kept group by doc_id
            )
            select b.doc_id,
                   cast(coalesce(cn.n_removed, 0) as bigint) as n_tokens_removed,
                   md5(coalesce(r.txt, '')) as despan_md5
            from base b
            left join covn cn using (doc_id)
            left join reb r using (doc_id)
        """,
        "token_budget_sample": r"""
            select doc_id, lang, n_tokens from (
              select doc_id, lang, n_tokens,
                     sum(n_tokens) over (
                       partition by lang
                       order by md5(cast(doc_id as varchar) || 'v1'), doc_id
                       rows between unbounded preceding and current row
                     ) as cum
              from (select doc_id, lang,
                           len(list_filter(string_split_regex(trim(text), '\s+'),
                                           t -> t <> '')) as n_tokens
                    from documents)
            ) where cum <= 2000
        """,
        "pack_sequences": r"""
            with d as (
              select doc_id,
                     cast(len(list_filter(string_split_regex(trim(text), '\s+'),
                                          t -> t <> '')) as bigint) as n,
                     md5(cast(doc_id as varchar) || 'v1') as h
              from documents
            ), k as (select * from d where n > 0),
            cum as (
              select doc_id, n,
                     cast(coalesce(sum(n) over (
                       order by h, doc_id
                       rows between unbounded preceding and 1 preceding), 0)
                       as bigint) as g
              from k
            ), spans as (
              select doc_id, n, g,
                     unnest(range(cast(g // 256 as bigint),
                                  cast((g + n - 1) // 256 + 1 as bigint))) as seq_id
              from cum
            )
            select cast(seq_id as bigint) as seq_id, doc_id,
                   greatest(g, seq_id * 256) - g as begin_tok,
                   least(g + n, (seq_id + 1) * 256) - g as end_tok,
                   greatest(g, seq_id * 256) - seq_id * 256 as seq_off
            from spans
        """,
        "incremental_validation": """
            select field, code, n from (
              select 'value' as field, 'required' as code,
                     count(*) filter (where value is null or value = 0) as n
              from events where event_type = 'purchase'
              union all
              select 'value', 'max',
                     count(*) filter (where coalesce(value, 0) > 100)
              from events where event_type = 'purchase'
              union all
              select 'event_type', 'oneof',
                     count(*) filter (where coalesce(event_type, '') not in
                       ('click','view','signup','purchase'))
              from events where event_type = 'purchase'
            ) where n > 0
        """,
        "gopher_quality": r"""
            with base as (
              select doc_id,
                     coalesce(text, '') as s,
                     list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                                 t -> t <> '') as w,
                     string_split(coalesce(text, ''), chr(10)) as ls
              from documents
            ), m as (
              select doc_id,
                     len(w) as n_tokens,
                     case when len(w) > 0
                          then round(list_sum(list_transform(w, t -> length(t)))::double
                                     / len(w), 6) else 0.0 end as mean_word_len,
                     case when len(w) > 0
                          then round((
                              cast((length(s) - length(replace(s, '#', ''))) / 1 as bigint)
                            + cast((length(s) - length(replace(s, '...', ''))) / 3 as bigint)
                          )::double / len(w), 6) else 0.0 end as symbol_ratio,
                     case when len(w) > 0
                          then round(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))::double
                                     / len(w), 6) else 0.0 end as alpha_word_frac,
                     case when len(ls) > 0
                          then round((len(ls) - len(list_distinct(ls)))::double / len(ls), 6)
                          else 0.0 end as dup_line_frac,
                     case when len(w) >= 2
                          then round((
                              (len(w) - 1) - len(list_distinct(list_transform(
                                range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))))
                          )::double / (len(w) - 1), 6) else 0.0 end as dup_2gram_frac,
                     case when len(w) >= 3
                          then round((
                              (len(w) - 2) - len(list_distinct(list_transform(
                                range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))))
                          )::double / (len(w) - 2), 6) else 0.0 end as dup_3gram_frac,
                     len(list_intersect(
                       list_distinct(list_transform(w, t -> lower(t))),
                       ['the','be','to','of','and','that','have','with'])) as stopword_hits
              from base
            )
            select doc_id, n_tokens, mean_word_len, symbol_ratio,
                   alpha_word_frac, dup_line_frac, dup_2gram_frac,
                   dup_3gram_frac, stopword_hits,
                   cast(n_tokens between 10 and 100000
                        and mean_word_len between 3.0 and 10.0
                        and symbol_ratio <= 0.1
                        and alpha_word_frac >= 0.8
                        and dup_line_frac <= 0.3
                        and dup_2gram_frac <= 0.2
                        and stopword_hits >= 2 as int) as keep
            from m
        """,
        "clean_docs": r"""
            with synth as (
              select doc_id,
                     concat_ws(chr(10), text, 'short',
                               'Accept our Privacy Policy and cookie settings now',
                               'Contact admin@example.com at 192.168.0.1 id 12345678901234.',
                               text) as t
              from documents
            ), kept as (
              select doc_id, t,
                     list_filter(string_split(t, chr(10)), x ->
                       length(trim(x)) >= 10
                       and not contains(lower(trim(x)), 'javascript')
                       and not contains(lower(trim(x)), 'cookie')
                       and not contains(lower(trim(x)), 'terms of use')
                       and not contains(lower(trim(x)), 'privacy policy')) as ks
              from synth
            ), dedup as (
              select doc_id, t,
                     list_filter(ks, (x, i) -> list_position(ks, x) = i) as ds
              from kept
            ), fin as (
              select doc_id,
                     len(string_split(t, chr(10))) as n_lines,
                     regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       array_to_string(ds, chr(10)),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                       '\b\d{13,19}\b', '<LONGNUM>', 'g') as clean
              from dedup
            )
            select doc_id, n_lines,
                   case when clean = '' then 0
                        else len(string_split(clean, chr(10))) end as n_lines_kept,
                   md5(clean) as clean_md5
            from fin
        """,
        "stats_pruned_scan": """
            select event_type, count(*) as n, sum(value) as sum_value
            from events where value between 50.0 and 100.0
            group by event_type
        """,
        "zorder_key": _zorder_oracle_sql(),
        "suggest_constraints": _suggest_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        "pii_scan": _pii_oracle_sql(),
        "html_extract": _html_oracle_sql(),
        "correlation_matrix": _corr_oracle_sql(),
        "semantic_types": _semantic_oracle_sql(),
        "fd_discovery": _fd_discovery_oracle_sql(),
        "reconcile": """
            with l as (
              select l_orderkey as k, sum(l_quantity) as sum_left
              from lineitem where l_orderkey is not null group by 1
            ), r as (
              select l_orderkey as k,
                     sum(case when l_orderkey % 17 = 0
                              then l_quantity * 2
                              else l_quantity end) as sum_right
              from lineitem
              where not (l_orderkey % 13 = 0 and l_linenumber = 1)
                and l_orderkey is not null
              group by 1
            ), j as (
              select coalesce(l.k, r.k) as l_orderkey, sum_left, sum_right
              from l full outer join r on l.k = r.k
            )
            select l_orderkey,
                   cast(coalesce(sum_left, 0) as bigint) as sum_left,
                   cast(coalesce(sum_right, 0) as bigint) as sum_right,
                   round(coalesce(sum_right, 0) - coalesce(sum_left, 0), 6)
                     as diff,
                   case when sum_left is null then 'missing_left'
                        when sum_right is null then 'missing_right'
                        when abs(sum_right - sum_left) > 0.0
                          then 'mismatch' end as kind
            from j
            where sum_left is null or sum_right is null
               or abs(sum_right - sum_left) > 0.0
        """,
        "segment_completeness": """
            with g as (
              select event_type, count(*) as n,
                     sum(case when user_id is null then 1 else 0 end) as n0,
                     sum(case when value is null then 1 else 0 end) as n1,
                     sum(case when ts is null then 1 else 0 end) as n2
              from events group by 1
            )
            select event_type, 'user_id' as "column",
                   n as n_rows, cast(n0 as bigint) as n_nulls,
                   round(n0 / n, 6) as null_rate
            from g
            union all
            select event_type, 'value', n, cast(n1 as bigint),
                   round(n1 / n, 6) from g
            union all
            select event_type, 'ts', n, cast(n2 as bigint),
                   round(n2 / n, 6) from g
        """,
        "cusum_shift": """
            with src as (
              select ts from events
              where ts is not null
                and (day(cast(ts as date)) <= 22 or user_id % 2 = 0)
            ), obs as (
              select date_trunc('day', ts) as b, count(*) as c
              from src group by 1
            ), sp as (
              select min(b) as lo, max(b) as hi from obs
            ), grid as (
              select unnest(generate_series(lo, hi, interval 1 day)) as b
              from sp
            ), g as (
              select grid.b, cast(coalesce(c, 0) as bigint) as n_rows
              from grid left join obs on grid.b = obs.b
            ), med as (
              select quantile_cont(n_rows, 0.5) as m from g
            ), mad as (
              select quantile_cont(abs(n_rows - m), 0.5) as md from g, med
            ), s as (
              select b, n_rows,
                     sum((n_rows - m - 0.5 * (1.4826 * md))
                         / (1.4826 * md)) over (order by b) as pu,
                     sum((m - n_rows - 0.5 * (1.4826 * md))
                         / (1.4826 * md)) over (order by b) as pd
              from g, med, mad
            ), r as (
              select b, n_rows, pu, pd,
                     least(min(pu) over (
                       order by b rows between unbounded preceding
                       and current row), 0) as mu,
                     least(min(pd) over (
                       order by b rows between unbounded preceding
                       and current row), 0) as md2
              from s
            )
            select epoch_us(b) as day_us, n_rows,
                   round(pu - mu, 6) as cusum_up,
                   round(pd - md2, 6) as cusum_down,
                   (pu - mu > 5.0 or pd - md2 > 5.0) as alarm
            from r
        """,
        "category_coverage": """
            with c as (
              select user_id as value, count(*) as n from events group by 1
            ), t as (
              select sum(n) as tot from c
            ), r as (
              select value, n,
                     row_number() over (
                       order by n desc, value asc nulls last) as rank,
                     sum(n) over (
                       order by n desc, value asc nulls last
                       rows between unbounded preceding and current row)
                       as cum
              from c
            )
            select rank, value, cast(n as bigint) as n,
                   round(n / t.tot, 6) as share,
                   round(cum / t.tot, 6) as cum_share
            from r, t where rank <= 20
        """,
        "join_profile": """
            with lk as (
              select l_orderkey as k, count(*) as cl from lineitem
              where l_orderkey is not null group by 1
            ), rk as (
              select o_orderkey as k, count(*) as cr from orders
              where o_orderkey % 3 <> 1 and o_orderkey is not null
              group by 1
            ), j as (
              select cl, cr from lk full outer join rk on lk.k = rk.k
            )
            select cast(sum(cl) as bigint) as n_left,
                   cast(sum(cr) as bigint) as n_right,
                   count(cl) as n_left_keys,
                   count(cr) as n_right_keys,
                   count(*) filter (where cl is not null and cr is not null)
                     as n_shared_keys,
                   round(coalesce(sum(cl) filter (where cr is not null), 0)
                         / sum(cl), 6) as left_match_rate,
                   round(coalesce(sum(cr) filter (where cl is not null), 0)
                         / sum(cr), 6) as right_match_rate,
                   cast(max(cl) as bigint) as max_mult_left,
                   cast(max(cr) as bigint) as max_mult_right,
                   cast(coalesce(sum(cl * cr) filter (
                     where cl is not null and cr is not null), 0) as bigint)
                     as join_rows
            from j
        """,
        "table_diff": """
            with old as (
              select doc_id, lang, n_chars from documents
            ), new as (
              select doc_id,
                     case when doc_id % 7 = 0 then 'zz' else lang end as lang,
                     n_chars
              from documents where doc_id % 11 <> 0
              union all
              select doc_id + 10000000, 'new', n_chars
              from documents where doc_id < 5
            ), j as (
              select coalesce(o.doc_id, n.doc_id) as doc_id,
                     (o.doc_id is null) as added,
                     (n.doc_id is null) as removed,
                     (o.lang is distinct from n.lang) as lang_ch,
                     (o.n_chars is distinct from n.n_chars) as nch_ch
              from old o full outer join new n on o.doc_id = n.doc_id
            )
            select doc_id,
                   case when added then 'added'
                        when removed then 'removed'
                        else 'changed' end as status,
                   case when added or removed then ''
                        else concat_ws(',',
                          case when lang_ch then 'lang' end,
                          case when nch_ch then 'n_chars' end) end as changed
            from j
            where added or removed or lang_ch or nch_ch
        """,
        "volume_anomaly": """
            with src as (
              select ts from events
              where ts is not null
                and (day(cast(ts as date)) % 7 <> 2 or user_id % 10 = 0)
            ), obs as (
              select date_trunc('day', ts) as b, count(*) as c
              from src group by 1
            ), sp as (
              select min(b) as lo, max(b) as hi from obs
            ), grid as (
              select unnest(generate_series(lo, hi, interval 1 day)) as b
              from sp
            ), g as (
              select grid.b, cast(coalesce(c, 0) as bigint) as n_rows
              from grid left join obs on grid.b = obs.b
            ), med as (
              select quantile_cont(n_rows, 0.5) as m from g
            ), dev as (
              select b, n_rows, abs(n_rows - med.m) as absdev
              from g, med
            ), mad as (
              select quantile_cont(absdev, 0.5) as md from dev
            )
            select epoch_us(b) as day_us, n_rows,
                   round(case when md > 0
                              then absdev / (1.4826 * md) end, 6) as deviation,
                   case when md > 0 then absdev / (1.4826 * md) > 3.0
                        else absdev > 0 end as anomalous
            from dev, mad
        """,
        "column_entropy": """
            with un as (
              select 'o_orderstatus' as col,
                     cast(o_orderstatus as varchar) as val from orders
              union all
              select 'o_orderpriority',
                     cast(o_orderpriority as varchar) from orders
              union all
              select 'o_orderdate',
                     cast(o_orderdate as varchar) from orders
            ), counts as (
              select col, val, count(*) as c from un
              where val is not null group by 1, 2
            ), per as (
              select col,
                     cast(sum(c) as bigint) as nn,
                     count(*) as nd,
                     cast(sum(case when c = 1 then 1 else 0 end) as bigint)
                       as uq,
                     sum(c * ln(c)) as clogc
              from counts group by 1
            ), t as (
              select count(*) as n_rows from orders
            )
            select col as "column", n_rows,
                   nn as n_nonnull, nd as n_distinct,
                   round(ln(nn) - clogc / nn, 6) as entropy,
                   round(case when nd > 1
                              then (ln(nn) - clogc / nn) / ln(nd) end, 6)
                     as norm_entropy,
                   round(nd / nn, 6) as distinctness,
                   round(uq / nd, 6) as unique_value_ratio
            from per, t
        """,
        "ingest_quarantine": """
            with lines as (
              select doc_id, lang, (doc_id % 10 = 3) as bad,
                     case when doc_id % 10 = 3
                          then '{"doc_id": ' || doc_id || ', "lang": "' || lang
                          else '{"doc_id": ' || doc_id || ', "lang": "' || lang
                               || '"}' end as raw
              from documents
            )
            select count(*) as n_rows,
                   count(*) filter (where not bad) as n_good,
                   count(*) filter (where bad) as n_corrupt,
                   count(*) filter (where not bad and doc_id is null)
                     as n_null_doc_id,
                   count(*) filter (where not bad and lang is null)
                     as n_null_lang,
                   md5(string_agg(raw, chr(10) order by raw)
                       filter (where bad)) as corrupt_md5,
                   cast(sum(doc_id) filter (where not bad) as bigint)
                     as good_docid_sum
            from lines
        """,
        "mutual_info": """
            with joint as (
              select o_orderstatus as a, o_orderpriority as b,
                     count(*) as c_ab
              from orders group by 1, 2
            ), per as (
              select a, b, c_ab,
                     sum(c_ab) over () as n,
                     sum(c_ab) over (partition by a) as c_a,
                     sum(c_ab) over (partition by b) as c_b
              from joint
            ), terms as (
              select a, b, n,
                     c_ab / n as p_ab, c_a / n as p_a, c_b / n as p_b
              from per
            ), agg as (
              select cast(max(n) as bigint) as n_rows,
                     cast(count(distinct a)
                       + max(case when a is null then 1 else 0 end)
                       as bigint) as card_a,
                     cast(count(distinct b)
                       + max(case when b is null then 1 else 0 end)
                       as bigint) as card_b,
                     round(-sum(p_ab * ln(p_a)), 6) as h_a,
                     round(-sum(p_ab * ln(p_b)), 6) as h_b,
                     round(sum(p_ab * ln(p_ab / (p_a * p_b))), 6) as mi
              from terms
            )
            select n_rows, card_a, card_b, h_a, h_b, mi,
                   round(case when least(h_a, h_b) > 0
                              then mi / least(h_a, h_b) end, 6) as nmi
            from agg
        """,
        "metric_anomaly": """
            with slices(sid, ets) as (
              values (1, ['click']),
                     (2, ['click','view']),
                     (3, ['click','view','purchase']),
                     (4, ['click','view','purchase','signup'])
            ), m as (
              select s.sid as snapshot_id, u.metric, u.value
              from slices s
              cross join lateral (
                select 'n_rows' as metric, cast(count(*) as double) as value
                from events where list_contains(s.ets, event_type)
                union all
                select 'null_frac',
                       cast(avg(cast(value is null as int)) as double)
                from events where list_contains(s.ets, event_type)
              ) u
            ), w as (
              select snapshot_id, metric, value,
                     lag(value) over (
                       partition by metric order by snapshot_id) as prev
              from m
            )
            select snapshot_id, metric, value,
                   coalesce(prev, -1.0) as prev,
                   coalesce(case when prev is not null and prev <> 0
                                 then round(abs(value / prev - 1), 6) end,
                            -1.0) as rel_change,
                   coalesce(case when prev is not null and prev <> 0
                                 then round(abs(value / prev - 1), 6) > 0.5
                                 when prev = 0 then value <> 0
                            end, false) as anomalous
            from w
        """,
        "snapshot_drift": """
            with e as (
              select list_transform(quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                                    x -> round(x, 6)) as edges
              from events where event_type = 'click' and value is not null
            ), src as (
              select 'snap1' as g, value from events
              where event_type = 'click' and value is not null
              union all
              select 'snap2', value from events
              where event_type in ('click','purchase') and value is not null
            ), b as (
              select g,
                     list_sum(list_transform(e.edges,
                       ed -> case when value > ed then 1 else 0 end)) as bk
              from src, e
            ), pb as (
              select bk,
                     count(*) filter (where g = 'snap1') as cb,
                     count(*) filter (where g = 'snap2') as cc
              from b group by 1
            ), t as (select sum(cb) as tb, sum(cc) as tc from pb)
            select 'snap1' as baseline, 'snap2' as curr,
                   round(sum(
                     (greatest(cc / tc, 1e-6) - greatest(cb / tb, 1e-6))
                     * ln(greatest(cc / tc, 1e-6) / greatest(cb / tb, 1e-6))
                   ), 6) as psi
            from pb, t
        """,
        "skew_join": """
            with dim as (
              select event_type as et, count(*) as type_n
              from events group by 1
            )
            select e.event_type, d.type_n, count(*) as n
            from events e join dim d on e.event_type = d.et
            group by 1, 2
        """,
        "ks_drift": """
            with v as (
              select value as x,
                     count(*) filter (where event_type = 'click') as cb,
                     count(*) filter (where event_type = 'purchase') as cc
              from events
              where event_type in ('click','purchase') and value is not null
              group by 1
            ), t as (
              select sum(cb) as nb, sum(cc) as nc from v
            ), c as (
              select sum(cb) over (order by x) as cumb,
                     sum(cc) over (order by x) as cumc
              from v
            )
            select 'click' as baseline, 'purchase' as curr,
                   round(max(abs(cumb / t.nb - cumc / t.nc)), 6) as ks,
                   cast(max(t.nb) as bigint) as n_base,
                   cast(max(t.nc) as bigint) as n_curr
            from c cross join t
        """,
        "k_anonymity": """
            with g as (
              select c_nationkey, c_mktsegment, count(*) as gs
              from customer group by 1, 2
            )
            select cast(sum(gs) as bigint) as n_rows,
                   count(*) as n_groups,
                   cast(min(gs) as bigint) as min_group_size,
                   count(*) filter (where gs < 5) as n_risky_groups,
                   cast(coalesce(sum(gs) filter (where gs < 5), 0) as bigint)
                     as n_risky_rows,
                   round(coalesce(sum(gs) filter (where gs < 5), 0)
                         / sum(gs), 6) as risky_row_rate
            from g
        """,
        "embedding_drift": """
            with b as (
              select embedding::DOUBLE[] as v from embeddings
              where vec_id % 2 = 0 and embedding is not null
                and len(embedding) > 0
            ), c as (
              select list_transform(embedding::DOUBLE[], x -> x + 0.1) as v
              from embeddings
              where vec_id % 2 = 1 and embedding is not null
                and len(embedding) > 0
            ), mb as (
              select generate_subscripts(v, 1) as dim, unnest(v) as x from b
            ), mc as (
              select generate_subscripts(v, 1) as dim, unnest(v) as x from c
            ), ab as (
              select dim, avg(x) as a from mb group by 1
            ), ac as (
              select dim, avg(x) as bm from mc group by 1
            ), dims as (
              select coalesce(ab.a, 0) as a, coalesce(ac.bm, 0) as bm
              from ab full outer join ac using (dim)
            ), agg as (
              select count(*) as dims, sum(a * bm) as dot,
                     sum(a * a) as na, sum(bm * bm) as nb,
                     sum((a - bm) * (a - bm)) as d2
              from dims
            ), sb as (
              select count(*) as n_base,
                     avg(sqrt(list_sum(list_transform(v, x -> x * x))))
                       as norm_base
              from b
            ), sc as (
              select count(*) as n_cur,
                     avg(sqrt(list_sum(list_transform(v, x -> x * x))))
                       as norm_cur
              from c
            )
            select n_base, n_cur, cast(dims as bigint) as dims,
                   round(dot / (sqrt(na) * sqrt(nb)), 6) as centroid_cosine,
                   round(sqrt(d2), 6) as centroid_shift,
                   round(norm_base, 6) as norm_base,
                   round(norm_cur, 6) as norm_cur
            from agg, sb, sc
        """,
        "weighted_sample": """
            with src as (
              select doc_id, n_chars, cast(n_chars as double) as w
              from documents
              where n_chars is not null and n_chars > 0
            ), keyed as (
              select doc_id, n_chars,
                     round(pow(
                       (('0x' || substr(md5(cast(doc_id as varchar) || 'v1'),
                                        1, 8))::bigint::double + 1.0)
                       / 4294967297.0,
                       1.0 / w), 6) as akey,
                     md5(cast(doc_id as varchar) || 'v1') as tie
              from src
            )
            select doc_id, n_chars from keyed
            order by akey desc, tie asc
            limit 100
        """,
        "category_churn": """
            with tagged as (
              select lang as category, 1 as b, 0 as c from documents
              where doc_id % 2 = 0 and lang <> 'de'
              union all
              select lang, 0, 1 from documents
              where doc_id % 2 = 1 and lang <> 'fr'
            ), counts as (
              select category, cast(sum(b) as bigint) as n_base,
                     cast(sum(c) as bigint) as n_cur
              from tagged group by 1
            )
            select category, n_base, n_cur,
                   case when n_base = 0 then 'new'
                        when n_cur = 0 then 'gone'
                        else 'common' end as kind
            from counts
        """,
        "freshness": """
            with src as (
              select ts from events
              where ts is not null
                and day(cast(ts as date)) % 7 <> 3
            ), obs as (
              select date_trunc('day', ts) as b, count(*) as c
              from src group by 1
            ), sp as (
              select min(b) as lo, max(b) as hi from obs
            ), grid as (
              select unnest(generate_series(lo, hi, interval 1 day)) as b
              from sp
            )
            select epoch_us(grid.b) as day_us,
                   cast(coalesce(c, 0) as bigint) as n_rows,
                   (c is null) as is_missing
            from grid left join obs on grid.b = obs.b
        """,
        "sequence_gaps": """
            with src as (
              select l_orderkey as k, l_linenumber as seq from lineitem
              where not (l_orderkey % 5 = 0 and l_linenumber = 2)
            ), w as (
              select k, seq,
                     lag(seq) over (partition by k order by seq) as prev_seq
              from src
            )
            select k as l_orderkey, prev_seq, seq,
                   case when seq = prev_seq then 'dup'
                        when seq > prev_seq + 1 then 'gap' end as kind,
                   cast(case when seq > prev_seq + 1 then seq - prev_seq - 1
                             else 0 end as bigint) as missing
            from w
            where seq = prev_seq or seq > prev_seq + 1
        """,
        "interval_overlaps": """
            with iv as (
              select user_id as k,
                     event_id % 1000 as s,
                     event_id % 1000 + 1
                       + cast(floor(abs(value)) as bigint) as e
              from events
              where user_id is not null and event_id is not null
                and value is not null
            ), w as (
              select k, s, e,
                     max(e) over (partition by k order by s, e
                                  rows between unbounded preceding
                                  and 1 preceding) as pme
              from iv
            )
            select k, s as start, e as "end", pme as prev_max_end
            from w where s < pme
        """,
        "monotonic": """
            with src as (
              select l_orderkey, l_linenumber, l_extendedprice
              from lineitem where l_orderkey % 20 = 0
            ), w as (
              select l_orderkey, l_linenumber,
                     lag(l_extendedprice) over (
                       partition by l_orderkey
                       order by l_linenumber, l_extendedprice) as prev_value,
                     l_extendedprice as value
              from src
            )
            select l_orderkey, l_linenumber, prev_value, value
            from w
            where prev_value is not null and value < prev_value
        """,
        "benford": """
            with src as (
              select abs(cast(l_extendedprice as double)) as a
              from lineitem
              where l_extendedprice is not null
                and abs(cast(l_extendedprice as double)) > 0
            ), obs as (
              select cast(floor(a * power(10.0, -floor(log10(a)))) as int)
                       as d,
                     count(*) as c
              from src group by 1
            ), grid as (
              select cast(range as int) as digit from range(1, 10)
            ), counts as (
              select digit, cast(coalesce(c, 0) as bigint) as n_digit
              from grid left join obs on digit = d
            )
            select digit, n_digit,
                   round(n_digit / (sum(n_digit) over ()), 6) as obs_p,
                   round(log10(1.0 + 1.0 / digit), 6) as exp_p,
                   round(abs(n_digit / (sum(n_digit) over ())
                             - log10(1.0 + 1.0 / digit)), 6) as abs_dev
            from counts
        """,
        "emd_drift": """
            with v as (
              select cast(value as double) as x,
                     count(*) filter (where event_type = 'click') as cb,
                     count(*) filter (where event_type = 'purchase') as cc
              from events
              where event_type in ('click','purchase') and value is not null
              group by 1
            ), t as (
              select sum(cb) as nb, sum(cc) as nc from v
            ), c as (
              select x,
                     sum(cb) over (order by x) as cumb,
                     sum(cc) over (order by x) as cumc,
                     lead(x) over (order by x) as nx
              from v
            )
            select 'click' as baseline, 'purchase' as curr,
                   round(sum(abs(cumb / t.nb - cumc / t.nc) * (nx - x)), 6)
                     as w1,
                   cast(max(t.nb) as bigint) as n_base,
                   cast(max(t.nc) as bigint) as n_curr
            from c cross join t
        """,
        "heavy_hitters": """
            with t as (select count(*) as n from events)
            select event_type as item, count(*) as n_item
            from events group by 1
            having count(*) >= (select 0.15 * n from t)
        """,
        "merge_upsert": """
            with tgt as (select doc_id, lang, n_chars from documents),
            src as (
              select doc_id, 'zz' as lang, n_chars + 1000 as n_chars
              from documents where doc_id % 10 = 3
              union all
              select doc_id + 10000000, 'new', cast(1 as bigint)
              from documents where doc_id < 5
            ),
            merged as (
              select * from tgt
              where doc_id not in (select doc_id from src)
              union all
              select * from src
            )
            select lang, count(*) as n,
                   cast(sum(n_chars) as bigint) as sum_chars
            from merged group by 1
        """,
    }
    # setsim_exact must equal the exact all-pairs set — the SAME ground
    # truth the LSH-blocked jaccard_pairs plan is checked against
    d["setsim_exact"] = d["jaccard_pairs"]
    return d
