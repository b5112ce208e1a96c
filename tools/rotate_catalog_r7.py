"""One-shot (ROUND-7 START): rewrite the CATALOG registry in the
round-7 rotation order, delete the 7 superseded singles, and promote
dsir_weights into the checked window.

Derived from tools/rotate_catalog_r6.py (which was written at round-6
start for the then-planned rotation, before dsir_weights existed) and
amended per the round-6 VERDICT "Next round" #1:

  window (positions 1-50) = dsir_weights (the only never-driver-checked
  query — never-checked outranks banked) + the 29 remaining banked §2
  rows (g2_nested_sessionize .. transit_sweepline, green r2) + the
  first 20 of the round-3-window set (rollup_revenue .. json_roundtrip,
  green r3).  1 + 29 + 20 = 50.

PRECONDITION — verified before running: CORRECTNESS_r06.json exists
and is 50/50 green including p456_detectors / f68_guards / s67_sinks
(the consolidated rows superseding the deleted singles).

After running, finish by hand (same list as the r6 script):
  1. delete the now-unreferenced q_*/SQL_* defs for the 7 removed
     singles;
  2. update the SURVEY.md §8 coverage map to cite p456_detectors /
     f68_guards / s67_sinks for P4-P6, F6/F8, S6/S7;
  3. re-tally the rotation header comment (180 entries; round-8
     window = tpch_q4_priority + remaining r3 (30) + first 20 of r4);
  4. python tools/check_catalog.py on the new first 50.
"""
from __future__ import annotations

import re
from pathlib import Path

PATH = Path(__file__).resolve().parent.parent / (
    "ena_database_build_spark/plans/catalog.py"
)

SUPERSEDED = [  # deleted this round (consolidated rows green in r6)
    "f6_empty_record_guard", "f8_empty_input_guard", "p4_feature_start",
    "p5_cds_head", "p6_qualifier_continuation", "s6_partitioned_shards",
    "s7_concat_single_file",
]
NEVER_CHECKED = ["dsir_weights"]  # added below the fold in r6
S2_REMAINDER = [  # 29 banked §2 rows, green in round 2
    "g2_nested_sessionize", "g3_final_flush", "g4_ordinals",
    "a1_collect_set", "a2_record_set_union", "a3_flat_minmax",
    "a4_circular_resolution", "j1_lookup_join", "j2_anti_join",
    "j3_fallback_coalesce", "o1_explode", "o2_seven_col_projection",
    "o3_union", "o4_topk", "o5_stable_range_sort", "s5_tsv_roundtrip",
    "ena_context_analog", "tpch_q1_pricing", "tpch_q3_shipping",
    "tpch_q5_volume", "dedup_exact", "minhash_signatures",
    "lsh_candidate_pairs", "simhash", "jaccard_pairs", "dedup_clusters",
    "asof_join", "range_join_transit", "transit_sweepline",
]
R3_FIRST20 = [  # first 20 of the round-3 window, green in round 3
    "rollup_revenue", "order_analytics", "quantiles_exact",
    "approx_quantiles", "kmeans_clusters", "embedding_quantize",
    "corpus_curation", "repetition_stats", "pii_scrub", "tfidf_top_terms",
    "bm25_top_terms", "inverted_index", "phrase_search", "decontaminate",
    "unigram_logprob", "pack_sequences", "mixture_rebalance", "doc_chunks",
    "corpus_shuffle", "json_roundtrip",
]
R3_REMAINDER = [  # rotate back in round 8 (with the first 20 of r4)
    "tpch_q4_priority",
    "tpch_q18_large_orders", "dedup_incremental", "purchase_attribution",
    "quality_gate", "hash_sample", "train_test_split", "stratified_sample",
    "cosine_topk", "srp_buckets", "dedup_embedding", "ivf_topk", "lang_id",
    "quality_scores", "token_counts", "doc_fingerprints",
    "rolling_fingerprints", "boilerplate_kgrams", "top_ngrams",
    "events_tumbling", "events_sliding", "events_sessions",
    "approx_distinct", "exact_distinct", "multimodal_decode",
    "multimodal_frames", "events_pivot", "props_extract", "stream_totals",
    "stream_dedup",
]
R4_WINDOW = [  # banked green in round 4 (CORRECTNESS_r04)
    "heavy_hitters", "semantic_dedup", "scd2_user_state",
    "pagerank_suppliers", "zorder_values", "embedding_project",
    "embedding_meanpool", "table_profile", "source_cap", "snapshot_diff",
    "cdc_latest_state", "bloom_decontaminate", "bpe_pair_counts",
    "bpe_merges", "incremental_stats", "orc_roundtrip",
    "stream_enrichment", "dq_report", "asof_join_bucketed",
    "hash_sample_weighted", "near_dedup_incremental",
    "tpch_q7_nation_volume", "tpch_q13_order_distribution",
    "user_retention", "compaction_plan", "funnel_conversion",
    "replica_diff", "line_dedup", "activity_streaks", "batch_cosine_topk",
    "event_transitions", "top_purchases", "schema_evolution",
    "span_corruption", "mixture_upsample", "script_composition",
    "bpe_compression", "skew_salted_agg", "skew_salted_join",
    "weighted_sample_n", "rolling_user_value", "scd2_enrichment",
    "weighted_sample_by_source", "cube_revenue", "time_to_convert",
    "winsorize_counts", "contrastive_triples", "supervised_pairs",
    "cms_frequencies", "kmv_distinct",
]
R6_WINDOW = [  # banked green in round 6 (CORRECTNESS_r06; freshest)
    "daily_spine", "session_bounce", "trending_types", "length_histogram",
    "revenue_share", "session_duration_quartiles", "purchase_gaps",
    "lang_source_matrix", "grouping_sets_revenue", "window_distinct_users",
    "p456_detectors", "f68_guards", "s67_sinks",
    "span_dedup", "embedding_standardize", "sft_transcripts", "psi_drift",
    "temperature_sampling", "near_dedup_keep_longest", "phash_buckets",
    "merge_upserts", "rate_anomalies", "stream_rate_flags", "grouped_split",
    "tokenizer_fertility", "bigram_logprob", "quantile_normalize",
    "simhash_candidates", "edit1_pairs", "funnel_conversion_bounded",
    "quality_ensemble", "plan_batches", "supplier_triangles",
    "session_paths", "mixture_card", "customer_set_ops",
    "s3_scan_projection", "f1_division_filter", "f2_prefix_filter",
    "f3_fungi_gate", "f4_whitelist_deadletter", "f5_malformed_id_drop",
    "f7_unparseable_cds_drop", "p1_regex_extract", "p2_alternation_extract",
    "p3_range_extract", "p7_location_normalizer", "p8_strand_detector",
    "p9_path_components", "g1_sessionize",
]

NEW_ORDER = (
    NEVER_CHECKED + S2_REMAINDER + R3_FIRST20   # r7 window (50)
    + R3_REMAINDER + R4_WINDOW + R6_WINDOW
)

COMMENTS = {
    NEVER_CHECKED[0]: (
        "    # ================== r7 window (positions 1-50) =============="
        "====\n"
        "    # -- the one never-driver-checked query (added r6 below the\n"
        "    # fold; never-checked outranks banked — r6 VERDICT #1)\n"
    ),
    S2_REMAINDER[0]: (
        "    # -- the 29 remaining banked §2 reference-surface rows\n"
        "    # (green in round 2; last checked there)\n"
    ),
    R3_FIRST20[0]: (
        "    # -- first 20 of the round-3 window (green in round 3)\n"
    ),
    R3_REMAINDER[0]: (
        "    # ============== below the fold (not checked in r7) =========="
        "====\n"
        "    # -- remaining round-3 window (rotate back in round 8 with\n"
        "    # the first 20 of the round-4 window)\n"
    ),
    R4_WINDOW[0]: (
        "    # -- round-4 window (banked green in round 4, "
        "CORRECTNESS_r04)\n"
    ),
    R6_WINDOW[0]: (
        "    # -- round-6 window (banked green in round 6, "
        "CORRECTNESS_r06)\n"
    ),
}

src = PATH.read_text()
lines = src.splitlines(keepends=True)
start = next(i for i, l in enumerate(lines)
             if l.startswith("CATALOG: dict[str, QueryDef] = {"))
end = next(i for i in range(start + 1, len(lines)) if lines[i] == "}\n")

entry_re = re.compile(r'^    "([a-z0-9_]+)": QueryDef\(')
entries: dict[str, str] = {}
i = start + 1
while i < end:
    line = lines[i]
    m = entry_re.match(line)
    if not m:
        i += 1  # drop old comments
        continue
    name = m.group(1)
    block = [line]
    while not block[-1].rstrip().endswith("),"):
        i += 1
        block.append(lines[i])
    entries[name] = "".join(block)
    i += 1

assert set(entries) == set(NEW_ORDER) | set(SUPERSEDED), (
    sorted(set(entries) ^ (set(NEW_ORDER) | set(SUPERSEDED))))
assert len(entries) == 187 and len(NEW_ORDER) == 180, len(entries)
assert len(NEVER_CHECKED + S2_REMAINDER + R3_FIRST20) == 50

out = [lines[start]]
for name in NEW_ORDER:
    if name in COMMENTS:
        out.append(COMMENTS[name])
    out.append(entries[name])
out.append("}\n")

PATH.write_text("".join(lines[:start]) + "".join(out)
                + "".join(lines[end + 1:]))
print("rotated to the round-7 order; deleted:", SUPERSEDED)
print("first 50:", NEW_ORDER[:50])
print("NOW: delete the orphaned q_*/SQL_* defs, update SURVEY.md §8, "
      "re-tally the header, run tools/check_catalog.py on the window.")
