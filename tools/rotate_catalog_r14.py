"""One-shot (ROUND-14 START): rewrite the CATALOG registry in the
round-14 rotation order.

Written at round 13 close, following the schedule the registry header
pins (plans/catalog.py "rotate back in round 14" note and the r13
rotation script's postscript):

  window (positions 1-50) = the remaining 33 round-10-window rows
  (s3_scan_projection .. tpch_q1_pricing, green r10) + the first
  17 of the round-11-window set (lsh_candidate_pairs_prod ..
  kmeans_clusters, green r11).  33 + 17 = 50; registry stays at 183
  entries — zero net-new additions (steady-state ~3.7-round cycle).

PRECONDITION — verify before running: CORRECTNESS_r13.json exists and
is 50/50 green (bpe_compression .. customer_set_ops).  If any
r13-window row came back red, FIX IT FIRST and keep it in the r14
window instead of rotating it out — a red row must never be banked.

Dry-run by default; pass --apply to rewrite plans/catalog.py (r10
judging showed an unguarded rotation script executes on --help).

After running with --apply, finish by hand (same list as the r13
script):
  1. re-tally the rotation header comment (round-15 window =
     remaining 33 r11-window rows + first 17 of the r12-window set);
  2. python tools/check_catalog.py /root/testdata/sf0.01 --first 50;
  3. pytest tests/ (update test_check_window_ordering_pinned's
     expected head).
"""
from __future__ import annotations

import argparse
import re
from pathlib import Path

PATH = Path(__file__).resolve().parent.parent / (
    "ena_database_build_spark/plans/catalog.py"
)

R10_REMAINDER = [  # 33 rows, banked green in round 10 -> the r14 window
    "s3_scan_projection",
    "f1_division_filter", "f2_prefix_filter", "f3_fungi_gate",
    "f4_whitelist_deadletter", "f5_malformed_id_drop",
    "f7_unparseable_cds_drop", "p1_regex_extract",
    "p2_alternation_extract", "p3_range_extract",
    "p7_location_normalizer", "p8_strand_detector", "p9_path_components",
    "g1_sessionize", "dsir_weights", "g2_nested_sessionize",
    "g3_final_flush", "g4_ordinals", "a1_collect_set",
    "a2_record_set_union", "a3_flat_minmax", "a4_circular_resolution",
    "j1_lookup_join", "j2_anti_join", "j3_fallback_coalesce",
    "o1_explode", "o2_seven_col_projection", "o3_union", "o4_topk",
    "o5_stable_range_sort", "s5_tsv_roundtrip", "ena_context_analog",
    "tpch_q1_pricing",
]
R11_FIRST17 = [  # first 17 of the round-11 window (green r11)
    "lsh_candidate_pairs_prod", "tpch_q3_shipping",
    "tpch_q5_volume", "dedup_exact", "minhash_signatures",
    "lsh_candidate_pairs", "simhash", "jaccard_pairs",
    "dedup_clusters", "asof_join", "range_join_transit",
    "transit_sweepline", "rollup_revenue", "order_analytics",
    "quantiles_exact", "approx_quantiles", "kmeans_clusters",
]
R11_REMAINDER = [  # rotate back in round 15 (with the first of r12)
    "embedding_quantize", "corpus_curation", "repetition_stats",
    "pii_scrub", "tfidf_top_terms", "bm25_top_terms",
    "inverted_index", "phrase_search", "decontaminate",
    "unigram_logprob", "pack_sequences", "mixture_rebalance",
    "doc_chunks", "corpus_shuffle", "json_roundtrip",
    "transit_payload", "tpch_q4_priority", "tpch_q18_large_orders",
    "dedup_incremental", "purchase_attribution", "quality_gate",
    "hash_sample", "train_test_split", "stratified_sample",
    "cosine_topk", "srp_buckets", "dedup_embedding", "ivf_topk",
    "lang_id", "quality_scores", "token_counts",
    "doc_fingerprints", "rolling_fingerprints",
]
R12_WINDOW = [  # banked green in round 12 (CORRECTNESS_r12)
    "session_aggregates_bucketed_stream", "boilerplate_kgrams",
    "top_ngrams", "events_tumbling", "events_sliding",
    "events_sessions", "approx_distinct", "exact_distinct",
    "multimodal_decode", "multimodal_frames", "events_pivot",
    "props_extract", "stream_totals", "stream_dedup",
    "heavy_hitters", "semantic_dedup", "scd2_user_state",
    "pagerank_suppliers", "zorder_values", "embedding_project",
    "embedding_meanpool", "table_profile", "source_cap",
    "snapshot_diff", "cdc_latest_state", "bloom_decontaminate",
    "bpe_pair_counts", "bpe_merges", "incremental_stats",
    "orc_roundtrip", "stream_enrichment", "dq_report",
    "asof_join_bucketed", "hash_sample_weighted",
    "near_dedup_incremental", "tpch_q7_nation_volume",
    "tpch_q13_order_distribution", "user_retention",
    "compaction_plan", "funnel_conversion", "replica_diff",
    "line_dedup", "activity_streaks", "batch_cosine_topk",
    "event_transitions", "top_purchases", "schema_evolution",
    "span_corruption", "mixture_upsample", "script_composition",
]
R13_WINDOW = [  # banked green in round 13 (CORRECTNESS_r13; freshest)
    "bpe_compression", "skew_salted_agg", "skew_salted_join",
    "weighted_sample_n", "rolling_user_value", "scd2_enrichment",
    "weighted_sample_by_source", "cube_revenue", "time_to_convert",
    "winsorize_counts", "contrastive_triples", "supervised_pairs",
    "cms_frequencies", "kmv_distinct",
    "daily_spine", "session_bounce", "trending_types", "length_histogram",
    "revenue_share", "session_duration_quartiles", "purchase_gaps",
    "lang_source_matrix", "grouping_sets_revenue", "window_distinct_users",
    "p456_detectors", "f68_guards", "s67_sinks",
    "span_dedup", "embedding_standardize", "sft_transcripts", "psi_drift",
    "temperature_sampling", "near_dedup_keep_longest",
    "phash_buckets", "merge_upserts", "rate_anomalies",
    "stream_rate_flags", "grouped_split", "tokenizer_fertility",
    "bigram_logprob", "quantile_normalize", "simhash_candidates",
    "edit1_pairs", "funnel_conversion_bounded", "quality_ensemble",
    "plan_batches", "supplier_triangles", "session_paths",
    "mixture_card", "customer_set_ops",
]

NEW_ORDER = (
    R10_REMAINDER + R11_FIRST17         # r14 window (50)
    + R11_REMAINDER + R12_WINDOW + R13_WINDOW
)

COMMENTS = {
    R10_REMAINDER[0]: (
        "    # ================== r14 window (positions 1-50) =============="
        "====\n"
        "    # -- the 33 remaining round-10-window rows (green in round 10;\n"
        "    # last checked there)\n"
    ),
    R11_FIRST17[0]: (
        "    # -- first 17 of the round-11 window (green in round 11)\n"
    ),
    R11_REMAINDER[0]: (
        "    # ============== below the fold (not checked in r14) ========="
        "====\n"
        "    # -- remaining round-11 window (rotate back in round 15 with\n"
        "    # the first 17 of the round-12 window)\n"
    ),
    R12_WINDOW[0]: (
        "    # -- round-12 window (banked green in round 12, "
        "CORRECTNESS_r12)\n"
    ),
    R13_WINDOW[0]: (
        "    # -- round-13 window (banked green in round 13, "
        "CORRECTNESS_r13)\n"
    ),
}

parser = argparse.ArgumentParser(
    description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
)
parser.add_argument(
    "--apply", action="store_true",
    help="actually rewrite plans/catalog.py (default: dry-run — "
         "validate the rotation and print the new window, write nothing)",
)
args = parser.parse_args()

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

assert set(entries) == set(NEW_ORDER), (
    sorted(set(entries) ^ set(NEW_ORDER)))
assert len(entries) == 183 and len(NEW_ORDER) == 183, len(entries)
assert len(R10_REMAINDER + R11_FIRST17) == 50

out = [lines[start]]
for name in NEW_ORDER:
    if name in COMMENTS:
        out.append(COMMENTS[name])
    out.append(entries[name])
out.append("}\n")

if not args.apply:
    print("DRY-RUN (pass --apply to rewrite plans/catalog.py)")
    print("would rotate to the round-14 order (183 entries)")
    print("first 50:", NEW_ORDER[:50])
    raise SystemExit(0)

PATH.write_text("".join(lines[:start]) + "".join(out)
                + "".join(lines[end + 1:]))
print("rotated to the round-14 order (183 entries)")
