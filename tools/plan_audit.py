"""Catalog-wide physical-plan audit: flags scale anti-patterns.

For every catalog query, builds the physical plan (no execution
beyond what query construction itself does) and reports:

* CartesianProduct / BroadcastNestedLoopJoin nodes — quadratic or
  broadcast-everything joins that would not survive 100 TB, except
  where a bounded build side is documented (allowlist below);
* single-partition Exchange nodes feeding non-aggregate work — the
  global-sort trap (1-row/bounded aggregates legitimately collapse).

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any non-allowlisted anti-pattern is found.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402

# queries whose nested-loop/cartesian node has a documented BOUNDED
# side (k rows, 1 row, or a constant-size plane table)
ALLOW_NESTED = {
    # 1-row query vector / k-row centroid tables (docstrings in
    # plans/catalog.py document the bound)
    "cosine_topk",
    "ivf_topk",
    "kmeans_clusters",
    "semantic_dedup",
    # 1-row corpus-stats / quantile-threshold broadcasts
    "corpus_curation",
    "quality_gate",
    "unigram_logprob",
    "bm25_top_terms",
    "decontaminate",
    # 1-row top-bigram broadcast (r13 map-only match phase)
    "phrase_search",
    # range-join fallback on a bounded date dimension
    "range_join_transit",
    # 4-row quantile-target table joined to the cumulative counts
    "quantiles_exact",
    # 1-row corpus doc-count broadcast (idf denominator)
    "tfidf_top_terms",
    # 1-row feasible-minimum broadcast (packing.mixture_rebalance)
    "mixture_rebalance",
    # Misra-Gries candidate set (<= 1/theta rows) + 1-row total
    "heavy_hitters",
    # bounded serving batch of query vectors broadcast over the corpus
    "batch_cosine_topk",
    # 1-row global min/max bounds broadcast for the bin arithmetic
    "length_histogram",
    # 1-row time-range midpoint broadcast splitting ref/cur snapshots
    # (drift.psi_report's per-key joins are all keyed; only the
    # midpoint bound is nested-loop)
    "psi_drift",
    # 1-row time-bounds broadcast building the window spine (counts,
    # stats, and the spine fill are all keyed joins)
    "rate_anomalies",
    "merge_upserts",
    # 1-row min-group-count broadcast feeding the #groups rate table
    # (the rate join onto the corpus is a keyed broadcast hash join)
    "temperature_sampling",
    # 1-row order-date midpoint broadcast splitting the cohort halves
    # (INTERSECT/EXCEPT themselves are keyed set operators)
    "customer_set_ops",
    # 1-row vocabulary-size broadcast (the bigram/context count joins
    # are window sums over the aggregated relation, all keyed)
    "bigram_logprob",
    # 1-row min/max bounds + 1-row total broadcasts around the
    # two-phase bucketed rank (bin ranks and offsets are keyed)
    "quantile_normalize",
    # same bounded broadcasts, twice (one per normalized signal)
    "quality_ensemble",
    # three 1-row census aggregates (triangles/nodes/edges) crossed
    # into the single output row; the graph joins are all keyed
    "supplier_triangles",
    # the grouped-quantile operator's broadcast of the 1-row quantile
    # target list (same bound as quantiles_exact / winsorize_counts)
    "mixture_card",
    # the quantile operator's 2-3-row target table joined to the
    # cumulative counts (same bound as quantiles_exact)
    "winsorize_counts",
    "session_duration_quartiles",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[str] = []
    for name, qd in CATALOG.items():
        try:
            df = qd.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR {name}: {exc}")
            continue
        nested = re.findall(
            r"CartesianProduct|BroadcastNestedLoopJoin", plan
        )
        if nested and name not in ALLOW_NESTED:
            bad.append(name)
            print(f"FLAG  {name}: {sorted(set(nested))}")
        elif nested:
            print(f"allow {name}: {sorted(set(nested))} (documented bound)")
        else:
            print(f"ok    {name}")
    print(f"\n{len(CATALOG) - len(bad)}/{len(CATALOG)} clean")
    if bad:
        print("flagged:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
