"""Executed-plan scan audit: flag catalog queries whose FINAL adaptive
plan re-executes its sources.

The defect class this guards (found in round 5): Catalyst column
pruning desyncs the exchange subtrees of two consumers of one
relation, AQE exchange reuse stops firing, and the upstream silently
re-executes per consumer — quality_ensemble's executed plan held 83
parquet scans before the round-5 restructure (now 3), and nothing in
the correctness gate or plan_audit (which looks for cartesians, not
re-execution) could see it.

For every catalog query: build, execute (collect — AQE must finalize
for ReusedExchange to be visible), then count `Scan parquet` in the
final-plan section only (`executedPlan().toString()` appends the
initial plan, which double-counts).  A query is flagged when its scan
count exceeds both the table-count floor and its per-query allowance.

Beyond the absolute allowance, the audit compares each query against
``tools/scan_manifest.json`` — the scan count recorded from a
verified-good full run — and flags ANY increase: the quantile_gate
incident showed a silent 1->2 scan re-execution (an inferred
isnotnull predicate desyncing a shared exchange) sails under any
loose budget, while an exact per-query baseline catches it.  Run with
``--write-manifest`` after an intentional plan change (and a green
check_catalog) to re-baseline; decreases are reported as
improvements, not failures.

Usage: python tools/scan_audit.py [--write-manifest] [sf_dir] [name ...]
Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, ".")

MANIFEST = Path(__file__).resolve().parent / "scan_manifest.json"

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402

# Default allowance: a query may scan each source table a small
# constant number of times (self-joins, two-snapshot diffs, and
# documented two-pass shapes are legitimate).  Anything above this is
# either a new documented entry here or a re-execution bug.
DEFAULT_MAX_SCANS = 8

# Documented exceptions: queries whose plan legitimately scans more
# than DEFAULT_MAX_SCANS times, each with the reason.
ALLOW: dict[str, tuple[int, str]] = {
    # customer_set_ops runs INTERSECT + EXCEPT + UNION as real set
    # operators over three period slices of two tables (the point of
    # the query is exercising the set operators, not a rewrite)
    "customer_set_ops": (12, "three period slices x set operators"),
    # dq_report plants defects via an extra keyed pass and runs two
    # referential-integrity broadcasts against two tables
    "dq_report": (10, "defect planting + 2 RI checks over 2 tables"),
}


def scan_count(df) -> int:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    return final.count("Scan parquet")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--write-manifest"]
    write_manifest = "--write-manifest" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or list(CATALOG)
    manifest: dict[str, int] = (
        json.loads(MANIFEST.read_text()) if MANIFEST.exists() else {}
    )
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    results = []
    for name in names:
        try:
            n = scan_count(CATALOG[name].spark(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report, don't die
            flagged.append((name, -1, f"ERROR {e}"))
            continue
        cap, why = ALLOW.get(name, (DEFAULT_MAX_SCANS, ""))
        results.append((n, name))
        if n > cap:
            flagged.append((name, n, f"cap {cap} {why}".strip()))
        elif not write_manifest and name in manifest and n > manifest[name]:
            flagged.append(
                (name, n, f"regressed from manifest {manifest[name]}")
            )
    results.sort(reverse=True)
    print("top scan counts:")
    for n, name in results[:15]:
        print(f"  {n:4d}  {name}")
    improved = [
        (name, n)
        for n, name in results
        if name in manifest and n < manifest[name]
    ]
    if improved:
        print("improved vs manifest (re-baseline with --write-manifest):")
        for name, n in improved:
            print(f"  {name}: {manifest[name]} -> {n}")
    if write_manifest:
        merged = {**manifest, **{name: n for n, name in results}}
        MANIFEST.write_text(
            json.dumps(dict(sorted(merged.items())), indent=1) + "\n"
        )
        print(f"manifest written: {len(merged)} entries")
    if flagged:
        print("\nFLAGGED (scans above allowance — likely re-execution):")
        for name, n, why in flagged:
            print(f"  {name}: {n} ({why})")
        sys.exit(1)
    print(f"\n{len(results)}/{len(names)} within scan budget")


if __name__ == "__main__":
    main()
