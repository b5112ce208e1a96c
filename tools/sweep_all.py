"""Run EVERY differential robustness sweep end-to-end, one command.

Generates all six adversarial corpora from a pristine source
(``tools/adversarial_corpus.py`` modes) and runs the full catalog
Spark-vs-DuckDB check over each, plus the two conf-perturbation axes
on the pristine corpus.  Prints one summary line per axis and exits
non-zero if ANY axis fails — the round-close robustness gate as a
single command instead of eight hand-typed ones.

Axes (every catalog query each; the pass bar derives from
len(CATALOG)):

  1. nulls      — ~10% NULLs + empty/tab/newline/quote strings, zeros
  2. extremes   — ±1e15 in float-only money columns, ±1e4 in the
                  exact-integer money columns (bounded below int64
                  products so the exact forms VALUE-compare — r12),
                  --rtol 1e-9 tolerant compare
  3. unicode    — exotic-but-cross-engine-agreeing payloads
  4. empty      — zero-row tables, real schemas
  5. scramble   — row-permuted multi-file layout (layout invariance)
  6. skew       — ~50% of rows on one hot FK key
  7. conf       — pristine corpus, shuffle.partitions=5 + AQE off
  8. scramble+conf — axes 5 and 7 combined

Usage: python tools/sweep_all.py [src_sf_dir] [work_dir]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

TOOLS = Path(__file__).resolve().parent
PY = sys.executable

sys.path.insert(0, str(TOOLS.parent))
from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402

# derived, not hardcoded: a catalog growth must not silently flip
# every axis to FAIL against a stale magic count (r9 review finding)
FULL_PASS = f"{len(CATALOG)}/{len(CATALOG)}"

AXES = [
    # (label, corpus mode or None for pristine, extra check args)
    ("nulls", "nulls", []),
    ("extremes", "extremes", ["--rtol", "1e-9"]),
    ("unicode", "unicode", []),
    ("empty", "empty", []),
    ("scramble", "scramble", []),
    ("skew", "skew", []),
    ("conf", None, [
        "--spark-conf", "spark.sql.shuffle.partitions=5",
        "--spark-conf", "spark.sql.adaptive.enabled=false",
    ]),
    ("scramble+conf", "scramble", [
        "--spark-conf", "spark.sql.shuffle.partitions=5",
        "--spark-conf", "spark.sql.adaptive.enabled=false",
    ]),
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_all")
    work.mkdir(parents=True, exist_ok=True)
    results: list[tuple[str, bool, float, str]] = []
    for label, mode, extra in AXES:
        if mode is None:
            corpus = src
        else:
            corpus = str(work / f"sf_{mode}")
            gen = subprocess.run(
                [PY, str(TOOLS / "adversarial_corpus.py"), src, corpus, mode],
                capture_output=True, text=True,
            )
            if gen.returncode != 0:
                results.append((label, False, 0.0, "corpus generation failed"))
                print(f"FAIL  {label}: generator\n{gen.stderr[-500:]}")
                continue
        t0 = time.perf_counter()
        chk = subprocess.run(
            [PY, str(TOOLS / "check_catalog.py"), corpus, *extra],
            capture_output=True, text=True,
        )
        dt = time.perf_counter() - t0
        tail = [
            ln for ln in chk.stdout.splitlines()
            if ln.strip() and not ln.startswith(("OK", "spark-conf"))
        ]
        summary = tail[-1] if tail else "(no summary)"
        ok = chk.returncode == 0 and FULL_PASS in chk.stdout
        results.append((label, ok, dt, summary))
        print(f"{'ok  ' if ok else 'FAIL'}  {label:15s} {dt:6.0f}s  {summary}")
        if not ok:
            # keep the evidence without drowning the terminal
            fails = [
                ln for ln in chk.stdout.splitlines() if ln.startswith("FAIL")
            ]
            for ln in fails[:20]:
                print(f"      {ln}")
    bad = [r for r in results if not r[1]]
    print(f"\n{len(results) - len(bad)}/{len(results)} axes green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
