"""Run EVERY differential robustness sweep end-to-end, one command.

Generates all six adversarial corpora from a pristine source
(``tools/adversarial_corpus.py`` modes) and runs the full catalog
Spark-vs-DuckDB check over each, plus the two conf-perturbation axes
on the pristine corpus, then the executed-plan scan audit
(``tools/scan_audit.py`` — the r12 standing gate: it catches silent
subtree re-execution no correctness axis can see).  Prints one
summary line per gate and exits non-zero if ANY fails — the
round-close robustness gate as a single command instead of ten
hand-typed ones.

Axes (every catalog query each; the pass bar derives from
len(CATALOG)):

  1. nulls      — ~10% NULLs + empty/tab/newline/quote strings, zeros
  2. extremes   — ±1e15 in float-only money columns, ±1e3 in the
                  exact-integer money columns (bounded so even
                  same-sign partial-sum runs stay inside int64 and
                  the exact forms VALUE-compare under ANY row order /
                  partitioning — r12, tightened r13),
                  --rtol 1e-9 tolerant compare
  3. unicode    — exotic-but-cross-engine-agreeing payloads
  4. empty      — zero-row tables, real schemas
  5. scramble   — row-permuted multi-file layout (layout invariance)
  6. skew       — ~50% of rows on one hot FK key
  7. conf       — pristine corpus, shuffle.partitions=5 + AQE off
  8. scramble+conf — axes 5 and 7 combined
  9. extremes+scramble — chained corpus mutation (axis 2's planted
                  extremes, then axis 5's row permutation): proves the
                  exact-money planting is order/partitioning-safe

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
    # r13 (from r12 ADVICE): the exact-money extremes are planted at
    # ±1e3 precisely so correctness cannot depend on planted +/- rows
    # alternating in row order — this chained axis (extremes corpus,
    # then row-permuted multi-file layout) PROVES that instead of
    # assuming it.
    ("extremes+scramble", ["extremes", "scramble"], ["--rtol", "1e-9"]),
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
            # a list of modes chains generators: each stage mutates the
            # previous stage's output (e.g. extremes -> scramble)
            modes = [mode] if isinstance(mode, str) else list(mode)
            stage_src, gen_failed = src, False
            for i, m in enumerate(modes):
                corpus = str(work / ("sf_" + "_".join(modes[: i + 1])))
                gen = subprocess.run(
                    [PY, str(TOOLS / "adversarial_corpus.py"),
                     stage_src, corpus, m],
                    capture_output=True, text=True,
                )
                if gen.returncode != 0:
                    results.append(
                        (label, False, 0.0, "corpus generation failed")
                    )
                    print(f"FAIL  {label}: generator\n{gen.stderr[-500:]}")
                    gen_failed = True
                    break
                stage_src = corpus
            if gen_failed:
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
    # standing gate (r12 lesson): the executed-plan scan audit caught a
    # silent subtree re-execution that no correctness axis can see —
    # run it every time the battery runs, against the pristine corpus
    t0 = time.perf_counter()
    audit = subprocess.run(
        [PY, str(TOOLS / "scan_audit.py"), src],
        capture_output=True, text=True,
    )
    dt = time.perf_counter() - t0
    a_ok = audit.returncode == 0
    a_tail = [ln for ln in audit.stdout.splitlines() if ln.strip()]
    results.append((
        "scan-audit", a_ok, dt, a_tail[-1] if a_tail else "(no output)"
    ))
    print(
        f"{'ok  ' if a_ok else 'FAIL'}  {'scan-audit':15s} {dt:6.0f}s  "
        f"{a_tail[-1] if a_tail else '(no output)'}"
    )
    if not a_ok:
        for ln in a_tail[-20:]:
            print(f"      {ln}")

    bad = [r for r in results if not r[1]]
    print(f"\n{len(results) - len(bad)}/{len(results)} gates green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
