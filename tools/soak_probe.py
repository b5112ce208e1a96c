"""Full-size scale-probe soak (round-2 verdict item #6).

Generates ONE pathologically large gzipped EMBL member (default 400k
records — ~1.9 GB decompressed text, ~28M lines), runs the pipeline
under BOTH ingest strategies (``wholetext`` materializes the file as a
single row; ``lines`` streams it as one row per line), asserts the two
outputs are row-identical, and reports wall time plus the JVM's peak
RSS (VmHWM) — the number that proves the ``lines`` fallback bounds
executor memory on members far larger than the "relatively small"
files the reference assumes (reference README.md:48).

Usage: python tools/soak_probe.py [n_records] [--lines-only]

``--lines-only`` skips the wholetext arm (at 400k records the
single-row blob is exactly the memory hazard the fallback exists for;
the equivalence of the two strategies is pinned at 20k records by
tests/test_scale_probe.py, so the soak only needs the lines arm plus
the blob-free memory ceiling).
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ena_database_build_spark.plans import ena_pipeline as P  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402
from ena_database_build_spark.sources.embl import read_embl_lines  # noqa: E402


def write_corpus(root: Path, n_records: int) -> Path:
    """Same record mix as tests/test_scale_probe.py, n× larger."""
    p = root / "wgs" / "public" / "big" / "BIG001.dat.gz"
    p.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(p, "wt") as f:
        for i in range(n_records):
            chr_len = 1000 + (i % 9000)
            topo = "circular" if i % 5 == 0 else "linear"
            a, b = (i * 37) % 800 + 1, (i * 37) % 800 + 1 + (i % 120)
            f.write(
                f"ID   BIG{i:08d}; SV 1; {topo}; genomic DNA; WGS; PRO; "
                f"{chr_len} BP.\n"
                "OC   Bacteria; lineage.\n"
                f"FT   source          1..{chr_len}\n"
                f"FT   CDS             join({a}..{b},{b + 10}..{b + 50})\n"
                f'FT                   /protein_id="P{i % 1000}.1"\n'
                f'FT                   /translation="MKV{"A" * (i % 40)}"\n'
            )
            if i % 3 == 0:
                f.write(
                    "FT   CDS             467\n"
                    f'FT                   /protein_id="SKIP{i}.1"\n'
                )
            if i % 4 == 0:
                f.write(
                    f"FT   CDS             complement({a + 2}..{b + 2})\n"
                    f'FT                   /db_xref="UniProtKB/TrEMBL:Q{i % 500}"\n'
                )
    return p


def jvm_peak_rss_mb() -> float | None:
    """VmHWM of the py4j-launched JVM (child java process), in MB."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) != me:  # ppid
                continue
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        return round(int(line.split()[1]) / 1024, 1)
        except (OSError, ValueError):
            continue
    return None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_records = int(args[0]) if args else 400_000
    lines_only = "--lines-only" in sys.argv

    root = Path(tempfile.mkdtemp(prefix="soak_probe_"))
    try:
        st = time.perf_counter()
        member = write_corpus(root, n_records)
        gz_mb = member.stat().st_size / (1 << 20)
        n_lines = sum(1 for _ in gzip.open(member, "rb"))
        print(
            f"corpus: {n_records} records, {gz_mb:.0f} MB gzip'd, "
            f"{n_lines} lines, generated in "
            f"{time.perf_counter() - st:.0f}s"
        )

        spark = get_spark("soak-probe")
        spark.sparkContext.setLogLevel("ERROR")
        idmap = spark.createDataFrame(
            [(f"P{i}.1", f"U{i}") for i in range(0, 1000, 3)],
            "foreign_id string, uniprot_id string",
        )

        results = {}
        strategies = ["lines"] if lines_only else ["lines", "wholetext"]
        for strategy in strategies:
            st = time.perf_counter()
            out = P.build_ena_tab(
                read_embl_lines(spark, str(root), strategy=strategy), idmap
            )
            n = out.count()
            wall = round(time.perf_counter() - st, 1)
            results[strategy] = (n, wall)
            print(
                f"{strategy:10s}: {n} output rows in {wall}s, "
                f"JVM peak RSS so far: {jvm_peak_rss_mb()} MB"
            )

        if len(results) == 2:
            assert results["lines"][0] == results["wholetext"][0], results
            print("row counts identical across strategies")
        print(f"JVM peak RSS: {jvm_peak_rss_mb()} MB")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
