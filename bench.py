"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds across the headline set (lower is
better).  Each query is materialized via a count/collect-free
``write.format("noop")`` so measured time is plan execution, not
driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ena_context_analog",
    "tpch_q1_pricing",
    "tpch_q5_volume",
    "a4_circular_resolution",
    "g1_sessionize",
    "j1_lookup_join",
    "o4_topk",
    "dedup_exact",
    "minhash_signatures",
    "simhash",
    "cosine_topk",
    "lang_id",
    "token_counts",
    "events_sessions",
    # round 2: the end-to-end curation composition (quality gate ->
    # dedup -> split -> stats) — the engine's flagship LLM-pipeline shape
    "corpus_curation",
    # round 2: Gopher-style repetition filter (map-side token stats +
    # relational bigram counts) and the 5-gram eval-decontamination join
    "repetition_stats",
    "decontaminate",
    # round 2: BM25 ranking — one explode + exchange-reused doc_freq
    # join + two window passes on one doc partitioning
    "bm25_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 8 shuffle partitions right-sizes the sf0.1 local run (measured
    # best of {4,8,16}; AQE re-splits skew and coalesces small
    # partitions at real scale, so this constant is not load-bearing on
    # a cluster)
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(cpus, 8))))
    spark = get_spark(
        "ena-bench", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # execution, not first-touch setup
    CATALOG["s3_scan_projection"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # steady-state timing: one warm-up run (pays one-time codegen/JIT
    # compilation — amortized to nothing on real corpus sizes), then the
    # MEDIAN of three timed runs — robust to a loaded shared host, where
    # best-of-N understates and mean-of-N overstates.  The DataFrame is
    # built ONCE per query: driver-side plan construction (py4j
    # expression building) is not execution and a real workload declares
    # its plan once too.
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        df = CATALOG[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            st = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - st)
        runs.sort()
        timings[name] = round(runs[1], 3)
        spread[name] = [round(runs[0], 3), round(runs[-1], 3)]

    total = round(sum(timings.values()), 3)
    sf = float(Path(sf_dir).name.replace("sf", "") or 0)

    # Same-session DuckDB oracle totals: the shared host's throughput
    # swings ~40% between measurement windows, so the absolute Spark
    # seconds of two different rounds are not comparable — the
    # Spark/oracle RATIO measured back-to-back in ONE window is
    # (round-3 VERDICT item #4).  Same protocol: warm-up run, then
    # median of three.
    oracle_timings = _time_oracles(sf_dir)
    oracle_total = (
        round(sum(oracle_timings.values()), 3) if oracle_timings else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "oracle_queries": oracle_timings,
                "oracle_total": oracle_total,
                "spark_over_oracle_ratio": (
                    round(total / oracle_total, 3) if oracle_total else None
                ),
                "sf": sf,
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


def _time_oracles(sf_dir: str) -> dict[str, float]:
    """Times each headline query's DuckDB oracle over the same parquet
    tables (median of 3 after one warm-up, matching the Spark
    protocol).  Returns {} if anything fails — the oracle side is a
    comparison yardstick, never a reason to lose the Spark numbers."""
    try:
        import duckdb

        from ena_database_build_spark.plans.catalog import TABLES

        con = duckdb.connect()
        for tab in TABLES:
            con.sql(
                f"CREATE VIEW {tab} AS "
                f"SELECT * FROM '{sf_dir}/{tab}.parquet'"
            )
        out: dict[str, float] = {}
        for name in HEADLINE:
            oracle = CATALOG[name].oracle
            if oracle is None:
                continue
            con.sql(oracle).fetchall()
            runs = []
            for _ in range(3):
                st = time.perf_counter()
                con.sql(oracle).fetchall()
                runs.append(time.perf_counter() - st)
            runs.sort()
            out[name] = round(runs[1], 3)
        return out
    except Exception:  # noqa: BLE001 — yardstick only, see docstring
        return {}


if __name__ == "__main__":
    main()
