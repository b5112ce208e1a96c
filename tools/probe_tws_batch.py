"""TWS replay per-batch cost probe (r13 verdict item 7) — result
recorded in r14.

Runs the streaming replay at sf0.01 with a configurable
spark.python.worker.reuse and maxFilesPerTrigger in a FRESH JVM,
printing total wall + per-micro-batch durationMs breakdown from the
query's progress events.

r14 measurements (sf0.01, local[8], mftp=1 → 10 micro-batches):

    reuse=true  (default): wall 37.0 s, addBatch 1.6-2.3 s/batch
                           (3.8 s on the cold first batch)
    reuse=false:           wall 65.7 s, addBatch 2.3-3.7 s/batch
                           (6.1 s cold)

Verdict: Python-worker reuse across micro-batches is ALREADY active
and load-bearing — disabling it costs +78% wall, so there is no
un-amortized per-batch Python spin-up left to reclaim from the
worker side.  The residual ~2 s/batch (≈5-7 s at sf0.1's row widths)
is the per-batch task round: RocksDB store open/commit per state
partition plus the TWS state-server handshake per task — the
platform floor for a COLD replay harness; a long-running production
stream pays query start-up once and its steady-state per-batch cost
is this residual, which shrinks with fewer/larger state partitions
and does not grow with corpus size.

Usage: python tools/probe_tws_batch.py <reuse true|false> [mftp]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "true"
mftp = int(sys.argv[2]) if len(sys.argv) > 2 else 1

from ena_database_build_spark.pbshim import install_protobuf_shim

install_protobuf_shim()

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("tws-probe")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.python.worker.reuse", mode)
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "4g")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import ena_database_build_spark.streaming.events as EV
from ena_database_build_spark.plans.catalog import t

caught = []
orig = EV.run_stream_to_memory


def wrap(df, name, mode="append"):
    q = orig(df, name, mode=mode)
    caught.append(q)
    return q


EV.run_stream_to_memory = wrap

ev = t(spark, "/root/testdata/sf0.01", "events")
st = time.perf_counter()
out = EV.replay_session_aggregates_bucketed(
    spark, ev, max_files_per_trigger=mftp
)
n = out.count()
wall = time.perf_counter() - st
q = caught[0]
prog = q.recentProgress
print(
    f"reuse={mode} mftp={mftp} wall={wall:.1f}s rows={n} "
    f"batches={len(prog)}",
    flush=True,
)
for p in prog:
    d = p.get("durationMs", {})
    keys = ("addBatch", "getBatch", "latestOffset", "commitOffsets", "walCommit")
    print(
        "  batch",
        p.get("batchId"),
        {k: d.get(k) for k in keys},
        "inRows:",
        p.get("numInputRows"),
    )
