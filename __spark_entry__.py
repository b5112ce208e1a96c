"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``ena_database_build_spark.plans.catalog`` — one
entry per SURVEY.md §2 operator id plus the §2.11 LLM-data-pipeline
extensions; this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

# transformWithState (session_aggregates_bucketed_stream) needs a
# protobuf runtime in the JVM-spawned Python workers; the shim must be
# on PYTHONPATH before the driver's SparkSession launches its JVM, and
# imports of this module happen exactly then.  No-op with pip protobuf.
from ena_database_build_spark.pbshim import install_protobuf_shim  # noqa: E402

install_protobuf_shim()

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    'chromosome neighborhood context' shape (ordered loci + mapped-id
    join + fallback) over the TPC-H-ish tables."""
    # TIMESTAMP(NANOS) parquet needs this to load on a plain session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return CATALOG["ena_context_analog"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§2.11."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(qd.spark) for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every query that is exactly
    SQL-expressible; approximate operators are omitted (rows-only)."""
    return {
        name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None
    }
