"""Structured Streaming parity tests: the same operator functions run
over readStream (file source, memory sink) must agree with their batch
execution — this is what makes the §2.11 streaming surface one code
path, not a fork."""

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.streaming import events as STR


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Normalized (microsecond-ts) copy of sf0.001 events, split into
    multiple files so the stream sees several micro-batches."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(src.dtypes).get("ts") == "bigint":
        src = src.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    out = tmp_path_factory.mktemp("events_stream")
    src.repartition(4).write.mode("overwrite").parquet(str(out))
    return str(out)


def _batch_events(spark, event_dir):
    return spark.read.parquet(event_dir)


def _run_stream(spark, stream_df, name, mode="append"):
    q = STR.run_stream_to_memory(stream_df, name, mode=mode)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, event_dir):
    # complete mode so the tail windows (which a watermark+append run
    # holds back until later data arrives) are visible for comparison
    stream = STR.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark, STR.tumbling_counts(stream, "5 minutes"), "tumb", mode="complete"
    )
    want = STR.tumbling_counts(_batch_events(spark, event_dir), "5 minutes")
    cols = ["win_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_matches_batch(spark, event_dir):
    stream = STR.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        STR.session_aggregates(stream, "10 minutes", watermark="1 hour"),
        "sess",
        mode="complete",
    )
    want = STR.session_aggregates(_batch_events(spark, event_dir), "10 minutes")
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_matches_batch(spark, event_dir):
    stream = STR.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        STR.sliding_rates(stream, "10 minutes", "5 minutes"),
        "slide",
        mode="complete",
    )
    want = STR.sliding_rates(
        _batch_events(spark, event_dir), "10 minutes", "5 minutes"
    )
    cols = ["win_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup(spark, event_dir):
    src = _batch_events(spark, event_dir)
    doubled_dir = event_dir + "_doubled"
    src.unionByName(src).repartition(4).write.mode("overwrite").parquet(doubled_dir)
    stream = STR.read_event_stream(spark, doubled_dir, max_files_per_trigger=2)
    got = _run_stream(spark, STR.stream_dedup(stream), "dedup")
    assert got.count() == src.count()
    assert got.select("event_id").distinct().count() == src.count()


def test_running_user_totals_stateful(spark, event_dir):
    from pyspark.sql import functions as F

    stream = STR.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    got = _run_stream(
        spark, STR.running_user_totals(stream), "totals", mode="update"
    )
    # last update per user == full-history totals
    from pyspark.sql import Window
    import pyspark.sql.functions as SF

    final = (
        got.withColumn(
            "rn",
            SF.row_number().over(
                Window.partitionBy("user_id").orderBy(SF.desc("n_events"))
            ),
        )
        .where("rn = 1")
        .select("user_id", "n_events", "total_value")
    )
    want = (
        _batch_events(spark, event_dir)
        .groupBy("user_id")
        .agg(
            SF.count("*").alias("n_events"),
            SF.round(SF.sum("value"), 6).alias("total_value"),
        )
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(final, cols) == _rows(want, cols)


def test_purchase_attribution_stream_matches_batch(spark, event_dir):
    # stream-stream interval self-join (inner).  The fixture's files
    # are randomly time-ordered, so exact parity needs unbounded state
    # (watermark=None); the watermarked run may evict late rows but
    # must emit a subset of the batch result.
    cols = ["purchase_id", "view_id", "user_id", "gap_s"]
    batch = _rows(
        STR.purchase_attribution(_batch_events(spark, event_dir)), cols
    )
    # guard against vacuous parity: [] == [] proves nothing
    assert len(batch) > 0
    unbounded = _run_stream(
        spark,
        STR.purchase_attribution(
            STR.read_event_stream(spark, event_dir), watermark=None
        ),
        "attrib_unbounded",
    )
    assert _rows(unbounded, cols) == batch
    assert all(0 <= r[3] <= 600 for r in batch)
    bounded = _run_stream(
        spark,
        STR.purchase_attribution(STR.read_event_stream(spark, event_dir)),
        "attrib_bounded",
    )
    assert set(_rows(bounded, cols)) <= set(batch)
