"""Ordered ingest of gzipped EMBL flat files (operators S1-S3, F1, X2).

The reference walks the directory tree with dynamically scheduled Dask
tasks (ena_build/dask_tasks.py:16-87) and streams each ``*.dat.gz`` line
by line (ena_build/parse_embl.py:482-484).  In Spark the walk is the
driver's parallel ``InMemoryFileIndex`` (``recursiveFileLookup``), the
suffix filter is ``pathGlobFilter`` (prunes at *listing* time — files
are never opened), and gzip decoding is the built-in codec.

Line order is semantic for the parser, so we ingest with
``wholetext=true`` (one row per file — gzip is non-splittable anyway, so
this costs no parallelism versus line mode) and pin order with
``posexplode``.  One file = one row = one unit of parallelism, exactly
the reference's granularity; ``repartition`` spreads millions of small
files evenly across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ena_database_build_spark.functions import embl as E

EMBL_GLOB = "*.dat.gz"


def read_embl_lines(
    spark: SparkSession,
    paths: list[str] | str,
    apply_division_filter: bool = True,
    target_partitions: int | None = None,
    strategy: str = "wholetext",
) -> DataFrame:
    """Read EMBL flat files under ``paths`` into the ordered-line schema
    ``file STRING, line_no LONG, line STRING``.

    ``apply_division_filter`` reproduces F1: in ``sequence/`` trees only
    ``_(ENV|PRO|FUN|PHG)_`` division files are kept
    (ena_build/dask_tasks.py:78-85).

    ``strategy``:

    * ``"wholetext"`` (default) — one blob row per file, exploded after
      a blob-level repartition; downstream windows/group-bys then need
      no line-level exchange.  Right for the reference corpus shape
      ("millions of relatively small gzip'd files", reference
      README.md:48); a single file must fit in one row buffer.
    * ``"lines"`` — plain line-mode text scan for corpora with
      pathologically large members: gzip is non-splittable so each
      file's lines arrive in read order within its partition;
      ``monotonically_increasing_id`` pins that order into ``line_no``.
      Costs one line-level shuffle for the sessionization windows.
    """
    if isinstance(paths, str):
        paths = [paths]
    if strategy not in ("wholetext", "lines"):
        raise ValueError(f"unknown ingest strategy: {strategy!r}")
    # shared listing/reader config so both strategies always ingest the
    # SAME file set (recursive lookup + glob + F1 division filter).
    # NB: wholetext must be the reader kwarg — the string option key is
    # not picked up by the text source in Spark 4.x.  The *.dat.gz glob
    # is also what makes line mode's ordering proof hold (gzip is
    # non-splittable, so one file = one read split); see below.
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", EMBL_GLOB)
    )
    if strategy == "lines":
        raw = reader.text(paths).select(
            F.input_file_name().alias("file"),
            F.col("value").alias("line"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        if apply_division_filter:
            # per-line regex on the path string — acceptable for the
            # large-file fallback; the wholetext path evaluates it once
            # per file
            raw = raw.where(E.matches_sequence_division(F.col("file")))
        if target_partitions:
            # clusters by file, so the window below adds no exchange
            raw = raw.repartition(target_partitions, "file")
        # ordering guard: _mid is monotone per file ONLY while every
        # admitted file is non-splittable (one file = one read split);
        # a splittable member would interleave its splits
        w = Window.partitionBy("file").orderBy("_mid")
        return raw.select(
            "file",
            (F.row_number().over(w) - 1).cast("long").alias("line_no"),
            "line",
        )
    raw = reader.text(paths, wholetext=True).select(
        F.input_file_name().alias("file"),
        F.col("value"),
    )
    if apply_division_filter:
        raw = raw.where(E.matches_sequence_division(F.col("file")))
    # Repartition the WHOLE-FILE blobs by file before exploding: the
    # shuffle then moves one row per file instead of millions of line
    # rows, and the resulting hashpartitioning(file) satisfies every
    # downstream clustering requirement (windows and group-bys all key
    # on a `file` prefix), so the entire sessionization pipeline runs
    # with no further exchange of line data.
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism * 2
    raw = raw.repartition(target_partitions, "file")
    # universal-newline split — the reference reads with text-mode
    # gzip.open (newline=None), so \r\n and \r collapse to \n
    return raw.select(
        "file",
        F.posexplode(F.split(F.col("value"), "\r\n|\r|\n")).alias(
            "line_no", "line"
        ),
    )


def embl_lines_from_rows(spark: SparkSession, rows, schema="file string, line_no long, line string") -> DataFrame:
    """Build the ordered-line DataFrame from in-memory rows (tests)."""
    return spark.createDataFrame(rows, schema)
