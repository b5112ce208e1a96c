"""Output sinks (operators S5-S7, O3/O4, X3).

The reference appends TSV rows per record (parse_embl.py:252-255),
shards per source dir in node-local scratch, moves shards to the shared
FS at task end (dask_tasks.py:148-211), then concatenates everything
into one ``ena.tab`` single-threaded on the client
(dask_tskmgr.py:232-241) — noted there as "likely to be slow".

Spark's FileOutputCommitter + ``spark.local.dir`` subsume the
scratch-then-move protocol; multi-part output *is* the scalable idiom,
so ``single_file=False`` is the default and the client-side concat
becomes ``coalesce(1)`` only on demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ena_database_build_spark.functions import embl as E


def write_ena_tab(
    df: DataFrame,
    path: str,
    partition_by_source_dir: bool = False,
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """S5/S6/S7: write the 7-column ena table as headerless TSV.

    ``partition_by_source_dir`` derives the reference's shard naming
    (P9, ``wgs-public-wds`` etc.) from the source file path when a
    ``file`` column is present.
    """
    out = df
    writer_partitions: list[str] = []
    if partition_by_source_dir and "file" in df.columns:
        out = out.withColumn("source_dir", E.source_dir_name(F.col("file")))
        writer_partitions = ["source_dir"]
    cols = [c for c in out.columns if c != "file"]
    out = out.select(*cols)
    if single_file:
        # O4: the reference sorts shard paths before concat; a global
        # orderBy reproduces source-grouped output when byte-stable
        # output is demanded.  Single-file output is inherently
        # single-writer — only for small exports.
        sort_cols = [c for c in ("source_dir", "ena_id", "locus_num") if c in out.columns]
        if sort_cols:
            out = out.orderBy(*sort_cols)
        out = out.coalesce(1)
    writer = out.write.mode(mode).option("sep", "\t").option("header", "false")
    if writer_partitions:
        writer = writer.partitionBy(*writer_partitions)
    writer.csv(path)
