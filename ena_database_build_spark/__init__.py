"""ena_database_build_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of EnzymeFunctionInitiative/ENA_Database_Build.

The reference (read-only at /root/reference) is a Dask-orchestrated,
row-at-a-time EMBL flat-file ETL pipeline. This package re-expresses the
same semantics as declarative Spark DataFrame plans:

- ``sources``   — ordered-line ingest of gzipped EMBL flat files, the
                  idmapping lookup table, and TSV/parquet sinks
                  (reference: ena_build/dask_tasks.py, mysql_database.py).
- ``functions`` — column-expression library: the four reference regexes
                  (ena_build/parse_embl.py:16-47) and the linear/circular
                  location-span resolver (ena_build/parse_embl.py:364-441).
- ``operators`` — windowed sessionization replacing the reference's
                  per-line state machine (ena_build/parse_embl.py:444-570),
                  plus LLM-data-pipeline extensions (dedup, similarity,
                  text analysis, multimodal) that the reference lacks.
- ``plans``     — composed end-to-end pipelines (files -> ena.tab).
- ``streaming`` — Structured Streaming variants over event streams.

Everything is built on DataFrame/Catalyst; no RDD code outside ordered
ingest, no Python row-at-a-time UDFs in hot paths.
"""

__version__ = "0.1.0"
