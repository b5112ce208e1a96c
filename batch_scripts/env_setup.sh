# Environment knobs for the Spark cluster launcher (spark_batch.sh).
# Counterpart of the reference's batch_scripts/env_setup.sh:1-35 —
# same role (corpus roots, DB config, worker sizing), Spark-standalone
# architecture settings instead of Dask scheduler/worker flags.

# ENA corpus root (the recursive *.dat.gz scan starts here)
EBROOTENA=/path/to/ENA/root/directory
EBVERSIONENA=ena_2025_02        # release tag; used for scratch naming

# Python environment that has ena_database_build_spark + pyspark
# installed (any activation mechanism works; conda shown for parity
# with the reference)
CONDA_HOME=/path/to/conda/installation
CONDA_ENV=ena_db_build

WORKING_DIR=$PWD
OUTPUT_DIR=$PWD/ena_tab_out
SCRATCH_DIR=/scratch/$EBVERSIONENA      # spark.local.dir per node
DB_CONFIG=sample_mysql.config           # same INI format as reference
DB_NAME=efi_202412

# --- Spark standalone architecture -----------------------------------
# One worker JVM per allocated node; executors sized so
# cores_per_executor * executors_per_node = cores per node.  Unlike
# the reference's 1-thread Dask workers (dask_batch.sh:27), Spark
# wants FEW fat executors per node — task parallelism comes from
# cores within an executor, and a single JVM amortizes broadcast
# variables (the idmapping table) and shuffle service memory.
SPARK_HOME=${SPARK_HOME:-/opt/spark}
MASTER_PORT=7077
MASTER_WEBUI_PORT=8080
CORES_PER_EXECUTOR=8
MEM_PER_EXECUTOR=16g
DRIVER_MEM=16g
# shuffle partitions: ~2-3x total executor cores is the starting
# point; the engine's AQE coalesces empties at runtime
SHUFFLE_PARTITIONS=${SHUFFLE_PARTITIONS:-2048}
