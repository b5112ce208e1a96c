#!/bin/bash
#SBATCH --partition=efi
#SBATCH --cpus-per-task=32
#SBATCH --ntasks-per-node=1
#SBATCH --nodes=4
#SBATCH --job-name="ena_db_build_spark"

# SLURM launcher for the Spark engine — counterpart of the reference's
# batch_scripts/dask_batch.sh:1-44 (scheduler/worker spin-up + client
# script + teardown), re-expressed for a Spark standalone cluster:
#
#   dask scheduler            ->  spark master (on the first node)
#   srun dask worker xN       ->  srun spark worker (one JVM per node;
#                                 executors are sized by env_setup.sh,
#                                 not one process per core)
#   python3 ena_dask_tskmgr   ->  spark-submit .../__main__.py (the same
#                                 CLI surface: --ena-paths / --db-config
#                                 / --db-name / --output-dir)
#
# On YARN or Kubernetes clusters none of the spin-up below is needed:
#   spark-submit --master yarn --deploy-mode cluster \
#     --py-files ena_database_build_spark.zip "$ENTRY" ...
# The standalone form is kept because it is the like-for-like analog of
# the reference's self-managed Dask cluster inside one SLURM allocation.

set -u

date
source env_setup.sh

# activate the python env (parity with the reference's conda activate)
source "$CONDA_HOME/etc/profile.d/conda.sh" && conda activate "$CONDA_ENV"

spark_pids=""
MASTER_HOST=$(hostname -f)
MASTER_URL="spark://${MASTER_HOST}:${MASTER_PORT}"

# Teardown runs on EVERY exit path (normal, failed spin-up, scancel)
# so a failure cannot leave the master/workers holding the allocation;
# the trap preserves the triggering exit code.
teardown() {
    rc=$?
    echo "Tearing down (rc=$rc)"
    "$SPARK_HOME/sbin/stop-master.sh" || true
    for pid in $spark_pids; do
        kill "$pid" 2>/dev/null || true
    done
    date
    exit "$rc"
}
trap teardown EXIT

echo "Spinning up the Master"
"$SPARK_HOME/sbin/start-master.sh" \
    --port "$MASTER_PORT" --webui-port "$MASTER_WEBUI_PORT"

# one worker JVM per allocated node, using every core and leaving the
# executor sizing to spark-submit below; --work-dir puts shuffle/spill
# on node-local scratch (the reference's --local-scratch analog)
echo "Spinning up the Workers"
srun --ntasks="$SLURM_NNODES" --ntasks-per-node=1 \
    "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.worker.Worker \
    --cores "$SLURM_CPUS_PER_TASK" \
    --work-dir "$SCRATCH_DIR" \
    "$MASTER_URL" > spark_worker.out 2>&1 &
spark_pids="$spark_pids $!"

echo "Starting the Build"
# spark-submit takes a python FILE; resolve the installed package's
# module entry point (same CLI as the ena-spark-build console script)
ENTRY=$(python - <<'PY'
import pathlib

import ena_database_build_spark as pkg

print(pathlib.Path(pkg.__file__).parent / "__main__.py")
PY
) || exit 1
# the build's exit status IS the job's exit status (via the EXIT trap)
"$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER_URL" \
    --driver-memory "$DRIVER_MEM" \
    --executor-memory "$MEM_PER_EXECUTOR" \
    --executor-cores "$CORES_PER_EXECUTOR" \
    --conf spark.sql.shuffle.partitions="$SHUFFLE_PARTITIONS" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.local.dir="$SCRATCH_DIR" \
    "$ENTRY" \
        --ena-paths "$EBROOTENA/sequence" \
                    "$EBROOTENA/wgs/public" \
                    "$EBROOTENA/wgs/suppressed" \
        --db-config "$DB_CONFIG" \
        --db-name "$DB_NAME" \
        --output-dir "$OUTPUT_DIR" \
        --master "$MASTER_URL" \
        --shuffle-partitions "$SHUFFLE_PARTITIONS"
exit $?   # teardown + final exit code via the EXIT trap
