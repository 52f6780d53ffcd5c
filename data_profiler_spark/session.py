"""SparkSession factory.

One place to pin the execution config that the whole engine assumes:
AQE on (runtime shuffle coalescing + skew-join splitting), Arrow on
(vectorized pandas-UDF transfer), UTC session timezone (oracle parity
with DuckDB), shuffle partitions sized to cores rather than the
200-partition default.

At 100 TB these same settings hold: AQE picks the real shuffle
parallelism from map-side statistics, so `spark.sql.shuffle.partitions`
only needs to be a sane upper bound (cluster cores × 2-3), and skew
handling is runtime, not hand-tuned.
"""

from __future__ import annotations

import os
from pathlib import Path as _Path

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "data_profiler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cores`` controls ``local[N]`` — the two-parallelism scaling bench
    (BASELINE.md north rule) runs the same job at local[8] and local[32]
    through this one knob.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(2 * n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        # Python workers resolve this package via PYTHONPATH, not driver
        # sys.path — pin the repo root so pandas UDFs import it anywhere.
        # On a real cluster, spark-submit --py-files replaces this.
        .config(
            "spark.executorEnv.PYTHONPATH",
            str(_Path(__file__).resolve().parents[1]),
        )
        # One BLAS thread per python worker: N workers × default BLAS
        # threadpool (ncores each) oversubscribes the box quadratically —
        # measured 2× wall-clock on the langid matmul at local[32]. Task
        # parallelism comes from Spark, not from nested BLAS threads.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # Retain python-worker allocator arenas: each Arrow/pandas-UDF
        # batch allocates multi-MB numpy/Arrow buffers that glibc serves
        # via mmap and returns to the OS on free, so EVERY batch re-pays
        # first-touch page faults. On an overcommitted hypervisor those
        # faults stall ~100× (measured here: first-touch cumsum over 50 MB
        # 103 s vs 0.1 s re-touch, with flat CPU markers and zero PSI —
        # the host supplies pages slowly under outside load). Disabling
        # malloc trim and raising the mmap threshold keeps freed batch
        # buffers in the worker's heap, paying the fault once per worker
        # instead of once per batch: measured best-of-4 scoring 13.6 s →
        # 9.3 s in a contended window (BASELINE.md round 4). Steady-state
        # RSS is bounded by the worker's peak batch footprint, which
        # worker reuse (default on) already implies.
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "268435456")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
