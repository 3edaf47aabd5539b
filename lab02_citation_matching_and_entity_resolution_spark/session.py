"""SparkSession factory with scale-oriented defaults.

The reference is a single process (no session concept); here we centralize the
knobs that matter at cluster scale: AQE (skew joins + partition coalescing),
Arrow for pandas UDF exchange, bounded Arrow batch sizes (the pair-feature UDF
is quadratic in string length), and shuffle parallelism tied to core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Pair-feature UDFs do O(len_a * len_b) work per row; keep Arrow batches small
# enough that a single batch never stalls an executor thread for minutes.
ARROW_MAX_RECORDS_PER_BATCH = 10_000


def get_spark(
    app_name: str = "lab02-er-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[N]`` from ``$SPARK_GRAFT_CPUS`` (32 in the
    sandbox); on a real cluster pass ``None`` and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, DEFAULT_SHUFFLE_PARTITIONS)))
        )

    # Whole-stage codegen for the wide feature projections generates methods
    # near HotSpot's DontCompileHugeMethods threshold (8k bytecode); such
    # methods run INTERPRETED when the JIT blacklists them, and the round-7
    # event-log capture measured first executions of the scoring stage at up
    # to 19x the steady-state CPU (2404 s vs 128 s executor run time for the
    # identical stage, uniform across all tasks) from exactly this.  Rather
    # than forcing C2 to compile huge methods (-XX:-DontCompileHugeMethods
    # measurably degraded warm legs ~15% here — compiling 64 KB methods is
    # itself expensive), split the generated code into smaller, normally
    # JIT-able methods: methodSplitThreshold 1024 -> 128 removed the
    # 150-280 s interpreted-tail legs in every observed run while keeping
    # warm-leg times unchanged.  A bigger code cache holds the extra
    # (smaller) methods.  Deployment-neutral; both knobs overridable.
    jvm_opts = os.environ.get(
        "SPARK_GRAFT_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
    )
    method_split = os.environ.get("SPARK_GRAFT_CODEGEN_SPLIT", "128")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.executor.extraJavaOptions", jvm_opts)
        .config("spark.sql.codegen.methodSplitThreshold", method_split)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m advisory coalesces mid-size stages to ~one task wave per
        # core; 16m keeps ~4 waves so stragglers overlap instead of stalling
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS_PER_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        # single-JVM local mode: the driver heap IS the executor heap; size it
        # for 32 concurrent tasks (spills + GC thrash at 8g killed scaling)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill on tmpfs when available: the sandbox's virtual disk is
    # slow enough to serialize shuffle-heavy stages (measured: local[32] no
    # faster than local[8] with /tmp-backed shuffles); a real cluster has
    # NVMe + network for this
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        builder = builder.config(
            "spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", f"{shm}/spark-local")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
