"""SparkSession factory.

Local mode is the test harness; the configs are chosen so the same code is
cluster-correct: shuffle partitioning is explicit at every stateful operator,
AQE handles runtime coalescing + skew joins, and Arrow is on for every
pandas-UDF boundary (the only Python that ever touches row data).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "warchaeology_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale the caller sets it to ~2-3x total executor cores; every operator
    that is partition-count-sensitive (bloom build, frontier rounds) takes
    an explicit ``num_partitions`` instead of relying on this default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # SPARK_GRAFT_MASTER overrides the caller: the bench/scaling harnesses
    # swap the same job onto a local-cluster[N,c,mem] master (real separate
    # executor JVMs + network shuffle + torrent broadcast — the faithful
    # single-box emulation of the charter's N-vs-4N-EXECUTOR criterion)
    # without threading a parameter through every entry point.
    master = os.environ.get("SPARK_GRAFT_MASTER") or master
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # JVM flag hook for experiments (e.g. SPARK_GRAFT_JAVA_OPTS=
        # -XX:+UseParallelGC). A/B on the 16M-URL kernel showed the GC
        # choice inside run-to-run co-tenant noise, so the default stays
        # Spark's own.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow batch sizing: 64k records/batch (Spark default 10k) — the
        # per-batch Python overhead is a FIXED cost per batch, so at high
        # core counts it dominates the vectorized work; the r4 A/B
        # (BENCH/ab_novel.json) measured the 16M-row bloom stage at
        # 8.6 s -> 6.3 s on 16 cores (neutral at 4) from this alone.
        # maxBytesPerBatch bounds the same batches BY BYTES so blob-heavy
        # rows (media content, archive members) can never amplify the
        # bigger record cap into memory blowups.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
        # Tungsten off-heap: the string-heavy hot paths are allocation/GC
        # bound at high thread counts — the r3 A/B (BENCH/ab_parse.json)
        # measured the 16M-URL canonicalize stage at 31.0 s on-heap vs
        # 19.8 s off-heap on 16 cores (neutral at 4), which is also what
        # lifted the N->4N ladder. Size is a cap, not a reservation.
        .config(
            "spark.memory.offHeap.enabled",
            os.environ.get("SPARK_GRAFT_OFFHEAP", "true"),
        )
        .config(
            "spark.memory.offHeap.size",
            os.environ.get("SPARK_GRAFT_OFFHEAP_SIZE", "16g"),
        )
    )
    if master.startswith("local-cluster"):
        # Executor processes don't inherit the driver's sys.path: ship the
        # package the way a real spark-submit --py-files run does (the zip
        # tools/make_submit.sh builds), plus PYTHONPATH for the executor-
        # side pandas-UDF imports. Executor memory must fit the worker
        # spec in the master string (MB field), so it is env-tunable.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_path = os.path.join(repo_root, "dist", "warchaeology_spark.zip")
        if os.path.exists(zip_path):
            builder = builder.config("spark.submit.pyFiles", zip_path)
        import sys as _sys

        builder = (
            builder.config("spark.executorEnv.PYTHONPATH", repo_root)
            .config("spark.executorEnv.PYSPARK_PYTHON", _sys.executable)
            .config(
                "spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "6g"),
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
