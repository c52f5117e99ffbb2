"""SparkSession builder with the engine's standard scale knobs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app: str = "colly-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)
    # Under spark-submit the JVM gateway already exists with the submitted
    # --master / --driver-memory / --conf: only session-settable spark.sql.*
    # knobs apply here; master and static JVM confs MUST NOT be overridden
    # (cluster managers would reject a second master, and static confs set
    # post-launch are silently ignored). PYSPARK_GATEWAY_PORT is how
    # PythonRunner hands the pre-built JVM to this process.
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        # These are DEFAULTS, not overrides: a key the user already passed
        # via spark-submit --conf / spark-defaults.conf wins. Attaching to
        # the submitted gateway (idempotent; getOrCreate does the same) is
        # what lets SparkConf see the submitted values.
        from pyspark import SparkContext
        from pyspark.conf import SparkConf

        SparkContext._ensure_initialized()
        submitted = SparkConf(loadDefaults=True)
        b = SparkSession.builder.appName(app)
        for k, v in (
            ("spark.sql.shuffle.partitions", str(shuffle)),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.enabled", "true"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"),
            ("spark.sql.maxPlanStringLength", "1048576"),
            ("spark.sql.session.timeZone", "UTC"),
        ):
            if not submitted.contains(k):
                b = b.config(k, v)
        # SPARK_GRAFT_CONF stays an explicit override — applied last, wins
        # over both the defaults above and the submitted conf
        for kv in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
            k, _, v = kv.partition("=")
            b = b.config(k.strip(), v.strip())
        return b.getOrCreate()
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # multi-process co-location (bench_multiproc): without this each
        # local-mode JVM sizes its GC/JIT/netty pools for ALL host cores —
        # four co-located JVMs then run 4x32 service threads on 32 cores
        # and collapse (measured 4.4x per-process slowdown at 4 procs)
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={os.environ.get('SPARK_GRAFT_PROC_CPUS', cpus)}"
            + " " + os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""),
        )
        # cap plan-string rendering: AQE re-renders the explain string on
        # every plan update; unbounded renders of deep iterative plans can
        # OOM the driver heap
        .config("spark.sql.maxPlanStringLength", "1048576")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # SPARK_GRAFT_CONF="k=v;k2=v2" — applied last so any default above can
    # be overridden per-run (A/B experiments, cluster-specific tuning)
    for kv in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
    eventlog_dir = os.environ.get("SPARK_EVENTLOG_DIR")
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", eventlog_dir)
            .config("spark.eventLog.compress", "false")
        )
    return b.getOrCreate()
