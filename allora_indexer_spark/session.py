"""SparkSession factory.

Defaults mirror how the engine should run on a real cluster (AQE on, broadcast
joins for dimension tables, sane shuffle partitioning) while remaining correct
on local[N]. The reference's parallelism knobs (WORKERS_NUM,
MAX_CONCURRENT_TX_PROCESSING — /root/reference/main.go:58,70) map onto Spark
task parallelism, not manual semaphores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "allora-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    Determinism notes (matters for the DuckDB-oracle correctness gate):
    - session timezone pinned to UTC so parquet timestamps and time windows
      agree with DuckDB's naive timestamps;
    - ANSI mode off (we use try_cast explicitly where null-on-failure is the
      contract, mirroring the reference's parse-gate semantics
      /root/reference/process_tx.go:344-367).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # CPUS feeds the master string, where '*' is legal ("local[*]");
        # it doubles as the shuffle default only when numeric — int('*')
        # would otherwise abort session creation with a traceback blaming
        # shuffle partitioning for a master-string setting
        fallback = cpus if cpus.isdigit() else str(os.cpu_count() or 32)
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", fallback)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # and dynamic broadcast conversion — the scale story for 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE coalesce the OUTPUT partitioning of cached plans too
        # (off by default): the ingest fan-out persists its two parse
        # roots, and without this every one of the ~23 downstream writes
        # scans shuffle.partitions-many mostly-empty cached partitions
        # (round-17 probe: 916 -> 78 tasks per ingest pass). The
        # coalescing is byte-targeted (advisoryPartitionSizeInBytes), so
        # a corpus-scale cached root keeps executor-sized partitions —
        # data-adaptive, not a local-core-count tune (guide §2.2).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Arrow for any pandas-UDF path (the slow-path escape hatch only).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame debugging captures the user call site for
        # every Column/DataFrame op: a py4j trace shows 13 driver round
        # trips per F.col(), 8 of them getActiveSession +
        # PySparkCurrentOrigin.set/clear bookkeeping, plus a Python-side
        # stack inspection. Off, one Column op is ~0.6 ms instead of
        # ~2-6 ms — a 4x cut in EVERY query's plan-construction latency
        # (errors still raise with full JVM context; only the "user line
        # was here" fragment is dropped). Round 17; guide §7.3 planning-
        # time-as-bottleneck.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # Parquet TIMESTAMP(NANOS) (events.ts) is read as long nanos and
        # truncated to micros in tables.load_table — the same truncation
        # DuckDB applies at scan, keeping the oracle comparison exact.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Dimension tables (region/nation/supplier/topics) are tiny; let the
        # planner broadcast them. 32 MB is generous locally and sane on a
        # cluster with 8 GiB+ executors.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Scan granularity: restates Spark's 128 MiB default ON PURPOSE —
        # it is a deliberate sizing decision (100 TB ≈ 800k schedulable
        # tasks, each decompressing well under executor memory), pinned so
        # an environment-level override cannot silently change it; with
        # AQE coalescing the post-shuffle side, these two knobs are the
        # whole spill-sizing story.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # FAIR job scheduling: the streaming sinks submit one write job
        # per table from a thread pool (warehouse.write_tables); under
        # FIFO a wide early job monopolizes every core while later
        # SMALL writes queue whole, stretching the trigger's tail
        # (stream_batch_p90). FAIR round-robins cores across the
        # concurrent jobs so the per-trigger wall time tracks total
        # work, not arrival order. Sequential workloads (the bench
        # query sweep, one job at a time) are unaffected — FAIR only
        # changes the schedule when jobs actually overlap.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
