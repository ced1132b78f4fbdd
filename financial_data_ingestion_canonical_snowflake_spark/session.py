"""SparkSession factory with pinned, scale-aware defaults.

The reference delegates all physical execution to Snowflake; here Catalyst +
Tungsten play that role. This module pins the session settings that make the
engine deterministic across environments (UTC session time zone) and fast at
scale (AQE, arrow, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that every query in this engine assumes. Applied both
# at session build time and defensively on externally-provided sessions
# (the correctness driver builds its own SparkSession).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic wall-clock rendering; the DuckDB oracle is TZ-naive.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: shuffle coalescing, skew-join splitting,
    # broadcast-join conversion from runtime stats.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batch transfer for the few Pandas-UDF paths (multimodal ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Some sources write TIMESTAMP(NANOS) parquet (e.g. the events table);
    # Spark has no nanos timestamp — read as long and convert at the source
    # (plans/registry.py:table) instead of failing the scan.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Scan-split bin-packing cost per file. At the default 4 MiB a 10 MB
    # single-file table opens on 3 of 32 cores, so CPU-heavy probe stages
    # (md5 Bloom probes, shingle/minhash folds, as-of unions) run nearly
    # single-threaded at fixture scale. 64 KiB lets bytes-per-core govern
    # split sizing for small inputs; at production scale files exceed
    # maxPartitionBytes and this conf has no effect on split counts.
    "spark.sql.files.openCostInBytes": "65536",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Safe to call on the driver's session: every conf here is
    runtime-mutable (no JVM restart needed).
    """
    confs = dict(RUNTIME_CONFS)
    # Right-size shuffle parallelism for the local harness (a session built
    # with Spark's default 200 pays ~6x task overhead at these scales). AQE
    # coalescing keeps this safe if data grows.
    confs.setdefault("spark.sql.shuffle.partitions", str(default_parallelism()))
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this build; defaults are acceptable
    return spark


def get_spark(
    app_name: str = "fincan-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``. Shuffle parallelism defaults to the
    core count locally; on a 1000-executor cluster it should be set to
    2-3x total cores (AQE coalesces the excess at runtime, so erring high
    is cheap).
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    active = SparkSession.getActiveSession()
    if active is None:
        builder = builder.master(master or f"local[{cpus}]")
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
