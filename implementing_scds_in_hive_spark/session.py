"""SparkSession construction tuned for the local test harness.

At 100 TB these settings are cluster-level concerns; here we encode the
scale-relevant defaults (AQE, skew handling, sensible shuffle parallelism,
Arrow for the Pandas-UDF paths) so every entry point runs the same way.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

# Static confs: only effective when get_spark launches the process's
# first JVM/session. getOrCreate() against an existing session silently
# ignores them, so we verify after the fact and warn (ADVICE r3).
_STATIC_CONFS = {
    "spark.sql.codegen.cache.maxEntries": "2000",
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
}


def get_spark(app_name: str = "scd-engine", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; a cluster would use
        # 2-3x total cores (or rely on AQE's initialPartitionNum).
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The compiled-codegen-class cache defaults to 100 entries; a
        # workload mixing many distinct plans evicts the expensive ones
        # (the minhash lambda tower costs ~3.5s to recompile — measured:
        # it ran 1.6s in isolation but 4-5s after 13 other queries).
        # Static conf, so it must be set before the first session.
        .config("spark.sql.codegen.cache.maxEntries", _STATIC_CONFS["spark.sql.codegen.cache.maxEntries"])
        # Default JVM code cache (240m) fills under a many-distinct-plans
        # workload and flushes JIT'd codegen classes back to the
        # interpreter; size it for plan diversity.
        .config(
            "spark.driver.extraJavaOptions",
            _STATIC_CONFS["spark.driver.extraJavaOptions"],
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Spark still defaults parquet timestamps to the deprecated
        # INT96 encoding, which carries NO usable column statistics —
        # every timestamp-keyed stats prune (snapshot data-skipping,
        # DML/merge candidate discovery) would silently keep all files.
        # TIMESTAMP_MICROS is the modern lakehouse default (Delta/
        # Iceberg) and restores footer min/max.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()

    def _conf_ok(key: str, want: str) -> bool:
        got = spark.conf.get(key, None)
        if key == "spark.driver.extraJavaOptions":
            # spark-defaults may append extra flags (GC tuning etc.); the
            # requirement is that our flag is present, not string equality.
            return got is not None and want in got
        return got == want

    stale = {
        k: spark.conf.get(k, None)
        for k, want in _STATIC_CONFS.items()
        if not _conf_ok(k, want)
    }
    if stale:
        warnings.warn(
            "get_spark() reused a pre-existing SparkSession whose static "
            f"confs differ from the requested tuning: {stale}. Static "
            "confs only apply to the process's FIRST session — construct "
            "it via get_spark (or restart) for the codegen-cache tuning "
            "to take effect.",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark
