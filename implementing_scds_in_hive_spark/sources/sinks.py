"""Write-side surface: the Spark equivalents of the reference's DDL/DML
sinks (SURVEY §2.1 S2-S7) plus the layout controls that matter at 100 TB.

The reference's sinks are Hive tables written with INSERT INTO /
INSERT OVERWRITE (SCD_script.txt:8,141). Here:

* ``write_table``        — plain parquet dir, mode append/overwrite
* ``write_partitioned``  — hive-style directory partitioning; the scan
  side gets partition pruning for free when filters hit the partition
  column (date-partitioned facts are the 100 TB default)
* ``write_bucketed``     — ``bucketBy`` into the session catalog: joins
  and aggregations on the bucket key skip the shuffle entirely when both
  sides share the bucketing (co-located join). This is the physical
  design lever for the SCD merge at scale: bucket production AND staging
  by the business key and the merge's join needs no exchange.
* ``overwrite_atomic``   — the self-overwrite-safe publish
  (operators/scd.py:publish) re-exported for discoverability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from implementing_scds_in_hive_spark.operators.scd import publish as overwrite_atomic

__all__ = [
    "write_table",
    "write_partitioned",
    "write_bucketed",
    "overwrite_atomic",
    "compact",
]


def write_table(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark,
    path: str,
    *,
    target_rows_per_file: int = 1_000_000,
    order_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_rows_per_file`` rows, optionally range-clustered on
    ``order_cols`` (gives min/max row-group statistics that make later
    range filters prune). The 100 TB housekeeping job every streaming
    sink needs — micro-batches leave thousands of tiny files whose
    per-file open/footer cost dominates scans. Returns the row count.

    A hive-partitioned directory MUST pass its partition columns via
    ``partition_by`` or the rewrite would flatten the layout (enforced
    below by walking the ``key=value`` directory levels — nested
    multi-column layouts included)."""
    import os
    import re

    def _hive_partition_cols(root: str) -> list[str]:
        """Ordered partition-column list from the directory nesting:
        one column name per key=value level (hive layout guarantees all
        sibling dirs at a level share the column)."""
        cols: list[str] = []
        cur = root
        while True:
            subs = [
                d for d in os.listdir(cur)
                if os.path.isdir(os.path.join(cur, d)) and re.match(r"^[^=]+=", d)
            ]
            if not subs:
                return cols
            names = sorted({d.split("=")[0] for d in subs})
            if len(names) > 1:
                raise ValueError(
                    f"{cur} mixes partition columns {names} at one directory "
                    "level — not a valid hive layout"
                )
            cols.append(names[0])
            cur = os.path.join(cur, subs[0])

    detected = _hive_partition_cols(path)
    if detected and list(partition_by or []) != detected:
        raise ValueError(
            f"{path} is hive-partitioned by {detected}; pass partition_by={detected} "
            "to preserve the layout (compacting without it would flatten partitions)"
        )
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    out = (
        df.repartitionByRange(n_files, *order_cols)
        if order_cols
        else df.repartition(n_files)
    )
    overwrite_atomic(out, path, partition_by=partition_by)
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Both sides of a join bucketed identically on the join key =>
    SortMergeJoin with ZERO Exchange on either side."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
