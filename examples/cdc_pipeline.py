"""CDC pipeline walkthrough: an operation feed driving an SCD2 dimension.

The reference pipeline consumes staging *snapshots* (a key's absence
means "no change"; nothing is ever deleted). This example shows the
operation-feed face the reference cannot express: two micro-batches of
Debezium-style (op, seq, values) rows applied with ``cdc_apply`` —
an update, a delete, and then the deleted key's resurrection — plus a
snapshot diff bridging the two worlds. Prints every intermediate table.

Run: python examples/cdc_pipeline.py
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import types as T

from implementing_scds_in_hive_spark.operators.cdc import (
    cdc_apply,
    snapshot_to_cdc,
)
from implementing_scds_in_hive_spark.operators.scd import SCDConfig
from implementing_scds_in_hive_spark.session import get_spark

EOT = datetime(2260, 12, 31, 23, 59, 59)
T0 = datetime(2024, 1, 1)

CFG = SCDConfig(
    key="login",
    type2_cols=("address",),
    type1_cols=("name",),
    surrogate_col="dim_user_id",
    end_of_time="2260-12-31 23:59:59",
)

PROD_SCHEMA = T.StructType(
    [
        T.StructField("dim_user_id", T.LongType()),
        T.StructField("login", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("scd_version", T.IntegerType()),
        T.StructField("scd_start_date", T.TimestampType()),
        T.StructField("scd_end_date", T.TimestampType()),
        T.StructField("scd_active", T.BooleanType()),
    ]
)

FEED_SCHEMA = T.StructType(
    [
        T.StructField("login", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("op", T.StringType(), False),
        T.StructField("op_seq", T.IntegerType(), False),
    ]
)


def show(title, df):
    print(f"\n=== {title} ===")
    df.orderBy(*df.columns[:2]).show(truncate=False)


def main() -> None:
    spark = get_spark("cdc-pipeline-example", cpus=4)

    dim = spark.createDataFrame(
        [
            (1, "jdoe", "John Doe", "12 Oak St", 1, T0, EOT, True),
            (2, "asmith", "Ann Smith", "9 Elm Rd", 1, T0, EOT, True),
        ],
        PROD_SCHEMA,
    )
    show("dimension, initial", dim)

    # --- batch 1: Ann moves (Type-2 change); John's account deleted ----
    batch1 = spark.createDataFrame(
        [
            ("asmith", "Ann Smith", "40 Pine Ave", "U", 1),
            ("jdoe", None, None, "D", 2),
        ],
        FEED_SCHEMA,
    )
    show("CDC batch 1 (update + delete)", batch1)
    # Sequential batch applies: collect the internally-persisted
    # intermediates and release them once each result is materialized,
    # so cached blocks don't accumulate across batches.
    handles: list = []
    dim = cdc_apply(
        dim, batch1, CFG, datetime(2024, 2, 1),
        key_strategy="row_number", cache_handles=handles,
    )
    show("after batch 1 — jdoe closed out, asmith versioned", dim)
    for h in handles:
        h.unpersist()
    handles.clear()

    # --- batch 2: John re-registers -> resurrection at version max+1 ---
    batch2 = spark.createDataFrame(
        [("jdoe", "John Doe", "77 Birch Ln", "I", 1)],
        FEED_SCHEMA,
    )
    show("CDC batch 2 (re-insert of a deleted key)", batch2)
    dim = cdc_apply(
        dim, batch2, CFG, datetime(2024, 3, 1),
        key_strategy="row_number", cache_handles=handles,
    )
    show("after batch 2 — jdoe resurrected at version 2", dim)
    for h in handles:
        h.unpersist()
    handles.clear()

    # --- snapshot world -> CDC world ----------------------------------
    old_snap = dim.where("scd_active").select("login", "name", "address")
    new_snap = spark.createDataFrame(
        [
            ("asmith", "Ann Smith-Jones", "40 Pine Ave"),  # Type-1 rename
            ("bgreen", "Bob Green", "3 Fir Ct"),  # new key
            # jdoe absent -> delete, which a snapshot merge cannot express
        ],
        "login string, name string, address string",
    )
    feed = snapshot_to_cdc(old_snap, new_snap, CFG)
    show("derived feed from snapshot diff (I/U/D)", feed)
    dim = cdc_apply(dim, feed, CFG, datetime(2024, 4, 1), key_strategy="row_number")
    show("after snapshot-diff apply — active rows == new snapshot", dim)

    spark.stop()


if __name__ == "__main__":
    main()
