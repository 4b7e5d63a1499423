"""Sessionizer skew smoke: plain vs two-level under a planted mega-bot.

Synthesizes an event table where ONE user owns half of all events (the
power-law case AQE cannot fix for windows) and times the plain per-user
sessionizer against ``sessionize_bucketed``. Also reports the max
window-partition row count each plan sees — the quantity that decides
whether a 1000-executor cluster has a straggler.

Usage: python scripts/sessionize_skew_smoke.py [n_events] (default 2M)
Results recorded in PLANS.md ("Window-skew caveat + mitigation").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.sessionize import (
    BUCKET_US_DEFAULT,
    sessionize,
    sessionize_auto,
    sessionize_bucketed,
)
from implementing_scds_in_hive_spark.operators.skew_route import decide_skew_plan
from implementing_scds_in_hive_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main(n_events: int) -> None:
    spark = get_spark("sessionize-skew-smoke")
    half = n_events // 2
    t0_us = 1_700_000_000_000_000  # fixed epoch base, micros

    # Bot: event every ~20s (never a 30-min gap) -> ONE session spanning
    # ~100+ days. Normal users: 1000 users, bursty (gaps straddle 30min).
    bot = spark.range(half).select(
        F.col("id").alias("event_id"),
        F.lit(0).alias("user_id"),
        F.timestamp_micros(F.lit(t0_us) + F.col("id") * 20_000_000).alias("ts"),
    )
    normal = spark.range(half, n_events).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 1000 + 1).alias("user_id"),
        F.timestamp_micros(
            F.lit(t0_us)
            + (F.col("id") % 1000) * 3_600_000_000
            + (F.col("id") / 1000).cast("long") * 900_000_000
        ).alias("ts"),
    )
    e = bot.unionByName(normal).persist()
    n = e.count()

    plain, t_plain = timed(lambda: sessionize(e).count())
    bucketed, t_bucketed = timed(lambda: sessionize_bucketed(e).count())
    assert plain == bucketed, (plain, bucketed)

    # auto routing (VERDICT r4 #2): with half the events on one user,
    # the probe must choose the bucketed plan without being asked
    decision = decide_skew_plan(e, ["user_id"], operator="sessionize")
    assert decision.bucketed, decision
    routed, t_routed = timed(lambda: sessionize_auto(e).count())
    assert routed == plain, (routed, plain)

    # max rows any single window partition holds, per plan
    max_plain = e.groupBy("user_id").count().agg(F.max("count")).first()[0]
    us = F.unix_micros(F.col("ts"))
    max_l1 = (
        e.withColumn("__bucket", F.floor(us / BUCKET_US_DEFAULT))
        .groupBy("user_id", "__bucket")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    print(
        json.dumps(
            {
                "n_events": n,
                "n_sessions": plain,
                "plain_sec": t_plain,
                "bucketed_sec": t_bucketed,
                "max_window_rows_plain": max_plain,
                "max_window_rows_bucketed_l1": max_l1,
                "auto_route": {
                    "bucketed": decision.bucketed,
                    "max_rows_per_key": decision.max_rows_per_key,
                    "threshold": decision.threshold,
                    "routed_sec": t_routed,
                },
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
