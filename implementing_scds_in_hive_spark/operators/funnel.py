"""Funnel (ordered-step conversion) analysis over an event stream.

"How many users did view → click → purchase, in that order, and when?"
The naive formulation is k-1 self-joins of the event table (step k
joined to the running min of step k-1) — k shuffles of the full fact
table. This operator is ONE shuffle: group events by user, sort the
(ts, type) pairs in-row, and scan them with a single `F.aggregate`
fold whose state is (next step index, completion times so far). The
scan advances on an event that matches the next step AND is strictly
later than the previous step's completion — identical semantics to the
chained ``min(ts) where ts > prev`` formulation the SQL oracle uses.

Scale: the shuffle carries (user, ts, type) — the per-user event list
must fit in a row (fine for bounded sessions; cap with a time window
for power users). The fold is JVM-side expression code, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user: ``steps_reached`` (0..len(steps)) and
    ``t_<step>`` completion timestamps (NULL past the drop-off point).
    Earliest-completion semantics: each step binds to its first
    occurrence strictly after the previous step's time."""
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )

    def scan(acc, ev):
        # strictly-after guard: try_element_at because ANSI element_at
        # errors on the not-yet-filled slot even inside a conditional
        # branch (codegen evaluates it eagerly); NULL compares false.
        after_prev = F.when(acc["idx"] == 0, F.lit(True)).otherwise(
            ev["ts"] > F.try_element_at(acc["times"], F.greatest(acc["idx"], F.lit(1)))
        )
        matches = (
            (acc["idx"] < n)
            & (ev["et"] == F.element_at(steps_arr, acc["idx"] + 1))
            & after_prev
        )
        advanced = F.struct(
            (acc["idx"] + 1).alias("idx"),
            F.concat(acc["times"], F.array(ev["ts"])).alias("times"),
        )
        return F.when(matches, advanced).otherwise(acc)

    init = F.struct(
        F.lit(0).alias("idx"), F.array().cast("array<timestamp>").alias("times")
    )
    state = F.aggregate(evs, init, scan)

    agg = events.groupBy(F.col(user_col).alias("user_id")).agg(state.alias("__st"))
    return agg.select(
        "user_id",
        F.col("__st.idx").alias("steps_reached"),
        *[
            F.try_element_at("__st.times", F.lit(i + 1)).alias(f"t_{s}")
            for i, s in enumerate(steps)
        ],
    )
