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
must fit in a row. Non-step events never enter the collected array
(the collect_list's `when` yields NULL for them, and collect_list
skips NULLs), so the hot-key bound is the per-user count of STEP-typed
events, not raw traffic — a bot hammering non-step events contributes
zero array entries while still appearing in the output with
steps_reached 0. For a user heavy in the step types themselves, cap
with a time window upstream. The fold is JVM-side expression code, no
Python.
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
    # collect_list skips NULL entries, so wrapping the struct in a
    # step-type `when` collects ONLY step events while aggregating over
    # every row — one scan, one shuffle, and all users appear (a user
    # of pure non-step traffic folds an empty array to steps_reached 0).
    # This bounds the in-row array under non-step heavy hitters (bot
    # traffic) without a second scan or a restore join.
    evs = F.array_sort(
        F.collect_list(
            F.when(
                F.col(type_col).isin(list(steps)),
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")),
            )
        )
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
