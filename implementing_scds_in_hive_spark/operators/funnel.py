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
must fit in a row. Events whose type is not a funnel step are filtered
BEFORE the shuffle (they can never advance the fold), so the hot-key
bound is the per-user count of step-typed events, not raw traffic — a
bot hammering non-step events costs nothing. For a user heavy in the
step types themselves, cap with a time window upstream. The fold is
JVM-side expression code, no Python.
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
    # Pre-shuffle reduction: only step-typed events can advance the
    # fold; everything else is a no-op row we'd shuffle and collect for
    # nothing. This also bounds the collected per-user array under
    # non-step heavy hitters (bot traffic). Users with zero step-typed
    # events are restored by the key-only join below.
    typed = events.where(F.col(type_col).isin(list(steps)))
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

    agg = typed.groupBy(F.col(user_col).alias("user_id")).agg(state.alias("__st"))
    # Every distinct user appears in the output, step-typed events or
    # not (steps_reached = 0 past the filter). The distinct is a
    # key-only aggregation: map-side combined, shuffles only user ids,
    # and AQE skew-splitting applies (it's an aggregate exchange, not a
    # window), so the hot key stays tamed end to end.
    users = events.select(F.col(user_col).alias("user_id")).distinct()
    joined = users.join(agg, "user_id", "left")
    idx = F.coalesce(F.col("__st.idx"), F.lit(0))
    return joined.select(
        "user_id",
        idx.alias("steps_reached"),
        *[
            F.try_element_at("__st.times", F.lit(i + 1)).alias(f"t_{s}")
            for i, s in enumerate(steps)
        ],
    )
