"""As-of (temporal) join: enrich each event with the latest matching
fact at-or-before its timestamp.

Spark lacks a native as-of join; a naive range join
(``l.key = r.key AND r.ts <= l.ts`` + max) explodes quadratically per
key. Implemented instead as the union-merge pattern: tag both streams,
sort within key partitions by time, and carry the last fact forward
with ``last(..., ignorenulls=True)`` — one shuffle of each input on the
key, linear work per partition. Deterministic tie-break: facts at equal
timestamps resolve by highest fact id, and a fact at exactly the event
timestamp matches (<=).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.fill import BUCKET_US_DEFAULT


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_id: str,
    skew_bounded: bool | str = False,
    bucket_us: int = BUCKET_US_DEFAULT,
    rows_per_key_hint: int | None = None,
    skew_threshold: int | None = None,
    probe_fraction: float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach ``right_cols`` of the latest
    ``right`` row with the same key and ``right_ts <= left_ts``.

    ``skew_bounded=True`` routes the carried-fact fill through
    ``operators/fill.py::forward_fill_bucketed`` — same output, but the
    per-key window is split by time bucket so a power-law key (bot
    traffic) cannot concentrate one task; see PLANS.md window-skew
    notes. Default stays the single-window plan (one window beats two
    when no key is pathological).

    ``skew_bounded="auto"`` decides from evidence (VERDICT r4 #2): an
    explicit ``rows_per_key_hint`` (max combined event+fact rows any
    key holds), else a max-rows-per-key probe over the unioned input
    (optionally sampled via ``probe_fraction``); the routing decision
    is logged by ``operators/skew_route.py``."""
    overlap = sorted(set(right_cols) & set(left.columns))
    if overlap:
        # same guard as bucketized_range_join/temporal_join: the final
        # select('__l.*', '__last_r.*') would emit duplicate column
        # names, failing any later reference with AMBIGUOUS_REFERENCE
        # (r11 review)
        raise ValueError(
            f"right_cols {overlap} collide with left's columns — alias "
            f"them on the right side before the as-of join"
        )
    if isinstance(skew_bounded, str) and skew_bounded != "auto":
        raise ValueError(
            f"skew_bounded must be True, False or 'auto', got "
            f"{skew_bounded!r} (any other string would silently "
            f"select the bucketed plan by truthiness)"
        )
    # a NULL-ts fact would sort FIRST in the as-of window (nulls-first)
    # and be carried into every earlier event — while in SQL semantics
    # right_ts <= left_ts is never true for NULL, i.e. no match (r11
    # review). Drop them; NULL-ts events order before every fact and
    # correctly enrich as NULL.
    right = right.where(F.col(right_ts).isNotNull())
    # tie-break sequence: integral ids pass through; anything else gets
    # a deterministic 64-bit hash (cast('long') on a string id was
    # silently NULL — nondeterministic same-instant winners)
    integral = dict(right.dtypes)[right_id] in (
        "tinyint", "smallint", "int", "bigint",
    )
    fact_seq = (
        F.col(right_id).cast("long")
        if integral
        else F.xxhash64(F.col(right_id))
    )
    lt = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__fact_seq"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols) + ">"
        ).alias("__r"),
    )
    rt = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        fact_seq.alias("__fact_seq"),
        F.lit(None).cast(lt.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    # Order: time asc, facts before events at the same instant (so an
    # equal-timestamp fact is visible, i.e. <= semantics), higher fact id
    # wins among same-instant facts.
    u = lt.unionByName(rt)
    if skew_bounded == "auto":
        from implementing_scds_in_hive_spark.operators.skew_route import (
            decide_skew_plan,
        )

        skew_bounded = decide_skew_plan(
            u,
            ["__k"],
            rows_per_key_hint=rows_per_key_hint,
            threshold=skew_threshold,
            probe_fraction=probe_fraction,
            operator="asof_join",
        ).bucketed
    if skew_bounded:
        from implementing_scds_in_hive_spark.operators.fill import (
            forward_fill_bucketed,
        )

        # Fact rows (the only non-null __r) always carry a non-null
        # __fact_seq, satisfying the composite-order precondition.
        carried = forward_fill_bucketed(
            u,
            "__r",
            key_col="__k",
            ts_col="__ts",
            order_col=["__is_left", "__fact_seq"],
            out_col="__last_r",
            bucket_us=bucket_us,
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__fact_seq"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__is_left") == 1).select("__l.*", "__last_r.*")
    return out
