"""Unit semantics of the single-pass funnel scan (operators/funnel.py).
Equivalence to the chained min(ts > prev) formulation at sf scale runs
in test_pytest_only_oracles (funnel_view_click_purchase)."""

from datetime import datetime

from implementing_scds_in_hive_spark.operators.funnel import funnel

M = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731


def _run(spark, rows, steps=("view", "click", "purchase")):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    return {r["user_id"]: r for r in funnel(df, list(steps)).collect()}


def test_order_matters_not_presence(spark):
    rows = [
        # u1: full funnel in order
        (1, "view", M(1)), (1, "click", M(2)), (1, "purchase", M(3)),
        # u2: all three types but purchase BEFORE click -> stops at 2
        (2, "view", M(1)), (2, "purchase", M(2)), (2, "click", M(3)),
        # u3: click without view -> 0
        (3, "click", M(1)), (3, "purchase", M(2)),
    ]
    out = _run(spark, rows)
    assert out[1]["steps_reached"] == 3 and out[1]["t_purchase"] == M(3)
    assert out[2]["steps_reached"] == 2 and out[2]["t_purchase"] is None
    assert out[3]["steps_reached"] == 0 and out[3]["t_view"] is None


def test_earliest_completion_binding(spark):
    rows = [
        (1, "view", M(1)), (1, "view", M(5)),
        (1, "click", M(2)), (1, "click", M(9)),
        (1, "purchase", M(3)),
    ]
    out = _run(spark, rows)
    # binds to FIRST view (M1), first click after it (M2), first
    # purchase after that (M3) — not the later view/click pairs
    assert out[1]["steps_reached"] == 3
    assert (out[1]["t_view"], out[1]["t_click"], out[1]["t_purchase"]) == (M(1), M(2), M(3))


def test_step_must_be_strictly_after_previous(spark):
    rows = [(1, "view", M(1)), (1, "click", M(1)), (1, "click", M(4))]
    out = _run(spark, rows)
    # the click at the same instant as the view does not count
    assert out[1]["t_click"] == M(4)


def test_every_user_appears(spark):
    rows = [(1, "error", M(1)), (2, "view", M(1))]
    out = _run(spark, rows)
    assert out[1]["steps_reached"] == 0
    assert out[2]["steps_reached"] == 1
    assert len(out) == 2
