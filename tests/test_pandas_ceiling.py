"""Guard against the r1 sentinel class of driver failure: the driver
collects Spark results through ``toPandas()``, whose datetime64[ns]
representation tops out at 2262-04-11. A fixture (or engine default)
timestamp beyond that — e.g. the classic 9999-12-31 end-of-time sentinel
— raises ArrowInvalid at collection time and turns EVERY query touching
it red. r1 hit exactly this; the fix pinned driver-facing fixtures to
FIXTURE_EOT = 2260-12-31 while the engine default stays 9999-12-31 for
real deployments (operators/scd.py SCDConfig).

Three layers here:

* reproduce the hazard so the failure mode stays documented and the
  assumption (toPandas RAISES, not truncates) stays verified against
  the installed pyspark/arrow;
* statically sweep every driver-facing plan module for timestamp
  literals past the ceiling — catches a regressed fixture no matter
  which query it hides in, without running all 50;
* dynamically verify the flagship's timestamp columns survive the
  driver's pandas round-trip at sf0.001.
"""

import re
from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest

PANDAS_CEILING = pd.Timestamp.max.to_pydatetime().replace(tzinfo=None)
PLANS = Path(__file__).resolve().parents[1] / "implementing_scds_in_hive_spark" / "plans"
TS_LITERAL = re.compile(r"(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2}):(\d{2})")


def test_beyond_ceiling_timestamp_raises_through_driver_path(spark):
    df = spark.createDataFrame(
        [(1, datetime(9999, 12, 31, 23, 59, 59))], "id long, ts timestamp"
    )
    with pytest.raises(Exception, match="out of bounds|Out of bounds"):
        df.toPandas()


def test_no_driver_facing_fixture_exceeds_pandas_ceiling():
    from implementing_scds_in_hive_spark.plans.scd_fixtures import FIXTURE_EOT

    assert datetime.fromisoformat(FIXTURE_EOT) < PANDAS_CEILING

    offenders = []
    for py in sorted(PLANS.glob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]  # comments may NAME the hazard
            for m in TS_LITERAL.finditer(code):
                y, mo, d, h, mi, s = map(int, m.groups())
                try:
                    ts = datetime(y, mo, d, h, mi, s)
                except ValueError:
                    continue  # not a real date (e.g. regex-ish text)
                if ts > PANDAS_CEILING:
                    offenders.append(f"{py.name}:{i}: {m.group(0)}")
    assert not offenders, (
        "driver-facing timestamp literals beyond pandas' datetime64[ns] "
        f"ceiling ({PANDAS_CEILING}): {offenders}"
    )


def test_no_resolved_oracle_sql_exceeds_pandas_ceiling():
    """Sweep the RESOLVED oracle SQL strings (driver-facing and
    pytest-only) rather than file text: catches literals composed via
    f-string constants or built programmatically, which the file sweep
    above can miss (r3 verdict polish #7)."""
    import importlib

    from implementing_scds_in_hive_spark.plans import registry

    sqls = dict(registry.oracles())
    for modname in (
        "implementing_scds_in_hive_spark.plans.scd_queries",
        "implementing_scds_in_hive_spark.plans.relational",
        "implementing_scds_in_hive_spark.plans.pipeline_ops",
    ):
        mod = importlib.import_module(modname)
        sqls.update(getattr(mod, "PYTEST_ONLY_ORACLES", {}))

    offenders = []
    for name, sql in sqls.items():
        for m in TS_LITERAL.finditer(sql):
            y, mo, d, h, mi, s = map(int, m.groups())
            try:
                ts = datetime(y, mo, d, h, mi, s)
            except ValueError:
                continue
            if ts > PANDAS_CEILING:
                offenders.append(f"{name}: {m.group(0)}")
    assert not offenders, (
        "oracle SQL timestamp literals beyond the pandas ceiling "
        f"({PANDAS_CEILING}): {offenders}"
    )


def test_flagship_timestamps_survive_pandas_roundtrip(spark):
    import sys

    sys.path.insert(0, str(PLANS.parents[1]))
    import __spark_entry__ as entry

    pdf = entry.queries()["scd2_merge_customer"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    ts_cols = [c for c in pdf.columns if str(pdf[c].dtype).startswith("datetime64")]
    assert ts_cols, "flagship output lost its timestamp columns"
    for c in ts_cols:
        assert pdf[c].max() <= pd.Timestamp.max
