"""Vector ops: normalization and int8 quantization invariants —
reconstruction error bounded by scale/2, cosine geometry preserved to
quantization tolerance, zero-vector and negative-component edges.
"""

import math

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.vectors import (
    cosine,
    dequantize,
    l2_normalize,
    norm,
    quantize,
    quantize_scale,
)

VECS = [
    (1, [1.0, -2.0, 3.0, -4.0]),
    (2, [0.001, 0.002, -0.003, 0.0005]),
    (3, [0.0, 0.0, 0.0, 0.0]),
    (4, [127.0, -127.0, 64.0, 1.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    df = spark.createDataFrame(VECS, "vec_id int, v array<double>")
    return df.select(
        "vec_id", "v", quantize_scale(F.col("v")).alias("scale")
    ).select(
        "vec_id", "v", "scale",
        quantize(F.col("v"), F.col("scale")).alias("q"),
    )


def test_reconstruction_error_bounded(vecs):
    rows = vecs.select(
        "v", "scale", dequantize(F.col("q"), F.col("scale")).alias("r")
    ).collect()
    for row in rows:
        for orig, rec in zip(row["v"], row["r"]):
            assert abs(orig - rec) <= row["scale"] / 2 + 1e-12


def test_int8_range_and_extremes(vecs):
    rows = {r["vec_id"]: r["q"] for r in vecs.collect()}
    assert all(-127 <= x <= 127 for q in rows.values() for x in q)
    assert rows[3] == [0, 0, 0, 0]          # zero vector -> zero scale path
    assert rows[4] == [127, -127, 64, 1]    # max|v|=127 -> scale 1.0, exact


def test_cosine_preserved_within_tolerance(spark, vecs):
    a = vecs.where(F.col("vec_id") == 1).select(
        F.col("v").alias("va"),
        dequantize(F.col("q"), F.col("scale")).alias("ra"),
    )
    row = a.select(cosine(F.col("va"), F.col("ra")).alias("c")).collect()[0]
    assert row["c"] == pytest.approx(1.0, abs=1e-3)


def test_l2_normalize(spark):
    df = spark.createDataFrame(VECS, "vec_id int, v array<double>")
    rows = {
        r["vec_id"]: r["n"]
        for r in df.select(
            "vec_id", norm(l2_normalize(F.col("v"))).alias("n")
        ).collect()
    }
    assert rows[1] == pytest.approx(1.0) and rows[2] == pytest.approx(1.0)
    assert rows[3] == 0.0  # zero vector passes through
