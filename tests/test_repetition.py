"""Repetition quality signals: hand-computed fractions on planted
documents, plus the edge cases (all-unique, all-same, too-short).

"a b a b a" has 2-gram shingles [ab, ba, ab, ba]: every position is in a
duplicated 2-gram (dup2 = 4/4) and the top 2-gram covers 2/4. Its
3-grams [aba, bab, aba] give dup3 = 2/3.
"""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.repetition import repetition_stats
from implementing_scds_in_hive_spark.operators.dedup import _shingle_hashes


def _stats(spark, text, n):
    df = spark.createDataFrame([(text,)], "text string").select(
        F.transform(F.split("text", " "), lambda t: F.xxhash64(t)).alias("th")
    )
    r = repetition_stats(F.col("th"), n, _shingle_hashes)
    row = df.select(
        r["dup_frac"].alias("dup"), r["top_frac"].alias("top")
    ).collect()[0]
    return row["dup"], row["top"]


def test_planted_repetition(spark):
    dup2, top2 = _stats(spark, "a b a b a", 2)
    assert dup2 == pytest.approx(4 / 4) and top2 == pytest.approx(2 / 4)
    dup3, _ = _stats(spark, "a b a b a", 3)
    assert dup3 == pytest.approx(2 / 3)


def test_all_unique_and_all_same(spark):
    dup, top = _stats(spark, "one two three four five", 2)
    assert dup == 0.0 and top == pytest.approx(1 / 4)
    dup, top = _stats(spark, "x x x x", 2)
    assert dup == 1.0 and top == 1.0


def test_too_short_document(spark):
    dup, top = _stats(spark, "solo", 2)
    assert dup == 0.0 and top == 0.0
