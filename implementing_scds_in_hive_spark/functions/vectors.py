"""Vector column expressions over ``array<float>`` embeddings.

Pure built-ins (``zip_with`` + ``aggregate``): the arithmetic runs
JVM-side in array order, making results deterministic and portable to
the DuckDB oracle. Accumulation is in double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bits_bucket(a: Column, n_bits: int = 16) -> Column:
    """Random-hyperplane-LSH degenerate form: bucket by the sign pattern
    of the first ``n_bits`` coordinates. Deterministic, shuffle-free
    blocking for near-duplicate candidate generation; a production ANN
    index would use seeded hyperplanes or IVF centroids instead."""
    bits = F.transform(
        F.slice(a, 1, n_bits), lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.concat_ws("", bits)
