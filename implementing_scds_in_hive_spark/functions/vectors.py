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


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (doubles); zero vectors pass through
    unchanged rather than dividing by zero."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(a, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(a, lambda x: x.cast("double")))


def quantize_scale(a: Column, *, bits: int = 8) -> Column:
    """Symmetric per-vector quantization scale: max|v| / (2^(bits-1)-1).
    Zero for all-zero vectors (quantized form is all zeros)."""
    qmax = (1 << (bits - 1)) - 1
    return F.aggregate(
        F.transform(a, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    ) / F.lit(float(qmax))


def quantize(a: Column, scale: Column) -> Column:
    """Symmetric integer quantization: round-half-up(v / scale) as int.

    Rounding is spelled ``floor(x + 0.5)`` — explicit arithmetic with
    one engine-independent meaning, unlike round(), whose half-way rule
    differs across engines (HALF_UP vs HALF_EVEN vs away-from-zero).
    Storage drops to ``bits`` per dimension (int8 by default ->  4x
    smaller than float32, 8x smaller than float64) — at 100 TB of
    embeddings the difference between one storage tier and four.
    """
    return F.when(
        scale > 0,
        F.transform(a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(a, lambda x: F.lit(0)))


def dequantize(q: Column, scale: Column) -> Column:
    """Reconstruct doubles from quantized ints: q * scale. Max absolute
    error is scale/2 by construction of round-half-up."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def sign_bits_bucket(a: Column, n_bits: int = 16) -> Column:
    """Random-hyperplane-LSH degenerate form: bucket by the sign pattern
    of the first ``n_bits`` coordinates. Deterministic, shuffle-free
    blocking for near-duplicate candidate generation; a production ANN
    index would use seeded hyperplanes or IVF centroids instead."""
    bits = F.transform(
        F.slice(a, 1, n_bits), lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.concat_ws("", bits)


def projection_signs(dim_in: int, dim_out: int, seed: str = "rp") -> list[list[float]]:
    """Rademacher (+-1) projection matrix derived from portable md5:
    sign(i, j) = +1 iff the 60-bit integer prefix of md5('seed:i:j') is
    even. Any ANSI engine replays the identical matrix (DuckDB twin:
    ``CAST('0x' || substring(md5(...), 1, 15) AS BIGINT) % 2``), so a
    projection is verifiable cross-engine without shipping the matrix —
    the hash IS the matrix. Achlioptas (2003) shows +-1 entries satisfy
    the Johnson-Lindenstrauss guarantee like Gaussians do."""
    import hashlib

    def sign(i: int, j: int) -> float:
        h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [[sign(i, j) for i in range(1, dim_in + 1)] for j in range(1, dim_out + 1)]


def random_project(a: Column, dim_in: int, dim_out: int, seed: str = "rp") -> Column:
    """JL random projection to ``dim_out`` doubles:
    ``out[j] = dot(a, signs_j) / sqrt(dim_out)``.

    The signs are Python-time constants baked into the plan as array
    literals — Catalyst sees ``dim_out`` plain dot products against
    literal arrays, nothing is hashed per row. Each dot is the module's
    ordered left fold, so the oracle's sequential list_dot_product
    replays the identical double arithmetic."""
    import math

    scale = 1.0 / math.sqrt(dim_out)
    signs = projection_signs(dim_in, dim_out, seed)
    return F.array(
        *[(literal_dot(a, row) * F.lit(scale)) for row in signs]
    )


def literal_dot(a: Column, weights) -> Column:
    """Dot product of an array column with a CONSTANT vector, unrolled
    to a chain of plain multiply-adds. Higher-order expressions
    (``aggregate``/``zip_with``) never join whole-stage codegen — each
    element costs an interpreted lambda invocation — but an unrolled
    ``element_at(a,1)*w1 + element_at(a,2)*w2 + ...`` is ordinary
    arithmetic Janino compiles (measured ~8x on the PCA transform; see
    PLANS.md "PCA at scale"). Left-to-right fold order is IDENTICAL to
    :func:`dot` (0 + t1 == t1 in IEEE for these values), so swapping
    one for the other cannot change results — the oracle compares pin
    this. Use only for literal weights: with two column arrays there is
    no unrolling, use :func:`dot`."""
    acc = F.element_at(a, 1).cast("double") * F.lit(float(weights[0]))
    for i, wi in enumerate(weights[1:], start=2):
        acc = acc + F.element_at(a, i).cast("double") * F.lit(float(wi))
    return acc
