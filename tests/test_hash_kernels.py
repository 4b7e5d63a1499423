"""Bit-exactness pins for the NumPy xxhash64 replay and the batched
MinHash tower (operators/hash_kernels.py).

The kernels are the documented scale option for the xxhash64 family's
signature tower (backend="arrow" on minhash_signatures /
minhash_lsh_pairs; the builtin JVM expression stays the default — the
r15 interleaved A/B measured the two at parity on the bench corpus, see
OPTIMIZATION_r15.md). Exactness is the contract either way.
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.hash_kernels import (
    xxhash64_int_scalar,
    xxhash64_long,
)


def test_xxhash64_long_matches_spark(spark):
    rng = random.Random(7)
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 42, -42] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(3000)
    ]
    want = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in longs], "x bigint")
        .select(F.xxhash64("x"))
        .collect()
    ]
    got = xxhash64_long(np.array(longs, dtype=np.int64).view(np.uint64), 42).view(
        np.int64
    )
    for v, g, w in zip(longs, got, want):
        assert int(g) == w, (v, int(g), w)


def test_xxhash64_int_long_chain_matches_spark(spark):
    """The tower's (permutation int, shingle long) two-child fold:
    seed 42 -> hashInt -> hashLong."""
    rng = random.Random(11)
    pairs = [(i, rng.randint(-(2**63), 2**63 - 1)) for i in range(64) for _ in range(20)]
    want = [
        r[0]
        for r in spark.createDataFrame(pairs, "i int, x bigint")
        .select(F.xxhash64("i", "x"))
        .collect()
    ]
    for (i, v), w in zip(pairs, want):
        seed_i = xxhash64_int_scalar(i, 42)
        g = int(
            xxhash64_long(np.array([v], dtype=np.int64).view(np.uint64), seed_i).view(
                np.int64
            )[0]
        )
        assert g == w, (i, v, g, w)


def test_xxhash64_multi_long_fold_matches_spark(spark):
    """The band-bucket shape: xxhash64(sig_0, .., sig_r-1)."""
    rng = random.Random(13)
    quads = [tuple(rng.randint(-(2**63), 2**63 - 1) for _ in range(4)) for _ in range(300)]
    want = [
        r[0]
        for r in spark.createDataFrame(
            quads, "a bigint, b bigint, c bigint, d bigint"
        )
        .select(F.xxhash64("a", "b", "c", "d"))
        .collect()
    ]
    for q, w in zip(quads, want):
        h = np.full(1, 42, dtype=np.uint64)
        for v in q:
            h = xxhash64_long(np.array([v], dtype=np.int64).view(np.uint64), h)
        assert int(h.view(np.int64)[0]) == w


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_minhash_lsh_pairs_backends_identical(docs):
    from implementing_scds_in_hive_spark.operators.dedup import minhash_lsh_pairs

    a = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, backend="arrow").collect())
    )
    b = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, backend="builtin").collect())
    )
    assert a == b and len(a) > 0


def test_minhash_signatures_backends_identical(docs):
    from implementing_scds_in_hive_spark.operators.dedup import minhash_signatures

    a = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in minhash_signatures(docs, num_perm=16, backend="arrow").collect()
    )
    b = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in minhash_signatures(docs, num_perm=16, backend="builtin").collect()
    )
    assert a == b and len(a) > 0
