"""NumPy replay of Spark's ``xxhash64`` over int/long inputs, and the
batched MinHash signature tower built on it (guide §4.2).

The MinHash tower — ``transform(sequence(0, P-1), i ->
array_min(transform(sh, h -> xxhash64(i, h))))`` — is a higher-order
lambda expression: it never joins whole-stage codegen, so every
(permutation, shingle) pair costs an *interpreted* JVM XxHash64 call,
P x |sh| per document. These kernels compute the identical tower as
P vectorized uint64 passes over the flattened shingle arrays of a whole
Arrow batch.

Exactness: Spark's XxHash64 expression (org.apache.spark.sql.catalyst
.expressions.XXH64, public) hashes an IntegerType child with
``hashInt`` and a LongType child with ``hashLong``, folding multiple
children left-to-right with the previous hash as the seed (initial
seed 42). Both primitives are pure 64-bit modular arithmetic —
reassociation-free, so the NumPy uint64 replay is EXACT (pinned
bit-for-bit against ``F.xxhash64`` in tests/test_hash_kernels.py).
Signed comparisons (``array_min`` over BIGINT) are done on the int64
VIEW of the unsigned hash values.

Only the LONG-input tower is vectorized here: the leaf token/string
hash stays a plain (codegen'd, fast) JVM expression in the scan — the
interpreted cost this removes is the lambda tower, not the leaf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "xxhash64_int_scalar",
    "xxhash64_long",
    "minhash_banded",
    "minhash_sig",
]

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxhash64_long(values: np.ndarray, seed) -> np.ndarray:
    """Spark XXH64.hashLong over a uint64 array (vectorized). ``seed``
    may be a scalar or a broadcastable uint64 array."""
    if np.isscalar(seed):
        # scalar uint64 overflow warns in numpy; wrap in Python ints
        h = np.uint64((int(seed) + int(_P5) + 8) & _M64)
    else:
        h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
    h = h ^ (_rotl(values * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def xxhash64_int_scalar(value: int, seed: int) -> int:
    """Spark XXH64.hashInt for one int (permutation indices are tiny —
    scalar Python-int modular arithmetic is clearest)."""
    h = (seed + int(_P5) + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * int(_P1)) & _M64
    h = ((((h << 23) | (h >> 41)) & _M64) * int(_P2) + int(_P3)) & _M64
    # fmix
    h ^= h >> 33
    h = (h * int(_P2)) & _M64
    h ^= h >> 29
    h = (h * int(_P3)) & _M64
    h ^= h >> 32
    return h


def _flatten(sh_series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint64, starts, lengths) of a pandas Series of long
    arrays. Shingle arrays are non-empty by the operators' contract
    (documents without shingles are filtered before hashing)."""
    lengths = np.fromiter((len(v) for v in sh_series), dtype=np.int64)
    if (lengths == 0).any():
        raise ValueError(
            "minhash kernels require non-empty shingle arrays "
            "(array_min of an empty array would be NULL)"
        )
    flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in sh_series])
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return flat.view(np.uint64), starts, lengths


def _signature_matrix(flat_u, starts, num_perm) -> np.ndarray:
    """int64[ndocs, num_perm]: per doc and permutation i, the SIGNED min
    over its shingles of xxhash64(i, shingle) — seed chain
    hashInt(i, 42) -> hashLong(shingle, .), exactly the JVM tower."""
    cols = []
    for i in range(num_perm):
        seed_i = xxhash64_int_scalar(i, 42)
        h = xxhash64_long(flat_u, seed_i).view(np.int64)
        cols.append(np.minimum.reduceat(h, starts))
    return np.stack(cols, axis=1)


def _band_bucket_matrix(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """int64[ndocs, bands]: bucket b = xxhash64(sig[b*r], ..,
    sig[b*r+r-1]) — the multi-child fold, seed 42, all LongType."""
    out = np.empty((sig.shape[0], bands), dtype=np.int64)
    for b in range(bands):
        h = np.full(sig.shape[0], 42, dtype=np.uint64)
        for r in range(rows_per_band):
            h = xxhash64_long(
                sig[:, b * rows_per_band + r].view(np.uint64), h
            )
        out[:, b] = h.view(np.int64)
    return out


def _arrow_list_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 values, starts) of a pyarrow list<int64> array —
    zero-copy: the list's value buffer IS the flat array, offsets give
    the segment starts (guide §4.2's re-slice-not-copy property)."""
    import pyarrow.compute as pc

    if col.null_count or pc.any(pc.equal(pc.list_value_length(col), 0)).as_py():
        raise ValueError(
            "minhash kernels require non-NULL, non-empty shingle arrays "
            "(array_min of an empty array would be NULL)"
        )
    offsets = np.asarray(col.offsets, dtype=np.int64)
    # offsets index the child array absolutely; trim past-the-end child
    # values so reduceat's final segment stops at the last list's end
    flat = np.asarray(col.values)[: offsets[-1]].astype(np.int64, copy=False)
    return flat.view(np.uint64), offsets[:-1]


def minhash_banded(
    sh_df: DataFrame,
    *,
    num_perm: int,
    bands: int,
    rows_per_band: int,
    did_col: str = "did",
    sh_col: str = "sh",
) -> DataFrame:
    """(did, band, bucket) for every document — the LSH banding input —
    as ONE map-only Arrow pass over (did, sh): the P x |sh| interpreted
    tower plus the per-band bucket fold become P + bands*r vectorized
    passes per batch. ``mapInArrow`` keeps the shingle lists zero-copy
    (values buffer + offsets), so the Python boundary ships bytes, not
    per-row objects. No exchange; the only shuffles left in the LSH
    plan are the (band, bucket) candidate self-join's."""
    import pyarrow as pa

    fields = {f.name: f for f in sh_df.schema.fields}
    did_field = fields[did_col]
    schema = StructType(
        [
            StructField(did_col, did_field.dataType, did_field.nullable),
            StructField("band", IntegerType(), False),
            StructField("bucket", LongType(), False),
        ]
    )
    band_ids = np.arange(bands, dtype=np.int32)

    def banded(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat_u, starts = _arrow_list_flat(rb.column(1))
            sig = _signature_matrix(flat_u, starts, num_perm)
            buckets = _band_bucket_matrix(sig, bands, rows_per_band)
            dids = rb.column(0)
            yield pa.RecordBatch.from_arrays(
                [
                    dids.take(pa.array(np.repeat(np.arange(n), bands))),
                    pa.array(np.tile(band_ids, n), type=pa.int32()),
                    pa.array(buckets.ravel(), type=pa.int64()),
                ],
                names=[did_col, "band", "bucket"],
            )

    return sh_df.select(did_col, sh_col).mapInArrow(banded, schema)


def minhash_sig(
    sh_df: DataFrame,
    *,
    num_perm: int,
    did_col: str = "did",
    sh_col: str = "sh",
) -> DataFrame:
    """(did, sz, sig array<bigint>) — the signature face of the tower,
    batch-vectorized; row-identical to the builtin expression."""
    fields = {f.name: f for f in sh_df.schema.fields}
    did_field = fields[did_col]
    schema = StructType(
        [
            StructField(did_col, did_field.dataType, did_field.nullable),
            StructField("sz", IntegerType(), False),
            StructField("sig", ArrayType(LongType(), True), True),
        ]
    )

    def sigs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat_u, starts, lengths = _flatten(pdf[sh_col])
            sig = _signature_matrix(flat_u, starts, num_perm)
            yield pd.DataFrame(
                {
                    did_col: pdf[did_col].to_numpy(),
                    "sz": lengths.astype(np.int32),
                    "sig": list(sig),
                }
            )

    return sh_df.select(did_col, sh_col).mapInPandas(sigs, schema)
