"""Bloom-filter join pruning — shrink the 100 TB side before it shuffles.

The expensive part of a big fact-to-dim join is shuffling the fact side.
When the dim side is too large to broadcast AS ROWS but its key set fits
a few megabytes AS A BITMAP, the classic fix is a Bloom filter: build a
bitmap over the dim keys and drop fact rows whose key cannot be in the
dim BEFORE the fact side reaches its Exchange. False positives survive
the pre-filter and are removed by the exact join that follows, so the
composed operator is *exactly* a semi/inner join — the bloom stage only
changes how many rows pay for the shuffle.

The bitmap is applied as a single array LITERAL in the filter predicate,
not as a joined broadcast relation. This is deliberate: expressed as a
cross join + filter, Catalyst's PushDownLeftSemiAntiJoin pushes the
exact semi join BELOW the bloom stage (observed), so the full fact
shuffled first and the bloom ran last — semantically fine, a total
performance inversion. A literal predicate sits directly on the fact
scan, below any Exchange, and nothing can reorder above it; one
Literal(ArrayData) node, not num_words expression nodes, so plan size
stays flat. The cost is an eager driver-side collect of the bitmap at
plan-build time — the same data movement a broadcast would do, paid
once in the build-once / probe-many lifecycle (persist the build
output like any table and re-derive the literal per probe).

Sizing: 2^23 bits (1 MiB) at 3 hashes holds ~1M keys at ~1% false
positives — dim cardinalities where broadcasting full rows would already
be multi-GB. Spark's runtime bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically inside one query; this operator makes the filter a
first-class value reusable across queries and days.

Everything is built-in expressions (xxhash64 / bit ops / element_at) —
JVM codegen end-to-end, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 3

# element_at(_MASKS, bit+1) == 1 << bit as a signed 64-bit word; bit 63
# wraps to long-min (the sign bit), matching what bit_or produced on the
# build side in two's complement.
_MASK_VALUES = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _masks() -> Column:
    return F.lit(_MASK_VALUES)


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions per key: xxhash64(key, i) mod num_bits.
    Seeding by a literal second column gives k distinct 64-bit hash
    functions from the one codegen'd primitive."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """One-row DataFrame ``(bloom array<bigint>, num_hashes int)`` — the
    bitmap packed as num_bits/64 words plus the parameter the probe side
    needs (num_bits is implied by the array length, so a persisted
    filter can never be probed with mismatched parameters). Build shape:
    explode k positions per key, partial bit_or per word inside each
    partition, one tiny shuffle of at most ``num_bits/64`` words per
    partition, final assembly of the dense array in a single
    aggregation. The key column itself is never collected; only set
    words travel."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    words = num_bits // 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes))).alias("__pos")
    )
    word_bits = (
        pos.select(
            F.shiftright(F.col("__pos"), 6).alias("__word"),
            F.element_at(_masks(), (F.col("__pos").bitwiseAND(F.lit(63)) + 1).cast("int")).alias(
                "__mask"
            ),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(words - 1)),
        lambda w: F.coalesce(F.element_at(F.col("__m"), w.cast("bigint")), F.lit(0).cast("bigint")),
    )
    return word_bits.agg(
        F.map_from_arrays(F.collect_list("__word"), F.collect_list("__bits")).alias("__m")
    ).select(dense.alias("bloom"), F.lit(num_hashes).alias("num_hashes"))


def bloom_collect(bloom: DataFrame) -> tuple[list[int], int]:
    """Materialize a built filter to ``(words, num_hashes)`` — the form
    the probe-side literal needs. One driver round-trip of the bitmap."""
    row = bloom.select("bloom", "num_hashes").collect()[0]
    return list(row.bloom), int(row.num_hashes)


def bloom_might_contain(words: list[int], num_hashes: int, key: Column) -> Column:
    """Predicate: every one of the key's k bits is set in the literal
    bitmap — no false negatives by construction; false-positive rate
    ~ fill_factor^k."""
    num_bits = 64 * len(words)
    bitmap = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word_val = F.element_at(bitmap, (F.shiftright(pos, 6) + 1).cast("int"))
        mask = F.element_at(_masks(), (pos.bitwiseAND(F.lit(63)) + 1).cast("int"))
        cond = cond & (word_val.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    bloom: DataFrame | tuple[list[int], int],
    key_col: str,
) -> DataFrame:
    """Fact rows whose key MIGHT be in the filter (members + ~FPR of the
    rest). The check is a literal predicate on the fact scan — map-side,
    upstream of any Exchange the caller adds afterwards. ``bloom`` is
    either ``bloom_build``'s output or an already-collected
    ``(words, num_hashes)`` pair (collect once when probing many
    tables)."""
    words, k = bloom if isinstance(bloom, tuple) else bloom_collect(bloom)
    return fact.where(bloom_might_contain(words, k, F.col(key_col)))


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    *,
    dim_key_col: str | None = None,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim`` with a bloom pre-filter on the fact
    side. Result is EXACTLY the plain semi join (false positives die in
    the final exact join); what changes is the row volume entering the
    fact-side Exchange — at 1% FPR on a 1-in-100 selective dim, ~99% of
    the 100 TB side never shuffles."""
    dk = dim_key_col or key_col
    dim_keys = dim.select(F.col(dk).alias(key_col)).distinct()
    bloom = bloom_build(dim_keys, key_col, num_bits=num_bits, num_hashes=num_hashes)
    reduced = bloom_prefilter(fact, bloom, key_col)
    return reduced.join(dim_keys, on=key_col, how="left_semi")


def bloom_fill_stats(bloom: DataFrame) -> DataFrame:
    """(set_bits, total_bits, fill_factor) — the health probe: predicted
    FPR is fill_factor^k; past ~0.5 fill the filter needs more bits."""
    set_bits = F.aggregate(
        F.transform(F.col("bloom"), lambda w: F.bit_count(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    total = F.size("bloom") * 64
    return bloom.select(
        set_bits.alias("set_bits"),
        total.cast("bigint").alias("total_bits"),
        F.round(set_bits.cast("double") / total.cast("double"), 6).alias("fill_factor"),
    )
