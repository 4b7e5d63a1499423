"""Token-window text chunking for training-data preparation.

Long documents are cut into fixed-size token windows with a stride
(overlap = size - stride) before tokenization/packing. Everything is
in-row array arithmetic — ``split`` once, then ``transform`` over a
``sequence`` of chunk indices slicing the token array — so chunking is
a zero-shuffle projection; the only row-count change is the final
``posexplode``. The slice clamps at the document end, so the last
chunk may be short but no token is dropped and no chunk is empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_text(
    docs: DataFrame,
    *,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, chunk): (doc_id, chunk_idx, chunk). ``size``
    tokens per chunk, windows advancing by ``stride`` (stride < size
    gives overlapping chunks). n_chunks = 1 + ceil(max(0, n-size)/stride)
    — exact integer arithmetic, so the count is oracle-replayable."""
    if not (0 < stride <= size):
        raise ValueError("require 0 < stride <= size")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - size, F.lit(0)) + stride - 1) / F.lit(stride)
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " "),
    )
    # an empty/NULL text would otherwise emit ONE empty chunk
    # (split('') = ['']), breaking the documented no-empty-chunks
    # guarantee for consumers that divide by token counts (r11 review)
    chunks = F.when(
        F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0, chunks
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def _exclusive_prefix_sums(
    df: DataFrame, order_col: str, len_col: str, n_parts: int | None = None
) -> DataFrame:
    """Exclusive running sum of ``len_col`` in global ``order_col``
    order WITHOUT a single-partition window: range-repartition on the
    order column, partition-local running sums, then add per-partition
    totals collected as O(#partitions) scalars — the same two-pass
    shape as the dense surrogate re-key (operators/scd.py two_pass).
    Appends ``__off`` (tokens before this row)."""
    if n_parts is None:
        # scale with the cluster, same floor as operators/scd.py two_pass
        n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    # Pin the (narrow: order_col + len_col) input BEFORE the range
    # shuffle: repartitionByRange's boundary-sampling job executes the
    # whole upstream plan once more, so an expensive upstream (e.g.
    # pack_sequences' size(split(text)) over the corpus) was evaluated
    # for the sample pass AND the shuffle pass — measured 3x the
    # corpus-scan cost at a 550k-doc/27M-token 100x replication (r13;
    # ~47s -> ~16s). Same pattern operators/scd.py two_pass documents;
    # localCheckpoint blocks free via GC, and the frame is 2 ints/doc.
    df = df.localCheckpoint(eager=True)
    local = (
        df.repartitionByRange(n_parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__local_off",
            F.sum(len_col).over(
                Window.partitionBy("__pid")
                .orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        # localCheckpoint, not a bare persist: nothing ever released
        # the cached partitions, leaking executor storage on every
        # pack_sequences call (r11 review); checkpoint blocks free via
        # the ContextCleaner once the plan is GC'd. Eager is required
        # anyway — the totals collect below materializes it.
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(len_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = local.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, 0)], "__pid int, __poff long"
    )
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(
            "__off", F.coalesce(F.col("__local_off"), F.lit(0)) + F.col("__poff")
        )
        .drop("__pid", "__local_off", "__poff")
    )


def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing manifest (the GPT-style
    pretraining layout): documents are laid end-to-end in ``id_col``
    order and cut into fixed ``seq_len``-token sequences; documents
    straddle sequence boundaries. Returns one row per (sequence, doc
    span): (seq_id, doc_id, doc_slice_start, slice_len, pos_in_seq) —
    the manifest a loader uses to assemble token buffers without ever
    materializing the concatenated corpus.

    The global token offset per document comes from the two-pass
    prefix-sum (no single-partition window); everything downstream is
    in-row integer arithmetic + one explode over the sequences a doc
    spans — exact, so a SQL window-cumsum oracle replays it."""
    if seq_len < 1:
        # sequence(first, last) silently steps DOWNWARD when first >
        # last, so a negative seq_len yields garbage manifests instead
        # of an error (r12 review — degeneracy class)
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    toks = F.split(F.col(text_col), " ")
    with_n = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("__n")
    ).where(F.col("__n") > 0)
    with_off = _exclusive_prefix_sums(with_n, "doc_id", "__n")

    off, n = F.col("__off"), F.col("__n")
    first = F.floor(off / seq_len).cast("long")
    last = F.floor((off + n - 1) / seq_len).cast("long")
    out = with_off.select(
        "doc_id",
        off.alias("__off"),
        n.alias("__n"),
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    seq_end = seq_start + seq_len
    doc_end = F.col("__off") + F.col("__n")
    return out.select(
        "seq_id",
        "doc_id",
        F.greatest(seq_start - F.col("__off"), F.lit(0)).alias("doc_slice_start"),
        (F.least(doc_end, seq_end) - F.greatest(F.col("__off"), seq_start)).alias(
            "slice_len"
        ),
        F.greatest(F.col("__off") - seq_start, F.lit(0)).alias("pos_in_seq"),
    )
