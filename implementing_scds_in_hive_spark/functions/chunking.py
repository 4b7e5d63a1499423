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

from pyspark.sql import DataFrame
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
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
