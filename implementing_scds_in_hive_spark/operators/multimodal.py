"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct alongside. The Spark-side machinery — schema, Arrow
batch shape, ``mapInPandas`` partition-parallel processing — is real and
tested; the actual media decode is STUBBED (the decode libraries are not
in this container): ``decode_image_stub`` raises ``NotImplementedError``
while ``extract_features`` computes deterministic byte-level features so
the full pipeline is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from implementing_scds_in_hive_spark.sources.registry import spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("head_byte", T.IntegerType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the opaque
    payload + typed metadata. At scale the payload comes from the lake
    (parquet BINARY / object-store refs) — the plumbing is identical."""
    payload = F.encode(F.col(text_col), "utf-8")
    # cap the fan-out: each partition costs a Python worker fork + Arrow
    # init on first use; 32 simultaneous cold workers measured slower
    # than 1 for small inputs. 8 balances startup vs parallelism; large
    # inputs arrive already partitioned and skip the repartition.
    return spread(docs, min_partitions=8).select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


# Magic-byte signatures (hex of the payload's first bytes → MIME).
# Ordered longest-prefix-first so PNG's 8-byte signature wins before
# any shorter pattern could.
MAGIC_PREFIXES = (
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("52494646", "audio/riff"),
)


def detect_modality(
    media: DataFrame, payload_col: str = "payload", out_col: str = "modality"
) -> DataFrame:
    """Classify each binary payload by its magic bytes — the dispatch
    step that routes rows to per-modality decoders (image resize, audio
    resample, frame sampling) without trusting upstream metadata. Pure
    in-row expression on the first 8 bytes: zero shuffle, and at scale
    the routing filter (`modality = 'image/png'`) prunes before any
    Python decoder sees a byte."""
    hexp = F.hex(F.substring(F.col(payload_col), 1, 8))
    expr = None
    for prefix, mime in MAGIC_PREFIXES:
        cond = hexp.startswith(prefix)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    return media.withColumn(out_col, expr.otherwise("application/octet-stream"))


def decode_image_stub(payload: bytes) -> object:
    """Placeholder for the real media decode (PIL/torchvision/ffmpeg are
    not installed in this environment)."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; wire PIL/torchaudio here in a full deployment"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction over the binary column via
    ``mapInPandas`` (Arrow-batched; one python worker per partition —
    the plan a real decoder would use, with the decode swapped in)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame,
    *,
    frame_bytes: int,
    stride: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over a binary media column: treat the payload as
    consecutive fixed-size frame records and emit every ``stride``-th
    frame (the "1 fps preview" step of a video pipeline). A real
    deployment swaps the fixed-size slicing for a container demuxer
    (ffmpeg) inside the same ``mapInPandas`` body — the Spark-side
    contract (schema, Arrow batch shape, per-partition Python worker,
    routing via detect_modality upstream) is exactly what ships.

    Emitted features are deterministic byte-level stand-ins (length +
    md5 per frame), so the full path is value-verifiable cross-engine
    without media libraries.
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError("frame_bytes and stride must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, md5s = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(did)
                    idxs.append(i)
                    lens.append(len(fr))
                    md5s.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
