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
    ("5036", "image/x-portable-pixmap"),  # "P6" — decodes for real
    ("424D", "image/bmp"),                # "BM" — decodes for real
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
    """Placeholder for COMPRESSED media decode (PIL/torchvision/ffmpeg
    are not installed in this environment). Uncompressed formats decode
    for real: see :func:`decode_ppm` / :func:`decode_bmp` /
    :func:`decode_image`."""
    raise NotImplementedError(
        "compressed media decode requires an image/audio library not present "
        "in this container; wire PIL/torchaudio here in a full deployment "
        "(uncompressed PPM/BMP decode IS implemented: decode_image)"
    )


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Pure-numpy decode of binary PPM (P6): header ``P6 <w> <h>
    <maxval>`` as whitespace-separated ASCII tokens with ``#`` comments,
    one whitespace byte, then ``h*w*3`` raw RGB samples (maxval <= 255).
    Returns uint8 array of shape (h, w, 3). Raises ValueError on any
    malformed header/truncated payload — the corrupt-row path the
    feature extractor must survive."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated ppm header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad ppm header byte {c!r}")
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        raise ValueError(f"bad ppm dims/maxval {w}x{h}/{maxval}")
    # one whitespace byte separates header from raster; tolerate the
    # common nonconformant CRLF (else its \n would silently shift every
    # pixel by one byte while still passing the length check)
    sep = payload[pos : pos + 1]
    if not sep.isspace():
        raise ValueError(f"bad ppm header terminator {sep!r}")
    pos += 1
    if sep == b"\r" and payload[pos : pos + 1] == b"\n":
        pos += 1
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated ppm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Pure-numpy decode of the uncompressed 24-bit BMP everyone means
    by ".bmp": BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, rows stored
    bottom-up and padded to 4 bytes, samples ordered BGR. Returns uint8
    (h, w, 3) in RGB order. Raises ValueError on anything else."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP / truncated file header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if header_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size {header_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported, got {bpp}bpp/{compression}")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    flipped = h > 0  # negative height = top-down rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = payload[data_offset : data_offset + stride * h]
    if len(raster) != stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


def decode_image(payload: bytes) -> "np.ndarray":
    """Magic-byte dispatch to a real decoder; compressed formats fall
    through to the stub (documented sandbox limitation)."""
    b = bytes(payload)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    return decode_image_stub(b)


def extract_features(media: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction over the binary column via
    ``mapInPandas`` (Arrow-batched; one python worker per partition —
    the plan a real decoder would use, with the decode swapped in)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # NULL payloads (nullable per MEDIA_SCHEMA) must not kill
            # the task — len(None)/bytes(None) raise TypeError, the
            # one failure mode the survive-bad-rows contract promised
            # to absorb (r11 review)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pd.array(
                        [len(b) if b is not None else None for b in payloads],
                        dtype="Int64",
                    ),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "head_byte": pd.array(
                        [
                            (b[0] if len(b) else -1) if b is not None else None
                            for b in payloads
                        ],
                        dtype="Int32",
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _decode_stats_columns(payloads) -> dict:
    """Decode loop shared by :func:`image_stats` and
    :func:`extract_features_with_decode`: per-payload (width, height,
    channels, sum_r, sum_g, sum_b, decode_ok) lists, failures as NULL
    rows rather than exceptions."""
    out = {k: [] for k in ("width", "height", "channels", "sum_r", "sum_g", "sum_b", "decode_ok")}
    for payload in payloads:
        try:
            if payload is None:  # NULL payload = undecodable, not fatal
                raise ValueError("null payload")
            img = decode_image(bytes(payload))
            sums = img.reshape(-1, img.shape[2]).sum(axis=0, dtype="int64")
            out["width"].append(img.shape[1])
            out["height"].append(img.shape[0])
            out["channels"].append(img.shape[2])
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
            out["decode_ok"].append(True)
        except (ValueError, NotImplementedError):
            for k in ("width", "height", "channels", "sum_r", "sum_g", "sum_b"):
                out[k].append(None)
            out["decode_ok"].append(False)
    return out


def _decode_stats_frame(out: dict) -> dict:
    return {
        "width": pd.Series(out["width"], dtype="Int32"),
        "height": pd.Series(out["height"], dtype="Int32"),
        "channels": pd.Series(out["channels"], dtype="Int32"),
        "sum_r": pd.Series(out["sum_r"], dtype="Int64"),
        "sum_g": pd.Series(out["sum_g"], dtype="Int64"),
        "sum_b": pd.Series(out["sum_b"], dtype="Int64"),
        "decode_ok": pd.Series(out["decode_ok"], dtype="bool"),
    }


def image_stats(
    media: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over the binary column: parse each payload with
    :func:`decode_image` (numpy PPM/BMP) inside the same Arrow-batched
    ``mapInPandas`` plan as :func:`extract_features`, emitting the
    dimensions and per-channel sample sums. Channel sums are INTEGERS so
    a cross-engine oracle can replay them exactly (means = sum/(w*h) are
    one division away). Rows that fail to decode — corrupt headers,
    truncated rasters, formats only the stub handles — come back with
    NULL stats and ``decode_ok = false`` instead of killing the job: at
    100 TB a decoder that dies on the corpus's one bad byte is useless."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = _decode_stats_columns(pdf[payload_col])
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), **_decode_stats_frame(stats)}
            )

    return media.mapInPandas(batches, IMAGE_STATS_SCHEMA)


FEATURES_WITH_DECODE_SCHEMA = T.StructType(
    list(FEATURE_SCHEMA.fields) + list(IMAGE_STATS_SCHEMA.fields)[1:]
)


def extract_features_with_decode(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    image_col: str = "image_payload",
) -> DataFrame:
    """One Arrow pass computing BOTH the byte-level payload features
    (:func:`extract_features`) and the real decode stats
    (:func:`image_stats` over ``image_col``) — a multimodal row commonly
    carries several media columns, and one Python worker pass beats two
    passes plus a join."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            stats = _decode_stats_columns(pdf[image_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pd.array(
                        [len(b) if b is not None else None for b in payloads],
                        dtype="Int64",
                    ),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "head_byte": pd.array(
                        [
                            (b[0] if len(b) else -1) if b is not None else None
                            for b in payloads
                        ],
                        dtype="Int32",
                    ),
                    **_decode_stats_frame(stats),
                }
            )

    return media.mapInPandas(batches, FEATURES_WITH_DECODE_SCHEMA)


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
