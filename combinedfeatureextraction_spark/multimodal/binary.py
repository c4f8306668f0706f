"""Multimodal (image/audio/video) column plumbing.

The reference's payload model — a gigapixel raster cropped per element and
processed as numpy inside the worker (FeatureExtractor.py:290-316) — maps
to opaque ``binary`` columns with typed metadata structs, processed in
Arrow batches via ``mapInPandas``. The Spark-side plumbing here (schemas,
batch shape, partition sizing) is real and tested. The codec layer
(round 3) decodes UNCOMPRESSED formats natively in pure numpy — binary
netpbm (P5/P6), RIFF/WAVE PCM (8/16-bit), uncompressed 24-bit BMP —
dispatched by magic bytes and verified by round-trip tests plus the
``media_decode`` analytic oracle. Compressed formats (JPEG/PNG/MP4/…)
still raise NotImplementedError at the same seam: those genuinely need
cv2/PIL/librosa, which are not in this container. ``decode=fake``
remains for byte-domain tests.

Scale notes: binary payloads make rows wide — mapInPandas batches are
bounded by spark.sql.execution.arrow.maxRecordsPerBatch, and the metadata
struct lets filters prune (e.g. width>0, media_type='image') BEFORE the
payload bytes cross the Arrow boundary (column pruning keeps the bytes
JVM-side for rows the filter drops).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_std", T.DoubleType(), False),
        T.StructField("fake_embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_ppm(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Pure-numpy decoder for binary netpbm images — P6 (RGB) and P5
    (gray). Whitespace/comment-tolerant header per the netpbm spec, then
    raw samples. Returns (flat float64 samples, width, height,
    channels). No external codec library required."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if payload[:2] == b"P6" else 1
    # header tokens: magic, width, height, maxval — separated by
    # whitespace, with '#'-to-EOL comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw data
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    n = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return data.astype(np.float64), w, h, channels


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-numpy decoder for RIFF/WAVE PCM (8- or 16-bit). Walks the
    chunk list (fmt / data may be preceded by LIST etc.). Returns
    (flat float64 samples, sample_rate, channels)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError("only PCM WAV supported")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return samples, sample_rate, channels


def decode_bmp(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Pure-numpy decoder for uncompressed 24-bit BMP: BITMAPINFOHEADER,
    4-byte-padded bottom-up BGR rows. Returns (flat float64 samples in
    row-major top-down RGB order, width, height, channels)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs(h), offset=off
    ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # positive height = bottom-up storage
        rows = rows[::-1]
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb.astype(np.float64).ravel(), w, abs(h), 3


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real codec dispatch by magic bytes — pure numpy, no external
    libraries: binary netpbm (P5/P6), RIFF/WAVE PCM, uncompressed 24-bit
    BMP. Compressed formats (JPEG/PNG/MP4/...) still raise at this seam —
    that part genuinely needs cv2/PIL/librosa."""
    if not payload:
        return np.zeros(0)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)[0]
    if payload[:4] == b"RIFF":
        return decode_wav(payload)[0]
    if payload[:2] == b"BM":
        return decode_bmp(payload)[0]
    raise NotImplementedError(
        "compressed codec (JPEG/PNG/MP4/...) requires cv2/PIL/librosa — "
        "uncompressed netpbm/WAV-PCM/BMP decode natively here"
    )


def _decode_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: interpret bytes as uint8 'pixels'."""
    return np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)


def extract_media_features(
    media: DataFrame,
    decode: str = "fake",
    embed_dim: int = 8,
) -> DataFrame:
    """Decode → feature-extract per media row, Arrow-batched. Vectorized
    within batch (numpy over the batch's payloads); zero per-row Python at
    the Spark level."""
    decoder = _decode_fake if decode == "fake" else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            arrs = [decoder(p, t) for p, t in zip(b["payload"], b["media_type"])]
            out = pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "media_type": b["media_type"].values,
                    "byte_len": [len(a) for a in arrs],
                    "byte_mean": [float(a.mean()) for a in arrs],
                    "byte_std": [float(a.std()) for a in arrs],
                    "fake_embedding": [
                        # deterministic byte-derived sketch: per-stripe means
                        np.array(
                            [
                                float(s.mean()) if len(s) else 0.0
                                for s in np.array_split(a, embed_dim)
                            ],
                            dtype=np.float32,
                        )
                        for a in arrs
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODED_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_mean", T.DoubleType(), True),
        T.StructField("sample_std", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def extract_decoded_features(media: DataFrame) -> DataFrame:
    """REAL-decode path: netpbm/WAV-PCM/BMP payloads → decoded-domain
    features (pixel/sample stats + decoded dimensions), Arrow-batched in
    mapInPandas — same plumbing shape as extract_media_features but the
    values come from the DECODED samples, not the raw bytes, so header
    parsing, dimension math, row padding and byte order are all on the
    verified path. Audio rows report n_samples with NULL width/height."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mtype, payload in zip(
                b["media_id"], b["media_type"], b["payload"]
            ):
                w = h = ch = None
                if payload[:2] in (b"P6", b"P5"):
                    arr, w, h, ch = decode_ppm(payload)
                elif payload[:4] == b"RIFF":
                    arr, _, ch = decode_wav(payload)
                elif payload[:2] == b"BM":
                    arr, w, h, ch = decode_bmp(payload)
                else:
                    arr = _decode_real(payload, mtype)  # raises: documented seam
                rows.append(
                    (
                        mid,
                        mtype,
                        len(arr),
                        float(arr.mean()) if len(arr) else None,
                        float(arr.std()) if len(arr) else None,
                        w,
                        h,
                        ch,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=DECODED_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands metadata into the
    (media_id, frame_idx) work-list WITHOUT touching payload bytes —
    the decode of selected frames is the stubbed step above."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
