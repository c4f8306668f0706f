"""Multimodal (image/audio/video) column plumbing.

The reference's payload model — a gigapixel raster cropped per element and
processed as numpy inside the worker (FeatureExtractor.py:290-316) — maps
to opaque ``binary`` columns with typed metadata structs, processed in
Arrow batches via ``mapInPandas``. The Spark-side plumbing here (schemas,
batch shape, partition sizing) is real and tested; the codec step is
STUBBED because the decode libraries (cv2/PIL/librosa) are not in this
container: ``decode=fake`` produces a deterministic byte-derived feature
so tests are exact, ``decode=real`` raises NotImplementedError at the
exact seam where a codec plugs in.

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


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "real decode requires cv2/PIL/librosa (not in this container); "
        "plug the codec in here — the surrounding Spark plumbing is final"
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
