"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas functions over ``mapInPandas``. The decode itself is
STUBBED in this container (no image/audio libs): ``decode_mode='strict'``
raises ``NotImplementedError`` at the decode site, ``'fake'`` produces a
deterministic synthetic decode so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, content_col: str,
                          media_type: str = "image") -> DataFrame:
    """Wrap an existing column as an opaque binary payload with metadata —
    the ingest shape for multimodal rows."""
    blob = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        blob.alias("payload"),
        F.struct(
            F.octet_length(blob).cast("int").alias("n_bytes"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic synthetic 'decode': digest-seeded feature vector.
    Replace with a real image/audio decoder where the libs exist."""
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16,
                     decode_mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps whole Arrow batches in one Python call — the
    shape a real CPU/GPU decode pipeline needs (batched, partition-local,
    no shuffle)."""
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this container; use decode_mode='fake'"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _validate_mode(decode_mode: str) -> None:
    """Driver-side, eager: a typo'd mode must fail at call time, not as a
    serialized executor exception at action time (or never, on empty
    input)."""
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")


def _require_decoder(decode_mode: str) -> None:
    _validate_mode(decode_mode)
    if decode_mode == "strict":
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this container; use decode_mode='fake'"
        )


def resize_images(
    media: DataFrame, width: int, height: int, decode_mode: str = "fake"
) -> DataFrame:
    """Arrow-batched resize: binary in → binary out with updated metadata.

    Fake mode emits a deterministic digest-seeded ``width*height`` byte
    payload (so the plumbing — schema, meta update, batch shape — is real
    and replay-stable); a real pipeline swaps the kernel for PIL/libvips.
    Partition-local, no shuffle."""
    _validate_mode(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _require_decoder(decode_mode)
            out_payloads = []
            for p in pdf["payload"]:
                digest = hashlib.md5(bytes(p)).digest()
                seed = int.from_bytes(digest[:8], "big") % (2**32)
                rng = np.random.default_rng(seed)
                out_payloads.append(
                    rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": out_payloads,
                    "meta": [
                        {
                            "n_bytes": width * height,
                            "format": "raw-resized",
                            "width": width,
                            "height": height,
                        }
                        for _ in out_payloads
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, frame_interval_ms: int = 1000, decode_mode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (the exploding
    shape a video pipeline needs — done inside the Arrow batch, so the
    blow-up never passes through a Python-row boundary).

    Fake mode derives a deterministic frame count from the payload digest
    and digest-chains the frame payloads; a real pipeline swaps the kernel
    for pyav/ffmpeg."""
    _validate_mode(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _require_decoder(decode_mode)
            ids, nos, tss, payloads = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(p)).digest()
                n_frames = digest[0] % 6 + 2  # deterministic 2..7
                frame = digest
                for i in range(n_frames):
                    frame = hashlib.md5(frame).digest()
                    ids.append(mid)
                    nos.append(i)
                    tss.append(i * frame_interval_ms)
                    payloads.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
