"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas functions over ``mapInPandas``. The decode itself is
STUBBED in this container (no image/audio libs): ``decode_mode='strict'``
raises ``NotImplementedError`` at the decode site, ``'fake'`` produces a
deterministic synthetic decode so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested end-to-end.

**Pluggable kernel seam**: every operator also accepts ``kernel=`` — a
batch-level callable that replaces the stub without touching the Spark
plumbing. A real PIL/libvips/pyav decoder drops in as::

    extract_features(media, dim=512,
                     kernel=lambda payloads: clip_model.encode(payloads))

The kernel always receives the WHOLE Arrow batch's payloads as
``list[bytes]`` (the shape a vectorized/GPU decode wants) and returns one
output per payload; per-operator contracts are on each function. The
kernel must be cloudpickle-serializable (top-level function or closure
over picklable state) — executors import it, the driver never runs it.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Sequence

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


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decode_mode: str = "fake",
    kernel: Callable[[list[bytes]], Sequence[Sequence[float]]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps whole Arrow batches in one Python call — the
    shape a real CPU/GPU decode pipeline needs (batched, partition-local,
    no shuffle).

    ``kernel(payloads) -> one length-``dim`` float sequence per payload``
    replaces the stub decode (``decode_mode`` is then ignored)."""
    if kernel is None:
        _validate_mode(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if kernel is not None:
                feats = [list(map(float, f)) for f in kernel(payloads)]
                if len(feats) != len(payloads):
                    raise ValueError(
                        f"kernel returned {len(feats)} outputs for "
                        f"{len(payloads)} payloads"
                    )
            else:
                _require_decoder(decode_mode)
                feats = [_fake_decode(p, dim).tolist() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) for p in payloads],
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
    media: DataFrame,
    width: int,
    height: int,
    decode_mode: str = "fake",
    kernel: Callable[[list[bytes], int, int], list[bytes]] | None = None,
) -> DataFrame:
    """Arrow-batched resize: binary in → binary out with updated metadata.

    Fake mode emits a deterministic digest-seeded ``width*height`` byte
    payload (so the plumbing — schema, meta update, batch shape — is real
    and replay-stable); ``kernel(payloads, width, height) -> one resized
    bytes per payload`` drops in a real PIL/libvips resize without
    touching the plumbing (``decode_mode`` is then ignored).
    Partition-local, no shuffle."""
    if kernel is None:
        _validate_mode(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if kernel is not None:
                out_payloads = [bytes(b) for b in kernel(payloads, width, height)]
                if len(out_payloads) != len(payloads):
                    raise ValueError(
                        f"kernel returned {len(out_payloads)} outputs for "
                        f"{len(payloads)} payloads"
                    )
            else:
                _require_decoder(decode_mode)
                out_payloads = []
                for p in payloads:
                    digest = hashlib.md5(p).digest()
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
                            # a real kernel's encoded output (e.g. JPEG)
                            # is not width*height bytes — record reality
                            "n_bytes": len(b),
                            "format": "raw-resized",
                            "width": width,
                            "height": height,
                        }
                        for b in out_payloads
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_interval_ms: int = 1000,
    decode_mode: str = "fake",
    kernel: Callable[[list[bytes], int], list[list[bytes]]] | None = None,
) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (the exploding
    shape a video pipeline needs — done inside the Arrow batch, so the
    blow-up never passes through a Python-row boundary).

    Fake mode derives a deterministic frame count from the payload digest
    and digest-chains the frame payloads; ``kernel(payloads,
    frame_interval_ms) -> one list-of-frame-bytes per payload`` drops in a
    real pyav/ffmpeg sampler without touching the plumbing
    (``decode_mode`` is then ignored)."""
    if kernel is None:
        _validate_mode(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(p) for p in pdf["payload"]]
            if kernel is not None:
                per_media = kernel(raw, frame_interval_ms)
                if len(per_media) != len(raw):
                    raise ValueError(
                        f"kernel returned {len(per_media)} outputs for "
                        f"{len(raw)} payloads"
                    )
            else:
                _require_decoder(decode_mode)
                per_media = []
                for p in raw:
                    digest = hashlib.md5(p).digest()
                    n_frames = digest[0] % 6 + 2  # deterministic 2..7
                    frame, frames = digest, []
                    for _ in range(n_frames):
                        frame = hashlib.md5(frame).digest()
                        frames.append(frame)
                    per_media.append(frames)
            ids, nos, tss, payloads = [], [], [], []
            for mid, frames in zip(pdf["media_id"], per_media):
                for i, fb in enumerate(frames):
                    ids.append(mid)
                    nos.append(i)
                    tss.append(i * frame_interval_ms)
                    payloads.append(bytes(fb))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
