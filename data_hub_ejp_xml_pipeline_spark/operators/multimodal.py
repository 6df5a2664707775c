"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas functions over ``mapInPandas``. Two decode modes:

* ``decode_mode='strict'`` — REAL byte-level decode via the
  dependency-free codecs in :mod:`.codecs` (24-bit BMP, P6 PPM, 16-bit
  PCM WAV); payloads in any other format raise ``NotImplementedError``
  at the decode site (a PIL/pyav ``kernel=`` handles them on a cluster
  with the libraries).
* ``decode_mode='fake'`` — deterministic digest-seeded synthetic decode,
  a TEST DOUBLE for exercising the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape) with arbitrary bytes.

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
            elif decode_mode == "strict":
                from data_hub_ejp_xml_pipeline_spark.operators import codecs

                feats = codecs.feature_any_kernel(payloads, dim)
            else:
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


def _sniff_or(payload: bytes, fallback: str) -> str:
    from data_hub_ejp_xml_pipeline_spark.operators import codecs

    fmt = codecs.sniff_format(payload)
    return fmt if fmt != "unknown" else fallback


def _validate_mode(decode_mode: str) -> None:
    """Driver-side, eager: a typo'd mode must fail at call time, not as a
    serialized executor exception at action time (or never, on empty
    input)."""
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),     # null for audio
        T.StructField("height", T.IntegerType()),    # null for audio
        T.StructField("n_bytes", T.IntegerType()),   # encoded payload size
        T.StructField("n_values", T.IntegerType()),  # decoded samples/channels
        T.StructField("sum_values", T.LongType()),   # checksum of decoded data
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode of every payload (no fake path): per-media dimensions +
    content checksum, the verification shape for a decode stage. Images
    report (width, height, n_values = w*h*3, sum_values = Σ RGB bytes);
    WAV reports (n_values = frames*channels, sum_values = Σ |samples|).
    Unsupported bytes raise — silent skips would hide corrupt payloads.
    Arrow-batched ``mapInPandas``, partition-local, no shuffle."""
    from data_hub_ejp_xml_pipeline_spark.operators import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in DECODE_STATS_SCHEMA}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                fmt = codecs.sniff_format(payload)
                if fmt == "wav":
                    _rate, samples = codecs.decode_wav(payload)
                    w = h = None
                    n_vals = int(samples.size)
                    total = int(np.abs(samples.astype(np.int64)).sum())
                else:
                    img = codecs.decode_image(payload)  # raises on unknown
                    h_, w_, _ = img.shape
                    w, h = int(w_), int(h_)
                    n_vals = int(img.size)
                    total = int(img.astype(np.int64).sum())
                rows["media_id"].append(mid)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(payload))
                rows["n_values"].append(n_vals)
                rows["sum_values"].append(total)
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


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
            elif decode_mode == "strict":
                from data_hub_ejp_xml_pipeline_spark.operators import codecs

                out_payloads = codecs.image_resize_kernel(payloads, width, height)
            else:
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
                            "format": _sniff_or(b, "raw-resized"),
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
            elif decode_mode == "strict":
                from data_hub_ejp_xml_pipeline_spark.operators import codecs

                per_media = codecs.wav_frame_kernel(raw, frame_interval_ms)
            else:
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
