"""Dependency-free media codecs: real byte-level decode/encode for the
multimodal operators.

The container ships no image/audio libraries, but three formats are simple
enough to implement faithfully from their public specs with numpy alone:

* **BMP** — 24-bit uncompressed (BITMAPFILEHEADER + BITMAPINFOHEADER,
  ``BI_RGB``, bottom-up rows, 4-byte row padding);
* **PPM (P6)** — binary NetPBM, maxval 255;
* **WAV** — RIFF/WAVE, 16-bit PCM ``fmt `` + ``data`` chunks.

These are REAL codecs — ``decode_bmp(encode_bmp(a)) == a`` for any uint8
HxWx3 array, and they reject malformed headers — so the multimodal
operators' ``decode_mode='strict'`` path exercises genuine byte parsing,
not a digest fake. Heavier formats (JPEG, H.264, …) still raise
``NotImplementedError`` through the same seam; a PIL/pyav kernel drops in
via ``kernel=`` on a cluster that has the libraries.

The vectorized kernels at the bottom are the pluggable ``kernel=``
callables for :mod:`.multimodal` — batch-in/batch-out, numpy-only, and
cloudpickle-serializable (top-level functions).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ BMP

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 array of shape (h, w, 3) (RGB) → 24-bit BMP bytes."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = a[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    offset = _BMP_FILE_HEADER.size + len(info)
    head = _BMP_FILE_HEADER.pack(b"BM", offset + len(body), 0, 0, offset)
    return head + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → uint8 (h, w, 3) RGB array."""
    if len(data) < _BMP_FILE_HEADER.size + 40 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    magic, _size, _r1, _r2, offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    (hdr_size, w, h, planes, bpp, compression, _img_size, _xppm, _yppm,
     _used, _important) = _BMP_INFO_HEADER.unpack_from(data, _BMP_FILE_HEADER.size)
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if w <= 0 or h == 0:
        raise ValueError(f"non-positive BMP dimensions ({w}x{h})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    if offset + row_bytes * h > len(data):
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ------------------------------------------------------------------ PPM

def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB array → binary P6 PPM bytes."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → uint8 (h, w, 3) RGB array. Handles comment
    lines and arbitrary whitespace in the header, per the NetPBM spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"non-positive PPM dimensions ({w}x{h})")
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    if pos + w * h * 3 > len(data):
        raise ValueError("truncated PPM payload")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 array of shape (n,) or (n, channels) → 16-bit PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()  # interleaved little-endian frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """16-bit PCM WAV bytes → (sample_rate, int16 array (n, channels)).
    Walks the RIFF chunk list (skipping LIST/fact/etc), so files from
    other encoders parse too."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            pcm = audio_fmt == 1
        elif cid == b"data":
            frames = data[body : body + clen]
        pos = body + clen + (clen & 1)  # chunks pad to even offsets
    if rate is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    if not pcm or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt pcm={pcm}, bits={bits})")
    if not channels:
        raise ValueError("WAV fmt declares 0 channels")
    n = len(frames) // (2 * channels)
    arr = np.frombuffer(frames, dtype="<i2", count=n * channels).reshape(n, channels)
    return rate, arr.copy()


# ------------------------------------------------- format sniff + dispatch

def sniff_format(payload: bytes) -> str:
    """'bmp' | 'ppm' | 'wav' | 'unknown' from magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_image(payload: bytes) -> np.ndarray:
    """Decode any supported image payload to uint8 (h, w, 3) RGB."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    raise NotImplementedError(
        f"no built-in decoder for this payload (sniffed {fmt!r}); "
        "supported: 24-bit BMP, P6 PPM, 16-bit PCM WAV — pass kernel= "
        "with a PIL/pyav decoder for other formats"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — index arithmetic
    only, bit-exact across platforms (no float filtering)."""
    h, w, _ = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys][:, xs]


# -------------------------------------------- multimodal kernel callables
# Batch-level callables matching the kernel= contracts in .multimodal —
# top-level functions, so cloudpickle ships them by reference-free value.

def image_feature_kernel(payloads: list[bytes], dim: int = 16) -> list[list[float]]:
    """Real decode → dim-length feature: mean gray value over ``dim``
    equal pixel strips in scan order (deterministic, resolution-free)."""
    out = []
    for p in payloads:
        img = decode_image(p)
        gray = img.astype(np.float32).mean(axis=2).ravel()
        # pad so the strips are equal length, then strip means
        n = int(np.ceil(len(gray) / dim)) * dim
        padded = np.pad(gray, (0, n - len(gray)), mode="edge")
        out.append([float(x) for x in padded.reshape(dim, -1).mean(axis=1)])
    return out


def feature_any_kernel(payloads: list[bytes], dim: int = 16) -> list[list[float]]:
    """Real decode → features for ANY supported payload: images use gray
    strip means (:func:`image_feature_kernel`); WAV uses mean |amplitude|
    over ``dim`` equal sample strips. Unknown bytes raise."""
    out = []
    for p in payloads:
        if sniff_format(p) == "wav":
            _rate, samples = decode_wav(p)
            mono = np.abs(samples.astype(np.float32)).mean(axis=1)
            n = max(int(np.ceil(len(mono) / dim)) * dim, dim)
            padded = np.pad(mono, (0, n - len(mono)), mode="edge")
            out.append([float(x) for x in padded.reshape(dim, -1).mean(axis=1)])
        else:
            out.extend(image_feature_kernel([p], dim))
    return out


def image_resize_kernel(payloads: list[bytes], width: int, height: int) -> list[bytes]:
    """Real decode → nearest-neighbor resize → re-encode in the SAME
    container format the payload arrived in."""
    out = []
    for p in payloads:
        fmt = sniff_format(p)
        img = decode_image(p)
        resized = resize_nearest(img, width, height)
        out.append(encode_bmp(resized) if fmt == "bmp" else encode_ppm(resized))
    return out


def wav_frame_kernel(payloads: list[bytes], frame_interval_ms: int) -> list[list[bytes]]:
    """Real WAV decode → fixed-interval PCM chunks, each re-encoded as a
    standalone WAV (the audio analog of video frame sampling)."""
    out = []
    for p in payloads:
        if sniff_format(p) != "wav":
            raise NotImplementedError(
                "frame sampling has a built-in decoder only for 16-bit PCM "
                "WAV; pass kernel= with a pyav/ffmpeg sampler for video"
            )
        rate, samples = decode_wav(p)
        per = max(1, (rate * frame_interval_ms) // 1000)
        chunks = [
            encode_wav(samples[i : i + per], rate)
            for i in range(0, len(samples), per)
        ]
        out.append(chunks)
    return out
