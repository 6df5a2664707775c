"""Dependency-free media codecs: real byte-level round trips, spec
conformance (padding, BGR, bottom-up rows, RIFF chunk walk), and the
strict decode path through the Spark operators."""

from __future__ import annotations

import numpy as np
import pytest

from data_hub_ejp_xml_pipeline_spark.operators import codecs, multimodal


@pytest.mark.parametrize("shape", [(1, 1), (3, 4), (7, 5), (16, 13)])
def test_bmp_ppm_round_trip(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(a)), a)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(a)), a)


def test_bmp_layout_is_spec_conformant():
    """Pin the on-disk layout (not just the round trip): 54-byte header,
    rows bottom-up, BGR order, 4-byte row padding."""
    img = np.zeros((2, 1, 3), dtype=np.uint8)
    img[0] = [255, 0, 0]   # top row red
    img[1] = [0, 0, 255]   # bottom row blue
    raw = codecs.encode_bmp(img)
    assert raw[:2] == b"BM" and len(raw) == 54 + 2 * 4  # 3 bytes + 1 pad
    # first stored row is the BOTTOM row, as BGR: blue=(0,0,255) → FF 00 00
    assert raw[54:57] == bytes([255, 0, 0])
    assert raw[58:61] == bytes([0, 0, 255])  # then the red top row


def test_wav_round_trip_and_chunk_walk():
    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32767, (300, 2), dtype=np.int16)
    raw = codecs.encode_wav(s, 22050)
    rate, back = codecs.decode_wav(raw)
    assert rate == 22050 and np.array_equal(back, s)
    # unknown chunks between fmt and data must be skipped (spec: readers
    # ignore chunks they don't know), including odd-length ones (padded)
    fmt_end = raw.index(b"data")
    junk = b"LIST\x05\x00\x00\x00abcde\x00"
    spliced = raw[:fmt_end] + junk + raw[fmt_end:]
    rate2, back2 = codecs.decode_wav(spliced)
    assert rate2 == 22050 and np.array_equal(back2, s)


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"XX not a bmp")
    with pytest.raises(ValueError):
        codecs.decode_bmp(codecs.encode_bmp(np.zeros((4, 4, 3), np.uint8))[:40])
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"P5\n1 1\n255\n\x00")  # P5 is grayscale pgm
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF\x04\x00\x00\x00AIFF")
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_ppm_header_comments_and_whitespace():
    a = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6 # comment\n# another\n 2\t2\n255\n" + a.tobytes()
    assert np.array_equal(codecs.decode_ppm(raw), a)


def test_resize_nearest_corners_and_determinism():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    big = codecs.resize_nearest(img, 6, 4)
    assert big.shape == (4, 6, 3)
    assert np.array_equal(big[0, 0], img[0, 0])
    assert np.array_equal(big[-1, -1], img[-1, -1])
    # downscale then upscale of a constant image is lossless
    const = np.full((8, 8, 3), 42, np.uint8)
    assert (codecs.resize_nearest(codecs.resize_nearest(const, 3, 3), 8, 8) == 42).all()


def test_wav_frame_kernel_chunks():
    wav = codecs.encode_wav(np.arange(1600, dtype=np.int16), 16000)
    frames = codecs.wav_frame_kernel([wav], 25)[0]  # 400 samples/frame
    assert len(frames) == 4
    rate, f0 = codecs.decode_wav(frames[0])
    assert rate == 16000 and f0.shape == (400, 1) and f0[0, 0] == 0
    _, flast = codecs.decode_wav(frames[-1])
    assert flast[-1, 0] == 1599
    with pytest.raises(NotImplementedError):
        codecs.wav_frame_kernel([b"not media"], 25)


# ------------------------------------------------- strict mode via Spark


@pytest.fixture(scope="module")
def real_media(spark):
    """3 BMPs + 2 WAVs as a media DataFrame of REAL encoded bytes."""
    import pandas as pd

    rows = []
    for i, (h, w) in enumerate([(2, 3), (4, 4), (5, 2)]):
        img = ((np.arange(h * w * 3) * (i + 7)) % 256).astype(np.uint8).reshape(h, w, 3)
        rows.append((f"img{i}", "image", codecs.encode_bmp(img)))
    for i, n in enumerate([800, 1200]):
        s = (np.arange(n) % 97).astype(np.int16)
        rows.append((f"wav{i}", "audio", codecs.encode_wav(s, 8000)))
    pdf = pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])
    pdf["meta"] = [
        {"n_bytes": len(p), "format": None, "width": None, "height": None}
        for p in pdf["payload"]
    ]
    return spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)


def test_decode_stats_real_bytes(spark, real_media):
    got = {r.media_id: r for r in multimodal.decode_stats(real_media).collect()}
    assert got["img0"].format == "bmp"
    assert (got["img0"].width, got["img0"].height) == (3, 2)
    assert got["img0"].n_values == 18
    img0 = ((np.arange(18) * 7) % 256).astype(np.int64)
    assert got["img0"].sum_values == int(img0.sum())
    assert got["wav0"].format == "wav"
    assert got["wav0"].width is None and got["wav0"].height is None
    assert got["wav0"].n_values == 800
    assert got["wav0"].sum_values == int((np.arange(800) % 97).sum())


def test_strict_resize_is_a_real_resize(spark, real_media):
    imgs = real_media.filter("media_type = 'image'")
    out = {r.media_id: r for r in
           multimodal.resize_images(imgs, 6, 4, decode_mode="strict").collect()}
    for i, (h, w) in enumerate([(2, 3), (4, 4), (5, 2)]):
        orig = ((np.arange(h * w * 3) * (i + 7)) % 256).astype(np.uint8).reshape(h, w, 3)
        r = out[f"img{i}"]
        assert r.meta.format == "bmp" and (r.meta.width, r.meta.height) == (6, 4)
        decoded = codecs.decode_bmp(bytes(r.payload))
        assert np.array_equal(decoded, codecs.resize_nearest(orig, 6, 4))


def test_strict_frame_sample_slices_pcm(spark, real_media):
    wavs = real_media.filter("media_type = 'audio'")
    frames = multimodal.sample_frames(
        wavs, frame_interval_ms=50, decode_mode="strict"
    ).toPandas()  # 400 samples per frame at 8 kHz
    per = frames.groupby("media_id").size()
    assert per["wav0"] == 2 and per["wav1"] == 3
    f = frames[(frames.media_id == "wav1") & (frames.frame_no == 2)].iloc[0]
    _, samples = codecs.decode_wav(bytes(f.payload))
    assert samples.shape[0] == 1200 - 800  # trailing partial frame
    assert f.frame_ts_ms == 100


def test_strict_features_real_decode(spark, real_media):
    feats = {r.media_id: r.feature for r in
             multimodal.extract_features(real_media, dim=4,
                                         decode_mode="strict").collect()}
    assert len(feats) == 5 and all(len(v) == 4 for v in feats.values())
    # pinned against the driver-side kernel (same real decode)
    local = codecs.feature_any_kernel(
        [codecs.encode_bmp(((np.arange(18) * 7) % 256).astype(np.uint8).reshape(2, 3, 3))],
        dim=4,
    )[0]
    assert feats["img0"] == pytest.approx(local)


# ------------------------------------------------- property round trips

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),   # crosses every w%4 padding case
    h=st.integers(1, 7),
    seed=st.integers(0, 2**16),
)
def test_bmp_round_trip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = codecs.encode_bmp(a)
    # encoded size = 54-byte headers + padded rows (the oracle formula)
    assert len(raw) == 54 + ((w * 3 + 3) // 4) * 4 * h
    assert np.array_equal(codecs.decode_bmp(raw), a)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**16),
)
def test_wav_round_trip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32767, (n, ch), dtype=np.int16)
    rate2, back = codecs.decode_wav(codecs.encode_wav(s, rate))
    assert rate2 == rate and np.array_equal(back, s)


def test_degenerate_headers_rejected():
    """Zero-dimension images and 0-channel WAVs are malformed-header
    ValueErrors, not downstream numpy/arithmetic crashes."""
    import struct

    zero_w = bytearray(codecs.encode_bmp(np.zeros((1, 1, 3), np.uint8)))
    struct.pack_into("<i", zero_w, 18, 0)  # biWidth = 0
    with pytest.raises(ValueError, match="dimensions"):
        codecs.decode_bmp(bytes(zero_w))

    with pytest.raises(ValueError, match="dimensions"):
        codecs.decode_ppm(b"P6\n0 1\n255\n")

    wav = bytearray(codecs.encode_wav(np.zeros(4, np.int16)))
    struct.pack_into("<H", wav, wav.index(b"fmt ") + 8 + 2, 0)  # channels = 0
    with pytest.raises(ValueError, match="0 channels"):
        codecs.decode_wav(bytes(wav))
