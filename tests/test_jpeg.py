"""Round-trip tests for the pure-stdlib baseline JPEG decoder
(redix_stream_spark/llm/jpeg.py) against the independent encoder fixture
(tests/jpeg_fixture.py). No Spark session needed — the decoder runs
worker-side inside mapInPandas; the pipeline-level behavior is covered in
test_llm.py's multimodal tests."""

from __future__ import annotations

import numpy as np

from redix_stream_spark.llm.jpeg import _ZIGZAG, decode_jpeg_pixels
from redix_stream_spark.llm.multimodal import (
    average_hash,
    decode_image_stub,
    decode_pixels,
    parse_image_meta,
)

from .jpeg_fixture import ZIGZAG, encode_jpeg


def _gradient(h, w):
    """Smooth RGB gradient — low-frequency content quantizes cleanly."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255) // max(w - 1, 1)
    g = (y * 255) // max(h - 1, 1)
    b = ((x + y) * 255) // max(h + w - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_zigzag_tables_agree_and_are_permutations():
    # Decoder and fixture derive the zigzag order by different
    # formulations; both must equal the canonical T.81 sequence.
    assert _ZIGZAG == ZIGZAG
    assert sorted(_ZIGZAG) == list(range(64))
    assert _ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_jpeg_roundtrip_444_near_lossless():
    # Quant table of all ones: the only loss is YCbCr rounding + DCT
    # float rounding. Odd dimensions exercise MCU padding + crop.
    img = _gradient(45, 37)
    payload = encode_jpeg(img)
    meta = parse_image_meta(payload)
    assert meta == {"format": "jpeg", "width": 37, "height": 45}
    out = decode_jpeg_pixels(payload)
    assert out is not None and out.shape == (45, 37, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_jpeg_roundtrip_420_subsampled():
    img = _gradient(40, 56)
    payload = encode_jpeg(img, subsample=True)
    out = decode_jpeg_pixels(payload)
    assert out is not None and out.shape == (40, 56, 3)
    # Chroma is 2x2-averaged then replicated; the gradient is smooth so
    # the error stays small.
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 8


def test_jpeg_roundtrip_grayscale():
    y, x = np.mgrid[0:24, 0:31]
    img = ((x * 7 + y * 11) % 256).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(img))
    assert out is not None and out.shape == (24, 31, 1)
    # High-frequency content + unit quant: DCT round-trip stays tight.
    assert int(np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()) <= 3


def test_jpeg_restart_markers_decode_identically():
    img = _gradient(32, 48)  # 24 MCUs at 4:4:4
    plain = decode_jpeg_pixels(encode_jpeg(img))
    with_rst = decode_jpeg_pixels(encode_jpeg(img, restart_interval=2))
    assert plain is not None and with_rst is not None
    assert (plain == with_rst).all()


def test_jpeg_16bit_quant_table():
    # A quant value > 255 forces the Pq=1 (16-bit) DQT path. Coarse
    # quantization loses detail but the frame must still decode to the
    # right shape with plausible values.
    img = _gradient(16, 16)
    q = np.ones((8, 8))
    q[7, 7] = 300.0
    out = decode_jpeg_pixels(encode_jpeg(img, qluma=q))
    assert out is not None and out.shape == (16, 16, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 16


def test_jpeg_coarse_quant_still_decodes():
    # A realistic-magnitude table (values 16..121) — verifies run-length
    # coding with long zero runs and EOB-heavy blocks.
    img = _gradient(33, 41)
    y, x = np.mgrid[0:8, 0:8]
    q = (16 + 15 * (x + y)).astype(np.float64)
    out = decode_jpeg_pixels(encode_jpeg(img, qluma=q, subsample=True))
    assert out is not None and out.shape == (33, 41, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).mean()) <= 12


def test_jpeg_real_phash_through_decode_stub():
    # Strong structure (left half black, right half white): quantization
    # noise cannot flip aHash bits, so the JPEG phash must equal the
    # source pixels' aHash — i.e. JPEGs now get a REAL perceptual hash.
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    payload = encode_jpeg(img)
    assert decode_pixels(payload) is not None
    feat = decode_image_stub(payload)
    assert feat["format"] == "jpeg"
    assert (feat["width"], feat["height"]) == (32, 32)
    assert feat["phash"] == average_hash(img)


def test_progressive_jpeg_falls_back_to_header_metadata():
    # Swap SOF0 for SOF2 (progressive): pixels unsupported → None, but
    # header metadata stays real and the stub degrades to content hash.
    payload = bytearray(encode_jpeg(_gradient(20, 20)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    payload = bytes(payload)
    assert decode_jpeg_pixels(payload) is None
    meta = parse_image_meta(payload)
    assert meta == {"format": "jpeg", "width": 20, "height": 20}
    feat = decode_image_stub(payload)
    assert feat["format"] == "jpeg" and len(feat["phash"]) == 16


def test_truncated_jpeg_returns_none():
    payload = encode_jpeg(_gradient(24, 24))
    assert decode_jpeg_pixels(payload[: len(payload) // 2]) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None


def test_avi_metadata_and_mjpeg_frame_sampling():
    # Six distinct frames: frame i is black with a white band whose
    # position moves — aHash differs per frame and is exactly the source
    # pixels' hash (strong structure survives unit-quant JPEG).
    from redix_stream_spark.llm.multimodal import (
        avi_video_frames,
        parse_video_meta,
        sample_frames_stub,
    )

    from .jpeg_fixture import avi_bytes

    srcs = []
    jpegs = []
    for i in range(6):
        img = np.zeros((32, 32, 3), np.uint8)
        img[:, 4 * i : 4 * i + 12] = 255
        srcs.append(img)
        jpegs.append(encode_jpeg(img))
    payload = avi_bytes(jpegs, 32, 32, usec_per_frame=40000)

    meta = parse_video_meta(payload)
    assert meta == {
        "format": "avi",
        "width": 32,
        "height": 32,
        "n_frames": 6,
        "duration_ms": 240,
    }
    assert avi_video_frames(payload) == jpegs

    # Even sampling: 3 of 6 frames → source indices 0, 2, 4, each with a
    # REAL perceptual hash (no deterministic_fake needed).
    frames = sample_frames_stub(payload, 3)
    assert [f["frame_idx"] for f in frames] == [0, 2, 4]
    for f in frames:
        assert f["phash"] == average_hash(srcs[f["frame_idx"]])
    # Distinct content ⇒ distinct perceptual hashes.
    assert len({f["phash"] for f in frames}) == 3

    # Asking for more frames than exist returns them all.
    assert [f["frame_idx"] for f in sample_frames_stub(payload, 99)] == list(range(6))


def test_non_avi_video_still_requires_fake():
    import pytest

    from redix_stream_spark.llm.multimodal import sample_frames_stub

    with pytest.raises(NotImplementedError):
        sample_frames_stub(b"not a video", 3)
    fake = sample_frames_stub(b"not a video", 3, deterministic_fake=True)
    assert [f["frame_idx"] for f in fake] == [0, 1, 2]


def test_jpeg_decoder_never_raises_on_corrupt_streams():
    # Robustness: decode runs worker-side on untrusted crawl bytes — any
    # corruption must yield None (or a valid array), never an exception.
    # Deterministic fuzz: seeded byte flips, truncations, and splices of
    # a valid stream.
    import random

    rnd = random.Random(20260814)
    base = bytearray(encode_jpeg(_gradient(24, 24), subsample=True, restart_interval=2))
    for _ in range(300):
        buf = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:  # flip 1-8 bytes
            for _ in range(rnd.randint(1, 8)):
                buf[rnd.randrange(len(buf))] = rnd.randrange(256)
        elif op == 1:  # truncate
            del buf[rnd.randrange(4, len(buf)) :]
        else:  # splice a random chunk
            at = rnd.randrange(len(buf))
            buf[at:at] = bytes(rnd.randrange(256) for _ in range(rnd.randint(1, 32)))
        out = decode_jpeg_pixels(bytes(buf))
        assert out is None or (out.ndim == 3 and out.dtype == np.uint8)
    # pure garbage behind an SOI marker
    for n in (0, 1, 7, 100):
        out = decode_jpeg_pixels(b"\xff\xd8" + bytes(rnd.randrange(256) for _ in range(n)))
        assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


def test_all_decoders_never_raise_on_corrupt_streams():
    # Every parser in the multimodal stack runs worker-side on untrusted
    # crawl bytes; corruption must yield None/valid output, never raise.
    # Seeded fuzz over valid PNG/GIF/BMP/WAV/MP4/AVI streams + garbage.
    import random

    from redix_stream_spark.llm.multimodal import (
        avi_video_frames,
        decode_pixels,
        parse_audio_meta,
        parse_image_meta,
        parse_video_meta,
        png_encode,
    )

    from .gif_fixture import gif_bytes
    from .jpeg_fixture import avi_bytes

    rnd = random.Random(20260815)
    img = _gradient(24, 24)
    pal = bytes(range(48))
    idx = [(x + y) % 16 for y in range(16) for x in range(16)]
    wav = (
        b"RIFF" + (36 + 64).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + (64).to_bytes(4, "little") + bytes(64)
    )
    mp4 = (
        (20).to_bytes(4, "big") + b"ftypisom" + bytes(8)
        + (8 + 8 + 100).to_bytes(4, "big") + b"moov"
        + (108).to_bytes(4, "big") + b"mvhd" + bytes(100)
    )
    bases = [
        png_encode(img),
        gif_bytes(16, 16, idx, pal),
        avi_bytes([encode_jpeg(img)], 24, 24),
        wav,
        mp4,
    ]
    parsers = [
        parse_image_meta,
        parse_audio_meta,
        parse_video_meta,
        decode_pixels,
        avi_video_frames,
    ]
    for base in bases:
        for _ in range(120):
            buf = bytearray(base)
            op = rnd.randrange(3)
            if op == 0:
                for _ in range(rnd.randint(1, 8)):
                    buf[rnd.randrange(len(buf))] = rnd.randrange(256)
            elif op == 1:
                del buf[rnd.randrange(1, len(buf)) :]
            else:
                at = rnd.randrange(len(buf))
                buf[at:at] = bytes(
                    rnd.randrange(256) for _ in range(rnd.randint(1, 16))
                )
            payload = bytes(buf)
            for parse in parsers:
                parse(payload)  # must not raise — return value irrelevant
