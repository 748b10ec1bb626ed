"""FLAC subset codec (llm/flac.py): byte-fixture round trips, CRC
gates, the LPC honest gate, and WAV/FLAC feature identity — the E110
JPEG-encoder pattern applied to audio (VERDICT r7 item 4)."""

from __future__ import annotations

import numpy as np
import pytest

from redix_stream_spark.llm.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_like_encode,
    flac_decode_pcm16,
    flac_encode_pcm16,
    parse_flac_streaminfo,
)


def _tone(n=10000, freq=440, amp=9000, rate=8000):
    t = np.arange(n, dtype=np.float64)
    return amp * np.sin(2 * np.pi * freq * t / rate)


def _as_pcm(wave):
    return np.clip(wave, -32768, 32767).astype("<i2").astype(np.int64)


@pytest.mark.parametrize("kind", [None, "verbatim", "fixed"])
def test_round_trip_is_lossless(kind):
    wave = _tone()
    enc = flac_encode_pcm16(wave, 8000, block_size=1024, force_subframe=kind)
    dec = flac_decode_pcm16(enc)
    assert dec is not None
    assert np.array_equal(dec.astype(np.int64), _as_pcm(wave))


def test_constant_blocks_and_compression():
    flat = np.full(5000, 123.0)
    enc = flac_encode_pcm16(flat, 8000, block_size=4096)
    assert np.array_equal(
        flac_decode_pcm16(enc).astype(np.int64), _as_pcm(flat)
    )
    # constant subframes make silence ~free; fixed predictors beat
    # verbatim on a smooth tone — the codec actually compresses.
    assert len(enc) < 100
    wave = _tone()
    fixed = flac_encode_pcm16(wave, 8000, 1024, force_subframe="fixed")
    verb = flac_encode_pcm16(wave, 8000, 1024, force_subframe="verbatim")
    assert len(fixed) < len(verb) < len(wave) * 2 + 4096


def test_coded_number_boundaries_round_trip():
    """ADVICE r8: the UTF-8-style coded number holds 5k+1 payload bits
    for k bytes (2 bytes < 2^11, 3 < 2^16, 4 < 2^21, …); the old 4k+6
    threshold encoded frame index 2048 as 2 bytes (e080 — invalid
    continuation) and desynced every decoder. Pin exact byte widths and
    decode round trips at each capacity boundary up to the 36-bit max."""
    from redix_stream_spark.llm.flac import _BitReader, _utf8_like_decode

    widths = {
        127: 1, 128: 2, 2047: 2, 2048: 3, 5000: 3, 16384: 3,
        65535: 3, 65536: 4, 100000: 4, 2**21 - 1: 4, 2**21: 5,
        2**26: 6, 2**31: 7, 2**36 - 1: 7,
    }
    for n, k in widths.items():
        b = _utf8_like_encode(n)
        assert len(b) == k, (n, b.hex())
        assert _utf8_like_decode(_BitReader(b)) == n
    assert _utf8_like_encode(2048).hex() == "e0a080"  # the r8 repro


def test_coded_number_over_capacity_raises():
    """ADVICE r9: coded numbers max out at 7 bytes / 36 payload bits —
    an over-capacity frame index must fail loudly, never emit a
    malformed head byte that desyncs the stream."""
    with pytest.raises(ValueError, match="coded number overflow"):
        _utf8_like_encode(1 << 36)
    with pytest.raises(ValueError):
        _utf8_like_encode((1 << 36) + 12345)


def test_stream_with_over_2048_frames_round_trips():
    """The r8 repro at stream level: ≥2048 frames forces 3-byte coded
    frame numbers; the whole stream must still decode losslessly (the
    old encoder emitted an invalid 2-byte number at frame 2048 → header
    CRC mismatch → entire stream decoded to None)."""
    wave = _tone(n=16 * 2100)  # 2100 frames at block_size=16
    enc = flac_encode_pcm16(wave, 8000, block_size=16)
    dec = flac_decode_pcm16(enc)
    assert dec is not None
    assert np.array_equal(dec.astype(np.int64), _as_pcm(wave))


def test_multi_partition_rice_round_trip():
    wave = _tone(n=4096)
    enc = flac_encode_pcm16(wave, 8000, 2048, partition_order=3)
    assert np.array_equal(
        flac_decode_pcm16(enc).astype(np.int64), _as_pcm(wave)
    )


def test_streaminfo_and_audio_meta_dispatch():
    from redix_stream_spark.llm.multimodal import parse_audio_meta

    enc = flac_encode_pcm16(_tone(n=16000), 8000, 4096)
    info = parse_flac_streaminfo(enc)
    assert info["sample_rate"] == 8000
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 16000
    meta = parse_audio_meta(enc)
    assert meta["format"] == "flac"
    assert meta["duration_ms"] == 2000


def test_crc_gates_corruption_to_none():
    enc = bytearray(flac_encode_pcm16(_tone(), 8000, 1024))
    # flip a bit in frame data (past the 4+4+34-byte metadata prefix)
    enc[200] ^= 0x10
    assert flac_decode_pcm16(bytes(enc)) is None
    # truncation mid-frame decodes to None, never partial garbage
    whole = flac_encode_pcm16(_tone(), 8000, 1024)
    assert flac_decode_pcm16(whole[: len(whole) - 7]) is None
    assert flac_decode_pcm16(b"RIFFxxxxWAVE") is None


@pytest.mark.parametrize("order", [1, 2, 4, 8, 12, 32])
def test_lpc_round_trip_is_lossless(order):
    """VERDICT r8 item 3: LPC subframes decode for real. Quantized
    integer shift-add prediction is bit-exact whatever the coefficient
    quality — the residual absorbs every prediction error — so every
    order round-trips losslessly."""
    wave = _tone()
    enc = flac_encode_pcm16(
        wave, 8000, block_size=1024, force_subframe="lpc", lpc_order=order
    )
    dec = flac_decode_pcm16(enc)
    assert dec is not None
    assert np.array_equal(dec.astype(np.int64), _as_pcm(wave))


def test_lpc_compresses_a_tone_and_verifies_streaminfo_md5():
    import hashlib

    wave = _tone()
    lpc = flac_encode_pcm16(wave, 8000, 1024, force_subframe="lpc")
    fixed = flac_encode_pcm16(wave, 8000, 1024, force_subframe="fixed")
    verb = flac_encode_pcm16(wave, 8000, 1024, force_subframe="verbatim")
    # a sinusoid is the textbook LPC-friendly signal: the order-8
    # predictor must beat both the fixed family and verbatim.
    assert len(lpc) < len(fixed) < len(verb)
    # STREAMINFO's PCM MD5 (bytes 26:42 of the metadata block) must
    # match the decoded waveform — the whole-stream integrity pin.
    dec = flac_decode_pcm16(lpc)
    md5 = hashlib.md5(
        dec.astype(np.int64).astype("<i2").tobytes()
    ).digest()
    assert lpc[8 + 18 : 8 + 34] == md5


def test_lpc_noise_and_multi_partition_round_trip():
    rng = np.random.default_rng(7)
    noise = rng.integers(-20000, 20000, size=8192).astype(np.float64)
    enc = flac_encode_pcm16(
        noise, 8000, 2048, force_subframe="lpc", partition_order=2
    )
    assert np.array_equal(
        flac_decode_pcm16(enc).astype(np.int64), _as_pcm(noise)
    )


def test_lpc_hand_assembled_frame_decodes_to_known_samples():
    """Spec-level pin, independent of the encoder: a hand-assembled
    order-1 LPC subframe with coefficient 2, shift 1 (i.e. pred =
    floor(2·prev / 2) = prev) and residuals [+1, -1, +2] over warm-up
    [100] must decode to exactly [100, 101, 100, 102]."""
    si = _BitWriter()
    si.write(4, 16)
    si.write(4, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(4, 36)
    si.align()
    meta = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.bytes() + b"\0" * 16

    h = _BitWriter()
    h.write(0b1111111111111000, 16)
    h.write(0b0111, 4)
    h.write(0b0000, 4)
    h.write(0b0000, 4)
    h.write(0b100, 3)
    h.write(0, 1)
    h.align()
    hdr = h.bytes() + _utf8_like_encode(0) + (3).to_bytes(2, "big")
    hdr += bytes([_crc8(hdr)])
    sub = _BitWriter()
    sub.write(0, 1)
    sub.write(0b100000, 6)  # LPC, order 1
    sub.write(0, 1)  # no wasted bits
    sub.write(100 & 0xFFFF, 16)  # warm-up sample
    sub.write(12 - 1, 4)  # precision 12
    sub.write(1, 5)  # shift 1
    sub.write(2, 12)  # coefficient [2]
    # residual: method 0, partition order 0, k=2, zigzagged [1,-1,2]
    sub.write(0, 2)
    sub.write(0, 4)
    sub.write(2, 4)
    for u in (2, 1, 4):  # zigzag(1)=2, zigzag(-1)=1, zigzag(2)=4
        sub.write_unary(u >> 2)
        sub.write(u & 3, 2)
    sub.align()
    frame = hdr + sub.bytes()
    payload = meta + frame + _crc16(frame).to_bytes(2, "big")
    dec = flac_decode_pcm16(payload)
    assert dec is not None
    assert dec.astype(np.int64).tolist() == [100, 101, 100, 102]


def test_wav_and_flac_payloads_yield_identical_features():
    """The q155b contract: FLAC is lossless, so the SAME waveform
    encoded either way must produce bit-identical window features."""
    from redix_stream_spark.llm.multimodal import (
        audio_window_features,
        decode_audio_pcm,
        wav_encode_pcm16,
    )

    wave = _tone(n=3 * 1024, freq=517, amp=7000)
    via_wav = decode_audio_pcm(wav_encode_pcm16(wave))
    via_flac = decode_audio_pcm(flac_encode_pcm16(wave, 8000, 1024))
    assert np.array_equal(via_wav, via_flac)
    assert audio_window_features(7, via_wav) == audio_window_features(
        7, via_flac
    )


def test_q155b_mixed_corpus_matches_q155(spark, sf_dir):
    """The mixed WAV/FLAC face must equal the WAV-only face row for row
    — the decoder dispatch and the FLAC path are hash-invisible."""
    from redix_stream_spark.registry import all_queries

    Q = all_queries()
    a = sorted(tuple(r) for r in Q["q155_audio_windows"](spark, sf_dir).collect())
    b = sorted(
        tuple(r)
        for r in Q["q155b_audio_windows_mixed"](spark, sf_dir).collect()
    )
    assert a == b and len(a) > 0
