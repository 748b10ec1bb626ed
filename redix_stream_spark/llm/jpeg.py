"""Baseline JPEG (SOF0/SOF1) pixel decoder — pure stdlib + numpy.

Closes the last multimodal pixel stub: JPEG entropy coding is Huffman
(ITU T.81 baseline), which needs no codec library — only bit arithmetic
and an 8x8 IDCT, both implementable with numpy. Coverage:

- baseline + extended-sequential DCT frames (SOF0/SOF1), 8-bit samples;
- 1-component (grayscale) and 3-component (YCbCr/JFIF) scans;
- arbitrary sampling factors whose ratios divide the max (4:4:4, 4:2:2,
  4:2:0, ...) with nearest (pixel-replication) chroma upsampling;
- 8- and 16-bit-precision quantization tables (DQT Pq 0/1), multiple
  tables per marker;
- restart intervals (DRI + RSTn resync, DC-predictor reset);
- 0xFF00 byte-stuffing in the entropy stream.

Progressive (SOF2) and arithmetic-coded frames return None — the caller
(``multimodal.decode_pixels``) falls back to header-only metadata, which
stays real via ``parse_image_meta``.

Like the PNG/GIF decoders this runs worker-side inside Arrow
``mapInPandas`` batches (multimodal.py): embarrassingly parallel, zero
shuffles, memory bounded by the Arrow batch size. The per-block Python
loop is the honest cost of a stdlib-only container; real deployments
swap ``decode_pixels`` for a codec library behind the same signature.

Round-trip-tested against the pure-python baseline *encoder* fixture in
tests/jpeg_fixture.py (canonical Huffman tables built from symbol
frequencies, 4:4:4 and 4:2:0, restart markers, 16-bit DQT).
"""

from __future__ import annotations

import numpy as np

# Zigzag scan order: position s in the coded stream ↔ natural (row-major)
# index _ZIGZAG[s]. Generated, not transcribed: anti-diagonals s = r+c,
# even diagonals walked bottom-left→top-right (row decreasing).
_ZIGZAG: list[int] = []
for _s in range(15):
    for _r in range(_s, -1, -1) if _s % 2 == 0 else range(_s + 1):
        _c = _s - _r
        if _r < 8 and _c < 8:
            _ZIGZAG.append(_r * 8 + _c)
_ZZ = np.array(_ZIGZAG, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis A: forward coeff = A @ block @ A.T, inverse
    block = A.T @ coeff @ A (A is orthonormal)."""
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


class _EndOfData(Exception):
    """Entropy stream hit a non-RST marker or ran out of bytes."""


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment.

    Handles 0xFF00 byte stuffing inline; any other 0xFF-marker mid-read
    raises _EndOfData (truncated/corrupt stream). ``restart()`` aligns to
    the next byte boundary and consumes an RSTn marker.
    """

    __slots__ = ("buf", "i", "bit")

    def __init__(self, buf: bytes, start: int) -> None:
        self.buf = buf
        self.i = start
        self.bit = 0

    def read_bit(self) -> int:
        buf, i = self.buf, self.i
        if i >= len(buf):
            raise _EndOfData
        b = buf[i]
        if b == 0xFF and (i + 1 >= len(buf) or buf[i + 1] != 0x00):
            raise _EndOfData
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.i += 2 if b == 0xFF else 1  # skip the stuffed 0x00
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        if self.bit:
            b = self.buf[self.i]
            self.i += 2 if b == 0xFF else 1
            self.bit = 0
        if (
            self.i + 1 < len(self.buf)
            and self.buf[self.i] == 0xFF
            and 0xD0 <= self.buf[self.i + 1] <= 0xD7
        ):
            self.i += 2


def _build_huffman(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """DHT (BITS, HUFFVAL) → {(code_length, code): symbol} via the
    canonical code construction of T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(rd: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg_pixels(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG → (H, W, C) uint8 (C=1 gray, C=3 RGB), else None."""
    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}  # table id → 64 values in zigzag order
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOS
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per marker
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq:
                    vals = [
                        int.from_bytes(body[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    j += 128
                else:
                    vals = list(body[j : j + 64])
                    j += 64
                if len(vals) < 64:
                    return None
                qt[tq] = vals
        elif marker == 0xC4:  # DHT — possibly several tables per marker
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = body[j + 1 : j + 17]
                j += 17
                nv = sum(bits)
                vals = body[j : j + nv]
                if len(vals) < nv:
                    return None  # truncated table definition
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if len(body) < 6:
                return None
            precision = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if precision != 8 or not (w and h) or nc not in (1, 3):
                return None
            if w * h > (1 << 26):  # corrupt-header allocation guard (64 MPx)
                return None
            if len(body) < 6 + 3 * nc:
                return None  # truncated frame header
            comps = []
            for k in range(nc):
                cid, hv, tq_ = body[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_}
                )
            frame = (w, h, comps)
        elif 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive / arithmetic / 12-bit: unsupported
        elif marker == 0xDA:  # SOS — single-scan sequential decode
            if frame is None:
                return None
            if not body:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                return None  # truncated scan header
            scan = []
            for k in range(ns):
                cs = body[1 + 2 * k]
                tdta = body[2 + 2 * k]
                scan.append((cs, tdta >> 4, tdta & 15))
            return _decode_scan(
                payload, i + 2 + seg_len, frame, scan, qt, huff, restart_interval
            )
        i += 2 + seg_len
    return None


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    w, h, comps = frame
    if len(scan) != len(comps):
        return None  # multi-scan sequential not supported
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (hmax and vmax):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = []
    for cs, td, ta in scan:
        c = next((c for c in comps if c["id"] == cs), None)
        if c is None or c["h"] == 0 or c["v"] == 0:
            return None
        if vmax % c["v"] or hmax % c["h"]:
            return None  # non-integer upsampling ratio
        q = qt.get(c["tq"])
        dc = huff.get((0, td))
        ac = huff.get((1, ta))
        if q is None or dc is None or ac is None:
            return None
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.uint8)
        order.append((c, np.asarray(q, dtype=np.int64), dc, ac, plane))
    rd = _BitReader(payload, start)
    pred = [0] * len(order)
    coeff_zz = np.zeros(64, np.int64)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    rd.restart()
                    pred = [0] * len(order)
                mcu_count += 1
                for ci, (c, q, dc_t, ac_t, plane) in enumerate(order):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coeff_zz[:] = 0
                            t = _huff_decode(rd, dc_t)
                            if t is None or t > 15:
                                return None
                            pred[ci] += _extend(rd.read_bits(t), t) if t else 0
                            coeff_zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(rd, ac_t)
                                if rs is None:
                                    return None
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:  # ZRL: 16 zeros
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                coeff_zz[k] = _extend(rd.read_bits(s), s)
                                k += 1
                            block = np.zeros(64, np.float64)
                            block[_ZZ] = coeff_zz * q  # dequant, zigzag→natural
                            px = _A.T @ block.reshape(8, 8) @ _A + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                                np.rint(px), 0, 255
                            ).astype(np.uint8)
    except _EndOfData:
        return None
    out = []
    for c, _q, _dc, _ac, plane in order:
        ry, rx = vmax // c["v"], hmax // c["h"]
        p = plane
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w].astype(np.float64))
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- minimal baseline encoder (grayscale) -----------------------------------
# Exists so fixtures can synthesize REAL JPEG payloads (q162's mixed-format
# image dedup) without an image library. Quantization tables are all ones:
# the only loss is DCT-coefficient rounding, so round-tripping through
# decode_jpeg_pixels perturbs each pixel by at most a few gray levels —
# fixtures that need comparisons stable across PNG/JPEG keep >=64 levels of
# margin (multimodal._synth_image). Pure integer/float64 numpy: the encoded
# bytes are deterministic for a given input.

#: DC: 12 categories (0..11) as 4-bit canonical codes; AC: EOB + ZRL + every
#: (run 0..15, size 1..10) symbol as 8-bit canonical codes. Any valid prefix
#: code works — the decoder rebuilds from the DHT we emit; fixed-width keeps
#: the canonical construction trivially correct (max code < all-ones).
_ENC_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = bytes([0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8)


def _encode_table(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code_length, code), the encoder-side view of the same
    canonical construction _build_huffman uses."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing; flush pads with 1s
    (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return abs(v).bit_length()


def jpeg_encode_gray(img: "np.ndarray") -> bytes:
    """(H, W) uint8 grayscale → baseline JFIF-less JPEG bytes (SOI, DQT
    all-ones, SOF0 single component, DHT, SOS, entropy data, EOI).
    Dimensions are padded to block multiples by edge replication."""
    img = np.asarray(img)
    if img.ndim == 3:
        img = img[:, :, 0]
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    dc_enc = _encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.rint(_A @ block @ _A.T).astype(np.int64)
            # AC size categories stop at 10 (|v| <= 1023); the DCT of
            # 8-bit input can graze past only on pathological patterns —
            # clamp, the error is absorbed by fixture margins.
            coef = np.clip(coef, -1023, 1023)
            zz = coef.reshape(64)[_ZZ]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _category(diff)
            ln, code = dc_enc[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_enc[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                ln, code = ac_enc[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                ln, code = ac_enc[0x00]
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    return b"".join(
        [
            b"\xff\xd8",
            seg(0xDB, bytes([0x00]) + bytes([1] * 64)),
            seg(
                0xC0,
                bytes([8])
                + h.to_bytes(2, "big")
                + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]),
            ),
            seg(0xC4, bytes([0x00]) + _ENC_DC_BITS + _ENC_DC_VALS),
            seg(0xC4, bytes([0x10]) + _ENC_AC_BITS + _ENC_AC_VALS),
            seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),
            bytes(bw.out),
            b"\xff\xd9",
        ]
    )
