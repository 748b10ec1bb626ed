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


def _parse_jpeg(payload: bytes):
    """Marker walk shared by the full and DC-only decoders: returns
    ``(frame, scan, qt, huff_raw, restart_interval, scan_start)`` — with
    ``huff_raw[(class, id)] = (BITS, HUFFVAL)`` kept raw so each decoder
    builds its own lookup structure — or None on anything the baseline
    decoder does not support."""
    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}  # table id → 64 values in zigzag order
    huff_raw: dict[tuple[int, int], tuple[bytes, bytes]] = {}
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
                huff_raw[(tc, th)] = (bytes(bits), bytes(vals))
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
            return frame, scan, qt, huff_raw, restart_interval, i + 2 + seg_len
        i += 2 + seg_len
    return None


def decode_jpeg_pixels(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG → (H, W, C) uint8 (C=1 gray, C=3 RGB), else None."""
    parsed = _parse_jpeg(payload)
    if parsed is None:
        return None
    frame, scan, qt, huff_raw, restart_interval, start = parsed
    huff = {k: _build_huffman(b, v) for k, (b, v) in huff_raw.items()}
    return _decode_scan(payload, start, frame, scan, qt, huff, restart_interval)


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


# --- DC-only fast path (1/8-scale thumbnail decode) --------------------------
# dHash-class perceptual hashing needs only a tiny grayscale thumbnail, and
# a baseline JPEG already stores one: each 8x8 block's DC coefficient IS the
# block mean (the published libjpeg "scale 1/8" idea). decode_jpeg_dc walks
# the entropy stream decoding DC deltas and LENGTH-SKIPPING every AC
# coefficient — no coefficient array, no dequant, no IDCT, no plane
# assembly — over a destuffed buffer with a 16-bit-prefix Huffman lookup
# table (one list index per symbol instead of per-bit tree walks). The
# exact-pixel decoder above is untouched; q162 keeps using it.

#: (BITS, HUFFVAL) → (symbol_list, length_list) indexed by the next 16 bits
#: of the stream; length 0 marks an invalid prefix. Bounded cache: tables
#: repeat across a corpus (encoders ship fixed tables), workers keep ≤64.
_LUT_CACHE: dict[tuple[bytes, bytes], tuple[list[int], list[int]]] = {}


def _fast_lut(bits: bytes, vals: bytes) -> tuple[list[int], list[int]]:
    key = (bits, vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(65536, np.int64)
    ln = np.zeros(65536, np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            sym[lo : lo + (1 << (16 - length))] = vals[k]
            ln[lo : lo + (1 << (16 - length))] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), ln.tolist())  # plain lists: fastest scalar indexing
    if len(_LUT_CACHE) >= 64:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


def _entropy_segments(payload: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from ``start``, split at RSTn markers, with
    0xFF00 byte stuffing removed — so segment decoding is plain bit math
    with no marker checks in the hot loop."""
    segs: list[bytes] = []
    n = len(payload)
    i = seg_start = start
    while True:
        j = payload.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(payload[seg_start : n if j < 0 else j])
            break
        m = payload[j + 1]
        if m == 0x00:
            i = j + 2
            continue
        segs.append(payload[seg_start:j])
        if 0xD0 <= m <= 0xD7:  # RSTn: next segment starts after the marker
            i = seg_start = j + 2
            continue
        break  # EOI or any other marker ends the scan
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def decode_jpeg_dc(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG → (ceil(H/8), ceil(W/8)) uint8 grayscale of per-block
    means, from DC coefficients only. Color frames combine the Y/Cb/Cr DC
    planes with the same BT.601 inverse the full decoder uses, averaged to
    the gray mean(R,G,B) the dHash kernel computes (no per-pixel clip, so
    saturated colors may differ by a few levels from the full path — the
    fixture margins dwarf that). Returns None on anything
    ``decode_jpeg_pixels`` would reject."""
    parsed = _parse_jpeg(payload)
    if parsed is None:
        return None
    frame, scan, qt, huff_raw, restart_interval, start = parsed
    w, h, comps = frame
    if len(scan) != len(comps):
        return None
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
            return None
        q = qt.get(c["tq"])
        draw = huff_raw.get((0, td))
        araw = huff_raw.get((1, ta))
        if q is None or draw is None or araw is None:
            return None
        dsym, dlen = _fast_lut(*draw)
        asym, alen = _fast_lut(*araw)
        grid = np.zeros((mcuy * c["v"], mcux * c["h"]), np.int64)
        order.append((c["v"], c["h"], q[0], dsym, dlen, asym, alen, grid))
    segs = _entropy_segments(payload, start)
    data = segs[0] + b"\xff\xff"  # pad: 3-byte peeks never run short mid-block
    nbits = (len(data) - 2) * 8
    seg_i = pos = mcu_count = 0
    pred = [0] * len(order)
    from_bytes = int.from_bytes  # hot-loop local bindings
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    return None
                data = segs[seg_i] + b"\xff\xff"
                nbits = (len(data) - 2) * 8
                pos = 0
                pred = [0] * len(order)
            mcu_count += 1
            for ci, (cv, ch, q0, dsym, dlen, asym, alen, grid) in enumerate(order):
                for by in range(cv):
                    for bx in range(ch):
                        byte = pos >> 3
                        v16 = (
                            (from_bytes(data[byte : byte + 3], "big") << (pos & 7))
                            >> 8
                        ) & 0xFFFF
                        ln = dlen[v16]
                        if not ln:
                            return None
                        t = dsym[v16]
                        pos += ln
                        if t:
                            if t > 15:
                                return None
                            byte = pos >> 3
                            mag = (
                                (
                                    (
                                        from_bytes(data[byte : byte + 3], "big")
                                        << (pos & 7)
                                    )
                                    >> 8
                                )
                                & 0xFFFF
                            ) >> (16 - t)
                            pos += t
                            pred[ci] += (
                                mag - (1 << t) + 1 if mag < (1 << (t - 1)) else mag
                            )
                        grid[my * cv + by, mx * ch + bx] = pred[ci]
                        k = 1  # AC scan: decode symbol lengths, skip payloads
                        while k < 64:
                            byte = pos >> 3
                            v16 = (
                                (
                                    from_bytes(data[byte : byte + 3], "big")
                                    << (pos & 7)
                                )
                                >> 8
                            ) & 0xFFFF
                            ln = alen[v16]
                            if not ln:
                                return None
                            rs = asym[v16]
                            pos += ln
                            s = rs & 15
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += (rs >> 4) + 1
                            pos += s
                        if pos > nbits:
                            return None  # ran past the segment: corrupt
    out = []
    bh, bw = -(-h // 8), -(-w // 8)
    for cv, ch, q0, _ds, _dl, _as, _al, grid in order:
        g = grid.astype(np.float64) * (q0 / 8.0) + 128.0
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            g = np.repeat(np.repeat(g, ry, axis=0), rx, axis=1)
        out.append(g[:bh, :bw])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    # mean(R,G,B) of the BT.601 inverse, in DC space:
    gray = (
        y
        + ((1.772 - 0.344136) * (cb - 128.0) + (1.402 - 0.714136) * (cr - 128.0))
        / 3.0
    )
    return np.clip(np.rint(gray), 0, 255).astype(np.uint8)


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
    return _jpeg_container_gray(h, w, bytes(bw.out))


def _jpeg_container_gray(h: int, w: int, entropy: bytes) -> bytes:
    """Assemble the fixed single-component container (SOI, all-ones DQT,
    SOF0, the module's DHT pair, SOS) around already-stuffed entropy data."""

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
            entropy,
            b"\xff\xd9",
        ]
    )


def jpeg_encode_cells(cells: np.ndarray) -> bytes:
    """(R, C) uint8 cell grid → baseline JPEG of (8R, 8C) pixels where each
    cell is one CONSTANT 8x8 block. A constant block's DCT is DC-only
    (DC = 8·(v-128) under the orthonormal basis, every AC exactly zero),
    so the entropy stream is emitted closed-form — DC category code (the
    fixed table maps category t to 4-bit code t), magnitude bits, 8-bit
    EOB — with bits accumulated in one Python int and byte stuffing done
    by bytes.replace. Synthesizing a 64x72 fixture image costs O(blocks)
    integer ops instead of per-coefficient DCT loops; decode round-trips
    EXACTLY (all-ones quant, integral DC). Feeds q162b's large-image
    fixtures, where the generic per-block encoder would dominate the
    measured decode path it exists to exercise."""
    cells = np.asarray(cells, dtype=np.int64)
    r, c = cells.shape
    acc = 0
    nacc = 0
    pred = 0
    for v in cells.reshape(-1).tolist():
        dc = 8 * (v - 128)
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()  # ≤ 11: |diff| ≤ 2040 < 2^11
        acc = (acc << 4) | t
        if t:
            acc = (acc << t) | (diff if diff >= 0 else diff + (1 << t) - 1)
            nacc += t
        acc <<= 8  # EOB: canonical code 0 at length 8
        nacc += 12
    pad = (-nacc) % 8  # T.81 F.1.2.3: pad with 1-bits to the byte boundary
    acc = (acc << pad) | ((1 << pad) - 1)
    nacc += pad
    entropy = acc.to_bytes(nacc // 8, "big").replace(b"\xff", b"\xff\x00")
    return _jpeg_container_gray(r * 8, c * 8, entropy)
