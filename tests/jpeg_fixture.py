"""Baseline JPEG encoder fixture (pure stdlib + numpy) — produces real
T.81 baseline streams to round-trip-test ``llm.jpeg.decode_jpeg_pixels``.

Huffman tables are built canonically from the actual symbol frequencies
(two-pass), so the decoder's variable-length canonical-code path is
exercised with tables other than its own assumptions. Supports 4:4:4 and
4:2:0, grayscale, restart intervals, and 16-bit (Pq=1) quantization
tables. Zigzag order is generated here by an independent formulation from
the decoder's, so a transposition bug cannot cancel out.
"""

from __future__ import annotations

import heapq

import numpy as np

# Independent zigzag derivation: within anti-diagonal s=r+c, even
# diagonals walk column-ascending, odd diagonals row-ascending.
_ZZ_POS = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0]),
)
ZIGZAG = [r * 8 + c for r, c in _ZZ_POS]


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _huffman_table(freqs: dict[int, int]) -> tuple[list[int], list[int], dict]:
    """Symbol frequencies → (BITS[16], HUFFVAL, {sym: (code, length)})."""
    syms = sorted(freqs)
    if not syms:
        syms = [0]
    if len(syms) == 1:
        lengths = {syms[0]: 1}
    else:
        heap = [(freqs.get(s, 1), i, (s,)) for i, s in enumerate(syms)]
        heapq.heapify(heap)
        tick = len(heap)
        depth: dict[int, int] = {s: 0 for s in syms}
        while len(heap) > 1:
            fa, _, a = heapq.heappop(heap)
            fb, _, b = heapq.heappop(heap)
            for s in a + b:
                depth[s] += 1
            tick += 1
            heapq.heappush(heap, (fa + fb, tick, a + b))
        lengths = depth
        if max(lengths.values()) > 16:  # safety net for pathological input
            width = max(1, (len(syms) - 1).bit_length())
            lengths = {s: width for s in syms}
    ordered = sorted(syms, key=lambda s: (lengths[s], s))
    bits = [0] * 16
    for s in ordered:
        bits[lengths[s] - 1] += 1
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = lengths[ordered[0]]
    for s in ordered:
        code <<= lengths[s] - prev
        prev = lengths[s]
        codes[s] = (code, prev)
        code += 1
    return bits, ordered, codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def raw_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self.out += bytes((0xFF, marker))


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _quantize_block(block: np.ndarray, qtab: np.ndarray) -> list[int]:
    """8x8 spatial block → 64 quantized coefficients in zigzag order."""
    coeff = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = np.rint(coeff / qtab).astype(np.int64)
    flat = q.reshape(64)
    return [int(flat[i]) for i in ZIGZAG]


def _pad_plane(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to (bh, bw)."""
    h, w = p.shape
    return np.pad(p, ((0, bh - h), (0, bw - w)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    qluma: np.ndarray | None = None,
    qchroma: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 → baseline JPEG bytes."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    qluma = np.ones((8, 8)) if qluma is None else np.asarray(qluma, np.float64)
    qchroma = qluma if qchroma is None else np.asarray(qchroma, np.float64)
    h, w = img.shape[:2]

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
        tsel = [0]  # huffman class (luma)
        qtabs = [qluma]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 box-average chroma (4:2:0); pad odd dims by edge first.
            cbp = _pad_plane(cb, h + (h & 1), w + (w & 1))
            crp = _pad_plane(cr, h + (h & 1), w + (w & 1))
            cb = (
                cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]
            ) / 4.0
            cr = (
                crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]
            ) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
        tsel = [0, 1, 1]
        qtabs = [qluma, qchroma]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_plane(
            np.clip(np.rint(p), 0, 255),
            mcuy * sv * 8,
            mcux * sh * 8,
        )
        for p, (sh, sv) in zip(planes, samp)
    ]

    # Pass 1: tokens in MCU-interleave order + symbol frequencies.
    tokens: list = []  # ("sym", tbl_key, sym, mag, nbits) | ("rst", idx)
    freqs: dict[tuple[str, int], dict[int, int]] = {}
    pred = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                tokens.append(("rst", rst_idx & 7))
                rst_idx += 1
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                qt = qtabs[qsel[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        zz = _quantize_block(p[y0 : y0 + 8, x0 : x0 + 8], qt)
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = _category(diff)
                        dc_key = ("dc", tsel[ci])
                        freqs.setdefault(dc_key, {}).setdefault(t, 0)
                        freqs[dc_key][t] += 1
                        tokens.append(("sym", dc_key, t, _mag_bits(diff, t), t))
                        ac_key = ("ac", tsel[ci])
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                freqs.setdefault(ac_key, {}).setdefault(0xF0, 0)
                                freqs[ac_key][0xF0] += 1
                                tokens.append(("sym", ac_key, 0xF0, 0, 0))
                                run -= 16
                            s = _category(v)
                            rs = (run << 4) | s
                            freqs.setdefault(ac_key, {}).setdefault(rs, 0)
                            freqs[ac_key][rs] += 1
                            tokens.append(("sym", ac_key, rs, _mag_bits(v, s), s))
                            run = 0
                        if run:
                            freqs.setdefault(ac_key, {}).setdefault(0x00, 0)
                            freqs[ac_key][0x00] += 1
                            tokens.append(("sym", ac_key, 0x00, 0, 0))

    tables = {key: _huffman_table(f) for key, f in freqs.items()}

    # Headers.
    out = bytearray(b"\xff\xd8")
    for tid, qt in enumerate(qtabs):
        zz_vals = [int(qt.reshape(64)[i]) for i in ZIGZAG]
        pq = 1 if max(zz_vals) > 255 else 0
        body = bytes([(pq << 4) | tid]) + (
            b"".join(v.to_bytes(2, "big") for v in zz_vals)
            if pq
            else bytes(zz_vals)
        )
        out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for (kind, tid), (bits, vals, _codes) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        body = bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    # Pass 2: entropy-coded data.
    bw_ = _BitWriter()
    for tok in tokens:
        if tok[0] == "rst":
            bw_.raw_marker(0xD0 + tok[1])
            continue
        _, key, sym, mag, nbits = tok
        code, length = tables[key][2][sym]
        bw_.put(code, length)
        if nbits:
            bw_.put(mag, nbits)
    bw_.pad_to_byte()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def _riff_chunk(cc: bytes, body: bytes) -> bytes:
    out = cc + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        out += b"\x00"  # word alignment
    return out


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def avi_bytes(jpeg_frames: list[bytes], w: int, h: int, usec_per_frame: int = 40000) -> bytes:
    """Minimal Motion-JPEG AVI container: RIFF('AVI ') with an hdrl/avih
    main header and a movi list of 00dc chunks (one JPEG per frame)."""
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (
            usec_per_frame,  # dwMicroSecPerFrame
            0,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0,  # dwFlags
            len(jpeg_frames),  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            0,  # dwSuggestedBufferSize
            w,  # dwWidth
            h,  # dwHeight
            0, 0, 0, 0,  # dwReserved
        )
    )
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih))
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body
