"""GIF fixture builder: full LZW encoder (dictionary growth, variable
code width) + GIF container — used to round-trip-test the decoder."""
import struct


def lzw_encode(min_cs, indices):
    clear = 1 << min_cs
    end = clear + 1
    cs = min_cs + 1
    codes = [(clear, cs)]
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    buf = ()
    for px in indices:
        nxt = buf + (px,)
        if nxt in table:
            buf = nxt
            continue
        codes.append((table[buf], cs))
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << cs) + 1 and cs < 12:
                cs += 1
        buf = (px,)
    if buf:
        codes.append((table[buf], cs))
    codes.append((end, cs))
    # pack LSB-first
    out = bytearray()
    acc = 0
    nbits = 0
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_bytes(w, h, indices, palette, interlace=False):
    min_cs = max(2, (len(palette) - 1).bit_length())
    if interlace:
        order = [y for off, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(off, h, step)]
        rows = [indices[y * w:(y + 1) * w] for y in range(h)]
        indices = [px for y in order for px in rows[y]]
    data = lzw_encode(min_cs, indices)
    pal = bytearray()
    n = 1 << (len(palette) - 1).bit_length() if len(palette) > 1 else 2
    n = max(n, 2)
    for i in range(n):
        pal += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    packed = 0x80 | (n.bit_length() - 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([min_cs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
