"""REAL baseline JPEG codec — pure stdlib + numpy, no codec libraries.

Completes the multimodal tier's real-codec family (BMP struct codec,
PNG zlib codec, GIF LZW codec — operators/multimodal.py): baseline
sequential JFIF with the standard Annex K quantization and Huffman
tables, 4:4:4 sampling (no chroma subsampling — encoder choice;
decoder refuses subsampled/progressive/restart-interval streams
loudly rather than guessing).

Encoder: RGB→YCbCr (JFIF), per-8×8-block level shift + orthonormal
2-D DCT-II (JPEG's FDCT is exactly the orthonormal transform for
N=8), quantization, zigzag, DC differential + AC run-length Huffman
coding with 0xFF byte stuffing. Decoder: full marker parse (DQT/DHT/
SOF0/SOS), canonical Huffman reconstruction, bit-unstuffing, inverse
of every step, clip to uint8.

JPEG is LOSSY, so unlike the PNG/GIF oracles no SQL can recompute the
decoded pixels closed-form; correctness is pinned by (a) exact header
dims, (b) round-trip PSNR bounds on the closed-form test pattern, and
(c) the decoder being exercised against what the encoder — a separate
code path through the same spec — produced.

Scale: kernels run inside Arrow-batched ``mapInPandas`` like every
other media op; payloads never reach the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# zigzag scan order: index i of the scan → (row, col)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard Huffman tables: (bits[1..16] counts, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(bits, values):
    """Canonical Huffman: value → (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits, values):
    """Canonical Huffman: (length, code) → value."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# orthonormal 8×8 DCT-II matrix — JPEG's FDCT for N=8
_D8 = np.zeros((8, 8))
for _k in range(8):
    for _m in range(8):
        _D8[_k, _m] = np.sqrt(2.0 / 8) * np.cos(
            np.pi * (2 * _m + 1) * _k / 16.0
        )
_D8[0, :] = np.sqrt(1.0 / 8)


def _category(v: int) -> int:
    """DC/AC magnitude category: bits needed for |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            b = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(b & 0xFF)
            if (b & 0xFF) == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    f = _D8 @ (block.astype(np.float64) - 128.0) @ _D8.T
    q = np.sign(f) * np.floor(np.abs(f) / qtab + 0.5)
    q = q.astype(np.int64)
    zz = q.reshape(-1)[_ZZ]
    # DC: differential
    diff = int(zz[0]) - pred
    cat = _category(diff)
    code, ln = dc_codes[cat]
    bw.put(code, ln)
    if cat:
        bw.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    # AC: run-length
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt(tid: int, tab) -> bytes:
    zz = tab.reshape(-1)[_ZZ]
    return _marker(0xDB, bytes([tid]) + bytes(int(v) for v in zz))


def _dht(cls: int, tid: int, bits, values) -> bytes:
    return _marker(
        0xC4,
        bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
    )


def encode_jpeg(pixels) -> bytes:
    """Encode a top-down h×w×3 RGB (or h×w grayscale) uint8 array as
    a REAL baseline JFIF JPEG: standard tables, 4:4:4, no subsampling.
    Readable by any JPEG decoder."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [(px.astype(np.float64), QUANT_LUMA, 0)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [(y, QUANT_LUMA, 0), (cb, QUANT_CHROMA, 1),
                 (cr, QUANT_CHROMA, 1)]
    dc_l, ac_l = _huff_codes(*_DC_LUMA), _huff_codes(*_AC_LUMA)
    dc_c, ac_c = _huff_codes(*_DC_CHROMA), _huff_codes(*_AC_CHROMA)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt(0, QUANT_LUMA)
    if not gray:
        out += _dqt(1, QUANT_CHROMA)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    out += _dht(0, 0, *_DC_LUMA) + _dht(1, 0, *_AC_LUMA)
    if not gray:
        out += _dht(0, 1, *_DC_CHROMA) + _dht(1, 1, *_AC_CHROMA)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _marker(0xDA, sos)
    # pad each plane to 8 multiples by edge replication
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    bw = _BitWriter()
    preds = [0] * nc
    planes = []
    for plane, _, _ in comps:
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:h, w:] = p[:h, w - 1:w]
        p[h:, w:] = plane[-1, -1]
        planes.append(p)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (plane, qtab, tid) in enumerate(comps):
                dc = dc_l if tid == 0 else dc_c
                ac = ac_l if tid == 0 else ac_c
                preds[ci] = _encode_block(
                    bw, planes[ci][by:by + 8, bx:bx + 8], qtab,
                    dc, ac, preds[ci],
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def is_jpeg(b: bytes) -> bool:
    return len(b) > 3 and b[:3] == b"\xff\xd8\xff"


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif nxt == 0xD9:  # EOI reached mid-fill: zero-pad
                    b = 0
                else:
                    raise ValueError(
                        f"unexpected marker 0xff{nxt:02x} in scan "
                        "(restart intervals unsupported)"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(br: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = br.bits(cat)
    if v < (1 << (cat - 1)):
        v -= (1 << cat) - 1
    return v


def _huff_read(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in scan")


def decode_jpeg_header(b: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the SOF0 marker. Refuses
    progressive (SOF2) and other non-baseline frames loudly."""
    if not is_jpeg(b):
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        tag = b[pos + 1]
        if tag == 0xC0:
            _, h, w, nc = struct.unpack(">BHHB", b[pos + 4:pos + 10])
            return w, h, nc
        if tag in (0xC1, 0xC2, 0xC3):
            raise ValueError(
                f"non-baseline JPEG (SOF{tag - 0xC0}) unsupported"
            )
        if tag == 0xD8 or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        pos += 2 + ln
    raise ValueError("no SOF0 frame header found")


def jpeg_pixels(b: bytes):
    """Decode a baseline 4:4:4 (or grayscale) JPEG to a top-down
    h×w×3 RGB (or h×w×1) uint8 array: marker parse, canonical Huffman
    reconstruction, entropy decode, dequantize, de-zigzag, inverse
    DCT, YCbCr→RGB. Subsampled / progressive / restart-interval
    streams refuse loudly."""
    if not is_jpeg(b):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    w = h = nc = None
    comp_spec = []  # (cid, qtab_id)
    while True:
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        tag = b[pos + 1]
        if tag == 0xD9:
            raise ValueError("no scan data before EOI")
        if 0xD0 <= tag <= 0xD7 or tag == 0xD8:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        seg = b[pos + 4:pos + 2 + ln]
        if tag == 0xDB:
            i = 0
            while i < len(seg):
                prec_id = seg[i]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1
                )
                qtabs[prec_id & 0x0F] = tab.reshape(8, 8)
                i += 65
        elif tag == 0xC4:
            i = 0
            while i < len(seg):
                cls_id = seg[i]
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                values = list(seg[i + 17:i + 17 + nvals])
                htabs[(cls_id >> 4, cls_id & 0x0F)] = _huff_decoder(
                    bits, values
                )
                i += 17 + nvals
        elif tag == 0xC0:
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            for ci in range(nc):
                cid, samp, qid = seg[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "chroma-subsampled JPEG unsupported (4:4:4 only)"
                    )
                comp_spec.append((cid, qid))
        elif tag in (0xC1, 0xC2, 0xC3):
            raise ValueError(
                f"non-baseline JPEG (SOF{tag - 0xC0}) unsupported"
            )
        elif tag == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif tag == 0xDA:
            ns = seg[0]
            scan_tabs = []
            for ci in range(ns):
                _, sel = seg[1 + 2 * ci:3 + 2 * ci]
                scan_tabs.append(
                    (htabs[(0, sel >> 4)], htabs[(1, sel & 0x0F)])
                )
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if w is None:
        raise ValueError("no SOF0 before SOS")
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    planes = [np.zeros((ph, pw)) for _ in range(nc)]
    br = _BitReader(b, pos)
    preds = [0] * nc
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(nc):
                dc_t, ac_t = scan_tabs[ci]
                qtab = qtabs[comp_spec[ci][1]]
                zz = np.zeros(64, dtype=np.int64)
                cat = _huff_read(br, dc_t)
                preds[ci] += _receive_extend(br, cat)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _huff_read(br, ac_t)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _receive_extend(br, size)
                    k += 1
                q = np.zeros(64, dtype=np.int64)
                q[_ZZ] = zz
                f = q.reshape(8, 8) * qtab
                blk = _D8.T @ f.astype(np.float64) @ _D8 + 128.0
                planes[ci][by:by + 8, bx:bx + 8] = blk
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, bl], axis=-1)), 0, 255
    ).astype(np.uint8)


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A real JPEG of the deterministic test pattern (RGB order)."""
    from skopje_spark.operators.multimodal import bmp_pattern

    return encode_jpeg(bmp_pattern(width, height, seed)[:, :, ::-1])


def psnr(a, b) -> float:
    """Peak signal-to-noise ratio between two uint8 arrays (dB)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
