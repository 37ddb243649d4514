"""Real baseline-sequential JPEG codec — stdlib + numpy, no codec libs.

VERDICT r11 directive #7: retire the biggest member of the multimodal
codec gate. This module is a from-scratch ITU-T.81 baseline implementation
(the same profile `presto-hive`'s media-adjacent tooling would meet with
libjpeg — the reference itself has no multimodal surface at all):

* **Encoder**: 8×8 block split with edge-replication padding, level
  shift, orthonormal 2-D DCT (precomputed cosine matrix), quality-scaled
  Annex-K quantization tables, zigzag, DC DPCM + AC run-length, Annex-K
  Huffman tables, byte stuffing, and the full marker layout (SOI, APP0
  JFIF, DQT, SOF0, DHT, SOS, EOI). Grayscale (1 component) or YCbCr with
  4:4:4 / 4:2:0 chroma subsampling (2×2 mean).
* **Decoder**: a real marker-walking parser — it decodes any
  baseline-sequential JPEG within its declared envelope (8-bit, 1 or 3
  components, sampling factors ≤ 2, DRI/RSTn restart markers), not just
  this encoder's output: DQT (8-bit tables), DHT (BITS → canonical code
  reconstruction per spec §C.2), SOF0, SOS, entropy-coded segment with
  byte unstuffing, EXTEND sign recovery (spec §F.2.2.1), dequantize,
  inverse zigzag, IDCT, level unshift, clamp, chroma replication
  upsample, and padding crop.

Exactness contract used by the oracle-checked roundtrip operator: at
quality 100 every quantizer is 1, and a block-CONSTANT 8×8 tile has
DC = 8·(v−128) with all AC mathematically zero (float residue ~1e−13
rounds away), so decode(encode(img)) == img EXACTLY for block-constant
planes — including through the 2×2 chroma mean (constant regions) and
replication upsample. Non-constant content is near-lossless at q100 and
covered by pytest bounds (tests/test_jpeg.py), since float DCT/IDCT
round-off is not SQL-oracle-expressible.

Progressive, arithmetic-coded, 12-bit, and 4-component JPEGs are out of
envelope and raise ValueError with the reason.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (ITU-T.81) ----------------------------------------------

QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# zigzag[i] = raster index of the i-th coefficient in zigzag order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Standard Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]

# Orthonormal DCT basis: DCT2 = M @ B @ M.T, IDCT = M.T @ F @ M
_M = np.zeros((8, 8))
_M[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
for _u in range(1, 8):
    for _x in range(8):
        _M[_u, _x] = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention, jcparam.c):
    scale = 5000/q for q<50 else 200-2q; entry = clamp(1..255) of
    (base*scale + 50)//100. At q=100 every entry is 1."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Spec §C.2 canonical code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, low bits) for a DPCM/AC value per spec §F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to 8-multiples, DCT+quantize every 8×8 block.
    Returns int32 array (by, bx, 64) in zigzag order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane.astype(np.float64) - 128.0, ((0, ph), (0, pw)), mode="edge")
    hh, ww = p.shape
    blocks = p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxz,vz->byuv", _M, blocks, _M)
    q = np.round(coef.reshape(hh // 8, ww // 8, 64)[:, :, ZIGZAG]
                 / qtbl[np.newaxis, np.newaxis, :]).astype(np.int32)
    return q


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def encode_baseline(
    planes: list[np.ndarray], quality: int = 90, subsample: bool = True
) -> bytes:
    """Encode a baseline JPEG. ``planes`` is ``[Y]`` (grayscale) or
    ``[Y, Cb, Cr]`` at full resolution (chroma is 2×2-mean downsampled
    here when ``subsample``); all uint8 2-D arrays of one shape."""
    if len(planes) not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) planes")
    h, w = planes[0].shape
    color = len(planes) == 3
    qt_l = scale_qtable(QTBL_LUMA, quality)
    qt_c = scale_qtable(QTBL_CHROMA, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0x00]) + bytes(int(x) for x in qt_l))
    if color:
        out += _marker(0xDB, bytes([0x01]) + bytes(int(x) for x in qt_c))
    # SOF0
    samp = (0x22 if subsample else 0x11) if color else 0x11
    comps = [(1, samp, 0)] + ([(2, 0x11, 1), (3, 0x11, 1)] if color else [])
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, s, tq in comps:
        sof += bytes([cid, s, tq])
    out += _marker(0xC0, sof)
    # DHT (all four tables when color, two when gray)
    specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if color:
        specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc_th, bits, vals in specs:
        out += _marker(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytes([len(comps)])
    for cid, _, tq in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _marker(0xDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if color and subsample:
        # 2x2 mean with edge replication to even dims first
        def down(p: np.ndarray) -> np.ndarray:
            pp = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.int64)
            return ((pp[0::2, 0::2] + pp[0::2, 1::2]
                     + pp[1::2, 0::2] + pp[1::2, 1::2] + 2) // 4).astype(np.uint8)

        data = [(_encode_plane_blocks(planes[0], qt_l), dc_l, ac_l, 2),
                (_encode_plane_blocks(down(planes[1]), qt_c), dc_c, ac_c, 1),
                (_encode_plane_blocks(down(planes[2]), qt_c), dc_c, ac_c, 1)]
    else:
        tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)
        data = [(_encode_plane_blocks(p, qt_l if i == 0 else qt_c),
                 tabs[i][0], tabs[i][1], 1)
                for i, p in enumerate(planes)]

    bw = _BitWriter()
    pred = [0] * len(planes)

    def put_block(blk: np.ndarray, ci: int, dct: dict, act: dict) -> None:
        diff = int(blk[0]) - pred[ci]
        pred[ci] = int(blk[0])
        cat, bits_v = _magnitude(diff)
        c, ln = dct[cat]
        bw.put(c, ln)
        if cat:
            bw.put(bits_v, cat)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = act[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            cat, bits_v = _magnitude(v)
            c, ln = act[(run << 4) | cat]
            bw.put(c, ln)
            bw.put(bits_v, cat)
            run = 0
        if run:
            c, ln = act[0x00]  # EOB
            bw.put(c, ln)

    # MCU interleave: luma hxv blocks then one block per chroma component
    yb, _, _, yfac = data[0]
    mby, mbx = yb.shape[0], yb.shape[1]
    if color and subsample:
        mcy, mcx = (mby + 1) // 2, (mbx + 1) // 2
        for my in range(mcy):
            for mx in range(mcx):
                for dy in range(2):
                    for dx in range(2):
                        by, bx = my * 2 + dy, mx * 2 + dx
                        blk = (yb[by, bx] if by < mby and bx < mbx
                               else _pad_block(yb, by, bx))
                        put_block(blk, 0, dc_l, ac_l)
                for ci in (1, 2):
                    cb = data[ci][0]
                    put_block(cb[my, mx], ci, dc_c, ac_c)
    else:
        for by in range(mby):
            for bx in range(mbx):
                for ci, (blocks, dct, act, _) in enumerate(data):
                    put_block(blocks[by, bx], ci, dct, act)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _pad_block(blocks: np.ndarray, by: int, bx: int) -> np.ndarray:
    """MCU-completion block: replicate the nearest edge block (its DC
    keeps the DPCM chain smooth; content is discarded on crop)."""
    return blocks[min(by, blocks.shape[0] - 1), min(bx, blocks.shape[1] - 1)]


class _BitReader:
    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                raise _RestartMarker()
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def reset(self) -> None:
        self._acc = 0
        self._n = 0

    def skip_rst(self) -> None:
        # byte-align is implied by reset(); consume the RSTn marker bytes
        while self.buf[self.pos] != 0xFF or not (
            0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _build_decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup per canonical assignment."""
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


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    """Spec §F.2.2.1 sign extension of a magnitude-category value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_baseline(data: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode a baseline-sequential JPEG (see module docstring envelope).
    Returns ``(planes, meta)``: full-resolution uint8 planes (chroma
    replication-upsampled; gray → 1 plane) and a metadata dict with
    width/height/precision/n_components/qtable sums/huffman counts."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    meta: dict = {"n_huff_codes": 0, "restart_interval": 0}
    frame = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline-8")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif tag == 0xC4:  # DHT (possibly several)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_tree(bits, vals)
                meta["n_huff_codes"] += n
                i += 17 + n
        elif tag == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0x0F,
                              "tq": tq})
            frame = {"prec": prec, "h": h, "w": w, "comps": comps}
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError("not baseline-sequential (SOF0) — out of envelope")
        elif tag == 0xDD:  # DRI
            (meta["restart_interval"],) = struct.unpack_from(">H", body, 0)
        elif tag == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    if frame["prec"] != 8:
        raise ValueError("only 8-bit precision is baseline")
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise ValueError("1 or 3 components supported")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 unsupported")
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    sc_by_id = {s["cs"]: s for s in scan}
    inv_zz = np.zeros(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    ri = meta["restart_interval"]
    n_mcu = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and n_mcu and n_mcu % ri == 0:
                    br.reset()
                    br.skip_rst()
                    pred = {c["id"]: 0 for c in comps}
                n_mcu += 1
                for c in comps:
                    s = sc_by_id[c["id"]]
                    dct = htables[(0, s["td"])]
                    act = htables[(1, s["ta"])]
                    for dy in range(c["vs"]):
                        for dx in range(c["hs"]):
                            zz = np.zeros(64, dtype=np.int64)
                            cat = _read_symbol(br, dct)
                            diff = _extend(br.bits(cat), cat) if cat else 0
                            pred[c["id"]] += diff
                            zz[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = _read_symbol(br, act)
                                r, s_cat = rs >> 4, rs & 0x0F
                                if s_cat == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                zz[k] = _extend(br.bits(s_cat), s_cat)
                                k += 1
                            c["coef"][
                                my * c["vs"] + dy, mx * c["hs"] + dx
                            ] = zz
    except _RestartMarker:
        # an RSTn at an unexpected bit position (corrupt / out-of-envelope
        # stream) — surface the module's documented contract error, never
        # the private signalling type
        raise ValueError("unexpected restart marker in scan") from None
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        deq = (c["coef"] * q[np.newaxis, np.newaxis, :])[:, :, inv_zz]
        blocks = deq.reshape(c["bh"], c["bw"], 8, 8).astype(np.float64)
        pix = np.einsum("xu,byuv,vz->byxz", _M.T, blocks, _M)
        full = (
            pix.transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        full = np.clip(np.round(full + 128.0), 0, 255).astype(np.uint8)
        # upsample by replication to full resolution, then crop
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            full = np.repeat(np.repeat(full, ry, axis=0), rx, axis=1)
        planes.append(full[:h, :w])
    meta.update(
        width=w, height=h, precision=frame["prec"], n_components=len(comps),
        qtable_sums={tq: int(t.sum()) for tq, t in qtables.items()},
    )
    return planes, meta


def parse_metadata(data: bytes) -> dict:
    """Header-only parse (SOI/APP0/DQT/DHT/SOF0): dimensions, precision,
    component count and sampling, quant-table sums, Huffman code counts —
    the corpus-audit path that never touches the entropy-coded segment."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    meta: dict = {"n_huff_codes": 0, "qtable_sums": {}}
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = data[pos + 1]
        if tag in (0xD9, 0xDA):
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:
            i = 0
            while i < len(body):
                tq = body[i] & 0x0F
                meta["qtable_sums"][tq] = int(
                    np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                    .astype(np.int64).sum()
                )
                i += 65
        elif tag == 0xC4:
            i = 0
            while i < len(body):
                n = sum(body[i + 1 : i + 17])
                meta["n_huff_codes"] += n
                i += 17 + n
        elif tag == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            meta.update(width=w, height=h, precision=prec, n_components=nc)
            meta["luma_sampling"] = int(body[7])
        pos += 2 + seglen
    if "width" not in meta:
        raise ValueError("missing SOF0")
    return meta
