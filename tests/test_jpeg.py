"""Baseline JPEG codec unit tests (operators/jpegcodec.py).

The registry op `multimodal_jpeg_roundtrip` oracle-checks the EXACT
contract (quality-100 block-constant planes). These tests cover what the
SQL oracle cannot express: real AC coefficients through every magnitude
path (float DCT/IDCT round-off), lossy-quality behavior, the 4:4:4 and
grayscale variants, canonical Huffman construction, and envelope
rejections (non-baseline SOF, truncation).
"""

from __future__ import annotations

import numpy as np
import pytest

from presto_db_spark.operators.jpegcodec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QTBL_LUMA,
    _build_codes,
    decode_baseline,
    encode_baseline,
    parse_metadata,
    scale_qtable,
)


def _rng():
    return np.random.RandomState(1234)


def test_blockconstant_exact_gray_and_color():
    rng = _rng()
    gray = np.repeat(np.repeat(rng.randint(0, 256, (3, 5)), 8, 0), 8, 1).astype(np.uint8)
    out, meta = decode_baseline(encode_baseline([gray], quality=100))
    assert np.array_equal(out[0], gray)
    assert (meta["width"], meta["height"], meta["n_components"]) == (40, 24, 1)

    y = np.repeat(np.repeat(rng.randint(0, 256, (4, 6)), 8, 0), 8, 1).astype(np.uint8)
    cb = np.repeat(np.repeat(rng.randint(0, 256, (2, 3)), 16, 0), 16, 1).astype(np.uint8)
    cr = np.repeat(np.repeat(rng.randint(0, 256, (2, 3)), 16, 0), 16, 1).astype(np.uint8)
    for subsample in (True, False):
        planes, meta = decode_baseline(
            encode_baseline([y, cb, cr], quality=100, subsample=subsample)
        )
        for got, want in zip(planes, (y, cb, cr)):
            assert np.array_equal(got, want), subsample
        assert meta["n_components"] == 3


def test_odd_dimensions_pad_and_crop():
    rng = _rng()
    y = np.repeat(np.repeat(rng.randint(0, 256, (3, 3)), 8, 0), 8, 1)[:17, :21].astype(np.uint8)
    cb = np.repeat(np.repeat(rng.randint(0, 256, (2, 2)), 16, 0), 16, 1)[:17, :21].astype(np.uint8)
    cr = np.repeat(np.repeat(rng.randint(0, 256, (2, 2)), 16, 0), 16, 1)[:17, :21].astype(np.uint8)
    planes, meta = decode_baseline(encode_baseline([y, cb, cr], quality=100))
    assert planes[0].shape == (17, 21)
    for got, want in zip(planes, (y, cb, cr)):
        assert np.array_equal(got, want)


def test_nonconstant_q100_near_lossless():
    # random content drives real AC coefficients through every magnitude
    # category, ZRL and EOB paths, and byte stuffing (0xFF in the stream)
    rng = _rng()
    img = rng.randint(0, 256, size=(48, 64)).astype(np.uint8)
    planes, _ = decode_baseline(encode_baseline([img], quality=100))
    assert int(np.abs(planes[0].astype(int) - img.astype(int)).max()) <= 2


def test_lossy_quality_monotonic_and_bounded():
    rng = _rng()
    # smooth gradient content: quantization error small, size shrinks with q
    ys, xs = np.mgrid[0:40, 0:48]
    img = ((ys * 3 + xs * 2) % 200 + 20).astype(np.uint8)
    sizes, errs = [], []
    for q in (90, 75, 50):
        data = encode_baseline([img], quality=q)
        planes, _ = decode_baseline(data)
        sizes.append(len(data))
        errs.append(float(np.abs(planes[0].astype(int) - img.astype(int)).mean()))
    assert sizes[0] > sizes[2], sizes  # lower quality -> smaller file
    assert errs[2] < 32.0, errs  # q50 still resembles the input


def test_huffman_tables_canonical_and_prefix_free():
    dc = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(dc) == 12 and len(ac) == 162
    for table in (dc, ac):
        codes = sorted((ln, c) for c, ln in table.values())
        as_bits = [format(c, f"0{ln}b") for ln, c in codes]
        for i, a in enumerate(as_bits):
            for b in as_bits[i + 1 :]:
                assert not b.startswith(a), (a, b)


def test_qtable_scaling_formula():
    assert int(scale_qtable(QTBL_LUMA, 100).sum()) == 64
    t50 = scale_qtable(QTBL_LUMA, 50)
    assert np.array_equal(t50, np.maximum(1, (QTBL_LUMA * 100 + 50) // 100))
    with pytest.raises(ValueError):
        scale_qtable(QTBL_LUMA, 0)


def test_metadata_parse_matches_encoder():
    rng = _rng()
    img = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    for q in (50, 75, 95):
        m = parse_metadata(encode_baseline([img], quality=q))
        assert (m["width"], m["height"], m["precision"]) == (32, 24, 8)
        assert m["n_components"] == 1 and m["luma_sampling"] == 0x11
        assert m["n_huff_codes"] == 174  # 12 DC + 162 AC (grayscale)
        assert m["qtable_sums"][0] == int(scale_qtable(QTBL_LUMA, q).sum())


def test_envelope_rejections():
    rng = _rng()
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_baseline([img], quality=90))
    # flip SOF0 (0xC0) to SOF2 progressive: must refuse, not mis-decode
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline(bytes(data))
    with pytest.raises(ValueError):
        decode_baseline(b"\x89PNG\r\n\x1a\n")
    with pytest.raises((ValueError, IndexError, KeyError)):
        decode_baseline(bytes(encode_baseline([img], quality=90))[:40])


def test_unexpected_restart_marker_is_contract_error():
    # splice an RSTn into the entropy stream at a position the decoder
    # does not expect one (restart_interval == 0): the private
    # _RestartMarker signal must surface as the documented ValueError
    rng = _rng()
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_baseline([img], quality=90))
    sos = data.find(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    data[scan_start + 4 : scan_start + 4] = b"\xff\xd0"
    with pytest.raises(ValueError, match="restart marker"):
        decode_baseline(bytes(data))
