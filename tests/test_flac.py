"""FLAC codec unit tests (operators/flaccodec.py).

The registry op `multimodal_flac_roundtrip` oracle-checks decoded sums
closed-form; these tests cover the codec-internal guarantees the SQL
oracle doesn't see: bit-exact roundtrips per subframe type, real
compression on predictable signals, CRC/MD5 corruption detection, frame
segmentation, and envelope rejections.
"""

from __future__ import annotations

import numpy as np
import pytest

from presto_db_spark.operators.flaccodec import (
    BLOCK,
    _crc8,
    _crc16,
    _read_utf8_number,
    _BitReader,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def test_roundtrip_noise_exact():
    rng = np.random.RandomState(5)
    x = [int(v) for v in rng.randint(-32768, 32768, 3000)]
    chans, meta = decode_flac(encode_flac(x))
    assert chans[0] == x
    assert meta["total_samples"] == 3000 and meta["bps"] == 16


def test_roundtrip_multiframe_and_compression():
    t = np.arange(3 * BLOCK + 123)
    x = [int(v) for v in (1000 * np.sin(t / 50)).astype(int)]
    data = encode_flac(x)
    chans, meta = decode_flac(data)
    assert chans[0] == x
    assert meta["n_frames"] == 4  # 3 full blocks + 123-sample tail
    assert len(data) < 0.3 * (2 * len(x))  # fixed predictors really compress


def test_constant_subframe():
    x = [-12345] * (BLOCK + 10)
    data = encode_flac(x)
    chans, meta = decode_flac(data)
    assert chans[0] == x
    assert len(data) < 120  # CONSTANT subframes are O(1) per frame


def test_linear_ramp_order2_zero_residuals():
    x = list(range(-3000, 3000, 2))
    data = encode_flac(x)
    assert decode_flac(data)[0][0] == x
    assert len(data) < 0.2 * (2 * len(x))


def test_crc_and_md5_catch_corruption():
    rng = np.random.RandomState(9)
    x = [int(v) for v in rng.randint(-2000, 2000, 2000)]
    good = encode_flac(x)
    for flip_at in (50, len(good) // 2, len(good) - 3):
        bad = bytearray(good)
        bad[flip_at] ^= 0x10
        with pytest.raises((ValueError, IndexError)):
            decode_flac(bytes(bad))


def test_utf8_number_roundtrip():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        enc = _utf8_number(n)
        assert _read_utf8_number(_BitReader(enc)) == n


def test_crc_vectors():
    # linearity/identity sanity: CRC of empty is 0 for both init-0 CRCs,
    # and single-byte CRC8 of 0x00 is 0
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"\x00") == 0
    # known CRC-16/BUYPASS check value for "123456789"
    assert _crc16(b"123456789") == 0xFEE8


def test_envelope_rejections():
    with pytest.raises(ValueError):
        encode_flac([])
    with pytest.raises(ValueError):
        encode_flac([40000])
    with pytest.raises(ValueError):
        decode_flac(b"RIFFnot-a-flac")
