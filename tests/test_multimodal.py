from __future__ import annotations

import pytest

from presto_db_spark.operators import multimodal as mm

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(mm.QUERIES))
def test_multimodal_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, mm.QUERIES[name], mm.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_frame_sample_shape(spark, sf_dir):
    df = mm.QUERIES["multimodal_frame_sample"](spark, sf_dir)
    rows = df.limit(10).collect()
    assert rows and all(r.offset % 64 == 0 for r in rows)


def test_phash_orientation_sensitivity(spark, sf_dir):
    """The aHash must read rows in IMAGE order: recomputing it without
    the bottom-up flip must disagree for at least one doc (i.e. the flip
    is load-bearing, not decorative), and n_above must equal the hash's
    popcount."""
    import numpy as np

    from presto_db_spark.operators import multimodal as mm

    rows = mm.QUERIES["multimodal_phash"](spark, sf_dir).collect()
    assert rows
    diff = 0
    for r in rows:
        assert r.n_above == bin(r.ahash).count("1")
        assert 0 <= r.ahash < (1 << 16)
        d, w, h = r.doc_id, r.width, r.height
        ys = np.arange(h)[:, None]  # NO flip: formula-y == stored row
        xs = np.arange(w)[None, :]
        rr = (d * 3 + xs * 7 + ys * 11) % 256
        gg = (d * 5 + xs * 13 + ys * 3) % 256
        bb = (d * 7 + xs + ys * 17) % 256
        luma = 299 * rr + 587 * gg + 114 * bb
        # unflipped hash: stored row 0 is formula y = h-1 → flipud
        luma_stored = luma[::-1]
        total = int(luma_stored.sum())
        noflip = 0
        for i in range(4):
            for j in range(4):
                s = int(luma_stored[i * h // 4:(i + 1) * h // 4,
                                    j * w // 4:(j + 1) * w // 4].sum())
                area = ((i + 1) * h // 4 - i * h // 4) * ((j + 1) * w // 4 - j * w // 4)
                if s * w * h > total * area:
                    noflip |= 1 << (i * 4 + j)
        diff += noflip != r.ahash
    assert diff > 0, "flip is never observable — hash not orientation-sensitive"


def test_audio_fingerprint_window_boundaries(spark, sf_dir):
    """The fingerprint must come from the REAL parsed PCM: recompute the
    energy-delta bits locally from the synthesis formula and integer
    window boundaries; n_rising is the popcount; a deliberate off-by-one
    boundary (ceil instead of floor split) must disagree somewhere."""
    from presto_db_spark.operators import multimodal as mm

    rows = mm.QUERIES["multimodal_audio_fingerprint"](spark, sf_dir).collect()
    assert rows
    wrong_boundary_diff = 0
    for r in rows:
        d, n = r.doc_id, r.n_frames
        assert n == 400 + (d % 5) * 80
        amp = [abs(((d * 31 + i * i * 7) % 2001) - 1000) for i in range(n)]
        W = mm._AFP_WINDOWS

        def fp(bounds):
            w = [sum(amp[bounds[k]:bounds[k + 1]]) for k in range(W)]
            return sum(1 << k for k in range(W - 1) if w[k + 1] > w[k])

        good = fp([k * n // W for k in range(W)] + [n])
        # one-sample boundary shift as the negative control (the fixture's
        # n are all multiples of 8, so a ceil-vs-floor split is identical)
        bad = fp([0] + [k * n // W + 1 for k in range(1, W)] + [n])
        assert r.afp == good
        assert r.n_rising == bin(good).count("1")
        wrong_boundary_diff += bad != good
    assert wrong_boundary_diff > 0, "boundary rule never observable"
