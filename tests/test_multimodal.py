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
