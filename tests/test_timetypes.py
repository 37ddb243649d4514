"""TIME / TIME WITH TIME ZONE model (SURVEY §1.2 gap row) vs DuckDB."""

from __future__ import annotations

import pytest

from presto_db_spark.operators import timetypes

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(timetypes.QUERIES))
def test_timetypes_vs_duckdb(spark, sf_dir, name):
    problems = check_query(
        spark, name, timetypes.QUERIES[name], timetypes.ORACLE.get(name), sf_dir
    )
    assert not problems, f"{name}: {problems}"


def test_at_timezone_sql(spark, sf_dir):
    from presto_db_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    r = eng.sql(
        "SELECT at_timezone(TIMESTAMP '2020-06-01 12:00:00', 'Asia/Kolkata') k, "
        "       at_timezone(TIMESTAMP '2020-06-01 12:00:00', 'America/New_York') ny"
    ).collect()[0]
    assert str(r.k) == "2020-06-01 17:30:00"
    assert str(r.ny) == "2020-06-01 08:00:00"  # EDT, -4 in June


def test_timetz_normalization_roundtrip(spark):
    from pyspark.sql import functions as F

    from presto_db_spark.operators.timetypes import (
        time_with_timezone,
        timetz_to_utc_millis,
    )

    df = spark.createDataFrame(
        [(0,), (1,), (86_399_999,), (19_800_000,)], ["ms"]
    ).select(
        "ms",
        timetz_to_utc_millis(
            time_with_timezone((F.col("ms") + 330 * 60_000) % 86_400_000, F.lit(330))
        ).alias("back"),
    )
    assert all(r.ms == r.back for r in df.collect())
