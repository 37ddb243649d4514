"""Connector-surface tests (SURVEY.md §2.1): format round-trips, partitioned
writes with pruning, bucketed exchange-free joins, memory/blackhole sinks."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from presto_db_spark.catalog import load_table
from presto_db_spark.sources import io as pio


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="pds_sources_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, sample, tmpdir, fmt):
    path = os.path.join(tmpdir, f"rt_{fmt}")
    pio.write_table(sample, path, format=fmt)
    back = pio.read_table(spark, path, format=fmt)
    assert back.count() == sample.count()
    a = sorted(
        (int(r[0]), round(float(r[1]), 2))
        for r in sample.select("o_orderkey", "o_totalprice").collect()
    )
    b = sorted(
        (int(r[0]), round(float(r[1]), 2))
        for r in back.select("o_orderkey", "o_totalprice").collect()
    )
    assert a == b


def test_partitioned_write_prunes(spark, sample, tmpdir):
    path = os.path.join(tmpdir, "part_orders")
    pio.write_table(sample, path, partition_by=["o_orderstatus"])
    statuses = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2  # hive-style layout on disk
    back = pio.read_table(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_bucketed_join_no_exchange(spark, sample):
    """Two tables bucketed on the join key must join with zero Exchange."""
    a, b = f"bk_a_{uuid.uuid4().hex[:8]}", f"bk_b_{uuid.uuid4().hex[:8]}"
    pio.write_bucketed_table(sample, a, ["o_custkey"], n_buckets=8)
    pio.write_bucketed_table(
        sample.select("o_custkey", "o_totalprice"), b, ["o_custkey"], n_buckets=8
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a).join(spark.table(b), "o_custkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_memory_and_blackhole(spark, sample):
    name = f"mem_{uuid.uuid4().hex[:8]}"
    out = pio.to_memory_table(sample.limit(100), name)
    assert out.count() == 100
    pio.to_blackhole(sample.limit(10))
    spark.catalog.dropTempView(name)


def test_gated_connectors_raise_cleanly(spark, sample):
    with pytest.raises((NotImplementedError, Exception)):
        pio.read_jdbc(spark, "jdbc:postgresql://nohost/db", "t")
    with pytest.raises((NotImplementedError, Exception)):
        pio.read_kafka_stream(spark, "nohost:9092", "topic")
    with pytest.raises(ValueError):
        pio.write_table(sample, "/tmp/x", format="avro")
