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


def test_parse_kafka_records_batch_and_stream(spark, tmp_path):
    """Kafka wire-format decode (the broker-free half of presto-kafka):
    UTF-8 keys, JSON values into a typed struct, malformed → NULL struct,
    metadata preserved — identical code path for batch and readStream."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from presto_db_spark.sources.io import parse_kafka_records

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("action", T.StringType()),
        ]
    )
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (b"k1", b'{"user_id": 7, "action": "click"}', "events", 0, 0, ts),
        (b"k2", b'{"user_id": 8, "action": "buy"}', "events", 0, 1, ts),
        (b"k3", b"not json at all", "events", 1, 0, ts),
        (None, b'{"user_id": 9, "action": "view"}', "events", 1, 1, ts),
    ]
    wire_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
    records = spark.createDataFrame(rows, wire_schema)

    out = {(r.partition, r.offset): r for r in parse_kafka_records(records, schema)
           .select("key", "value.*", "partition", "offset").collect()}
    r01 = out[(0, 1)]
    assert r01.user_id == 8 and r01.action == "buy" and r01.key == "k2"
    bad = [r for r in out.values() if r.user_id is None and r.action is None]
    assert len(bad) == 1  # malformed JSON -> NULL struct, row kept

    # identical call on a stream: write the wire frame as parquet, readStream it
    src = str(tmp_path / "wire")
    records.write.parquet(src)
    stream = spark.readStream.schema(wire_schema).parquet(src)
    q = (
        parse_kafka_records(stream, schema)
        .filter(F.col("value").isNotNull())
        .writeStream.format("memory")
        .queryName("kafka_decoded")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT value.user_id FROM kafka_decoded").collect()
    assert sorted(r.user_id for r in got if r.user_id is not None) == [7, 8, 9]


def test_jdbc_live_roundtrip_derby(spark, sf_dir):
    """LIVE JDBC connector test against the bundled embedded Derby driver
    (presto-base-jdbc parity, previously environment-gated): write a
    table over JDBC, read it back, read it PARTITIONED (4 parallel
    splits on the key — the reference's ConnectorSplitSource analog),
    and prove source-side filter pushdown reaches the JDBC scan."""
    import tempfile

    from presto_db_spark.sources.io import read_jdbc, write_jdbc

    db = tempfile.mkdtemp(prefix="derby_") + "/pds_testdb"
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_jdbc(nation, url, "nation_jdbc", driver=driver)

    back = read_jdbc(spark, url, "nation_jdbc", driver=driver)
    assert back.count() == nation.count()
    assert sorted(c.lower() for c in back.columns) == sorted(
        c.lower() for c in nation.columns)

    part = read_jdbc(
        spark, url, "nation_jdbc", driver=driver,
        partitionColumn="N_NATIONKEY", lowerBound=0, upperBound=25,
        numPartitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == nation.count()

    flt = back.filter("N_REGIONKEY = 2")
    plan = flt._sc._jvm.PythonSQLUtils.explainString(
        flt._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,2)" in plan
    exact = nation.filter("n_regionkey = 2").count()
    assert flt.count() == exact
