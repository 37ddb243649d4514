"""Structured Streaming veneer over the event pipeline.

The reference has NO streaming runtime (SURVEY.md §2.10 — presto-kafka is a
batch scan of offsets). This module is the post-parity extension the build
plan calls for: the same event aggregations exposed on ``readStream`` with
watermarks, so the engine covers late-data pipelines at scale.

Parity proof: ``streaming_tumbling`` runs the *streaming* pipeline with an
``availableNow`` trigger over the same parquet and returns the finished
result — the driver's DuckDB oracle checks it against the batch SQL. The
streaming and batch plans are the same Catalyst expressions; watermark +
append mode only change completeness semantics, which availableNow closes.

Scale notes: file-source streaming shards by files (maxFilesPerTrigger);
the tumbling agg is a stateful window agg with watermark-based state
eviction — at 100 TB/day the state store holds only open windows
(1h window + 1h watermark → bounded state), checkpointed incrementally.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table  # noqa: F401  (used by events_stream schema path)

QUERIES = {}
ORACLE = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema from the batch reader,
    including the nanos→micros ts normalization)."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source needs a *directory*; the driver testdata is a
    # single parquet file, so expose it through a temp symlink dir (no
    # copy). On a real deployment the events feed is already a directory
    # (or Kafka) and this indirection disappears.
    import os

    stage = tempfile.mkdtemp(prefix="pds_stream_src_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts(stream: DataFrame) -> DataFrame:
    """1h tumbling window with 1h watermark: count + exact-cents value sum
    per (window, event_type)."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(F.round(F.col("value") * 100)) / 100, 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@_q(
    "streaming_tumbling",
    """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(round(value * 100)) / 100, 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming pipeline to completion (availableNow) and return
    the materialized result — batch SQL is the oracle."""
    sink = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pds_ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
