"""Sources & sinks — the connector surface (SURVEY.md §2.1).

The reference ships per-connector Maven modules implementing the SPI in
``presto-spi/.../spi/connector/``: native ORC (``presto-orc/``), Parquet
(``presto-parquet/``, ``presto-hive/.../parquet/ParquetPageSource.java:47``),
RCFile, Hive, the JDBC family (``presto-base-jdbc/`` + mysql/postgresql/…),
``presto-memory/``, ``presto-blackhole/``, ``presto-kafka/``,
``presto-local-file/``. Spark's DataSource V2 framework plays the SPI role;
this module is the thin, uniform facade over it plus the two capabilities
that matter at 100 TB:

* **partitioned writes** → hive-style directory partitioning → partition
  pruning at read time;
* **bucketed tables** → ``bucketBy`` + ``sortBy`` → co-located,
  exchange-free joins and aggregations on the bucket key (the reference's
  grouped execution, ``pm/operator/StageExecutionDescriptor.java``).

Formats needing services absent from this container (JDBC drivers, Kafka
brokers, Avro package) are import/option-gated with clear errors — the
plumbing is real, the service is not in the test environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: formats fully usable in this environment (built into Spark core)
NATIVE_FORMATS = ("parquet", "orc", "json", "csv", "text")


def read_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Uniform reader. CSV defaults to header+inferSchema unless a schema is
    given (schema-on-read is the scalable path: no inference pass)."""
    fmt = format.lower()
    if fmt not in NATIVE_FORMATS:
        raise ValueError(f"unsupported format {format!r}; use one of {NATIVE_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Uniform path writer (``TableWriterOperator`` role; Spark's commit
    protocol provides the ``TableFinishOperator`` transactional finish)."""
    fmt = format.lower()
    if fmt not in NATIVE_FORMATS:
        raise ValueError(f"unsupported format {format!r}; use one of {NATIVE_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_cols`` between tables
    with the same bucketing need NO exchange (verified in tests). This is
    the 100 TB lever for repeated large-table joins — shuffle once at write
    time, never again at read time."""
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(name)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: str = "zkey",
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write (Delta ``OPTIMIZE ZORDER`` /
    Iceberg sort-order shape): range-partition on the Morton key, sort
    within each partition, drop the key from the payload.  Every output
    file then covers a tight zkey range, so its parquet row-group
    min/max statistics are tight on EVERY source column of the
    interleave and a filtered read prunes most row groups
    (``operators/warehouse.layout_zorder`` computes the key;
    ``tests/test_zorder_layout.py`` proves the pruning end-to-end
    against an unclustered write of the same rows).

    100 TB: one range exchange (sampled range boundaries) + a
    within-partition sort — the standard one-shuffle layout-rewrite
    cost, paid once at write time like ``write_bucketed_table``."""
    (
        df.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )


def to_memory_table(df: DataFrame, name: str) -> DataFrame:
    """presto-memory equivalent: materialize as a cached temp view."""
    df.createOrReplaceTempView(name)
    out = df.sparkSession.table(name)
    out.cache().count()
    return out


def to_blackhole(df: DataFrame) -> None:
    """presto-blackhole / DevNullOperator: full execution, discarded output."""
    df.write.format("noop").mode("overwrite").save()


def read_text_skipping(
    spark: SparkSession,
    path: str,
    schema: str,
    header_lines: int = 0,
    footer_lines: int = 0,
    delimiter: str = "|",
    encoding: str = "utf-8",
) -> DataFrame:
    """Delimited-text reader with per-file header/footer skipping — the
    hive connector's ``skip.header.line.count`` / ``skip.footer.line.count``
    table properties (reference: presto-hive table-property plumbing;
    product-test fixture ``datasets/table_with_header*.ddl`` declares
    exactly this).  Spark's csv source only handles a 1-line header and
    has no footer skipping, so this reads each file WHOLE via the
    ``binaryFile`` source and decodes it in one Arrow stage:

    * one task per file, parallel across files, zero shuffles;
    * footer skipping needs the file's end, so per-file reading is the
      only correct unit (Hive itself refuses to split footer-skipping
      files for the same reason) — a single file must fit in an executor,
      the same contract as any non-splittable input (gzip text);
    * ``schema`` is a Spark DDL string ("id INT, data STRING"); cells are
      split on ``delimiter`` and cast column-wise (invalid casts → NULL,
      hive's lax text semantics).
    """
    import pandas as pd
    from pyspark.sql import types as T

    struct = T.StructType.fromDDL(schema)
    names = [f.name for f in struct.fields]
    raw_schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
    )

    def decode(batches):
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for content in pdf["content"]:
                lines = bytes(content).decode(encoding).splitlines()
                end = len(lines) - footer_lines
                for ln in lines[header_lines:end]:
                    cells = ln.split(delimiter)
                    for i, n in enumerate(names):
                        cols[n].append(cells[i] if i < len(cells) else None)
            yield pd.DataFrame(cols, columns=names, dtype=object)

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=raw_schema)
    )
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in struct.fields]
    )


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC family (``presto-base-jdbc/``): reads a JDBC table, with the
    partitioned-read options (partitionColumn/lowerBound/upperBound/
    numPartitions — the parallel-scan splits of the reference's
    ``ConnectorSplitSource``) and source-side filter pushdown
    (``PushedFilters`` in the scan, like the reference's TupleDomain →
    JDBC WHERE pushdown). LIVE-tested against the bundled embedded Derby
    driver (write → partitioned read → pushdown, ``test_sources.py``);
    any external driver jar on the classpath works the same way."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # e.g. external driver jar missing
        raise NotImplementedError(
            "JDBC driver for this URL not available; add the driver jar via "
            "spark.jars and this call works unchanged (embedded Derby is "
            "bundled and live-tested)"
        ) from exc


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               **properties) -> None:
    """JDBC writer (``presto-base-jdbc`` write path / TableWriterOperator
    over a JDBC sink)."""
    df.write.jdbc(url, table, mode=mode, properties=properties)


def read_kafka_stream(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """presto-kafka equivalent — but as a true stream (the reference scans
    topics as batch tables; SURVEY.md §2.10). Requires the
    spark-sql-kafka package, absent here."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:
        raise NotImplementedError(
            "spark-sql-kafka not available in this container; on a deployment, "
            "add the package via spark.jars.packages and this call works unchanged"
        ) from exc


def parse_kafka_records(records: DataFrame, value_schema) -> DataFrame:
    """Decode the Kafka wire schema into typed rows — the half of the
    presto-kafka connector (``presto-kafka/.../KafkaRecordSet.java`` row
    decoders) that does NOT need a broker, so it is fully testable here.

    ``records`` carries Spark's Kafka source shape: key/value BINARY plus
    (topic, partition, offset, timestamp) metadata. Works identically on a
    batch frame or on readStream output: keys decode as UTF-8, values
    from_json into ``value_schema``; malformed JSON yields a NULL struct
    (PERMISSIVE — the reference's decoder emits NULL columns likewise),
    kept so the caller can route a dead-letter stream. Metadata columns
    ride along for offset-based dedup/replay.
    """
    return records.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
