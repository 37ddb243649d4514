"""Central query registry: name → (spark_fn, oracle_sql | None).

``__spark_entry__.py`` re-exports this. Every operator family module
contributes its QUERIES/ORACLE dicts; a missing oracle entry means the
driver records a weaker rows-only check (reserved for genuinely
non-SQL-expressible operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES: list[str] = [
    "presto_db_spark.operators.tpch",
    "presto_db_spark.operators.tpcds",
    "presto_db_spark.operators.tpcds2",
    "presto_db_spark.operators.relational",
    "presto_db_spark.operators.relational2",
    "presto_db_spark.operators.rangejoin",
    "presto_db_spark.operators.skew",
    "presto_db_spark.operators.sketch",
    "presto_db_spark.operators.tdigest",
    "presto_db_spark.operators.geo",
    "presto_db_spark.operators.wkt",
    "presto_db_spark.operators.wkt2",
    "presto_db_spark.operators.pandas_surface",
    "presto_db_spark.operators.functions_corpus",
    "presto_db_spark.operators.functions_corpus2",
    "presto_db_spark.operators.functions_corpus3",
    "presto_db_spark.operators.events",
    "presto_db_spark.operators.timetypes",
    "presto_db_spark.operators.text",
    "presto_db_spark.operators.dedup",
    "presto_db_spark.operators.pipeline_corpus",
    "presto_db_spark.operators.similarity",
    "presto_db_spark.operators.multimodal",
    "presto_db_spark.streaming.pipeline",
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLE", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names from {modname}: {sorted(dup)}")
        queries.update(q)
        oracle.update(o)
    unknown = set(oracle) - set(queries)
    if unknown:
        raise ValueError(f"oracle entries without queries: {sorted(unknown)}")
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
