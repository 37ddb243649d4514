"""Index lookup join — the ``IndexJoinOperator`` family analog.

Reference: ``pm/operator/index/`` (IndexLoader / IndexSourceOperator /
PageBufferOperator driving a connector-provided key→rows index),
plan node ``pm/sql/planner/plan/IndexJoinNode.java``, selection
``pm/sql/planner/optimizations/IndexJoinOptimizer.java``.  The reference
streams the probe side and, per batch of probe keys, executes POINT
LOOKUPS against the indexed source instead of scanning it.

Spark-first re-expression: parquet's row-group min/max statistics ARE the
index.  The probe side's DISTINCT keys (the optimizer only selects an
index join when the probe key set is small — IndexJoinOptimizer requires
an indexable source and bounded lookups; we enforce the same
applicability gate with ``max_keys``) are collected and pushed into the
indexed table's scan as an ``In`` filter, so the scan prunes row groups
and never reads the non-matching bulk — the moral equivalent of the
point lookup, expressed declaratively so Catalyst shows ``PushedFilters:
[In(key, ...)]`` on the scan (plan-gated in ``tests/test_relational2.py``).
The join itself then broadcasts the (small) probe side.

100 TB: the indexed fact stays partitioned; only row groups whose
min/max straddle a probe key are read.  Sorting/clustering the fact by
the key at write time (``sources/io.py`` bucketed write) tightens the
stats exactly like rebuilding an index.  The applicability gate fails
loudly past ``max_keys`` — the same "index join or nothing" contract the
reference's optimizer applies, never a silent full scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

MAX_INDEX_KEYS = 10_000  # applicability gate (IndexJoinOptimizer analog)


def index_lookup_join(
    probe: DataFrame,
    indexed: DataFrame,
    probe_key: str,
    index_key: str,
    *,
    max_keys: int = MAX_INDEX_KEYS,
) -> DataFrame:
    """Join ``probe`` against ``indexed`` by pushing the probe's distinct
    keys into the indexed side's scan (``isin`` → parquet ``In`` pushdown
    → row-group pruning), then broadcasting the probe side.  Raises when
    the probe key set exceeds ``max_keys`` — index joins are for bounded
    lookups; an unbounded probe belongs in a shuffle join."""
    keys = [r[0] for r in probe.select(probe_key).distinct().collect()]
    if len(keys) > max_keys:
        raise ValueError(
            f"index_lookup_join: {len(keys)} probe keys exceed the "
            f"applicability bound {max_keys} — use a shuffle join"
        )
    pruned = indexed.filter(F.col(index_key).isin(keys))
    return F.broadcast(probe).join(
        pruned, F.col(probe_key) == F.col(index_key)
    )


_IDX_SQL = """
WITH probe AS (
  SELECT c_custkey, c_name FROM customer
  WHERE c_acctbal > 9000 AND c_mktsegment = 'BUILDING'
)
SELECT p.c_custkey, p.c_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(round(o.o_totalprice * 100)) AS BIGINT)
         AS sum_price_cents
FROM probe p JOIN orders o ON o.o_custkey = p.c_custkey
GROUP BY p.c_custkey, p.c_name
ORDER BY p.c_custkey
"""


def _q(name: str, sql: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@_q("join_index_lookup", _IDX_SQL)
def join_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A bounded probe set (high-balance (>9000) BUILDING customers) looked up
    against the orders fact through the key-pushdown index join; per-key
    order counts and exact-cents totals.  The oracle is the plain
    relational join — proving the pruned path loses no rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    probe = cust.filter(
        (F.col("c_acctbal") > 9000) & (F.col("c_mktsegment") == "BUILDING")
    ).select("c_custkey", "c_name")
    joined = index_lookup_join(
        probe, orders, "c_custkey", "o_custkey"
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("sum_price_cents"),
        )
        .orderBy("c_custkey")
    )
