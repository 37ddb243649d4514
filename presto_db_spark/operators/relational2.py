"""Relational coverage, part 2 — EXISTS/NOT-IN decorrelation, mixed DISTINCT
aggregation, UNNEST WITH ORDINALITY, INTERSECT ALL, TABLESAMPLE.

Reference semantics exercised (SURVEY.md §2):

* EXISTS / NOT EXISTS subqueries — decorrelated to semi/anti joins by
  ``TransformExistsApplyToLateralNode`` +
  ``TransformUncorrelatedInPredicateSubqueryToSemiJoin``
  (``pm/sql/planner/iterative/rule/``); Spark's ``RewritePredicateSubquery``
  produces LeftSemi/LeftAnti the same way.
* NOT IN three-valued NULL semantics — a NULL in the subquery makes
  ``x NOT IN (...)`` never-true (null-aware anti join), unlike LEFT ANTI.
  Presto implements this in ``HashSemiJoinOperator``'s match channel
  (``pm/operator/HashSemiJoinOperator.java:32``).
* Multiple DISTINCT aggregates in one pass — ``MarkDistinctOperator``
  (``pm/operator/MarkDistinctOperator.java:35``, planner rule
  ``MultipleDistinctAggregationToMarkDistinct``); Spark lowers the same
  shape through ``RewriteDistinctAggregates``/Expand.
* UNNEST ... WITH ORDINALITY — ``UnnestOperator`` with ordinality channel
  (``pm/operator/unnest/UnnestOperator.java:48``) → ``posexplode``.
* INTERSECT ALL — ``ImplementIntersectAndExceptAsUnion`` lowering
  (``pm/sql/planner/optimizations/``) → Spark native ``intersectAll``.
* TABLESAMPLE BERNOULLI — ``SampleNode`` (grammar ``SqlBase.g4``) →
  ``df.sample``; sampling is engine-specific → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import _t

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@_q(
    "subq_exists",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    )
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@_q(
    "subq_not_in_null",
    """
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderkey < 1000))
    AS n_no_null,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, o_custkey) FROM orders
                           WHERE o_orderkey < 10))
    AS n_with_null
""",
)
def subq_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL-free subquery (plain anti join) vs a subquery
    containing NULL (never-true → 0 rows). spark.sql keeps the null-aware
    anti-join semantics that a hand-built LEFT ANTI would get wrong."""
    import uuid

    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # unique view names: query functions must not collide on session state
    cv, ov = f"_r2_c_{uuid.uuid4().hex[:8]}", f"_r2_o_{uuid.uuid4().hex[:8]}"
    cust.createOrReplaceTempView(cv)
    orders.createOrReplaceTempView(ov)
    return spark.sql(
        f"""
        SELECT
          (SELECT count(*) FROM {cv}
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM {ov} WHERE o_orderkey < 1000)) AS n_no_null,
          (SELECT count(*) FROM {cv}
           WHERE c_custkey NOT IN
             (SELECT nullif(o_custkey, o_custkey) FROM {ov}
              WHERE o_orderkey < 10)) AS n_with_null
        """
    )


@_q(
    "agg_multi_distinct",
    """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
       CAST(count(DISTINCT l_linestatus) AS BIGINT) AS nd_status,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three DISTINCT aggs + plain aggs in one GROUP BY — the MarkDistinct
    shape; Spark plans it as a single pass over Expand (check: one scan)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.countDistinct("l_linestatus").alias("nd_status"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@_q(
    "unnest_ordinality",
    """
WITH s AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
  FROM documents WHERE doc_id < 30
)
SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, words[CAST(t.i AS INTEGER)] AS word
FROM s, unnest(generate_series(1, len(words))) t(i)
""",
)
def unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 30)
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("words"))
        .select("doc_id", F.posexplode("words").alias("pos", "word"))
    )


@_q(
    "setop_intersect_all",
    """
SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey < 2000
INTERSECT ALL
SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 3000
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") < 2000).select("l_partkey", "l_suppkey")
    b = li.filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 3000)).select(
        "l_partkey", "l_suppkey"
    )
    return a.intersectAll(b)


@_q(
    "win_range_value_frame",
    """
SELECT event_id, user_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 300 PRECEDING AND 300 FOLLOWING) AS BIGINT)
         AS n_nearby,
       round(sum(round(value * 100)) OVER (PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) / 100, 2)
         AS trailing_value
FROM events WHERE user_id < 30
""",
)
def win_range_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with VALUE offsets (±300 s around each event) — the
    frame variant win_frames doesn't cover (``FrameInfo.java:25`` RANGE
    N PRECEDING/FOLLOWING). Value-range frames are tie-safe: peers share
    the frame, so the result is deterministic under equal timestamps."""
    from pyspark.sql import Window as W

    from ..catalog import load_table

    events = load_table(spark, sf_dir, "events")
    sec = F.unix_seconds("ts")
    base = events.filter(F.col("user_id") < 30).select(
        "event_id", "user_id", sec.alias("sec"), "value"
    )
    w_both = W.partitionBy("user_id").orderBy("sec").rangeBetween(-300, 300)
    w_trail = W.partitionBy("user_id").orderBy("sec").rangeBetween(-300, W.currentRow)
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w_both).alias("n_nearby"),
        F.round(F.sum(F.round(F.col("value") * 100)).over(w_trail) / 100, 2).alias(
            "trailing_value"
        ),
    )


@_q(
    "win_ignore_nulls",
    """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v
  FROM orders WHERE o_custkey < 50
)
SELECT o_orderkey,
       lag(v IGNORE NULLS) OVER w AS prev_nn,
       last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nn,
       first_value(v IGNORE NULLS) OVER w AS first_nn
FROM t WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS value-window semantics (``LagFunction.java:55``,
    ``FirstValueFunction``/``LastValueFunction``) — every third price nulled
    so the skip-over behavior is actually exercised."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.filter(F.col("o_custkey") < 50).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # PySpark's F.lag has no ignoreNulls parameter — SQL syntax via expr;
    # first/last expose it directly.
    over = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
    return t.select(
        "o_orderkey",
        F.expr(f"lag(v) IGNORE NULLS {over}").alias("prev_nn"),
        F.last("v", ignorenulls=True).over(w_run).alias("last_nn"),
        F.first("v", ignorenulls=True).over(w).alias("first_nn"),
    )


@_q(
    "setop_except_distinct",
    """
SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey < 2000
EXCEPT
SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 3000
""",
)
def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — the dedup variant next to setop_except_all
    (``ImplementIntersectAndExceptAsUnion.java`` lowers both)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") < 2000).select("l_partkey", "l_suppkey")
    b = li.filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 3000)).select(
        "l_partkey", "l_suppkey"
    )
    return a.subtract(b)


@_q(
    "misc_unique_id",
    """
SELECT CAST(count(*) AS BIGINT) AS n, true AS ids_unique
FROM lineitem WHERE l_orderkey < 5000
""",
)
def misc_unique_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AssignUniqueIdOperator (``pm/operator/AssignUniqueIdOperator.java:29``)
    → monotonically_increasing_id. Ids themselves are partition-dependent, so
    the oracle checks the operator's contract instead: as many DISTINCT ids
    as rows."""
    (li,) = _t(spark, sf_dir, "lineitem")
    with_id = li.filter(F.col("l_orderkey") < 5000).withColumn(
        "uid", F.monotonically_increasing_id()
    )
    return with_id.agg(
        F.count("*").alias("n"),
        (F.countDistinct("uid") == F.count("*")).alias("ids_unique"),
    )


@_q(
    "sample_bernoulli",
    """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
       TRUE AS sample_within_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI(10) — seeded df.sample. WHICH rows are drawn
    is engine-RNG-dependent, but the statistical contract is checkable: per
    group, the sampled count must land within 6 sigma of the 10%
    expectation (binomial bound, in-query boolean the oracle pins TRUE)
    alongside the exact group totals."""
    (li,) = _t(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_returnflag").agg(F.count("*").alias("n_total"))
    sampled = (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
    )
    mean = F.col("n_total") * 0.1
    sigma = F.sqrt(F.col("n_total") * 0.1 * 0.9)
    return totals.join(sampled, "l_returnflag", "left").select(
        "l_returnflag",
        "n_total",
        (
            F.abs(F.coalesce(F.col("n_sampled"), F.lit(0)) - mean) <= sigma * 6 + 1
        ).alias("sample_within_bounds"),
    )


@_q(
    "unnest_multi_zip",
    """
WITH d AS (
  SELECT doc_id, string_split(trim(text), ' ') AS words
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, unnest(words) AS w,
       CAST(unnest(list_transform(words, x -> length(x))) AS INT) AS wl
FROM d
""",
)
def unnest_multi_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto ``CROSS JOIN UNNEST(a, b)`` — MULTI-array unnest zips the
    arrays positionally (``pm/operator/unnest/UnnestOperator.java:48``
    drives all unnest channels in lock-step). Spark: ``arrays_zip`` then
    ``inline`` — one generator, no join."""
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.col("doc_id") < 200).select(
        "doc_id", F.split(F.trim("text"), " ").alias("words")
    )
    zipped = d.select(
        "doc_id",
        F.arrays_zip(
            F.col("words").alias("w"),
            F.transform("words", F.length).alias("wl"),
        ).alias("z"),
    )
    return zipped.select("doc_id", F.inline("z"))


@_q(
    "unnest_map",
    """
SELECT doc_id, e.key AS k, CAST(e.value AS BIGINT) AS v
FROM documents, LATERAL unnest(map_entries(
  MAP {'n_chars': length(text), 'n_words': len(string_split(trim(text), ' '))}
)) AS t(e)
WHERE doc_id < 200
""",
)
def unnest_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto ``UNNEST(map)`` → (key, value) rows (UnnestOperator's map
    channel). Spark: ``explode`` over a map column."""
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("n_chars"), F.length("text").cast("long"),
        F.lit("n_words"), F.size(F.split(F.trim("text"), " ")).cast("long"),
    )
    return (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode(m).alias("k", "v"))
    )


# --- distributed global sort acceptance ------------------------------------

_SORT_SQL = """
WITH ranked AS (
  SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
         row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
           AS rn
  FROM lineitem
)
SELECT rn, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_shipdate, l_extendedprice
FROM ranked WHERE rn % 1000 = 1 ORDER BY rn
"""


@_q("sort_distributed_sample", _SORT_SQL)
def sort_distributed_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-table sort acceptance (the reference ships a
    dedicated ``distributed_sort.yaml`` benchto suite): globally sort the
    fact on a unique 3-key composite and emit every 1000th row — the
    sampled rows pin the GLOBAL order (any mis-merged range partition
    shifts them) while the output stays tiny.

    The global index is built the way a 1000-executor sort must be —
    NOT a single-partition window: range-partition on the sort key,
    sort within partitions, per-partition row offsets from the sorted
    stage's own consecutive ids, then the broadcast prefix-offset join
    (a #partitions-sized broadcast — the only driver-side state). The
    composite key is unique, so the global index is deterministic
    regardless of the sampled range boundaries. r10: rebuilt on
    ``distrank.global_index``'s rank-only path — ONE shuffle of the
    fact total (the r01-r09 form paid a second full
    hashpartitioning(pid) exchange for its local-rank window)."""
    from ..catalog import load_table
    from .distrank import global_index

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    keys = ["l_shipdate", "l_orderkey", "l_linenumber"]
    return (
        global_index(li, keys)
        .withColumn("rn", F.col("__rn"))
        .filter((F.col("rn") % 1000) == 1)
        .select(
            "rn", "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "l_shipdate", "l_extendedprice",
        )
        .orderBy("rn")
    )


# --- PIVOT / UNPIVOT / gaps-and-islands (r11p wave) --------------------------
# Presto 0.236 has no PIVOT syntax (users write conditional aggregation —
# the exact shape this oracle uses); Spark has the native relational
# operator (`RelationalGroupedDataset.pivot`, lowered to a single
# hash-aggregate over `CASE` projections — no extra shuffle vs the manual
# form). UNPIVOT is `DataFrame.unpivot` (Expand node, zero shuffles).
# Gaps-and-islands is the classic sequence analytic: runs of consecutive
# keys found via the key-minus-row_number invariant, windowed PER GROUP
# (never a single-partition window).

_PIVOT_BRANDS = ["Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"]

_PIVOT_SQL = """
WITH p AS (
  SELECT p_size % 5 AS size_mod, p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
  WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4', 'Brand#5')
)
SELECT CAST(size_mod AS BIGINT) AS size_mod,
       CAST(sum(CASE WHEN p_brand = 'Brand#1' THEN c END) AS BIGINT) AS b1_cents,
       CAST(sum(CASE WHEN p_brand = 'Brand#2' THEN c END) AS BIGINT) AS b2_cents,
       CAST(sum(CASE WHEN p_brand = 'Brand#3' THEN c END) AS BIGINT) AS b3_cents,
       CAST(sum(CASE WHEN p_brand = 'Brand#4' THEN c END) AS BIGINT) AS b4_cents,
       CAST(sum(CASE WHEN p_brand = 'Brand#5' THEN c END) AS BIGINT) AS b5_cents
FROM p GROUP BY size_mod ORDER BY size_mod
"""


@_q("part_pivot_wide", _PIVOT_SQL)
def part_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native PIVOT: brand columns × size-bucket rows, sum of exact retail
    cents per cell. The explicit values list keeps the plan single-pass
    (no distinct-values pre-query) and the IN filter reaches the parquet
    scan, so only the pivoted brands are ever read. One map-side-combined
    hash aggregate — identical shuffle count to the conditional-CASE form
    Presto users write (the oracle), with the operator surface Spark adds
    on top."""
    part = _t(spark, sf_dir, "part")[0]
    wide = (
        part.filter(F.col("p_brand").isin(_PIVOT_BRANDS))
        .select(
            (F.col("p_size") % 5).cast("bigint").alias("size_mod"),
            "p_brand",
            F.round(F.col("p_retailprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("size_mod")
        .pivot("p_brand", _PIVOT_BRANDS)
        .agg(F.sum("c"))
    )
    cols = [F.col("size_mod")] + [
        F.col(f"`{b}`").cast("bigint").alias(f"b{i + 1}_cents")
        for i, b in enumerate(_PIVOT_BRANDS)
    ]
    return wide.select(*cols).orderBy("size_mod")


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS spend_cents
  FROM events GROUP BY user_id
)
SELECT user_id, metric, value FROM (
  SELECT user_id, 'n_click' AS metric, n_click AS value FROM wide
  UNION ALL SELECT user_id, 'n_view', n_view FROM wide
  UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM wide
  UNION ALL SELECT user_id, 'spend_cents', spend_cents FROM wide
) ORDER BY user_id, metric
"""


@_q("events_unpivot_metrics", _UNPIVOT_SQL)
def events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native UNPIVOT (wide metric columns → tidy long rows): one per-user
    aggregate builds the wide frame, then ``DataFrame.unpivot`` lowers to
    an Expand node — a 4× row multiplier with ZERO additional shuffles
    (the oracle's UNION-ALL form re-reads the CTE four times in engines
    without CTE materialization). The long layout is what metric stores /
    feature pipelines ingest."""
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    wide = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint").alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint").alias("n_view"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint").alias("n_purchase"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("bigint").alias("spend_cents"),
    )
    return wide.unpivot(
        ["user_id"],
        ["n_click", "n_view", "n_purchase", "spend_cents"],
        "metric",
        "value",
    ).orderBy("user_id", "metric")


_ISLANDS_SQL = """
WITH s AS (
  SELECT o_custkey, o_orderkey,
         o_orderkey - row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderkey) AS grp
  FROM orders
)
SELECT o_custkey,
       CAST(min(o_orderkey) AS BIGINT) AS island_start,
       CAST(max(o_orderkey) AS BIGINT) AS island_end,
       CAST(count(*) AS BIGINT) AS island_len
FROM s GROUP BY o_custkey, grp
HAVING count(*) >= 2
ORDER BY o_custkey, island_start
"""


@_q("win_gaps_islands", _ISLANDS_SQL)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE order keys held by
    one customer, via the key-minus-row_number constant-per-run invariant.
    The window partitions by o_custkey (bounded per-key width — never a
    single-partition window), and the island fold is the same exchange's
    groupBy, so the whole analytic is ONE shuffle on o_custkey. Scale:
    per-customer order counts are bounded; skewed customers stay within
    one partition's window sort."""
    from pyspark.sql.window import Window as W

    from ..catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    s = o.withColumn("grp", F.col("o_orderkey") - F.row_number().over(w))
    return (
        s.groupBy("o_custkey", "grp")
        .agg(
            F.min("o_orderkey").alias("island_start"),
            F.max("o_orderkey").alias("island_end"),
            F.count("*").alias("island_len"),
        )
        .filter(F.col("island_len") >= 2)
        .select("o_custkey", "island_start", "island_end", "island_len")
        .orderBy("o_custkey", "island_start")
    )


# --- correlated LATERAL subquery (r11t wave) ---------------------------------
# Presto grammar exposes correlated subqueries that its planner rewrites
# through TransformCorrelated*/LateralJoin nodes
# (pm/sql/planner/iterative/rule/TransformCorrelatedScalarSubquery.java);
# Spark's SQL surface is the explicit `, LATERAL (...)` join (decorrelated
# by DecorrelateInnerQuery + RewriteLateralSubquery). The per-group
# ORDER BY ... LIMIT k body is the acid test: the decorrelated plan must
# become a partitioned window-group-limit, never an N×M nested loop.

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price_cents
FROM customer c,
LATERAL (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c.c_custkey, t.price_cents DESC, t.o_orderkey
"""


@_q("subq_lateral_topn", _LATERAL_SQL)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT (each
    BUILDING customer's two priciest orders), written as literal LATERAL
    SQL in BOTH engines. Spark DECORRELATES it: a row_number window
    partitioned by o_custkey + rn <= 2 filter, then ONE broadcast hash
    equi-join against the filtered customers — never a per-row nested
    re-execution of the subquery (the gate asserts no nested-loop join).
    The planner additionally materializes the lateral body's ORDER BY as
    a range sort to pin per-group row order before the rank; the
    hand-written DataFrame twin (win_topn_per_group) skips that extra
    exchange — the documented cost of the declarative surface. Total
    order inside the body (price DESC, orderkey) keeps the picked rows
    identical across engines."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# --- existence join (EXISTS as a projected column, r11x wave) ----------------
# subq_exists covers EXISTS as a FILTER (LeftSemi); when the predicate's
# truth value is PROJECTED instead, both engines plan a different join
# type entirely — Spark's ExistenceJoin (Presto: the semi-join "match"
# channel surfaced as a column, HashSemiJoinOperator.java's
# SemiJoinOutput). The per-segment conversion rollup keeps the output
# bounded and the oracle one conditional aggregate.

_EXISTENCE_SQL = """
WITH flags AS (
  SELECT c.c_custkey, c.c_mktsegment,
         EXISTS (SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer c
)
SELECT c_mktsegment, has_urgent,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(c_custkey) AS BIGINT) AS min_custkey
FROM flags GROUP BY c_mktsegment, has_urgent
ORDER BY c_mktsegment, has_urgent
"""


@_q("join_existence_flag", _EXISTENCE_SQL)
def join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS projected as a column (did this customer ever place an
    urgent order?) — planned as an ExistenceJoin, the join type between
    semi (filter) and outer (data): one hash join on o_custkey emitting
    a boolean match channel, never a row-multiplying outer join + post
    aggregation. Plan-gated on the ExistenceJoin node. The identical
    EXISTS SQL runs in both engines."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTENCE_SQL)


# --- aggregate FILTER clause (r11z wave) -------------------------------------
# The SQL:2003 FILTER (WHERE ...) aggregate modifier — Presto grammar
# `aggregationClause` (SqlBase.g4 `filter`), lowered through
# `AggregationNode`'s mask channels; Spark parses the same syntax and
# lowers it to the conditional-aggregate form. One literal SQL text runs
# in BOTH engines.

_FILTER_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS urgent_cents,
       CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT')
            AS BIGINT) AS urgent_customers
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@_q("agg_filter_clause", _FILTER_SQL)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clauses — plain, on a sum, and on a
    DISTINCT count — as ONE literal SQL text both engines parse (the
    masked-aggregation surface Presto users write instead of CASE
    expressions; Spark lowers it to the same conditional aggregates, so
    the plan is still a single two-phase pass). Exact cents keep the
    value hash stable."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_SQL)
