"""DDL/DML surface tests — CTAS, INSERT, DELETE, views, ANALYZE, EXPLAIN,
session properties (SURVEY.md §2.1 writer operators, §2.9 ExplainAnalyze)."""

from __future__ import annotations

import uuid

import pytest

from presto_db_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir=sf_dir)


def _tmpname() -> str:
    return "t_" + uuid.uuid4().hex[:10]


def test_ctas_insert_delete_roundtrip(engine):
    name = _tmpname()
    engine.create_table_as(
        name, "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
    )
    try:
        n0 = engine.spark.table(name).count()
        assert n0 > 0

        engine.insert_into(
            name, "SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice FROM orders"
        )
        assert engine.spark.table(name).count() == 2 * n0

        deleted = engine.delete_where(name, "o_orderkey >= 1000000")
        assert deleted == n0
        assert engine.spark.table(name).count() == n0
        assert engine.spark.table(name).filter("o_orderkey >= 1000000").count() == 0
    finally:
        engine.spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ctas_partitioned(engine):
    name = _tmpname()
    engine.create_table_as(
        name,
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",
        partition_by=["o_orderstatus"],
    )
    try:
        # partition pruning must reach the scan: filter on the partition col
        plan = engine.explain(
            f"SELECT count(*) FROM {name} WHERE o_orderstatus = 'F'", mode="formatted"
        )
        assert "PartitionFilters" in plan or "o_orderstatus" in plan
        got = {
            r[0]
            for r in engine.spark.table(name).select("o_orderstatus").distinct().collect()
        }
        want = {
            r[0] for r in engine.table("orders").select("o_orderstatus").distinct().collect()
        }
        assert got == want
    finally:
        engine.spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_views_and_analyze(engine):
    v = _tmpname()
    engine.create_view(v, "SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1")
    assert engine.spark.table(v).count() > 0
    engine.drop_view(v)

    name = _tmpname()
    engine.create_table_as(name, "SELECT c_custkey, c_acctbal FROM customer")
    try:
        engine.analyze(name, columns=["c_custkey", "c_acctbal"])
        stats = engine.explain(f"SELECT * FROM {name}", mode="cost")
        assert "rowCount" in stats or "sizeInBytes" in stats
    finally:
        engine.spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_explain_modes_and_analyze_exec(engine):
    sql = "SELECT l_returnflag, sum(l_quantity) AS q FROM lineitem GROUP BY 1"
    formatted = engine.explain(sql, mode="formatted")
    assert "HashAggregate" in formatted
    ran = engine.explain_analyze(sql)
    assert "HashAggregate" in ran


def test_session_properties(engine):
    engine.set_session("hash_partition_count", 16)
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    engine.set_session("join_distribution_type", "PARTITIONED")
    assert engine.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    engine.set_session("join_distribution_type", "AUTOMATIC")
    engine.set_session("hash_partition_count", 8)
    engine.set_session("spill_enabled", True)  # accepted no-op


def test_metadata_surface(engine):
    tables = engine.show_tables()
    for t in ["customer", "lineitem", "orders", "documents"]:
        assert t in tables
    cols = dict(engine.show_columns("customer"))
    assert cols["c_custkey"] == "bigint" and cols["c_mktsegment"] == "string"
    fns = engine.show_functions(like="url_extract%")
    assert "url_extract_parameter" in fns and "url_extract_host" in fns
    assert "strpos" in engine.show_functions(like="strpos")
    # SQL LIKE semantics: anchored full match, % any run, _ one char
    assert engine.show_functions(like="xtract") == []  # not a substring scan
    assert all(f.endswith("td") for f in engine.show_functions(like="%_td"))
    assert engine.show_functions(like="to_%_td") == [
        "to_char_td", "to_date_td", "to_timestamp_td"]
    # SQL spellings work too
    assert engine.sql("SHOW TABLES").count() >= 10
    assert engine.sql("DESCRIBE customer").count() >= 5


def test_create_function_presto_grammar(engine):
    """Presto SQL-invoked functions (SqlBase.g4:62-69) through Engine.sql:
    qualified names, characteristics, RETURNS NULL ON NULL INPUT, and the
    create/use/show/drop lifecycle."""
    engine.sql(
        "CREATE FUNCTION example.default.tan_deg(x DOUBLE) "
        "RETURNS DOUBLE RETURN tan(radians(x))"
    )
    r = engine.sql("SELECT round(example.default.tan_deg(45.0), 6) t").collect()[0]
    assert r.t == 1.0
    # unqualified call resolves too (session-flat namespace)
    assert engine.sql("SELECT round(tan_deg(0.0), 6) t").collect()[0].t == 0.0
    assert "tan_deg" in engine.show_functions(like="tan%")

    engine.sql(
        "CREATE OR REPLACE FUNCTION nn(x INT) RETURNS INT LANGUAGE SQL "
        "DETERMINISTIC RETURNS NULL ON NULL INPUT RETURN x + 1"
    )
    row = engine.sql("SELECT nn(4) a, nn(CAST(NULL AS INT)) b").collect()[0]
    assert (row.a, row.b) == (5, None)

    # trailing-semicolon statement with the null-call clause: the ';' must
    # not be swallowed into the parenthesized guard body (ADVICE r04)
    engine.sql(
        "CREATE OR REPLACE FUNCTION nn2(x INT) RETURNS INT "
        "RETURNS NULL ON NULL INPUT RETURN x + 1;"
    )
    row2 = engine.sql("SELECT nn2(4) a, nn2(CAST(NULL AS INT)) b").collect()[0]
    assert (row2.a, row2.b) == (5, None)

    engine.sql("DROP FUNCTION example.default.tan_deg")
    engine.sql("DROP FUNCTION IF EXISTS nn")
    # Presto grammar allows a parameter-type signature on DROP FUNCTION;
    # Spark's DROP TEMPORARY FUNCTION doesn't — the dialect strips it
    engine.sql("DROP FUNCTION nn2(int)")
    engine.sql("DROP FUNCTION IF EXISTS nn2(int, varchar);")
    assert "tan_deg" not in engine.show_functions(like="tan%")
    assert "nn2" not in engine.show_functions(like="nn%")


def test_prepared_statement_lifecycle(engine):
    """PREPARE / EXECUTE USING / DEALLOCATE PREPARE / DESCRIBE INPUT|OUTPUT
    (SqlBase.g4:119-121, pm/execution/PrepareTask.java): positional ?
    binding is literal-safe, expression args allowed, count mismatch and
    unknown handles are errors, the dialect applies to the prepared body."""
    import pytest

    assert engine.sql(
        "PREPARE q1 FROM SELECT c_name FROM customer "
        "WHERE c_custkey = ? AND c_name <> 'a?b'"
    ).collect()[0].result == "PREPARE"
    direct = engine.sql(
        "SELECT c_name FROM customer WHERE c_custkey = 7 AND c_name <> 'a?b'"
    ).collect()
    assert engine.sql("EXECUTE q1 USING 7").collect() == direct
    assert engine.sql("EXECUTE q1 USING 3 + 4").collect() == direct
    # bracketed constructors in a USING argument must not split on their
    # internal commas (ADVICE r04: ARRAY[1, 2] is ONE argument)
    assert engine.sql(
        "EXECUTE q1 USING element_at(ARRAY[7, 99], 1)"
    ).collect() == direct

    rows = engine.sql("DESCRIBE INPUT q1").collect()
    assert [(r.position, r.type) for r in rows] == [(0, "unknown")]
    out = engine.sql("DESCRIBE OUTPUT q1").collect()
    assert [(r.column_name, r.type) for r in out] == [("c_name", "string")]

    with pytest.raises(ValueError, match="Incorrect number of parameters"):
        engine.sql("EXECUTE q1 USING 1, 2")
    assert engine.sql("DEALLOCATE PREPARE q1").collect()[0].result == "DEALLOCATE"
    with pytest.raises(KeyError, match="not found"):
        engine.sql("EXECUTE q1 USING 1")

    # Presto-dialect body: quoted identifier + approx_distinct rewrite at
    # EXECUTE time.
    engine.sql(
        'PREPARE q2 FROM SELECT approx_distinct(c_nationkey) AS nd '
        'FROM "customer" WHERE c_custkey < ?'
    )
    assert engine.sql("EXECUTE q2 USING 100").collect()[0].nd > 0
    engine.sql("DEALLOCATE PREPARE q2")


def test_show_stats(engine):
    """SHOW STATS FOR t (ShowStatsRewrite.java): per-column ndv/nulls/min/max
    rows + the summary row_count row, computed in one aggregation pass."""
    df = engine.sql("SHOW STATS FOR customer")
    rows = {r.column_name: r for r in df.collect()}
    assert set(df.columns) == {
        "column_name", "data_size", "distinct_values_count",
        "nulls_fraction", "low_value", "high_value", "row_count",
    }
    n = rows[None].row_count
    assert n and n > 0
    ck = rows["c_custkey"]
    assert ck.nulls_fraction == 0.0
    assert float(ck.low_value) == 0.0 and float(ck.high_value) == n - 1
    # HLL ndv within its documented ~5% band of the exact count
    assert abs(ck.distinct_values_count - n) / n < 0.1
    assert rows["c_mktsegment"].data_size > 0
    assert engine.show_stats("nation").count() == 4  # 3 cols + summary


def test_session_statements(engine):
    """SET SESSION / SHOW SESSION / RESET SESSION through Engine.sql
    (SqlBase.g4 setSession/resetSession; SetSessionTask.java): property
    names map to Spark confs via the session-property table, overrides are
    visible in SHOW SESSION, and RESET drops them."""
    assert engine.sql(
        "SET SESSION hash_partition_count = 16"
    ).collect()[0].result == "SET SESSION"
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    assert engine.sql(
        "SET SESSION join_distribution_type = 'BROADCAST';"
    ).collect()[0].result == "SET SESSION"
    rows = {r.name: r.value for r in engine.sql("SHOW SESSION").collect()}
    assert rows["hash_partition_count"] == "16"
    assert rows["join_distribution_type"] == "BROADCAST"
    assert engine.sql(
        "RESET SESSION hash_partition_count"
    ).collect()[0].result == "RESET SESSION"
    rows = {r.name: r.value for r in engine.sql("SHOW SESSION").collect()}
    assert "hash_partition_count" not in rows
    # RESET must restore the UNDERLYING conf, not just the SHOW entry
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") != "16"
    engine.sql("RESET SESSION join_distribution_type")
    # boolean literals display lowercase, Presto-style; escaped quotes
    # in string values unescape
    engine.sql("SET SESSION spill_enabled = true")
    engine.sql("SET SESSION my_note = 'O''Brien'")
    rows = {r.name: r.value for r in engine.sql("SHOW SESSION").collect()}
    assert rows["spill_enabled"] == "true"
    assert rows["my_note"] == "O'Brien"
    engine.sql("RESET SESSION spill_enabled")
    engine.sql("RESET SESSION my_note")


def test_explain_statements(engine):
    """Presto EXPLAIN spellings through Engine.sql (SqlBase.g4 explain;
    ExplainTask.java): plain, (TYPE LOGICAL|DISTRIBUTED|VALIDATE), and
    EXPLAIN ANALYZE — all over dialect-rewritten bodies."""
    import pytest

    plan = engine.sql(
        "EXPLAIN SELECT approx_distinct(c_mktsegment) FROM customer"
    ).collect()[0][0]
    assert "HashAggregate" in plan or "Aggregate" in plan
    logical = engine.sql(
        "EXPLAIN (TYPE LOGICAL) SELECT count(*) FROM customer"
    ).collect()[0][0]
    assert "Optimized Logical Plan" in logical or "Aggregate" in logical
    dist = engine.sql(
        "EXPLAIN (TYPE DISTRIBUTED) SELECT c_nationkey, count(*) "
        "FROM customer GROUP BY 1"
    ).collect()[0][0]
    assert "Exchange" in dist
    assert engine.sql(
        "EXPLAIN (TYPE VALIDATE) SELECT 1"
    ).collect()[0].valid is True
    ran = engine.sql(
        "EXPLAIN ANALYZE SELECT c_mktsegment, count(*) FROM customer GROUP BY 1"
    ).collect()[0][0]
    assert "HashAggregate" in ran


def test_explain_type_io(engine):
    """EXPLAIN (TYPE IO) emits the IOPlanPrinter-shaped JSON: one entry per
    scanned table with the PRUNED column set and the filters the scan
    actually pushed — not the generic plan text."""
    import json

    out = engine.sql(
        "EXPLAIN (TYPE IO) SELECT l_returnflag, sum(l_quantity) "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_totalprice > 1000 GROUP BY 1"
    ).collect()[0][0]
    doc = json.loads(out)
    infos = {e["table"]: e for e in doc["inputTableColumnInfos"]}
    assert set(infos) == {"lineitem", "orders"}
    assert infos["lineitem"]["columns"] == [
        "l_orderkey", "l_quantity", "l_returnflag"]  # pruned, not full
    assert infos["orders"]["columns"] == ["o_orderkey", "o_totalprice"]
    assert any("GreaterThan(o_totalprice" in f
               for f in infos["orders"]["pushedFilters"])


def test_show_functions(engine):
    """SHOW FUNCTIONS [LIKE pattern] — Presto column shape, one row per
    callable session function (Spark builtins + every Presto-compat
    registration), SQL-LIKE wildcard semantics."""
    df = engine.sql("SHOW FUNCTIONS")
    assert df.columns == ["Function", "Return Type", "Argument Types",
                          "Function Type", "Deterministic", "Description"]
    names = {r[0] for r in df.collect()}
    assert {"strpos", "st_point", "parse_duration", "sum"} <= names
    assert len(names) > 400
    liked = [r[0] for r in engine.sql("SHOW FUNCTIONS LIKE 'approx%'").collect()]
    assert liked and all(n.startswith("approx") for n in liked)
    agg = {r[0]: r["Function Type"] for r in df.collect()}
    assert agg["sum"] == "aggregate" and agg["strpos"] == "scalar"


def test_transaction_statements_and_grants(engine):
    """START TRANSACTION / COMMIT / ROLLBACK parse and succeed (auto-commit
    no-ops — the observable Presto behavior on an auto-commit session);
    SHOW GRANTS returns the reference's column layout, truthfully empty."""
    assert engine.sql("START TRANSACTION").collect()[0][0] == "START TRANSACTION"
    assert engine.sql(
        "START TRANSACTION ISOLATION LEVEL READ COMMITTED"
    ).collect()[0][0] == "START TRANSACTION"
    assert engine.sql("COMMIT").collect()[0][0] == "COMMIT"
    assert engine.sql("COMMIT WORK").collect()[0][0] == "COMMIT"
    assert engine.sql("ROLLBACK").collect()[0][0] == "ROLLBACK"
    g = engine.sql("SHOW GRANTS")
    assert g.columns[:4] == ["Grantor", "Grantor Type", "Grantee", "Grantee Type"]
    assert g.count() == 0
    assert engine.sql("SHOW GRANTS ON TABLE customer").count() == 0


def test_explain_format_forms(engine):
    """EXPLAIN (FORMAT JSON|GRAPHVIZ|TEXT), combinable with TYPE in either
    order (SqlBase.g4 explainOption) — JSON is Catalyst's plan-tree JSON,
    GRAPHVIZ a dot digraph with child->parent edges."""
    import json

    j = engine.sql(
        "EXPLAIN (FORMAT JSON) SELECT count(*) FROM customer"
    ).collect()[0][0]
    assert json.loads(j)[0]["class"].startswith("org.apache.spark")
    g = engine.sql(
        "EXPLAIN (FORMAT GRAPHVIZ) "
        "SELECT c_mktsegment, count(*) FROM customer GROUP BY 1"
    ).collect()[0][0]
    assert g.startswith("digraph plan {") and g.rstrip().endswith("}")
    assert "HashAggregate" in g and "->" in g
    lj = engine.sql(
        "EXPLAIN (TYPE LOGICAL, FORMAT JSON) SELECT count(*) FROM customer"
    ).collect()[0][0]
    assert "catalyst.plans.logical" in lj
    t = engine.sql("EXPLAIN (FORMAT TEXT) SELECT 1").collect()[0][0]
    assert "Physical Plan" in t
