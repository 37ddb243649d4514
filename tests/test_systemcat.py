"""System-connector surface (systemcat.py + Engine._system_statement)
beyond the golden pairs: live content, query-log bounds, error paths."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from presto_db_spark.engine import Engine

    return Engine(spark)


def test_runtime_queries_log_is_live_and_bounded(engine):
    engine.sql("SELECT 41 + 1 AS x").collect()
    rows = engine.sql(
        "SELECT query_id, state, user, query FROM system.runtime.queries"
    ).collect()
    assert any("41 + 1" in r.query for r in rows)
    assert all(r.state == "FINISHED" for r in rows)
    # Presto-format query id: yyyyMMdd_HHmmss_NNNNN_xxxxx
    qid = rows[-1].query_id
    parts = qid.split("_")
    assert len(parts) == 4 and len(parts[0]) == 8 and len(parts[3]) == 5
    # bounded history (the reference also caps its query history)
    for i in range(120):
        engine._log_query(f"probe {i}")
    assert len(engine.query_log) <= 100


def test_information_schema_columns_matches_tables(engine):
    """Every table listed in information_schema.tables has columns, and
    ordinal positions are dense from 1."""
    rows = engine.sql(
        "SELECT table_schema, table_name, ordinal_position "
        "FROM system.information_schema.columns"
    ).collect()
    tabs = {(r.table_schema, r.table_name) for r in rows}
    listed = {
        (r.table_schema, r.table_name)
        for r in engine.sql(
            "SELECT table_schema, table_name "
            "FROM system.information_schema.tables"
        ).collect()
    }
    assert tabs == listed
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[(r.table_schema, r.table_name)].append(r.ordinal_position)
    for k, positions in per.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), k


def test_runtime_nodes_is_live(engine):
    row = engine.sql(
        "SELECT node_id, node_version, coordinator, state "
        "FROM system.runtime.nodes"
    ).collect()[0]
    assert row.node_id == engine.spark.sparkContext.applicationId
    assert row.node_version.startswith("spark-")
    assert row.coordinator is True and row.state == "active"


def test_show_tables_unknown_schema_raises(engine):
    with pytest.raises(ValueError, match="does not exist"):
        engine.sql("SHOW TABLES FROM system.nope")


def test_show_columns_system_table(engine):
    rows = engine.sql("SHOW COLUMNS FROM system.runtime.nodes").collect()
    assert [r.Column for r in rows] == [
        "node_id", "http_uri", "node_version", "coordinator", "state"
    ]
    assert rows[3].Type == "boolean"


def test_jmx_tables_contain_platform_beans(engine):
    names = {r.Table for r in engine.sql("SHOW TABLES FROM jmx.current").collect()}
    for expected in (
        "java.lang:type=runtime", "java.lang:type=memory",
        "java.lang:type=threading", "java.lang:type=operatingsystem",
    ):
        assert expected in names, names
    # live GC beans are present too (name varies by collector)
    assert any(n.startswith("java.lang:type=garbagecollector,name=") for n in names)


def test_system_refs_are_literal_safe(engine):
    """A string literal mentioning system.runtime.queries must survive."""
    row = engine.sql(
        "SELECT 'system.runtime.queries' AS s, count(*) >= 0 AS ok "
        "FROM system.runtime.nodes"
    ).collect()[0]
    assert row.s == "system.runtime.queries" and row.ok


def test_jmx_select_live_attributes(engine):
    """SELECT over jmx.current singleton MXBean tables returns live
    driver-JVM values (presto-jmx JmxRecordSetProvider analog)."""
    r = engine.sql(
        'SELECT node, object_name, vmname, uptime '
        'FROM jmx.current."java.lang:type=runtime"'
    ).collect()[0]
    assert r.node == engine.spark.sparkContext.applicationId
    assert r.object_name == "java.lang:type=runtime"
    assert "VM" in r.vmname and r.uptime > 0
    m = engine.sql(
        'SELECT `heapmemoryusage.used` AS used, `heapmemoryusage.max` AS mx '
        'FROM jmx.current."java.lang:type=memory"'
    ).collect()[0]
    assert 0 < m.used <= m.mx
    o = engine.sql(
        'SELECT availableprocessors, name '
        'FROM jmx.current."java.lang:type=operatingsystem"'
    ).collect()[0]
    assert o.availableprocessors >= 1 and o.name
    # literal safety: the quoted object name inside a string is untouched
    s = engine.sql(
        """SELECT 'jmx.current."java.lang:type=runtime"' AS s"""
    ).collect()[0].s
    assert s == 'jmx.current."java.lang:type=runtime"'


def test_show_create_table(engine):
    engine.spark.sql(
        "SELECT CAST(1 AS BIGINT) AS id, 'x' AS name, CAST(1.5 AS DOUBLE) AS v"
    ).createOrReplaceTempView("sct_demo")
    text = engine.sql("SHOW CREATE TABLE sct_demo").collect()[0][0]
    assert text.startswith("CREATE TABLE sct_demo (")
    assert '"id" bigint' in text and '"name" varchar' in text \
        and '"v" double' in text


def test_show_create_view(engine):
    """ShowCreate for a VIEW returns the STORED view SQL under a 'Create
    View' column (ShowQueriesRewrite.java), not a synthesized column list."""
    engine.sql(
        "CREATE OR REPLACE TEMP VIEW scv_demo AS "
        "SELECT 1 AS a, 'x' AS b"
    )
    df = engine.sql("SHOW CREATE VIEW scv_demo")
    assert df.columns == ["Create View"]
    vtext = df.collect()[0][0]
    assert vtext.startswith("CREATE VIEW scv_demo AS")
    assert "SELECT 1 AS a, 'x' AS b" in vtext
    # a view whose definition this session never saw cannot be synthesized
    engine.spark.sql("SELECT 2 AS z").createOrReplaceTempView("scv_opaque")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not created through"):
        engine.sql("SHOW CREATE VIEW scv_opaque")
