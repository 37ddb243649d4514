"""Benchto schema adapter — run the reference's OWN benchmark SQL verbatim.

The reference ships its TPC-H benchmark corpus as raw Presto SQL
(``presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q01-q22.sql``)
written against the Presto tpch connector's schema: *unprefixed* column
names (``l.shipdate``, not ``l_shipdate``), three-part
``"${database}"."${schema}"."${prefix}table"`` references, and the full
TPC-H column set (comment/address/phone/partsupp/... columns the driver's
synthetic parquet lacks).

This module mounts that schema over the driver tables as a view layer so
the reference files run VERBATIM (after benchto's own ``${...}``
substitution) through :meth:`Engine.sql` — and builds the *identical*
views in DuckDB so every file can be value-checked against an independent
engine on the same inputs.

Synthesized columns are deterministic pure expressions of the key columns
(same text evaluated by both engines), styled after the TPC-H spec's
domains (``Manufacturer#n``, container two-word codes, ship modes,
clerk numbers, nation names from the spec's fixed list) so the reference
predicates — ``p.type like '%BRASS'``, ``o.comment not like
'%special%requests%'``, ``substr(c.phone,1,2) IN ('13',...)`` — select
non-trivial subsets instead of degenerating to empty scans. Date columns
are shifted back two years (driver data spans 1995-2001; the TPC-H
predicates target 1993-1998) so the date windows land inside the data.

At 100 TB these views are zero-cost: pure projections that fuse into the
scan (no shuffle, no UDF — every synthesized column is a JVM expression),
and Catalyst still pushes base-column filters through them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# TPC-H spec nation list (N1 comments of the spec; nationkey -> name).
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
    "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES",
]

_QUAL = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
_METAL = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
_CONT1 = ["SM", "MED", "LG", "JUMBO", "WRAP"]
_CONT2 = ["CASE", "BOX", "BAG", "PKG", "PACK"]
_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
_INSTR = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
_NAME1 = ["forest", "green", "goldenrod", "lavender", "spring", "yellow"]


def _case_mod(expr: str, values: list[str]) -> str:
    """CASE mod(expr, n) WHEN i THEN values[i] ... — portable SQL."""
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE mod({expr}, {len(values)}) {whens} END"


def view_definitions(raw, s) -> dict[str, str]:
    """The adapter views as SELECT texts.

    ``raw(t)`` renders a reference to the raw driver table *t*;
    ``s(x)`` renders an int→string cast — the only two spellings that
    differ between Spark and DuckDB. Everything else is shared text, so
    both engines evaluate byte-identical derivations.
    """
    phone = (
        f"{s('10 + mod({k}, 25)')} || '-' || {s('100 + mod({k} * 7, 900)')}"
        " || '-' || " + s("1000 + mod({k} * 13, 9000)")
    )
    return {
        "region": f"""
            SELECT r_regionkey AS regionkey, r_name AS name,
                   'region ' || r_name AS comment
            FROM {raw('region')}""",
        "nation": f"""
            SELECT n_nationkey AS nationkey,
                   {_case_mod('n_nationkey', NATIONS)} AS name,
                   n_regionkey AS regionkey,
                   'nation comment ' || {s('n_nationkey')} AS comment
            FROM {raw('nation')}""",
        "supplier": f"""
            SELECT s_suppkey AS suppkey, s_name AS name,
                   'Address s' || {s('s_suppkey')} AS address,
                   s_nationkey AS nationkey,
                   {phone.replace('{k}', 's_suppkey')} AS phone,
                   s_acctbal AS acctbal,
                   CASE WHEN mod(s_suppkey, 4) = 0
                        THEN 'slow delivery Customer Complaints recorded'
                        ELSE 'supplier comment ' || {s('s_suppkey')}
                   END AS comment
            FROM {raw('supplier')}""",
        "customer": f"""
            SELECT c_custkey AS custkey, c_name AS name,
                   'Address c' || {s('c_custkey')} AS address,
                   c_nationkey AS nationkey,
                   {phone.replace('{k}', 'c_custkey')} AS phone,
                   c_acctbal AS acctbal, c_mktsegment AS mktsegment,
                   'customer comment ' || {s('c_custkey')} AS comment
            FROM {raw('customer')}""",
        "part": f"""
            SELECT p_partkey AS partkey,
                   {_case_mod('p_partkey', _NAME1)} || ' ' || p_name AS name,
                   'Manufacturer#' || {s('1 + mod(p_partkey, 5)')} AS mfgr,
                   p_brand AS brand,
                   p_type || ' ' || {_case_mod('p_partkey', _QUAL)} || ' '
                          || {_case_mod('p_partkey + 3', _METAL)} AS type,
                   p_size AS size,
                   {_case_mod('p_partkey', _CONT1)} || ' '
                          || {_case_mod('p_partkey + 1', _CONT2)} AS container,
                   p_retailprice AS retailprice,
                   'part comment ' || {s('p_partkey')} AS comment
            FROM {raw('part')}""",
        "orders": f"""
            SELECT o_orderkey AS orderkey, o_custkey AS custkey,
                   o_orderstatus AS orderstatus, o_totalprice AS totalprice,
                   CAST(o_orderdate - INTERVAL '2' YEAR AS DATE) AS orderdate,
                   o_orderpriority AS orderpriority,
                   'Clerk#' || {s('100 + mod(o_orderkey, 1000)')} AS clerk,
                   0 AS shippriority,
                   CASE WHEN mod(o_orderkey, 5) = 0
                        THEN 'special packaging requests noted'
                        ELSE 'order comment ' || {s('o_orderkey')}
                   END AS comment
            FROM {raw('orders')}""",
        # commit/receipt are offsets of shipdate chosen so commit<receipt,
        # ship<commit and receipt-window predicates all split the data.
        "lineitem": f"""
            SELECT l_orderkey AS orderkey, l_partkey AS partkey,
                   l_suppkey AS suppkey, l_linenumber AS linenumber,
                   l_quantity AS quantity, l_extendedprice AS extendedprice,
                   l_discount AS discount, l_tax AS tax,
                   l_returnflag AS returnflag, l_linestatus AS linestatus,
                   CAST(l_shipdate - INTERVAL '2' YEAR AS DATE) AS shipdate,
                   CAST(l_shipdate - INTERVAL '2' YEAR AS DATE)
                       + (mod(l_orderkey * 5 + l_linenumber * 7, 45) - 15)
                       * INTERVAL '1' DAY AS commitdate,
                   CAST(l_shipdate - INTERVAL '2' YEAR AS DATE)
                       + (1 + mod(l_orderkey * 7 + l_linenumber * 3, 30))
                       * INTERVAL '1' DAY AS receiptdate,
                   {_case_mod('l_orderkey + l_linenumber', _INSTR)} AS shipinstruct,
                   {_case_mod('l_orderkey * 3 + l_linenumber', _MODES)} AS shipmode,
                   'lineitem comment ' || {s('l_linenumber')} AS comment
            FROM {raw('lineitem')}""",
        # The driver testdata has no partsupp: derive the TPC-H 4-suppliers-
        # per-part shape deterministically from part × {0,1,2,3}.
        "partsupp": f"""
            SELECT p_partkey AS partkey,
                   mod(p_partkey + 7 * i, (SELECT count(*) FROM {raw('supplier')}))
                       AS suppkey,
                   1 + mod(p_partkey * 13 + i * 17, 9999) AS availqty,
                   (1 + mod(p_partkey * 31 + i * 7, 99900)) / 100.0 AS supplycost,
                   'partsupp comment ' || {s('p_partkey')} AS comment
            FROM {raw('part')}
            CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1
                        UNION ALL SELECT 2 UNION ALL SELECT 3) gen""",
    }


def register_benchto_views(
    spark: SparkSession, sf_dir: str, prefix: str = "bt_"
) -> list[str]:
    """Create the adapter as Spark temp views ``bt_region`` ... ``bt_partsupp``
    over the driver parquet at *sf_dir*. Returns the view names. After this,
    a reference benchto file with ``${database}.${schema}`` ∈ the dialect
    rewriter's catalog set and ``${prefix}`` = *prefix* runs verbatim."""
    from .catalog import register_tables

    register_tables(spark, sf_dir)
    defs = view_definitions(raw=lambda t: t, s=lambda x: f"CAST({x} AS STRING)")
    names = []
    for table, body in defs.items():
        name = prefix + table
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {body}")
        names.append(name)
    return names


def register_benchto_duckdb(con, sf_dir: str, prefix: str = "bt_",
                            database: str = "tpch", schema: str = "tiny") -> None:
    """Build the IDENTICAL view layer in a DuckDB connection under
    ``database.schema`` so the same post-substitution SQL text runs there
    as the independent oracle."""
    con.execute(f"ATTACH IF NOT EXISTS ':memory:' AS {database}")
    con.execute(f"CREATE SCHEMA IF NOT EXISTS {database}.{schema}")
    # Presto has date(x); DuckDB doesn't — q20 uses it.
    try:
        con.execute("CREATE MACRO date(x) AS CAST(x AS DATE)")
    except Exception:
        pass  # already created
    defs = view_definitions(
        raw=lambda t: f"read_parquet('{sf_dir}/{t}.parquet')",
        s=lambda x: f"CAST({x} AS VARCHAR)",
    )
    for table, body in defs.items():
        con.execute(
            f"CREATE OR REPLACE VIEW {database}.{schema}.{prefix}{table} AS {body}"
        )
