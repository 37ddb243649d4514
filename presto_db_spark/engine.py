"""Engine facade — the user-facing entry point.

Mirrors the reference's query lifecycle surface (submit → parse → analyze →
plan → execute; ``presto-main/.../dispatcher/DispatchManager.java:142``,
``SqlParser.java:101``) but delegates every stage to Spark SQL / Catalyst:
``Engine.sql()`` IS the whole pipeline. What we add on top:

* catalog bootstrap over the driver's parquet tables (:mod:`catalog`),
* the Presto-compat function layer (:mod:`functions.presto`) registered
  into the session's function registry, so Presto-flavored SQL runs as-is,
* the extension operators (dedup / similarity / text / multimodal) exposed
  as DataFrame→DataFrame transformers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, register_tables
from .ddl import DdlMixin
from .functions.dialect import DEFAULT_CATALOGS, rewrite_presto_sql
from .functions.presto import register_presto_functions
from .session import get_spark


class Engine(DdlMixin):
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        register_presto_functions(self.spark)
        self.tables: dict[str, DataFrame] = {}
        # Catalog names stripped from three-part table references by the
        # dialect rewriter (Presto catalog.schema.table → flat temp view).
        self.catalogs: set[str] = set(DEFAULT_CATALOGS)
        if sf_dir:
            self.attach(sf_dir)

    def attach(self, sf_dir: str) -> None:
        """Register the driver tables under their bare names."""
        self.tables = register_tables(self.spark, sf_dir)

    def sql(self, query: str, *, dialect: bool = True) -> DataFrame:
        """Run SQL. With ``dialect=True`` (default) the Presto-only
        spellings Spark can't host as temp functions — quoted identifiers,
        catalog-prefixed names, ARRAY[]/ROW() constructors, AT TIME ZONE,
        UNNEST join forms, aggregate renames, arity-dependent regexp
        defaults, literal-format datetime calls, TRY guidance — are
        rewritten first; see :mod:`functions.dialect`."""
        if dialect:
            # Presto REQUIRES SQL-invoked functions to live in a namespace
            # (CREATE FUNCTION example.default.tan — SqlBase.g4:62). Learn
            # the namespace's catalog from the DDL so this statement's and
            # every later statement's references to it are stripped to the
            # session-flat name.
            for m in re.finditer(
                r"(?i)\b(?:create(?:\s+or\s+replace)?|drop)\s+function\s+"
                r"(?:if\s+exists\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*"
                r"[A-Za-z_][A-Za-z0-9_]*\s*\.\s*[A-Za-z_]",
                query,
            ):
                self.catalogs.add(m.group(1).lower())
            query = rewrite_presto_sql(query, catalogs=frozenset(self.catalogs))
        return self.spark.sql(query)

    def strict_errors(self, enabled: bool = True) -> None:
        """Presto evaluates with ANSI error semantics ALWAYS — division by
        zero, numeric overflow, and invalid casts are query errors
        (``pm/operator/scalar/MathFunctions.java`` throws
        PrestoException(DIVISION_BY_ZERO) etc.). Spark 4's ANSI default
        already matches, so strict is the out-of-the-box behavior;
        ``strict_errors(False)`` opts into legacy permissive NULL-on-error
        (the ``try_*`` functions keep their NULL contract either way,
        matching Presto's TRY)."""
        self.spark.conf.set("spark.sql.ansi.enabled", "true" if enabled else "false")

    def table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        if name in TABLES:
            raise KeyError(f"table {name!r} exists but no sf_dir attached")
        return self.spark.table(name)
