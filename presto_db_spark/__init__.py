"""presto_db_spark — a PySpark-native analytics engine with the query
capabilities of fornaix/presto-db (Presto 0.236), built Spark-first.

See SURVEY.md for the capability contract and the reference citations.
"""

from .engine import Engine  # noqa: F401
from .session import get_spark  # noqa: F401
