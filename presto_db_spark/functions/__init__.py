from .presto import register_presto_functions  # noqa: F401
