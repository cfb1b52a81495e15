from .registry import QUERIES, QuerySpec, register  # noqa: F401
