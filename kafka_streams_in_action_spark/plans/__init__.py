from .queries import QUERIES, QuerySpec, run_query  # noqa: F401
