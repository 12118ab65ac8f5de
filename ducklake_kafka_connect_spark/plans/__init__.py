from .queries import QUERIES, QueryDef, oracle_sql_map, query_map  # noqa: F401
