from .parquet import TABLES, load_table, register_views, table_path  # noqa: F401
