from .parquet_loader import load_parquet, load_tables  # noqa: F401
