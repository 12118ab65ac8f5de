from .ingest import IngestConfig, IngestPipeline, TableSpec  # noqa: F401
