from .mapping import ParserConfig
from .service import IngestionReport, ingest_data

__all__ = ["ParserConfig", "IngestionReport", "ingest_data"]
