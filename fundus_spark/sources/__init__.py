from .doc_html import documents_as_transcripts
from .transcripts import build_transcripts, bulk_rows, golden_rows, write_transcripts_parquet

__all__ = [
    "build_transcripts",
    "bulk_rows",
    "documents_as_transcripts",
    "golden_rows",
    "write_transcripts_parquet",
]
