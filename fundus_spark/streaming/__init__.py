from .stream import stream_extract_articles, write_stream_to_parquet

__all__ = ["stream_extract_articles", "write_stream_to_parquet"]
