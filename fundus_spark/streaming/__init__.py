from .stream import (
    conversations_with_inactivity_timeout,
    sessionized_conversations,
    stream_extract_articles,
    stream_first_wins_dedup,
    windowed_turn_counts,
    write_stream_to_parquet,
)

__all__ = [
    "conversations_with_inactivity_timeout",
    "sessionized_conversations",
    "stream_extract_articles",
    "stream_first_wins_dedup",
    "windowed_turn_counts",
    "write_stream_to_parquet",
]
