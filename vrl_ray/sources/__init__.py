"""Sources: parquet readers + deterministic synthetic transcript data."""

from .transcripts import (
    transcript_dataset,
    transcript_table,
    generate_conversation,
    ensure_transcripts_parquet,
    TOOL_VOCAB,
)

__all__ = [
    "transcript_dataset", "transcript_table", "generate_conversation",
    "ensure_transcripts_parquet", "TOOL_VOCAB",
]
