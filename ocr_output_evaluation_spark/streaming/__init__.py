from .pipeline import (
    read_web_pages_stream,
    running_lang_totals,
    stream_extraction,
    windowed_lang_counts,
)

__all__ = [
    "read_web_pages_stream",
    "stream_extraction",
    "windowed_lang_counts",
    "running_lang_totals",
]
