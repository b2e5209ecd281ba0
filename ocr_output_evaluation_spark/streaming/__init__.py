from .pipeline import (
    dedup_within_watermark,
    enrich_stream_with_dim,
    read_web_pages_stream,
    running_lang_totals,
    stream_as_of_join,
    stream_dedup_extraction,
    stream_extraction,
    stream_cms_cells,
    stream_hll_registers,
    stream_sessionize,
    stream_warc_extraction,
    windowed_lang_counts,
)

__all__ = [
    "dedup_within_watermark",
    "enrich_stream_with_dim",
    "read_web_pages_stream",
    "stream_dedup_extraction",
    "stream_extraction",
    "windowed_lang_counts",
    "running_lang_totals",
    "stream_as_of_join",
    "stream_cms_cells",
    "stream_hll_registers",
    "stream_sessionize",
    "stream_warc_extraction",
]
