from .html_extractor import (
    ExtractionResult,
    extract_document,
    extract_html,
    extraction_version,
)
from .pdf_extractor import extract_pdf

__all__ = [
    "ExtractionResult",
    "extract_document",
    "extract_html",
    "extract_pdf",
    "extraction_version",
]
