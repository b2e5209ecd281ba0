"""Arrow-vectorized Spark wrappers around the pure extractor.

The ONLY per-row Python in the whole engine (analog of the reference's
irreducible UDF region, SURVEY.md §2.10). Everything upstream/downstream is
native DataFrame expressions. The UDF is a scalar pandas UDF: the JVM ships
Arrow batches of (html) to the Python worker, the worker maps the pure
function over the batch, and returns one Arrow struct column.

Scale notes:
- Batch size is bounded via spark.sql.execution.arrow.maxRecordsPerBatch
  (session.py) so html blobs don't blow worker memory.
- Select ONLY (url, html, ...) before applying this — column pruning keeps
  the Arrow channel narrow (SURVEY.md §4.1).
- The pure extractor module is imported once per Python worker process
  (module-global), the analog of the reference's per-process model cache
  (/root/reference/perplexity_scorer.py:84-135).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..schema import EXTRACTION_RESULT
from .html_extractor import extract_document


@F.pandas_udf(EXTRACTION_RESULT)
def extract_udf(html: pd.Series) -> pd.DataFrame:
    """html BINARY -> struct(extracted_text, text_sha256, n_blocks_kept,
    n_blocks_dropped, is_pdf, error). Byte-identical to extract_document()."""
    rows = []
    for payload in html:
        r = extract_document(payload if payload is None else bytes(payload))
        rows.append(
            (r.text, r.text_sha256, r.n_blocks_kept, r.n_blocks_dropped, r.is_pdf, r.error)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "extracted_text",
            "text_sha256",
            "n_blocks_kept",
            "n_blocks_dropped",
            "is_pdf",
            "error",
        ],
    )


def with_extraction(df, html_col: str = "html", out_col: str = "extraction"):
    """Attach the extraction struct column; caller selects/flattens fields."""
    return df.withColumn(out_col, extract_udf(F.col(html_col)))


def domain_of(url: Column | str) -> Column:
    """Native domain parse — no UDF. https://host/path -> host."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
