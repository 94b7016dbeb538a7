"""documents -> synthetic PDF payloads bridge (deterministic).

Each document's whitespace-normalized text becomes a one-line,
Flate-compressed PDF. The extraction oracle is then closed-form:
``pdf_text == trim(regexp_replace(text, '\\s+', ' ', 'g'))``.
Multi-line / multi-page shapes are covered by kernel unit tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pyspark.sql.types import BinaryType, LongType, StructField, StructType

_PDF_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

_WS = re.compile(r"\s+")


def _build_batches(batches):
    import pyarrow as pa

    from .pdf_gen import build_pdf

    schema = pa.schema([pa.field("doc_id", pa.int64()), pa.field("payload", pa.binary())])
    for batch in batches:
        ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
        texts = batch.column(batch.schema.get_field_index("text")).to_pylist()
        payloads = [build_pdf([[_WS.sub(" ", t or "").strip()]]) for t in texts]
        yield pa.RecordBatch.from_arrays([pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())], schema=schema)


def documents_as_pdfs(documents: DataFrame) -> DataFrame:
    from ..operators.adaptive import adaptive_repartition

    base = adaptive_repartition(documents.select("doc_id", "text"), cols=("doc_id",))
    return base.mapInArrow(_build_batches, schema=_PDF_DOCS_SCHEMA)
