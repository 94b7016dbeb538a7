"""documents -> deterministic ``.warc.gz`` payloads (one per source).

Each source's documents become HTTP response records (URL, WARC-Date,
and body all closed-form in doc_id/text) inside a real multi-member
gzip WARC file (kernel/warc.py builder — the CC-NEWS layout), so the
``warc_extract`` round trip has an exact DuckDB oracle.

Test/bench synthesis only: one applyInPandas group per source holds
that source's documents in memory, which is fine for fixture-scale
corpora — production WARC files already exist on disk and flow through
``operators/warc.py`` one file per row (no grouping)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..kernel.warc import build_warc


def _build_group_factory(wrap_html: bool):
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        from datetime import date, timedelta

        from .doc_html import py_doc_to_html

        pdf = pdf.sort_values("doc_id")
        source = pdf["source"].iloc[0]
        records = []
        for row in pdf.itertuples(index=False):
            doc_id = int(row.doc_id)
            day = (date(2024, 1, 1) + timedelta(days=doc_id % 365)).isoformat()
            body = py_doc_to_html(doc_id, row.text) if wrap_html else row.text
            records.append((f"https://{source}.example/article/{doc_id}", f"{day}T00:00:00Z", body))
        return pd.DataFrame({"source": [source], "payload": [build_warc(records)]})

    return build


def documents_as_warcs(documents: DataFrame, wrap_html: bool = False) -> DataFrame:
    """``wrap_html=False``: record bodies are the raw document text
    (exact round-trip oracle). ``wrap_html=True``: bodies are the
    synthetic generic-rule articles (py_doc_to_html), so the chained
    WARC->extraction pipeline has the same closed-form oracle as
    ``extract_documents``."""
    return (
        documents.select("doc_id", "source", "text")
        .groupBy("source")
        .applyInPandas(_build_group_factory(wrap_html), schema="source string, payload binary")
    )
