"""documents -> deterministic ``.warc.gz`` payloads (one per source).

Each source's documents become HTTP response records (URL, WARC-Date,
and body all closed-form in doc_id/text) inside a real multi-member
gzip WARC file (kernel/warc.py builder — the CC-NEWS layout), so the
``warc_extract`` round trip has an exact DuckDB oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..kernel.warc import build_warc


def _build_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from datetime import date, timedelta

    pdf = pdf.sort_values("doc_id")
    source = pdf["source"].iloc[0]
    records = []
    for row in pdf.itertuples(index=False):
        day = (date(2024, 1, 1) + timedelta(days=int(row.doc_id) % 365)).isoformat()
        records.append(
            (
                f"https://{source}.example/article/{int(row.doc_id)}",
                f"{day}T00:00:00Z",
                row.text,
            )
        )
    return pd.DataFrame({"source": [source], "payload": [build_warc(records)]})


def documents_as_warcs(documents: DataFrame) -> DataFrame:
    return (
        documents.select("doc_id", "source", "text")
        .groupBy("source")
        .applyInPandas(_build_group, schema="source string, payload binary")
    )
