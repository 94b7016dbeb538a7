"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

Header metadata is decoded FOR REAL for BMP/PNG/GIF/WAV via the
pure-Python parser in ``kernel/media.py`` (width/height for images,
duration/sample-rate for audio) — oracle-gated by the ``media_decode``
query. Full pixel/sample decode (resize, resample, frame sampling)
needs codec libraries that are not in this container, so payloads in
unrecognized formats fall back to a deterministic digest-derived fake
(documented below); everything Spark-side — schema, partitioning, UDF
signature, batch shaping — is real and tested. Swap ``_fake_decode``
for a Pillow/torchaudio/PyAV call on a real deployment.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("feature_dim", IntegerType()),
    ]
)


def _fake_decode(payload: bytes):
    """Deterministic fake decode for formats without a header parser:
    digest-derived dimensions. Keeps the pipeline end-to-end testable
    without codecs; swap for Pillow/torchaudio/PyAV on deployment."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return width, height


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..kernel.media import parse_media_header

    for batch in batches:
        out = {name: [] for name in FEATURE_SCHEMA.fieldNames()}
        for row in batch.itertuples(index=False):
            payload = bytes(row.payload or b"")
            digest = hashlib.md5(payload).hexdigest()
            header = parse_media_header(payload)
            if header is not None:
                fmt, width, height, duration = header.format, header.width, header.height, header.duration_ms
            else:
                fmt = None
                width, height = _fake_decode(payload)
                duration = None
            out["media_id"].append(row.media_id)
            out["kind"].append(row.kind)
            out["n_bytes"].append(len(payload))
            out["content_digest"].append(digest)
            out["format"].append(fmt)
            out["width"].append(width)
            out["height"].append(height)
            out["duration_ms"].append(duration)
            out["feature_dim"].append(64)
        yield pd.DataFrame(out)


def media_features(media: DataFrame) -> DataFrame:
    """Binary payloads -> typed feature rows. Repartitions uniformly on
    media_id first (payloads can be huge; never key a shuffle on kind —
    a corpus is usually 90% one modality)."""
    return media.repartition(F.col("media_id")).mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
