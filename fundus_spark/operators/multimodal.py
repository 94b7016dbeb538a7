"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels (image decode/resize, audio resample, video frame
sampling) need codec libraries that are not in this container, so the
per-batch decode is STUBBED with a deterministic fake (documented
below); everything Spark-side — schema, partitioning, UDF signature,
batch shaping — is real and tested. Swap ``_fake_decode`` for a
Pillow/torchaudio/PyAV call on a real deployment.
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
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_dim", IntegerType()),
    ]
)


def _try_real_decode(payload: bytes, kind: str):
    """Gate on optional codec libs; not present in this container."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode wiring goes here")
    except ImportError:
        return None


def _fake_decode(payload: bytes, kind: str):
    """Deterministic fake decode: digest-derived dimensions. Keeps the
    pipeline end-to-end testable without codecs."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return digest, width, height


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        out = {name: [] for name in FEATURE_SCHEMA.fieldNames()}
        for row in batch.itertuples(index=False):
            payload = bytes(row.payload or b"")
            decoded = _try_real_decode(payload, row.kind) or _fake_decode(payload, row.kind)
            digest, width, height = decoded
            out["media_id"].append(row.media_id)
            out["kind"].append(row.kind)
            out["n_bytes"].append(len(payload))
            out["content_digest"].append(digest)
            out["width"].append(width)
            out["height"].append(height)
            out["feature_dim"].append(64)
        yield pd.DataFrame(out)


def media_features(media: DataFrame) -> DataFrame:
    """Binary payloads -> typed feature rows. Repartitions uniformly on
    media_id first (payloads can be huge; never key a shuffle on kind —
    a corpus is usually 90% one modality)."""
    return media.repartition(F.col("media_id")).mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
