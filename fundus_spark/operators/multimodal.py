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
from typing import Iterable, Iterator, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
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


def _maybe_repartition(media: DataFrame, repartition_on: Optional[Union[str, Column]]) -> DataFrame:
    """Decode stages are stateless narrow maps, so by default they run
    on the scan's OWN partitioning: a fresh file scan is already
    byte-uniform (``spark.sql.files.maxPartitionBytes`` splits it), and
    a forced repartition would shuffle every payload byte — at 100 TB
    of media that shuffle IS the job's dominant cost. Pass
    ``repartition_on`` (e.g. ``"media_id"``) only when the input
    arrives from a skewed upstream shuffle; never key it on ``kind`` —
    a corpus is usually 90% one modality."""
    if repartition_on is None:
        return media
    col = F.col(repartition_on) if isinstance(repartition_on, str) else repartition_on
    return media.repartition(col)


def media_features(
    media: DataFrame, repartition_on: Optional[Union[str, Column]] = None
) -> DataFrame:
    """Binary payloads -> typed feature rows via a zero-shuffle
    Arrow-batched map (see :func:`_maybe_repartition` for when to opt
    into a redistribution first)."""
    return _maybe_repartition(media, repartition_on).mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)


def _resize_batches(max_w: int, max_h: int):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.media import parse_media_header

        for batch in batches:
            out = {name: [] for name in RESIZE_SCHEMA.fieldNames()}
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload or b"")
                header = parse_media_header(payload)
                if header is None or header.width is None:
                    continue  # not an image we can size
                w, h = header.width, header.height
                # aspect-preserving fit (the real geometry; the pixel
                # resample itself needs codec libs -> stubbed, see
                # module docstring)
                scale = min(max_w / w, max_h / h, 1.0)
                out["media_id"].append(row.media_id)
                out["kind"].append(row.kind)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(max(1, int(w * scale)))
                out["out_height"].append(max(1, int(h * scale)))
            yield pd.DataFrame(out)

    return fn


def media_resize(
    media: DataFrame,
    max_w: int = 32,
    max_h: int = 32,
    repartition_on: Optional[Union[str, Column]] = None,
) -> DataFrame:
    """Aspect-preserving resize plumbing: REAL input dimensions (header
    decode) and REAL output geometry (fit-within-box math, never
    upscaled); the pixel resample is the documented codec stub. Rows
    that are not parseable images are dropped (audio goes through
    :func:`media_frame_sample`). Zero-shuffle by default — see
    :func:`_maybe_repartition`."""
    return _maybe_repartition(media, repartition_on).mapInPandas(
        _resize_batches(max_w, max_h), schema=RESIZE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", LongType()),
    ]
)


def _frame_batches(every_ms: int):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.media import parse_media_header

        for batch in batches:
            out = {name: [] for name in FRAME_SAMPLE_SCHEMA.fieldNames()}
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload or b"")
                header = parse_media_header(payload)
                if header is None or header.duration_ms is None:
                    continue
                t = 0
                idx = 0
                while t < header.duration_ms:
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(idx)
                    out["t_ms"].append(t)
                    idx += 1
                    t += every_ms
            yield pd.DataFrame(out)

    return fn


def media_frame_sample(
    media: DataFrame, every_ms: int = 50, repartition_on: Optional[Union[str, Column]] = None
) -> DataFrame:
    """Uniform frame/sample-point schedule over timed media: REAL
    offsets computed from the REAL container duration (WAV here; the
    same schedule drives video frame extraction once codec libs exist —
    decoding the frame at each ``t_ms`` is the documented stub).
    Zero-shuffle by default — see :func:`_maybe_repartition`."""
    return _maybe_repartition(media, repartition_on).mapInPandas(
        _frame_batches(every_ms), schema=FRAME_SAMPLE_SCHEMA
    )
