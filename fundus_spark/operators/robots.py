"""Robots gate over stored tables — the batch analogue of the
reference's per-fetch robots check (``scraping/html.py:163-167``:
skip a URL when ``robots.can_fetch(user_agent, url)`` is false; the
crawl-delay consultation at ``html.py:133-140`` maps to the
``crawl_delay`` output column).

Scale shape: the robots side is one row per source/domain — a tiny
dimension — so it BROADCASTS onto the URL frontier (no shuffle of the
big side); evaluation is an Arrow-batched stage with the parsed
matcher cached per distinct robots payload within each batch.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_GATE_SCHEMA = StructType(
    [
        StructField("url_id", LongType()),
        StructField("source", StringType()),
        StructField("url", StringType()),
        StructField("allowed", BooleanType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def _gate_batches(user_agent: str):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.robots import RobotsMatcher

        cache: dict = {}
        for batch in batches:
            out = {name: [] for name in ROBOTS_GATE_SCHEMA.fieldNames()}
            for row in batch.itertuples(index=False):
                text = row.robots_txt or ""
                matcher = cache.get(text)
                if matcher is None:
                    matcher = cache[text] = RobotsMatcher(text)
                out["url_id"].append(row.url_id)
                out["source"].append(row.source)
                out["url"].append(row.url)
                out["allowed"].append(matcher.can_fetch(user_agent, row.url))
                delay = matcher.crawl_delay(user_agent)
                out["crawl_delay"].append(float(delay) if delay is not None else None)
            yield pd.DataFrame(out)

    return fn


def robots_gate(
    urls: DataFrame,
    robots: DataFrame,
    user_agent: str = "FundusBot",
) -> DataFrame:
    """``urls (url_id, source, url)`` x ``robots (source, robots_txt)``
    -> per-URL ``allowed`` + ``crawl_delay`` under RFC 9309 semantics
    (kernel/robots.py). The robots dimension broadcasts."""
    from .adaptive import adaptive_repartition

    joined = adaptive_repartition(urls, cols=("url_id",)).join(
        F.broadcast(robots), "source", "left"
    )
    return joined.mapInPandas(_gate_batches(user_agent), schema=ROBOTS_GATE_SCHEMA)
