"""Deterministic sampling and dataset-split assignment for
training-data pipelines.

The primitive is a content-independent uniform hash bucket
``u(id) = md5(salt || id)[:8 hex] / 2^32  in [0, 1)`` — a pure JVM
column expression (one md5 per row, no Python), portable to any engine
with md5 so the DuckDB oracle recomputes the exact same rows.

Why hash-bucket instead of ``df.sample()``: the decision for a row
depends ONLY on (salt, id), never on partitioning, row order, or the
rest of the corpus. At 100 TB that buys three properties RNG sampling
cannot give:

* **reproducible** across reruns, engines, and cluster sizes;
* **incremental** — re-running over a grown corpus keeps every prior
  decision, so downstream caches/checkpoints stay valid;
* **coordinated** — train/val/test membership is consistent between
  independent jobs that never communicate (same salt -> same split).

All operators are narrow (filter / projection): zero shuffles, full
predicate pipelining into the scan stage. The reference has no sampling
surface (it crawls everything); this is part of the
training-data-pipeline extension layer.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 2**32


def hash_bucket(id_col: Column, salt: str = "", mode: str = "md5") -> Column:
    """Uniform bigint bucket in [0, 2^32) from (salt, id).

    * ``md5`` (default): first 8 md5 hex digits — identical in any
      md5-capable engine, so the DuckDB oracle recomputes the exact
      sample/split membership.
    * ``xxhash64`` (production): Spark's native hash folded to 32 bits,
      ~3-4x cheaper per row but engine-specific. Same twin-mode
      contract as the minhash operators; a given corpus must pick ONE
      mode and keep it — the two modes define different (equally valid)
      sample/split universes.
    """
    if mode not in ("md5", "xxhash64"):
        # a typo'd mode silently selecting the other hash would put the
        # run in a different sample/split universe — fail at build time
        raise ValueError(f"unknown hash mode {mode!r}: expected 'md5' or 'xxhash64'")
    if mode == "xxhash64":
        return F.pmod(F.xxhash64(F.concat(F.lit(salt), id_col.cast("string"))), F.lit(_BUCKETS)).cast("bigint")
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8), 16, 10).cast("bigint")


def _threshold(rate: float) -> int:
    return int(rate * _BUCKETS)


def deterministic_sample(
    df: DataFrame, rate: float, salt: str = "", id_col: str = "doc_id", mode: str = "md5"
) -> DataFrame:
    """Keep each row iff ``u(id) < rate``. A superset corpus always
    samples to a superset (per-row decisions are independent)."""
    return df.where(hash_bucket(F.col(id_col), salt, mode) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "source",
    default_rate: float = 0.0,
    salt: str = "",
    id_col: str = "doc_id",
    mode: str = "md5",
) -> DataFrame:
    """Per-stratum deterministic sampling (dataset mixing: e.g. keep 5%
    of crawl, 100% of curated). ``rates`` maps stratum value -> keep
    rate; strata absent from the map get ``default_rate``.

    Scale shape: the rate table is folded into a CASE expression (a few
    dozen strata is the normal case), so the plan stays a narrow filter
    with no join; for thousands of strata switch to a broadcast join on
    a rates dim — same semantics, still no shuffle of the fact side.
    """
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold(rate))).otherwise(thr)
    return df.where(hash_bucket(F.col(id_col), salt, mode) < thr)


def split_assign(
    df: DataFrame,
    weights: Sequence[Tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
    id_col: str = "doc_id",
    mode: str = "md5",
) -> DataFrame:
    """Assign every row a split label by cumulative hash-bucket ranges:
    with weights ((train, .9), (val, .05), (test, .05)), ids whose
    bucket lands in [0, .9) are train, [.9, .95) val, rest test.
    Membership depends only on (salt, id): two jobs that never
    communicate agree on the split, and growing the corpus never moves
    an existing row between splits. Weights must sum to ~1; the last
    split absorbs rounding."""
    bucket = hash_bucket(F.col(id_col), salt, mode)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    bounds = []
    for name, w in weights[:-1]:
        cum += w
        bounds.append((name, _threshold(cum)))
    for name, bound in reversed(bounds):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
