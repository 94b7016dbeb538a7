"""Scale-adaptive parallelism for compute-bound stages.

The problem (spark_optimization_guide.md §2/§6): Spark sizes scan splits
and AQE-coalesced shuffle partitions by BYTES. That is right when cost
is I/O-bound, and wrong for stages whose per-row cost dwarfs their byte
count — the Python extraction kernel, media decodes, per-character
winnowing hashes, n-gram explodes. A small input (one parquet row group,
or a few MB after AQE coalescing) then runs a CPU-bound stage on one
core while the rest of the machine idles.

:func:`adaptive_repartition` fixes exactly that regime and ONLY that
regime: the decision is derived from the input's own size and
partitioning, never from a constant tuned to any one machine.

* already-parallel input (>= the session's default parallelism in
  partitions) -> untouched;
* big input (optimizer size estimate >= one ``per_core_bytes`` split
  per core — any real at-scale scan) -> untouched, keeping the narrow
  zero-shuffle plan that is correct at 100 TB;
* small AND under-partitioned input -> one tiny shuffle up to the
  default parallelism, unlocking every core for the compute-bound
  stage that follows. The shuffled volume is bounded by the size check
  (< cores x ``per_core_bytes``), so the added exchange is always
  cheap relative to the stage it parallelizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: size-per-core threshold below which an input counts as "small": one
#: modest scan split per core. 32 MB x cores is far under any real
#: production input, and far over every local fixture.
PER_CORE_BYTES = 32 * 1024 * 1024


#: logical-plan node names whose presence means the DataFrame's nominal
#: (pre-AQE) partition count says nothing about runtime parallelism —
#: AQE re-coalesces every shuffle those nodes introduce by BYTES, which
#: for a small input collapses a compute-bound stage onto one core.
_WIDE_TOKENS = (
    "Aggregate",
    "Join",
    "Window",
    "Distinct",
    "Deduplicate",
    "Sort",
    "Repartition",
)


def _plan_size_bytes(df: DataFrame) -> Optional[int]:
    """Optimizer size estimate for ``df``'s plan, or None when the
    estimate is unavailable/unknown (e.g. some RDD-backed plans report
    the defaultSizeInBytes sentinel — treated as unknown)."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimation is best-effort
        return None
    # defaultSizeInBytes sentinel (Long.MaxValue-ish) means "no idea"
    if size < 0 or size >= (1 << 62):
        return None
    return size


def _has_wide_node(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001
        return False
    return any(tok in plan for tok in _WIDE_TOKENS)


def is_cheap_rescan(df: DataFrame) -> bool:
    """True when evaluating ``df`` twice costs ~one scan: it is already
    persisted/cached/checkpointed, or its optimized plan is a bare
    file-source read (scan/project/filter only — a count on it is
    parquet-metadata-cheap). Anything with a shuffle- or generate-class
    node (Aggregate, Join, Window, Distinct, ...) re-runs the whole job
    per evaluation and should be checkpointed by the caller of this
    predicate."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return True
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 — conservatively treat as expensive
        return False
    expensive = _WIDE_TOKENS + ("Generate",)
    return not any(tok in plan for tok in expensive)


def adaptive_repartition(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    per_core_bytes: Optional[int] = None,
) -> DataFrame:
    """Repartition a small, under-partitioned input up to the session's
    default parallelism ahead of a compute-bound stage; no-op for big or
    already-parallel inputs (see module docstring for the contract).

    ``cols`` hash-partitions on the given columns (deterministic and
    uniform when they form a fine-grained key, e.g. the row id);
    otherwise round-robin. Results are unchanged either way — callers
    are per-row maps or shuffling aggregations downstream.
    """
    if per_core_bytes is None:
        per_core_bytes = PER_CORE_BYTES  # late-bound so tests can pin a regime
    try:
        if df.isStreaming:
            return df
    except Exception:  # noqa: BLE001
        pass
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — never let the advisory check fail a plan
        return df
    size = _plan_size_bytes(df)
    if size is not None and size >= target * per_core_bytes:
        # provably big: leave the plan alone whatever its partitioning —
        # a full shuffle of heavy bytes is exactly what this helper must
        # never introduce (guide §8: move heavy bytes once, and not for
        # this). This is the 100 TB branch.
        return df
    if size is None:
        # unknown size (checkpoint/RDD-backed plans report inflated or
        # absent pre-materialization estimates): act only on the
        # unambiguous starvation case — a single partition, where every
        # byte already funnels through one task and one redistribution
        # moves it exactly once (the guide §2.5 unsplittable-input
        # prescription)
        if current != 1:
            return df
    else:
        # provably small: one tiny exchange buys full-core parallelism.
        # A narrow scan already split >= target ways needs nothing; a
        # plan with a wide node needs the explicit repartition even at
        # a nominal `target` partitions, because AQE coalesces its
        # shuffles by bytes at runtime.
        if current >= target and not _has_wide_node(df):
            return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)
