"""Relational operators mirroring the reference's aggregation-like
behaviors (SURVEY.md §2.5) as native DataFrame plans:

* grouped top-k (``max_articles_per_publisher`` cutoff) — window
  row_number, shuffle keyed on the group only;
* first-wins dedup (``only_unique``) — groupBy + min tiebreak (map-side
  combinable, preferred over dropDuplicates for determinism);
* Requires/RequiresAll predicate filters — pure Column algebra;
* regex URL-ish filters.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
    desc: bool = True,
) -> DataFrame:
    """Per-group top-k (reference ``max_articles_per_publisher`` cutoff,
    crawler.py:438-445). ``tiebreak_col`` is mandatory: row_number over a
    non-total order is nondeterministic across shuffles, so the caller
    must name the unique column that breaks ties (ascending)."""
    order = F.desc(order_col) if desc else F.asc(order_col)
    w = Window.partitionBy(*group_cols).orderBy(order, F.asc(tiebreak_col))
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def first_wins_dedup(df: DataFrame, key_cols: Sequence[str], tiebreak_col: str) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(F.asc(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def regex_filter(df: DataFrame, col: str, pattern: str, keep_matching: bool = False) -> DataFrame:
    """URLFilter semantics (reference ``filter.py:57-82``): True = drop."""
    predicate = F.col(col).rlike(pattern)
    return df.where(predicate if keep_matching else ~predicate)


def requires(df: DataFrame, attrs: Sequence[str], eval_booleans: bool = True) -> DataFrame:
    """``Requires(*attrs)`` semantics (reference ``filter.py:128-161``):
    drop rows whose named attrs are null/empty/falsy."""
    conditions: List[Column] = []
    for name in attrs:
        col = F.col(name)
        dtype = dict(df.dtypes)[name]
        cond = col.isNotNull()
        if dtype.startswith("array"):
            cond = cond & (F.size(col) > 0)
        elif dtype == "string":
            cond = cond & (F.length(col) > 0)
        elif dtype == "boolean" and eval_booleans:
            cond = cond & col
        conditions.append(cond)
    combined = conditions[0]
    for c in conditions[1:]:
        combined = combined & c
    return df.where(combined)


def language_filter(extracted: DataFrame, allowed: Sequence[str], lang_col: str = "lang") -> DataFrame:
    """Keep rows whose detected language is in ``allowed`` (the
    reference's post-extraction language filter, scraper.py:64-70 —
    articles whose detected lang is outside the publisher's language
    set are dropped). Null lang is dropped, like a failed detection."""
    return extracted.where(F.col(lang_col).isin(list(allowed)))


def round_robin_merge(df: DataFrame, group_col: str, order_col: str) -> DataFrame:
    """Round-robin fair merge across groups — the reference crawler's
    ``more_itertools.roundrobin`` over per-publisher article streams
    (crawler.py:585-590), re-expressed as a deterministic total order:
    the r-th item of every group comes before any (r+1)-th item, groups
    ordered by name within a round. Emits ``merge_pos`` (0-based).

    Scale shape: per-group rank and within-round rank use PARTITIONED
    windows (keys: group / round index — both bounded); the only
    unpartitioned step is a prefix sum over the per-round COUNTS, a
    relation of at most max-group-size rows, never the data. No global
    single-partition window touches row-level data.
    """
    w_group = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    base = df.withColumn("_rn", F.row_number().over(w_group))
    w_round = Window.partitionBy("_rn").orderBy(F.asc(group_col))
    in_round = base.withColumn("_pos_in_round", F.row_number().over(w_round) - 1)
    round_sizes = base.groupBy("_rn").agg(F.count(F.lit(1)).alias("_round_n"))
    w_prefix = Window.orderBy("_rn").rowsBetween(Window.unboundedPreceding, -1)
    offsets = round_sizes.select(
        "_rn", F.coalesce(F.sum("_round_n").over(w_prefix), F.lit(0)).alias("_offset")
    )
    return (
        in_round.join(F.broadcast(offsets), "_rn")
        .withColumn("merge_pos", (F.col("_offset") + F.col("_pos_in_round")).cast("long"))
        .drop("_rn", "_pos_in_round", "_offset")
    )
