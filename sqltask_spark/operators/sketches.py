"""Frequency-sketch operators: Misra–Gries heavy hitters.

No reference counterpart (north-star extension). The exact "which
tokens dominate the corpus" query is a groupBy over EVERY distinct
item — at 100 TB that shuffle carries the full vocabulary (billions
of keys for web-scale n-grams). The sketch path bounds it:

1. **Per-partition Misra–Gries summaries** (k counters) via an
   Arrow-batched ``mapInPandas``: each batch's value_counts is itself
   an exact summary, merged into the running counters with the
   mergeable-summaries rule (add counts; if more than k items remain,
   subtract the (k+1)-th largest and drop non-positives) — the
   vectorized formulation of MG's decrement step (Agarwal et al.,
   "Mergeable Summaries", PODS 2012), no per-row Python loop.
2. **Driver merge** of the ≤ k·P summary rows (tiny) with the same
   rule → a candidate set with the global MG guarantee: every item
   with true frequency > n/(k+1) is a candidate, for ANY
   partitioning of the input.
3. **Exact verification**: only candidate items are exact-counted
   (broadcast semi-join → map-side-combined count over ≤ k distinct
   keys), and the φ-threshold filter (``count·(k+1) > n`` — integer
   arithmetic) keeps exactly the TRUE heavy hitters.

The output is therefore exact and partitioning-independent (the
sketch only prunes; candidates ⊇ true heavies by the MG guarantee),
which is what makes the operator oracle-checkable by plain SQL while
never running an unbounded-vocabulary shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: "pd.Series", batch: "pd.Series", k: int) -> "pd.Series":
    """Merge two MG summaries (one may be exact batch counts), keep
    at most k counters: sum, then subtract the (k+1)-th largest count
    and drop non-positive counters."""
    merged = counters.add(batch, fill_value=0)
    if len(merged) > k:
        t = merged.nlargest(k + 1).iloc[-1]
        merged = merged - t
        merged = merged[merged > 0]
    return merged


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 50,
) -> DataFrame:
    """Exact φ-heavy hitters (φ = 1/(k+1)) of ``item_col``.

    Returns (item, n_occurrences) for every item whose exact count
    satisfies ``count·(k+1) > n_total``, ordered by count desc with
    an item tie-break. See the module docstring for the three-stage
    shape; the result is exact and layout-independent.
    """
    spark = df.sparkSession
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = _mg_merge(
                counters, pdf["item"].value_counts(), k
            )
        yield pd.DataFrame(
            {"item": counters.index.astype(str), "cnt": counters.values}
        )

    summaries = items.mapInPandas(
        summarize, schema="item string, cnt long"
    ).collect()
    merged = pd.Series(dtype="int64")
    for r in summaries:
        merged = _mg_merge(merged, pd.Series({r["item"]: r["cnt"]}), k)
    candidates = [str(i) for i in merged.index]
    if not candidates:
        return items.groupBy("item").count().limit(0).select(
            "item", F.col("count").alias("n_occurrences")
        )

    total = items.count()
    exact = (
        items.filter(F.col("item").isin(candidates))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * (k + 1) > F.lit(total))
    )
    return exact.orderBy(F.desc("n_occurrences"), "item")
