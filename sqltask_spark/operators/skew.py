"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default,
``spark.sql.adaptive.skewJoin.enabled``) handles most skew at
runtime; explicit salting remains the tool when one side must be
replicated — e.g. a medium-sized dimension too big to broadcast
joined against a fact with a few very hot keys, or aggregation
pipelines where a single key exceeds an executor.

``salted_join``: the large (skewed) side gets a deterministic salt in
``[0, buckets)`` per row; the small side is exploded ×``buckets`` so
every (key, salt) pair finds its match. Correctness is unchanged —
each large-side row still meets each matching small-side row exactly
once — while the hot key's rows spread over ``buckets`` shuffle
partitions instead of one.

``salted_count``: two-phase aggregation (per-(key, salt) partial →
per-key final) for count/sum-style aggregates on skewed keys. For
algebraic aggregates Spark's own partial aggregation already does
this; the explicit form exists for pipelines that need the
intermediate (e.g. heavy distinct-collection per key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(
    df: DataFrame, keys: Sequence[str], buckets: int
) -> DataFrame:
    """Deterministic per-row salt: xxhash64 of the whole row's key +
    a uniform spreader (monotonic id) folded into [0, buckets)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*keys, F.monotonically_increasing_id()),
            F.lit(buckets),
        ).cast("int"),
    )


def explode_salt(
    df: DataFrame, buckets: int
) -> DataFrame:
    """Replicate each row once per salt bucket (small side only)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>")),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side, explode the
    small side, join on (keys, salt).

    ``how`` supports 'inner' and 'left' (left = the large side). The
    small side is replicated ×buckets — keep ``buckets`` modest and
    the small side genuinely smaller.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(keys)
    l = with_salt(large, keys, buckets)
    s = explode_salt(small, buckets)
    return l.join(s, on=[*keys, SALT_COL], how=how).drop(SALT_COL)


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    buckets: int = 8,
) -> DataFrame:
    """Two-phase count per key: (key, salt) partial → key final."""
    keys = list(keys)
    partial = (
        with_salt(df, keys, buckets)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").alias("n_rows")
    )
