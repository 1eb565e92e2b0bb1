"""Similarity search over embedding columns (``array<float>``).

North-star extension. Two tiers:

- **brute-force top-k** — exact: broadcast the (small) query set
  against the corpus, score every pair JVM-side, per-query top-k via
  window. Cost O(|queries| · |corpus|) with zero shuffle on the
  corpus side (queries are broadcast); the right baseline and exact
  answer for ≤ thousands of queries.
- **LSH-bucketed top-k** — approximate: random-hyperplane signatures
  (cosine LSH) bucket the corpus; each query only scores candidates
  sharing a bucket in ≥1 of ``tables`` hash tables. Corpus-side cost
  drops to O(n · tables) signature work + a bucket equi-join; the
  scale path when queries × corpus explodes.

All vector math is expressed with ``zip_with``/``aggregate`` fold
over double-cast elements — sequential, deterministic, JVM-side (no
Python). Hyperplanes derive from a seeded RNG so results are stable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Scores are rounded before ranking and tie-broken by corpus id, so
    the result set is fully deterministic and reproducible by any
    engine computing the same double arithmetic.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        as_double_array(F.col(query_vec)).alias("qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        as_double_array(F.col(corpus_vec)).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits),
        )
        .drop("qv", "cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def cosine_lsh_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane signature: one int packing sign bits."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = as_double_array(vec)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    dim: int,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    tables: int = 4,
    seed: int = 42,
    round_digits: int = 6,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table.

    Recall improves with ``tables``; cost is one equi-join per table
    (unioned, deduped) instead of the full cross product.

    ``probe_hamming=1`` enables multi-probe: each query additionally
    probes every bucket one sign-bit flip away. Because the probe
    expansion happens on the (small, broadcast) query side it is
    nearly free, while per-table collision probability rises from
    ``p^b`` to ``p^b + b·p^(b-1)(1-p)`` — the standard way to reach
    high recall without multiplying hash tables.
    """
    def with_sigs(df: DataFrame, id_alias: str, vec_col: str) -> DataFrame:
        out = df.select(
            F.col(id_alias),
            as_double_array(F.col(vec_col)).alias(f"{id_alias}_v"),
            *[
                cosine_lsh_signature(
                    F.col(vec_col), dim, n_planes, seed + t
                ).alias(f"sig{t}")
                for t in range(tables)
            ],
        )
        return out

    q = with_sigs(
        queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("__qv")),
        "query_id",
        "__qv",
    )
    c = with_sigs(
        corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(corpus_vec).alias("__cv")),
        "neighbor_id",
        "__cv",
    )
    def probe_buckets(sig: Column) -> Column:
        """Bucket itself + all buckets within the probe Hamming radius."""
        probes = [sig]
        if probe_hamming >= 1:
            probes += [
                sig.bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ]
        return F.array(*probes)

    cands = None
    for t in range(tables):
        qi = q.select(
            "query_id",
            "query_id_v",
            F.explode(probe_buckets(F.col(f"sig{t}"))).alias("bucket"),
        )
        ci = c.select(
            "neighbor_id", "neighbor_id_v", F.col(f"sig{t}").alias("bucket")
        )
        cand = ci.join(F.broadcast(qi), "bucket").drop("bucket")
        cands = cand if cands is None else cands.unionByName(cand)
    scored = (
        cands.filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "score",
            F.round(
                cosine(F.col("query_id_v"), F.col("neighbor_id_v")),
                round_digits,
            ),
        )
        .drop("query_id_v", "neighbor_id_v")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
