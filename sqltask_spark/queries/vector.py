"""Embedding similarity-search queries over the ``embeddings`` table.

Brute-force cosine top-k carries a DuckDB oracle (both engines fold
the same doubles in element order; scores rounded before ranking with
an id tie-break → fully deterministic). The LSH variant uses seeded
random hyperplanes — deterministic but not practical to express in
SQL, so it is declared without an oracle and validated in pytest by
measuring recall against the brute-force result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqltask_spark.data import load_table
from sqltask_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_lsh,
    l2_norm,
    as_double_array,
)

N_QUERY_VECS = 5
TOP_K = 10
EMBED_DIM = 64

_COS_SQL = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


# --------------------------------------------------------------------------
# ann_topk_brute — exact cosine top-10 for the first 5 vectors.
# --------------------------------------------------------------------------

def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= N_QUERY_VECS)
    return cosine_topk_brute(
        queries, emb, "vec_id", "vec_id", k=TOP_K
    ).orderBy("query_id", "rank")


_ANN_BRUTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id <= {N_QUERY_VECS}
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT
    q.query_id,
    c.neighbor_id,
    ROUND({_COS_SQL}, 6) AS score
  FROM c CROSS JOIN q
  WHERE q.query_id <> c.neighbor_id
), ranked AS (
  SELECT
    query_id, neighbor_id, score,
    ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC
    ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, rank
FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# vector_norms — per-vector L2 norm + per-label counts.
# --------------------------------------------------------------------------

def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(l2_norm(as_double_array(F.col("embedding"))), 6).alias(
            "l2_norm"
        ),
    ).orderBy("vec_id")


_NORMS_SQL = """
SELECT
  vec_id,
  label,
  ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
FROM embeddings
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# ann_topk_lsh — approximate variant (no oracle; recall-tested).
# --------------------------------------------------------------------------

def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= N_QUERY_VECS)
    return cosine_topk_lsh(
        queries,
        emb,
        "vec_id",
        "vec_id",
        dim=EMBED_DIM,
        k=TOP_K,
        n_planes=10,
        tables=6,
    ).orderBy("query_id", "rank")


QUERIES = {
    "ann_topk_brute": ann_topk_brute,
    "vector_norms": vector_norms,
    "ann_topk_lsh": ann_topk_lsh,
}

ORACLES = {
    "ann_topk_brute": _ANN_BRUTE_SQL,
    "vector_norms": _NORMS_SQL,
    # ann_topk_lsh: no oracle (seeded hyperplanes, approximate).
}
