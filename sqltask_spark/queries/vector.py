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
    cosine_near_pairs,  # noqa: F401 — small-corpus oracle cross-check
    cosine_near_pairs_blocked,
    cosine_near_pairs_lsh,
    cosine_topk_brute,
    cosine_topk_ivf,
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


# --------------------------------------------------------------------------
# ann_topk_ivf — IVF-partitioned approximate top-k (no oracle;
# recall-tested in pytest like the LSH variant).
# --------------------------------------------------------------------------

def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= N_QUERY_VECS)
    return cosine_topk_ivf(
        queries, emb, "vec_id", "vec_id", k=TOP_K,
        n_cells=32, n_probe=8,
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# dedup_embedding_pairs — embedding-cosine near-duplicate pairs.
# --------------------------------------------------------------------------

#: The synthetic embeddings have no true near-dups (max pairwise
#: cosine ≈ 0.51 at sf0.01), so the threshold sits below that to
#: exercise the operator end-to-end; real corpora run ≥ 0.9.
_EMB_DUP_THRESHOLD = 0.4


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-pairs via the blocked equi-join (scale path): same
    result set as the all-pairs oracle below, but distributed as
    B(B+1)/2 shuffle-joined block pairs — no broadcast nested loop in
    the plan (locked by ``tests/test_plans.py``). The unblocked
    :func:`cosine_near_pairs` remains the small-corpus cross-check."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs_blocked(
        emb, "vec_id", "embedding", threshold=_EMB_DUP_THRESHOLD
    ).orderBy("id_a", "id_b")


def dedup_embedding_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate variant: LSH-bucketed candidates + exact cosine
    verify — the 100 TB path for real ≥0.9 thresholds (no oracle:
    recall is seeded-approximate; pytest measures it against exact).
    The synthetic threshold is low, so recall needs many narrow
    tables; real high-threshold corpora need far fewer."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs_lsh(
        emb,
        "vec_id",
        dim=EMBED_DIM,
        vec_col="embedding",
        threshold=_EMB_DUP_THRESHOLD,
        n_planes=4,
        tables=16,
    ).orderBy("id_a", "id_b")


_EMB_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scored AS (
  SELECT
    a.vec_id AS id_a,
    b.vec_id AS id_b,
    ROUND(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine
FROM scored
WHERE cosine >= {_EMB_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


QUERIES = {
    "ann_topk_brute": ann_topk_brute,
    "vector_norms": vector_norms,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "dedup_embedding_pairs": dedup_embedding_pairs,
    "dedup_embedding_pairs_lsh": dedup_embedding_pairs_lsh,
}

ORACLES = {
    "ann_topk_brute": _ANN_BRUTE_SQL,
    "vector_norms": _NORMS_SQL,
    "dedup_embedding_pairs": _EMB_PAIRS_SQL,
    # ann_topk_lsh: no oracle (seeded hyperplanes, approximate).
}
