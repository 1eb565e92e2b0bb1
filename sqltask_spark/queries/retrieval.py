"""Retrieval queries over the ``documents`` table: BM25 search,
hashed TF-IDF vectorization, and an embedding-free topic map.

``search_bm25`` and ``doc_tfidf_vectors`` are fully deterministic
(fixed-point micro-unit sums, md5 feature hashing) and carry DuckDB
oracles that reproduce the exact arithmetic. ``topic_cluster_documents``
runs spherical k-means (engine-specific float geometry) → rows-only
for the driver; its semantics are pytest-covered on a planted
two-topic corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sqltask_spark.data import load_table
from sqltask_spark.operators.retrieval import (
    _query_frame,
    bm25_search,
    hashed_tfidf,
    hybrid_rrf_search,
    tfidf_near_pairs,
    topic_clusters,
)

#: normalization fragments shared with the oracle — single source of
#: truth in textops (pinned Unicode-whitespace class, identical to the
#: Spark side's Java regex)
from sqltask_spark.queries.textops import _NORM, _TOKS, _norm_sql  # noqa: E402

#: The benchmark query set — fixed literals over the corpus
#: vocabulary so both engines embed the identical constant relation.
_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join merge"),
    (2, "stream window agg"),
    (3, "the fast sort"),
    (4, "vector data spark"),
    (5, "slow query filter scan"),
]

_BM25_K = 10


def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(
        docs, _query_frame(spark, _BM25_QUERIES), k=_BM25_K
    ).orderBy("query_id", "rank")


def _values_clause() -> str:
    return ", ".join(
        f"({qid}, '{text}')" for qid, text in _BM25_QUERIES
    )


_BM25_SQL = f"""
WITH qs(query_id, query_text) AS (VALUES {_values_clause()}),
qterms AS (
  SELECT query_id, term FROM (
    SELECT query_id,
           UNNEST(list_distinct(string_split(
             {_norm_sql('query_text')},
             ' '))) AS term
    FROM qs
  ) WHERE term <> ''
),
toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents),
stats AS (SELECT COUNT(*) AS n_docs, SUM(LEN(t)) AS sum_dl FROM toks),
base AS (SELECT doc_id, LEN(t) AS dl, UNNEST(t) AS term FROM toks),
postings AS (
  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM base
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
dfc AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.term, p.doc_id,
    CAST(ROUND(
      LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      * ((tf * (1.2 + 1.0))
         / (tf + 1.2 * (1.0 - 0.75
                        + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
      * 1000000.0) AS BIGINT) AS contrib_micro
  FROM postings p JOIN dfc USING (term), stats
),
agg AS (
  SELECT query_id, doc_id,
         SUM(contrib_micro) AS score_micro,
         COUNT(*) AS n_matched
  FROM scored JOIN qterms USING (term)
  GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank,
         doc_id, n_matched, score_micro
  FROM agg
)
SELECT query_id, rank, doc_id, n_matched,
       ROUND(score_micro / 1000000.0, 6) AS score
FROM ranked WHERE rank <= {_BM25_K}
ORDER BY query_id, rank
"""


_TFIDF_BUCKETS = 1024


def doc_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return hashed_tfidf(docs, n_buckets=_TFIDF_BUCKETS).orderBy(
        "doc_id", "bucket"
    )


def _nibble_sql(pos: int) -> str:
    return f"(strpos('0123456789abcdef', substring(md5(term), {pos}, 1)) - 1)"


_BUCKET_SQL = (
    f"(((({_nibble_sql(1)} * 16 + {_nibble_sql(2)}) * 16 "
    f"+ {_nibble_sql(3)}) * 16 + {_nibble_sql(4)}) % {_TFIDF_BUCKETS})"
)

_TFIDF_SQL = f"""
WITH base AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM base GROUP BY doc_id, term
),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(*) AS n_docs FROM documents),
weighted AS (
  SELECT doc_id, {_BUCKET_SQL} AS bucket,
    CAST(ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000000.0)
         AS BIGINT) AS w_micro
  FROM tf JOIN dfc USING (term), stats
)
SELECT doc_id, bucket, COUNT(*) AS n_terms,
       ROUND(SUM(w_micro) / 1000000.0, 6) AS weight
FROM weighted
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


def topic_cluster_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return topic_clusters(docs, n_clusters=8)


# --------------------------------------------------------------------------
# dedup_tfidf_cosine — TF-IDF-weighted cosine near-dup pairs: the
# weighted complement of the Jaccard family (rare shared shingles
# count more; multiplicity matters). Fixed-point integer sums +
# md5-derived shingle keys keep the entry oracle-hashed; the hot-
# shingle df cap is default-ON (the production 100 TB shape) and
# mirrored in the SQL.
# --------------------------------------------------------------------------

_COSINE_THRESHOLD = 0.6
_COSINE_MAX_DF = 50

#: shingle MULTISET (no list_distinct — multiplicity carries tf)
_SHINGLES_MULTI = f"""
CASE WHEN LEN({_TOKS}) >= 3
     THEN list_transform(
            generate_series(1, LEN({_TOKS}) - 2),
            i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2]))
     ELSE [{_NORM}] END
"""


def dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_near_pairs(
        docs,
        shingle_n=3,
        threshold=_COSINE_THRESHOLD,
        max_shingle_df=_COSINE_MAX_DF,
    ).orderBy("id_a", "id_b")


_TFIDF_COSINE_SQL = f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id AS id, {_SHINGLES_MULTI} AS shingles FROM documents
),
inv0 AS MATERIALIZED (
  SELECT id, ('0x' || substring(md5(s), 1, 15))::BIGINT AS sh
  FROM (SELECT id, UNNEST(shingles) AS s FROM sh)
),
tf AS MATERIALIZED (
  SELECT id, sh, COUNT(*) AS tf FROM inv0 GROUP BY id, sh
),
dfc AS (
  SELECT sh, COUNT(*) AS df FROM tf
  GROUP BY sh HAVING COUNT(*) <= {_COSINE_MAX_DF}
),
stats AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS MATERIALIZED (
  SELECT id, sh,
    CAST(ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0) * 100.0)
         AS BIGINT) AS w
  FROM tf JOIN dfc USING (sh), stats
),
norms AS MATERIALIZED (SELECT id, SUM(w * w) AS n2 FROM w GROUP BY id),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, SUM(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT id_a, id_b,
         dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos_raw
  FROM pairs
  JOIN norms na ON na.id = id_a
  JOIN norms nb ON nb.id = id_b
)
SELECT id_a, id_b, ROUND(cos_raw, 6) AS cosine
FROM scored
WHERE cos_raw >= {_COSINE_THRESHOLD}
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# search_hybrid_rrf — BM25 ∪ hashed-TF-IDF-cosine fused by Reciprocal
# Rank Fusion. Both legs and the fusion are fixed-point, so the full
# hybrid ranking is oracle-hashed.
# --------------------------------------------------------------------------

_RRF_K = 60
_LEG_K = 20
_HYBRID_K = 10


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return hybrid_rrf_search(
        docs,
        _query_frame(spark, _BM25_QUERIES),
        k=_HYBRID_K,
        leg_k=_LEG_K,
        rrf_k=_RRF_K,
        n_buckets=_TFIDF_BUCKETS,
    ).orderBy("query_id", "rank")


_HYBRID_SQL = f"""
WITH qs(query_id, query_text) AS (VALUES {_values_clause()}),
qterms AS (
  SELECT query_id, term FROM (
    SELECT query_id,
           UNNEST(list_distinct(string_split(
             {_norm_sql('query_text')},
             ' '))) AS term
    FROM qs
  ) WHERE term <> ''
),
toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents),
stats AS (SELECT COUNT(*) AS n_docs, SUM(LEN(t)) AS sum_dl FROM toks),
base AS MATERIALIZED (
  SELECT doc_id, LEN(t) AS dl, UNNEST(t) AS term FROM toks
),
-- ======================= BM25 leg =======================
bm_postings AS (
  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM base
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
bm_dfc AS (SELECT term, COUNT(*) AS df FROM bm_postings GROUP BY term),
bm_scored AS (
  SELECT p.term, p.doc_id,
    CAST(ROUND(
      LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      * ((tf * (1.2 + 1.0))
         / (tf + 1.2 * (1.0 - 0.75
                        + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
      * 1000000.0) AS BIGINT) AS contrib_micro
  FROM bm_postings p JOIN bm_dfc USING (term), stats
),
bm_agg AS (
  SELECT query_id, doc_id, SUM(contrib_micro) AS score_micro
  FROM bm_scored JOIN qterms USING (term)
  GROUP BY query_id, doc_id
),
bm_ranked AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score_micro DESC, doc_id) AS INTEGER) AS bm25_rank
  FROM bm_agg
),
bm_leg AS (
  SELECT query_id, doc_id, bm25_rank FROM bm_ranked
  WHERE bm25_rank <= {_LEG_K}
),
-- =================== dense (TF-IDF cosine) leg ===================
d_tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM base GROUP BY doc_id, term
),
d_dfc AS MATERIALIZED (
  SELECT term, COUNT(*) AS df FROM d_tf GROUP BY term
),
w_d AS MATERIALIZED (
  SELECT doc_id, {_BUCKET_SQL} AS bucket,
         SUM(CAST(ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0)
                        * 100.0) AS BIGINT)) AS w
  FROM d_tf JOIN d_dfc USING (term), stats
  GROUP BY doc_id, {_BUCKET_SQL}
),
q_tf AS (
  SELECT query_id, term, COUNT(*) AS tf FROM (
    SELECT query_id,
           UNNEST(string_split(
             {_norm_sql('query_text')},
             ' ')) AS term
    FROM qs
  ) WHERE term <> '' GROUP BY query_id, term
),
w_q AS MATERIALIZED (
  SELECT query_id, {_BUCKET_SQL} AS bucket,
         SUM(CAST(ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0)
                        * 100.0) AS BIGINT)) AS w
  FROM q_tf JOIN d_dfc USING (term), stats
  GROUP BY query_id, {_BUCKET_SQL}
),
n2_d AS (SELECT doc_id, SUM(w * w) AS n2_d FROM w_d GROUP BY doc_id),
n2_q AS (SELECT query_id, SUM(w * w) AS n2_q FROM w_q GROUP BY query_id),
dots AS (
  SELECT q.query_id, d.doc_id, SUM(q.w * d.w) AS dot
  FROM w_q q JOIN w_d d USING (bucket)
  GROUP BY q.query_id, d.doc_id
),
dense_ranked AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY ROUND(dot / (sqrt(n2_q) * sqrt(n2_d)), 9) DESC,
                    doc_id) AS INTEGER) AS dense_rank
  FROM dots JOIN n2_q USING (query_id) JOIN n2_d USING (doc_id)
),
dense_leg AS (
  SELECT query_id, doc_id, dense_rank FROM dense_ranked
  WHERE dense_rank <= {_LEG_K}
),
-- ======================= RRF fusion =======================
fused AS (
  SELECT query_id, doc_id, bm25_rank, dense_rank,
         COALESCE(CAST(ROUND(1000000.0 / ({_RRF_K} + bm25_rank))
                       AS BIGINT), 0)
         + COALESCE(CAST(ROUND(1000000.0 / ({_RRF_K} + dense_rank))
                         AS BIGINT), 0) AS rrf_micro
  FROM bm_leg FULL OUTER JOIN dense_leg USING (query_id, doc_id)
),
out_ranked AS (
  SELECT query_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY rrf_micro DESC, doc_id) AS INTEGER) AS rank,
         doc_id, bm25_rank, dense_rank,
         ROUND(rrf_micro / 1000000.0, 6) AS score
  FROM fused
)
SELECT query_id, rank, doc_id, bm25_rank, dense_rank, score
FROM out_ranked WHERE rank <= {_HYBRID_K}
ORDER BY query_id, rank
"""


QUERIES = {
    "search_bm25": search_bm25,
    "search_hybrid_rrf": search_hybrid_rrf,
    "doc_tfidf_vectors": doc_tfidf_vectors,
    "dedup_tfidf_cosine": dedup_tfidf_cosine,
    "topic_cluster_documents": topic_cluster_documents,
}

ORACLES = {
    "search_bm25": _BM25_SQL,
    "search_hybrid_rrf": _HYBRID_SQL,
    "doc_tfidf_vectors": _TFIDF_SQL,
    "dedup_tfidf_cosine": _TFIDF_COSINE_SQL,
    # topic_cluster_documents: intentionally no oracle — k-means
    # float geometry is engine-specific; pytest covers semantics.
}
