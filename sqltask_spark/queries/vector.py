"""Embedding similarity-search queries over the ``embeddings`` table.

Brute-force cosine top-k carries a DuckDB oracle (both engines fold
the same doubles in element order; scores rounded before ranking with
an id tie-break → fully deterministic). The production LSH variants
use seeded Gaussian hyperplanes via a BLAS Arrow UDF (rows-only;
recall measured in pytest against brute force); the
``dedup_embedding_pairs_lsh_fixed`` twin swaps in seeded Achlioptas
±1 planes with exact fixed-point sign bits, which DuckDB reproduces —
hash-checking the bucket→cap→verify pipeline end to end.
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


def ann_topk_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8: IVF probing over byte-quantized corpus codes — the
    8×-smaller storage layout of a production vector index. Rows-only
    (quantization perturbs scores); recall-vs-brute pytest-asserted."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= N_QUERY_VECS)
    return cosine_topk_ivf(
        queries, emb, "vec_id", "vec_id", k=TOP_K,
        n_cells=32, n_probe=8, quantize_bits=8,
    ).orderBy("query_id", "rank")


def ann_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-rank: the corpus side of the candidate
    path carries 16 PQ code bytes per vector (vs 64 for SQ8, 512
    raw); ADC-scored candidates refine through an exact-cosine top-k.
    Rows-only (sampled codebooks are engine-specific);
    recall-vs-brute pytest-asserted."""
    from sqltask_spark.operators.similarity import cosine_topk_ivf_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= N_QUERY_VECS)
    return cosine_topk_ivf_pq(
        queries, emb, "vec_id", "vec_id", k=TOP_K,
        n_cells=32, n_probe=8, m=16, pq_k=16,
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


# --------------------------------------------------------------------------
# dedup_embedding_pairs_lsh_fixed — ORACLED twin of the LSH pairs
# entry: seeded Achlioptas ±1 planes + exact BIGINT fixed-point sign
# bits make every bucket reproducible in DuckDB, so the whole
# bucket-join → cap → exact-cosine-verify pipeline hash-checks. The
# Gaussian/Arrow-UDF entry stays the production path.
# --------------------------------------------------------------------------

_LSH_FIXED_SEED = 101
_LSH_FIXED_PLANES = 4
_LSH_FIXED_TABLES = 16
_LSH_FIXED_CAP = 1000


def dedup_embedding_pairs_lsh_fixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sqltask_spark.operators.similarity import (
        cosine_near_pairs_lsh_fixed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs_lsh_fixed(
        emb,
        "vec_id",
        "embedding",
        threshold=_EMB_DUP_THRESHOLD,
        n_planes=_LSH_FIXED_PLANES,
        tables=_LSH_FIXED_TABLES,
        seed=_LSH_FIXED_SEED,
        max_bucket_size=_LSH_FIXED_CAP,
        expected_dim=EMBED_DIM,
    ).orderBy("id_a", "id_b")


def _lsh_fixed_sql() -> str:
    from sqltask_spark.operators.similarity import (
        sparse_projection_matrix,
    )

    n_sig = _LSH_FIXED_TABLES * _LSH_FIXED_PLANES
    triples = sparse_projection_matrix(
        EMBED_DIM, n_sig, _LSH_FIXED_SEED
    )
    values = ", ".join(f"({i}, {j}, {s})" for i, j, s in triples)
    return f"""
WITH mat(i, j, s) AS (VALUES {values}),
e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
base AS (
  SELECT vec_id AS id,
         UNNEST(generate_series(0, LEN(embedding) - 1)) AS i,
         UNNEST(embedding) AS x
  FROM embeddings
),
q AS (
  SELECT id, i,
         CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM base
),
dots AS (
  SELECT id, j, SUM(q * s) AS dot FROM q JOIN mat USING (i)
  GROUP BY id, j
),
buckets AS (
  SELECT id, j // {_LSH_FIXED_PLANES} AS t,
         SUM(CASE WHEN dot >= 0
                  THEN (1 << (j % {_LSH_FIXED_PLANES})) ELSE 0 END)
           AS bucket
  FROM dots GROUP BY id, j // {_LSH_FIXED_PLANES}
),
ok AS (
  SELECT t, bucket FROM buckets GROUP BY t, bucket
  HAVING COUNT(*) <= {_LSH_FIXED_CAP}
),
capped AS (SELECT b.id, b.t, b.bucket FROM buckets b JOIN ok USING (t, bucket)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM capped a
  JOIN capped b ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id
),
scored AS (
  SELECT id_a, id_b,
         ROUND(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
  FROM cand
  JOIN e ea ON ea.id = cand.id_a
  JOIN e eb ON eb.id = cand.id_b
)
SELECT id_a, id_b, cosine
FROM scored
WHERE cosine >= {_EMB_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


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


# --------------------------------------------------------------------------
# embedding_quantize_int8 — per-vector absmax int8 quantization with
# reconstruction error. Pure projection (no shuffle, no global stats);
# oracle reproduces the identical arithmetic. The quantized vector is
# checked through an md5 digest of its comma-joined values (the
# driver's pandas canonicalizer can't sort list cells, so the result
# row carries scalars only — the digest is just as strong a check).
# --------------------------------------------------------------------------

def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.similarity import quantize_symmetric

    emb = load_table(spark, sf_dir, "embeddings")
    q_str = F.transform("qvec", lambda x: x.cast("string"))
    return quantize_symmetric(emb, "vec_id").select(
        F.col("id").alias("vec_id"),
        F.round("scale", 9).alias("scale"),
        F.md5(F.concat_ws(",", q_str)).alias("qvec_md5"),
        F.aggregate(
            F.transform("qvec", lambda x: F.abs(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("q_l1"),
        F.round("recon_err", 6).alias("recon_err"),
    ).orderBy("vec_id")


_QUANT_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
           AS scale
  FROM v
), q AS (
  SELECT vec_id, v, scale,
         CASE WHEN scale <> 0
              THEN list_transform(v, x -> CAST(round(x / scale, 0) AS INT))
              ELSE list_transform(v, x -> 0) END AS qvec
  FROM s
)
SELECT
  vec_id,
  ROUND(scale, 9) AS scale,
  md5(array_to_string(qvec, ',')) AS qvec_md5,
  CAST(list_aggregate(list_transform(qvec, x -> abs(CAST(x AS BIGINT))),
                      'sum') AS BIGINT) AS q_l1,
  ROUND(sqrt(list_aggregate(
    list_transform(list_zip(v, qvec),
                   z -> power(z[1] - CAST(z[2] AS DOUBLE) * scale, 2)),
    'sum')), 6) AS recon_err
FROM q
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# semdedup_keep — semantic dedup survivors: cluster embeddings into
# k-means cells, prune within-cell near-dups, keep lowest id (the
# SemDeDup recipe — see operators.similarity.semdedup_prune). No
# oracle: the cell assignment rides engine-specific float k-means;
# semantics are pytest-verified on planted duplicates instead
# (tests/test_operators.py::test_semdedup_prune_planted_dups).
# --------------------------------------------------------------------------

def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.similarity import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    # n_cells deliberately left on auto: it scales with the corpus so
    # cell occupancy (and the per-cell quadratic) stays constant
    return semdedup_prune(
        emb,
        "vec_id",
        "embedding",
        threshold=_EMB_DUP_THRESHOLD,
    )


# --------------------------------------------------------------------------
# label_centroids — per-label element-wise mean embedding (class
# centroids: the building block of nearest-centroid classification,
# cluster summaries, and drift monitoring). The numeric trap: a
# cross-ROW float sum is order-dependent (IEEE addition is not
# associative), so a naive avg() would hash differently per shuffle
# order AND per engine — which is why every other vector op here
# folds within a row only. Solution: fixed-point accumulation —
# each element is floor-quantized to 2^-20 units (floor, not round:
# no tie-breaking rule to disagree on), summed exactly as BIGINTs
# (order-free), and divided once at the end. Max quantization error
# 2^-20 per element, and the result is bit-identical on any engine
# with IEEE doubles — hence the oracle. One posexplode + one
# map-side-combined agg; output is (labels × dim) rows, never an
# array cell (array cells defeat the driver's row canonicalizer).
# --------------------------------------------------------------------------

_FP_SCALE = 1 << 20


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label",
        F.posexplode(as_double_array(F.col("embedding"))).alias(
            "pos", "x"
        ),
    ).withColumn(
        "el", F.floor(F.col("x") * F.lit(float(_FP_SCALE))).cast("bigint")
    )
    return (
        pos.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("el").alias("sx"),
        )
        .select(
            "label",
            "pos",
            "n_vectors",
            F.round(
                F.col("sx")
                / (F.col("n_vectors") * F.lit(float(_FP_SCALE))),
                9,
            ).alias("centroid_val"),
        )
        .orderBy("label", "pos")
    )


_CENTROIDS_SQL = f"""
WITH pos AS (
  -- DuckDB lacks WITH ORDINALITY; index the list explicitly
  SELECT
    label,
    i - 1 AS pos,
    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {_FP_SCALE}.0) AS BIGINT)
      AS el
  FROM embeddings,
       UNNEST(generate_series(1, LEN(embedding))) AS t(i)
)
SELECT
  label, pos,
  CAST(COUNT(*) AS BIGINT) AS n_vectors,
  ROUND(CAST(SUM(el) AS DOUBLE) / (COUNT(*) * {_FP_SCALE}.0), 9)
    AS centroid_val
FROM pos
GROUP BY label, pos
ORDER BY label, pos
"""


# --------------------------------------------------------------------------
# knn_graph — exact k-NN graph over the whole corpus (every vector's
# top-k neighbors), the substrate of graph-based curation. Blocked
# triangle join scores each pair once; both directions + per-source
# window. O(n²) compute is inherent to the exact graph — the IVF
# variants are the approximate scale path, and this entry is the
# baseline they are measured against. Fully deterministic (rounded
# scores, dst tie-break) → oracle-hashed.
# --------------------------------------------------------------------------

_KNN_K = 3


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.similarity import knn_graph as knn

    emb = load_table(spark, sf_dir, "embeddings")
    return knn(emb, "vec_id", "embedding", k=_KNN_K).orderBy(
        "src_id", "rank"
    )


_KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pairs AS (
  SELECT
    a.vec_id AS src_id,
    b.vec_id AS dst_id,
    ROUND(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))), 6) AS score
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT src_id, CAST(rank AS INT) AS rank, dst_id, score
FROM (
  SELECT src_id, dst_id, score,
         ROW_NUMBER() OVER (PARTITION BY src_id
                            ORDER BY score DESC, dst_id ASC) AS rank
  FROM pairs
  WHERE score IS NOT NULL
)
WHERE rank <= {_KNN_K}
ORDER BY src_id, rank
"""


# --------------------------------------------------------------------------
# embedding_outliers — connectivity-based outlier screen: a vector
# whose NEAREST neighbor is below a cosine floor sits isolated in
# embedding space (mis-embedded, off-distribution, or junk input) —
# the curation signal that removes disconnected points before
# clustering/mix decisions. Exactly the k=1 slice of the kNN graph,
# so it shares the blocked triangle join (one equi-join, O(n·B)
# shuffle); at corpora where exact O(n²) compute is off the table the
# same screen runs over IVF-cell candidates instead. Deterministic →
# oracle-hashed.
# --------------------------------------------------------------------------

_OUTLIER_COS = 0.32


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sqltask_spark.operators.similarity import knn_graph as knn

    emb = load_table(spark, sf_dir, "embeddings")
    nn = knn(emb, "vec_id", "embedding", k=1)
    return nn.select(
        F.col("src_id").alias("vec_id"),
        F.col("dst_id").alias("nn_id"),
        F.col("score").alias("nn_cosine"),
        (F.col("score") < _OUTLIER_COS).alias("is_outlier"),
    ).orderBy("vec_id")


_OUTLIERS_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pairs AS (
  SELECT
    a.vec_id AS vec_id,
    b.vec_id AS nn_id,
    ROUND(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))), 6) AS nn_cosine
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT vec_id, nn_id, nn_cosine, nn_cosine < {_OUTLIER_COS} AS is_outlier
FROM (
  SELECT vec_id, nn_id, nn_cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY nn_cosine DESC, nn_id ASC) AS rank
  FROM pairs
  WHERE nn_cosine IS NOT NULL
)
WHERE rank = 1
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# embedding_random_projection — JL sparse random projection 64→16
# dims in exact fixed-point; the pre-ANN compression step. The ±1
# Achlioptas matrix is seeded, so both engines embed the identical
# constant relation and the BIGINT projection sums hash-match.
# --------------------------------------------------------------------------

_RP_OUT_DIM = 16
_RP_SEED = 7


def embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sqltask_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    # expected_dim: the oracle's projection matrix is frozen at
    # EMBED_DIM when _rp_sql() renders — a different data width must
    # error here, not silently hash-mismatch
    return random_projection(
        emb,
        "vec_id",
        out_dim=_RP_OUT_DIM,
        seed=_RP_SEED,
        expected_dim=EMBED_DIM,
    ).orderBy("id", "j")


def _rp_sql() -> str:
    import math

    from sqltask_spark.operators.similarity import (
        sparse_projection_matrix,
    )

    triples = sparse_projection_matrix(EMBED_DIM, _RP_OUT_DIM, _RP_SEED)
    values = ", ".join(f"({i}, {j}, {s})" for i, j, s in triples)
    scale = repr(math.sqrt(3.0 / _RP_OUT_DIM))
    return f"""
WITH mat(i, j, s) AS (VALUES {values}),
base AS (
  SELECT vec_id AS id,
         UNNEST(generate_series(0, LEN(embedding) - 1)) AS i,
         UNNEST(embedding) AS v
  FROM embeddings
),
q AS (
  SELECT id, i,
         CAST(ROUND(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
  FROM base
)
SELECT id, j, ROUND(SUM(vq * s) * {scale} / 1000000.0, 6) AS value
FROM q JOIN mat USING (i)
GROUP BY id, j
ORDER BY id, j
"""


# --------------------------------------------------------------------------
# embedding_drift_by_label — the embedding-space DRIFT MONITOR: per
# label, cosine between the centroid of snapshot A (even vec_id) and
# snapshot B (odd vec_id). The ML-ops companion to
# ivf_occupancy_stats: occupancy says the INDEX cells are skewing,
# this says the DISTRIBUTION itself moved (an upstream encoder or
# corpus change shows up as cos < 1 before recall degrades).
#
# Determinism: per-dimension centroid SUMS in milli fixed point
# (exact BIGINT — cosine of sums ≡ cosine of means, the scale
# cancels); the three quadratic forms (dot, |a|², |b|²) stay exact
# BIGINT (overflow horizon ~8M vectors per label-half at dim 64);
# the final cosine is double ROUND(dot/sqrt(na2·nb2), 6) — every
# input is an exact integer and /, sqrt are IEEE-exactly-rounded in
# both engines, so the doubles are bit-identical. The exact integers
# ride in the output so a consumer can recompute at any precision.
# --------------------------------------------------------------------------

_DRIFT_SCALE = 1000


def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label",
        F.pmod("vec_id", F.lit(2)).alias("half"),
        F.posexplode(as_double_array(F.col("embedding"))).alias(
            "pos", "x"
        ),
    ).withColumn(
        "el",
        F.floor(F.col("x") * F.lit(float(_DRIFT_SCALE))).cast("bigint"),
    )
    sums = pos.groupBy("label", "half", "pos").agg(
        F.sum("el").alias("s")
    )
    a = sums.filter(F.col("half") == 0).select(
        "label", "pos", F.col("s").alias("sa")
    )
    b = sums.filter(F.col("half") == 1).select(
        "label", "pos", F.col("s").alias("sb")
    )
    quad = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("dot_m"),
            F.sum(F.col("sa") * F.col("sa")).alias("na2_m"),
            F.sum(F.col("sb") * F.col("sb")).alias("nb2_m"),
        )
    )
    counts = (
        emb.groupBy("label")
        .agg(
            F.sum((F.pmod("vec_id", F.lit(2)) == 0).cast("long")).alias(
                "n_a"
            ),
            F.sum((F.pmod("vec_id", F.lit(2)) == 1).cast("long")).alias(
                "n_b"
            ),
        )
    )
    return (
        quad.join(counts, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            "dot_m",
            "na2_m",
            "nb2_m",
            F.when(
                (F.col("na2_m") > 0) & (F.col("nb2_m") > 0),
                F.round(
                    F.col("dot_m")
                    / F.sqrt(
                        F.col("na2_m").cast("double")
                        * F.col("nb2_m").cast("double")
                    ),
                    6,
                ),
            ).alias("centroid_cos"),
        )
        .orderBy("label")
    )


_DRIFT_SQL = f"""
WITH pos AS (
  SELECT label, vec_id % 2 AS half, i - 1 AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {_DRIFT_SCALE}.0)
              AS BIGINT) AS el
  FROM embeddings,
       UNNEST(generate_series(1, LEN(embedding))) AS t(i)
), sums AS (
  SELECT label, half, pos, SUM(el)::BIGINT AS s
  FROM pos GROUP BY 1, 2, 3
), quad AS (
  SELECT a.label,
         SUM(a.s * b.s)::BIGINT AS dot_m,
         SUM(a.s * a.s)::BIGINT AS na2_m,
         SUM(b.s * b.s)::BIGINT AS nb2_m
  FROM (SELECT label, pos, s FROM sums WHERE half = 0) a
  JOIN (SELECT label, pos, s FROM sums WHERE half = 1) b
    USING (label, pos)
  GROUP BY 1
), counts AS (
  SELECT label,
         SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM embeddings GROUP BY 1
)
SELECT q.label, c.n_a, c.n_b, q.dot_m, q.na2_m, q.nb2_m,
       CASE WHEN q.na2_m > 0 AND q.nb2_m > 0
            THEN ROUND(q.dot_m / sqrt(CAST(q.na2_m AS DOUBLE)
                                      * CAST(q.nb2_m AS DOUBLE)), 6)
       END AS centroid_cos
FROM quad q JOIN counts c USING (label)
ORDER BY label
"""


QUERIES = {
    "ann_topk_brute": ann_topk_brute,
    "embedding_random_projection": embedding_random_projection,
    "vector_norms": vector_norms,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "ann_topk_ivf_sq8": ann_topk_ivf_sq8,
    "ann_topk_ivf_pq": ann_topk_ivf_pq,
    "dedup_embedding_pairs": dedup_embedding_pairs,
    "dedup_embedding_pairs_lsh": dedup_embedding_pairs_lsh,
    "dedup_embedding_pairs_lsh_fixed": dedup_embedding_pairs_lsh_fixed,
    "embedding_quantize_int8": embedding_quantize_int8,
    "semdedup_keep": semdedup_keep,
    "label_centroids": label_centroids,
    "knn_graph": knn_graph,
    "embedding_outliers": embedding_outliers,
    "embedding_drift_by_label": embedding_drift_by_label,
}

ORACLES = {
    "ann_topk_brute": _ANN_BRUTE_SQL,
    "embedding_random_projection": _rp_sql(),
    "vector_norms": _NORMS_SQL,
    "dedup_embedding_pairs": _EMB_PAIRS_SQL,
    "dedup_embedding_pairs_lsh_fixed": _lsh_fixed_sql(),
    "embedding_quantize_int8": _QUANT_SQL,
    "embedding_outliers": _OUTLIERS_SQL,
    "label_centroids": _CENTROIDS_SQL,
    "knn_graph": _KNN_SQL,
    "embedding_drift_by_label": _DRIFT_SQL,
    # ann_topk_lsh: no oracle (seeded hyperplanes, approximate).
}
