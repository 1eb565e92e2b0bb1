"""Fixed-point k-means certificates over the ``embeddings`` table.

The production k-means family (IVF ANN, SemDeDup, topic cells) trains
float centroids on a driver-side sample — the right 100 TB shape but
engine-specific math, so those entries are rows-only. These entries
re-run the SAME algorithm shapes on the exact BIGINT Lloyd recurrence
(dense and sparse) of :mod:`sqltask_spark.operators.kmeans_fixed`, which
DuckDB replays as plain SQL — converting the whole family into
driver-hash-checked certificates (the ``bpe_learn_certified``
pattern applied to clustering):

- ``kmeans_certified`` — the TRAINING loop: 3 Lloyd rounds (init →
  assign → integer-mean update, empty cells keep their centroid),
  outputting per-cluster membership, inertia, and a centroid digest.
- ``ann_topk_ivf_fixed`` — the IVF SEARCH path: assign the corpus to
  the trained cells, probe the ``N_PROBE`` nearest cells per query,
  exact cosine top-k within the probed cells only.
- ``semdedup_fixed`` — the SemDeDup prune: within-cell pairwise
  cosine ≥ threshold drops the higher id (keep-lowest-id, the
  engine-wide survivor convention).
- ``topic_cluster_certified`` — the TOPIC-MAP shape: hashed
  term-count vectors (sparse long format, 60-bit md5 buckets) →
  sparse fixed-point k-means → per-cluster doc/token counts + top
  terms, all in exact integers.
- ``ivf_occupancy_stats`` — the DRIFT MONITOR: per-cell occupancy
  rollup (max/min/mean/p99 + overflow-safe concentration ratio),
  the rebuild signal the frozen-quantizer append contract
  (:func:`sqltask_spark.operators.ann_index.append_to_ivf_index`)
  prescribes.

The production entries (``ann_topk_ivf``, ``semdedup_keep``,
``topic_cluster_documents``) remain the performance path; recall and
planted-duplicate semantics stay pytest-verified there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sqltask_spark.data import load_table
from sqltask_spark.operators import text as tx
from sqltask_spark.operators.dedup import _md5_long_of
from sqltask_spark.operators.kmeans_fixed import (
    FP_SCALE,
    kmeans_fixed,
    kmeans_fixed_sparse,
    to_fixed_long,
)
from sqltask_spark.operators.similarity import as_double_array, cosine

K_CELLS = 8
ITERS = 3
N_PROBE = 3  # 3 of 8 cells: ≥0.5 measured recall on the synthetic
# corpus (its embeddings are near-random, the hardest case for cell
# locality; real corpora cluster far better — see the production
# entry's recall tests)
TOP_K = 10
N_QUERY_VECS = 5
SEM_THRESHOLD = 0.4  # _EMB_DUP_THRESHOLD — same planted-dup regime


# --------------------------------------------------------------------------
# Spark entries
# --------------------------------------------------------------------------

def kmeans_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster summary of the fixed-point Lloyd run: membership,
    inertia, centroid L1 mass + digest. Scalar columns only (array
    cells defeat the driver's row canonicalizer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fixed(
        emb, "vec_id", "embedding", k=K_CELLS, iters=ITERS
    )
    c_str = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "c"))),
        lambda s: s["c"].cast("string"),
    )
    cstats = cents.groupBy("cid").agg(
        F.sum(F.abs("c")).alias("centroid_l1"),
        F.md5(F.array_join(c_str, ",")).alias("centroid_md5"),
    )
    astats = assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist").alias("inertia"),
    )
    return (
        cstats.join(astats, "cid", "left")
        .select(
            "cid",
            F.coalesce("n_members", F.lit(0).cast("long")).alias(
                "n_members"
            ),
            F.coalesce("inertia", F.lit(0).cast("long")).alias("inertia"),
            "centroid_l1",
            "centroid_md5",
        )
        .orderBy("cid")
    )


def ann_topk_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search certificate: probe the ``N_PROBE`` nearest trained
    cells per query, exact cosine top-k within probed cells only —
    the exact candidate set is part of the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fixed(
        emb, "vec_id", "embedding", k=K_CELLS, iters=ITERS
    )
    qpts = to_fixed_long(
        emb.filter(F.col("vec_id") <= N_QUERY_VECS), "vec_id", "embedding"
    )
    d = F.col("el") - F.col("c")
    qdist = (
        qpts.join(F.broadcast(cents), "pos")
        .groupBy("id", "cid")
        .agg(F.sum(d * d).alias("dist"))
    )
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy("dist", "cid")
    )
    probe = (
        qdist.withColumn("_rn", rn)
        .filter(F.col("_rn") <= N_PROBE)
        .select(F.col("id").alias("query_id"), "cid")
    )
    cand = (
        probe.join(assign.select(F.col("id").alias("neighbor_id"), "cid"),
                   "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    vecs = emb.select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    scored = (
        cand.join(
            vecs.select(
                F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
            ),
            "query_id",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def semdedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup certificate: within each trained cell, a pair with
    cosine ≥ threshold drops the higher id; survivors keep
    (vec_id, cell). The production ``semdedup_keep`` stays the
    sample-trained float path."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign, _ = kmeans_fixed(
        emb, "vec_id", "embedding", k=K_CELLS, iters=ITERS
    )
    cells = assign.select(F.col("id").alias("vec_id"), "cid")
    vecs = emb.select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    ).join(cells, "vec_id")
    a = vecs.select(
        "cid", F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = vecs.select(
        "cid", F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("va"), F.col("vb")), 6) >= SEM_THRESHOLD
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        cells.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("cid").alias("cell"))
        .orderBy("vec_id")
    )


def ivf_occupancy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF drift-monitor certificate: per-cell occupancy summary
    of the trained quantizer's assignment — the signal the frozen-
    quantizer append contract operates on (rebuild when concentration
    trends away from its build-time value).

    Same summary shape as the PRODUCTION operator over a committed
    on-disk index (:func:`sqltask_spark.operators.ann_index.
    ivf_occupancy_stats`, whose planted-drift behavior is
    pytest-pinned in test_index_lifecycle); this entry computes it
    over the certified fixed-point Lloyd assignment so DuckDB replays
    every integer. ``concentration_micro`` = max·1e6 div
    truncated-mean (the ``event_key_skew_profile`` overflow-safe
    discipline — bounded by max·1e6; the truncated mean ≥ 1 always,
    every counted cell holds ≥ 1 vector). ``p99_occupancy`` is the
    exact type-7 percentile, bit-identical across engines on the
    integer census. Scale shape: one map-side-combined groupBy(cid)
    census (cell-count-sized shuffle), then a 1-row rollup.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    assign, _ = kmeans_fixed(
        emb, "vec_id", "embedding", k=K_CELLS, iters=ITERS
    )
    census = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("c"))
    return census.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells_used"),
        F.sum("c").cast("long").alias("n_vectors"),
        F.max("c").cast("long").alias("max_occupancy"),
        F.min("c").cast("long").alias("min_occupancy"),
        F.expr("percentile(c, 0.99D)").alias("p99_occupancy"),
    ).select(
        "n_cells_used",
        "n_vectors",
        "max_occupancy",
        "min_occupancy",
        (F.col("n_vectors") / F.col("n_cells_used")).alias(
            "mean_occupancy"
        ),
        "p99_occupancy",
        F.expr(
            "(max_occupancy * 1000000)"
            " div (n_vectors div n_cells_used)"
        )
        .cast("long")
        .alias("concentration_micro"),
    )


def _ivf_occupancy_sql() -> str:
    return f"""
WITH {_kmeans_ctes()},
census AS (SELECT cid, COUNT(*) AS c FROM fasg GROUP BY cid),
roll AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_used,
         CAST(SUM(c) AS BIGINT) AS n_vectors,
         CAST(MAX(c) AS BIGINT) AS max_occupancy,
         CAST(MIN(c) AS BIGINT) AS min_occupancy,
         quantile_cont(c, 0.99) AS p99_occupancy
  FROM census)
SELECT n_cells_used, n_vectors, max_occupancy, min_occupancy,
       n_vectors / CAST(n_cells_used AS DOUBLE) AS mean_occupancy,
       p99_occupancy,
       CAST((max_occupancy * 1000000)
            // (n_vectors // n_cells_used) AS BIGINT)
         AS concentration_micro
FROM roll
"""


N_TOPIC_BUCKETS = 32
K_TOPICS = 8
TOPIC_ITERS = 3
TOP_TERMS = 3


def topic_cluster_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-map certificate: 32-bucket hashed term-count vectors →
    sparse fixed-point k-means → (cluster_id, n_docs, n_tokens,
    top_terms). Documents with zero tokens have no vector and are
    excluded by construction (identically on both engines). The
    production ``topic_cluster_documents`` stays the TF-IDF +
    spherical-float path."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(tx.tokenize(F.col("text"))).alias("term"),
    ).filter(F.col("term") != "")
    pts = (
        toks.select(
            "id",
            (_md5_long_of(F.col("term")) % N_TOPIC_BUCKETS)
            .cast("int")
            .alias("pos"),
        )
        .groupBy("id", "pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("el"))
    )
    assign, _cents = kmeans_fixed_sparse(
        pts, k=K_TOPICS, iters=TOPIC_ITERS
    )
    members = assign.select("id", "cid")
    tcnt = (
        toks.join(members, "id")
        .groupBy("cid", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("cid").orderBy(F.desc("cnt"), F.asc("term"))
    topj = (
        tcnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_TERMS)
        .groupBy("cid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "term"))),
                    lambda s: s["term"],
                ),
                ",",
            ).alias("top_terms")
        )
    )
    stats = members.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ntok = tcnt.groupBy("cid").agg(F.sum("cnt").alias("n_tokens"))
    return (
        stats.join(ntok, "cid")
        .join(topj, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_docs",
            "n_tokens",
            "top_terms",
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# DuckDB oracles — the identical recurrence as unrolled CTEs
# --------------------------------------------------------------------------

_COS = (
    "ROUND(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b}))), 6)"
)


def _kmeans_ctes(k: int = K_CELLS, iters: int = ITERS) -> str:
    """The fixed-point Lloyd recurrence as a CTE chain ending in
    ``cent{iters}`` (trained centroids) and ``fasg`` (final
    assignment with BIGINT squared distance)."""
    ctes = [
        f"""pts AS MATERIALIZED (
  SELECT vec_id AS id,
         UNNEST(generate_series(0, len(embedding) - 1)) AS pos,
         CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * {FP_SCALE}.0)
              AS BIGINT) AS el
  FROM embeddings)""",
        """ids AS MATERIALIZED (
  SELECT id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS rk
  FROM (SELECT DISTINCT id FROM pts))""",
        f"""cent0 AS MATERIALIZED (
  SELECT CAST(rk - 1 AS INT) AS cid, pos, el AS c
  FROM ids JOIN pts USING (id) WHERE rk <= {k})""",
    ]
    for i in range(iters):
        ctes.append(f"""dist{i} AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.el - c.c) * (p.el - c.c)) AS BIGINT) AS d
  FROM pts p JOIN cent{i} c USING (pos) GROUP BY p.id, c.cid)""")
        ctes.append(f"""asg{i} AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cid) AS rn
    FROM dist{i}) WHERE rn = 1)""")
        ctes.append(f"""upd{i} AS MATERIALIZED (
  SELECT a.cid, p.pos, CAST(SUM(p.el) // COUNT(*) AS BIGINT) AS c_new
  FROM asg{i} a JOIN pts p USING (id) GROUP BY a.cid, p.pos)""")
        ctes.append(f"""cent{i + 1} AS MATERIALIZED (
  SELECT o.cid, o.pos, COALESCE(u.c_new, o.c) AS c
  FROM cent{i} o LEFT JOIN upd{i} u ON u.cid = o.cid AND u.pos = o.pos)""")
    ctes.append(f"""fdist AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.el - c.c) * (p.el - c.c)) AS BIGINT) AS d
  FROM pts p JOIN cent{iters} c USING (pos) GROUP BY p.id, c.cid)""")
    ctes.append("""fasg AS MATERIALIZED (
  SELECT id, cid, d FROM (
    SELECT id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cid) AS rn
    FROM fdist) WHERE rn = 1)""")
    return ",\n".join(ctes)


def _kmeans_certified_sql() -> str:
    return f"""
WITH {_kmeans_ctes()},
cstats AS (
  SELECT cid, CAST(SUM(ABS(c)) AS BIGINT) AS centroid_l1,
         md5(string_agg(CAST(c AS VARCHAR), ',' ORDER BY pos))
           AS centroid_md5
  FROM cent{ITERS} GROUP BY cid),
astats AS (
  SELECT cid, COUNT(*) AS n_members, CAST(SUM(d) AS BIGINT) AS inertia
  FROM fasg GROUP BY cid)
SELECT s.cid,
       COALESCE(a.n_members, CAST(0 AS BIGINT)) AS n_members,
       COALESCE(a.inertia, CAST(0 AS BIGINT)) AS inertia,
       s.centroid_l1,
       s.centroid_md5
FROM cstats s LEFT JOIN astats a USING (cid)
ORDER BY cid
"""


def _ann_ivf_fixed_sql() -> str:
    cos = _COS.format(a="ea.v", b="eb.v")
    return f"""
WITH {_kmeans_ctes()},
qdist AS (
  SELECT p.id, c.cid, CAST(SUM((p.el - c.c) * (p.el - c.c)) AS BIGINT) AS d
  FROM pts p JOIN cent{ITERS} c USING (pos)
  WHERE p.id <= {N_QUERY_VECS}
  GROUP BY p.id, c.cid),
probe AS (
  SELECT id AS query_id, cid FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cid) AS rn
    FROM qdist) WHERE rn <= {N_PROBE}),
cand AS (
  SELECT pr.query_id, fa.id AS neighbor_id
  FROM probe pr JOIN fasg fa USING (cid)
  WHERE fa.id <> pr.query_id),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT c.query_id, c.neighbor_id, {cos} AS score
  FROM cand c
  JOIN e ea ON ea.vec_id = c.query_id
  JOIN e eb ON eb.vec_id = c.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, neighbor_id
         ) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _semdedup_fixed_sql() -> str:
    cos = _COS.format(a="ea.v", b="eb.v")
    return f"""
WITH {_kmeans_ctes()},
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dropped AS (
  SELECT DISTINCT b.id AS vec_id
  FROM fasg a
  JOIN fasg b ON a.cid = b.cid AND a.id < b.id
  JOIN e ea ON ea.vec_id = a.id
  JOIN e eb ON eb.vec_id = b.id
  WHERE {cos} >= {SEM_THRESHOLD})
SELECT f.id AS vec_id, f.cid AS cell
FROM fasg f
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = f.id)
ORDER BY vec_id
"""


def _sparse_kmeans_ctes(k: int, iters: int) -> str:
    """Sparse fixed-point Lloyd recurrence over hashed term counts,
    ending in ``fasg`` (final assignment). Mirrors
    ``operators.kmeans_fixed.kmeans_fixed_sparse`` exactly: the
    three-term distance decomposition, member-count divisor,
    zero-component drop with the all-zero sentinel row,
    keep-previous on empty clusters."""
    from sqltask_spark.queries.textops import _TOKS, _md5long_sql

    ctes = [
        f"""toks AS MATERIALIZED (SELECT doc_id AS id, UNNEST({_TOKS}) AS term
        FROM documents)""",
        """tok AS MATERIALIZED (SELECT id, term FROM toks WHERE term <> '')""",
        f"""pts AS MATERIALIZED (
  SELECT id, CAST({_md5long_sql("term")} % {N_TOPIC_BUCKETS} AS INT)
           AS pos,
         CAST(COUNT(*) AS BIGINT) AS el
  FROM tok GROUP BY 1, 2)""",
        """ids AS MATERIALIZED (
  SELECT id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS rk
  FROM (SELECT DISTINCT id FROM pts))""",
        f"""cent0 AS MATERIALIZED (
  SELECT CAST(rk - 1 AS INT) AS cid, pos, el AS c
  FROM ids JOIN pts USING (id) WHERE rk <= {k})""",
        """dsq AS MATERIALIZED (
  SELECT id, CAST(SUM(el * el) AS BIGINT) AS dsq FROM pts GROUP BY id)""",
    ]

    def round_ctes(i: int, cent: str, tag: str) -> list[str]:
        return [
            f"""csq{tag} AS MATERIALIZED (
  SELECT cid, CAST(SUM(c * c) AS BIGINT) AS c2 FROM {cent} GROUP BY cid)""",
            f"""xp{tag} AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM(p.el * c.c) AS BIGINT) AS x
  FROM pts p JOIN {cent} c USING (pos) GROUP BY p.id, c.cid)""",
            f"""dist{tag} AS MATERIALIZED (
  SELECT d.id, s.cid,
         d.dsq - 2 * COALESCE(x.x, CAST(0 AS BIGINT)) + s.c2 AS dist
  FROM dsq d CROSS JOIN csq{tag} s
  LEFT JOIN xp{tag} x ON x.id = d.id AND x.cid = s.cid)""",
            f"""asg{tag} AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
    FROM dist{tag}) WHERE rn = 1)""",
        ]

    for i in range(iters):
        ctes += round_ctes(i, f"cent{i}", str(i))
        ctes.append(f"""msz{i} AS MATERIALIZED (
  SELECT cid, COUNT(*) AS n FROM asg{i} GROUP BY cid)""")
        ctes.append(f"""upd{i} AS MATERIALIZED (
  SELECT cid, pos, c FROM (
    SELECT a.cid, p.pos, CAST(SUM(p.el) // MIN(m.n) AS BIGINT) AS c
    FROM asg{i} a JOIN pts p USING (id) JOIN msz{i} m ON m.cid = a.cid
    GROUP BY a.cid, p.pos) WHERE c <> 0)""")
        # the second arm is the all-zero sentinel: a non-empty cluster
        # whose every component truncated to 0 keeps one (cid, 0, 0)
        # row so it stays in csq / the assignment grid (mirrors
        # operators.kmeans_fixed._update_sparse — k must never
        # silently shrink)
        ctes.append(f"""cent{i + 1} AS MATERIALIZED (
  SELECT cid, pos, c FROM upd{i}
  UNION ALL
  SELECT m.cid, CAST(0 AS INT) AS pos, CAST(0 AS BIGINT) AS c
  FROM msz{i} m WHERE m.cid NOT IN (SELECT cid FROM upd{i})
  UNION ALL
  SELECT o.cid, o.pos, o.c FROM cent{i} o
  WHERE o.cid NOT IN (SELECT cid FROM msz{i}))""")
    ctes += round_ctes(iters, f"cent{iters}", "F")
    ctes.append("fasg AS MATERIALIZED (SELECT id, cid FROM asgF)")
    return ",\n".join(ctes)


def _topic_certified_sql() -> str:
    return f"""
WITH {_sparse_kmeans_ctes(K_TOPICS, TOPIC_ITERS)},
tcnt AS MATERIALIZED (
  SELECT a.cid, t.term, COUNT(*) AS cnt
  FROM fasg a JOIN tok t USING (id) GROUP BY a.cid, t.term),
topj AS (
  SELECT cid, string_agg(term, ',' ORDER BY rk) AS top_terms
  FROM (
    SELECT cid, term,
           ROW_NUMBER() OVER (
             PARTITION BY cid ORDER BY cnt DESC, term) AS rk
    FROM tcnt) WHERE rk <= {TOP_TERMS}
  GROUP BY cid),
stats AS (SELECT cid, COUNT(*) AS n_docs FROM fasg GROUP BY cid),
ntok AS MATERIALIZED (
  SELECT cid, CAST(SUM(cnt) AS BIGINT) AS n_tokens
  FROM tcnt GROUP BY cid)
SELECT s.cid AS cluster_id, s.n_docs, n.n_tokens, j.top_terms
FROM stats s
JOIN ntok n USING (cid)
JOIN topj j USING (cid)
ORDER BY cluster_id
"""


QUERIES = {
    "kmeans_certified": kmeans_certified,
    "ann_topk_ivf_fixed": ann_topk_ivf_fixed,
    "ivf_occupancy_stats": ivf_occupancy_stats,
    "semdedup_fixed": semdedup_fixed,
    "topic_cluster_certified": topic_cluster_certified,
}

ORACLES = {
    "kmeans_certified": _kmeans_certified_sql(),
    "ann_topk_ivf_fixed": _ann_ivf_fixed_sql(),
    "ivf_occupancy_stats": _ivf_occupancy_sql(),
    "semdedup_fixed": _semdedup_fixed_sql(),
    "topic_cluster_certified": _topic_certified_sql(),
}
