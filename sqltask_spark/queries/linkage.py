"""Record-linkage catalog entries — edit-distance joins whose
deletion-neighborhood blocking is proven COMPLETE by hash-matching a
brute-force DuckDB ``levenshtein`` oracle.

Each entry runs the blocked plan (:mod:`sqltask_spark.operators.linkage`
— explode neighborhoods, equi-join on variant, verify with the JVM
``levenshtein``) while the oracle runs the naive quadratic predicate
join. Equal hashes = the blocking missed nothing AND the verify
admitted nothing extra, at every driver gate, forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqltask_spark.data import load_table
from sqltask_spark.operators.linkage import (
    fuzzy_self_join,
    fuzzy_value_pairs,
)


def fuzzy_pairs_customer_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name linkage at edit distance 1 (classic entity
    resolution: ids differing in one digit). Exact — no cap."""
    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_self_join(cust, "c_custkey", "c_name", k=1).select(
        F.col("a_id").cast("long").alias("a_id"),
        F.col("b_id").cast("long").alias("b_id"),
        F.col("dist").cast("long").alias("dist"),
    )


def fuzzy_degree_part_ed2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part fuzzy-duplicate degree: how many OTHER parts have a
    name within edit distance 2. Runs in VALUE space (64 distinct
    names at every sf — an id-level self-join would emit d^2 rows per
    name duplicated d times, ~4M inflated pairs at sf0.1), then joins
    multiplicities back: degree(part with name x) = (m(x) - 1) +
    Σ m(y) over names y within distance 2."""
    part = load_table(spark, sf_dir, "part")
    vp = fuzzy_value_pairs(part, "p_name", k=2)
    # per-name mass of fuzzy neighbors (both directions)
    neigh = (
        vp.select(F.col("a_s").alias("s"), F.col("b_n").alias("m"))
        .unionAll(
            vp.select(F.col("b_s").alias("s"), F.col("a_n").alias("m"))
        )
        .groupBy("s")
        .agg(F.sum("m").cast("long").alias("n_neigh"))
    )
    per_name = (
        part.groupBy(F.col("p_name").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
        .join(neigh, "s", "left")
        .select(
            "s",
            (
                F.col("m") - F.lit(1)
                + F.coalesce("n_neigh", F.lit(0))
            ).cast("long").alias("n_sim"),
        )
    )
    # fan the name-level degree back out to ids with a plain equi-join
    # (no collect_list — a name duplicated a billion times must not
    # materialize an id array)
    return (
        part.join(per_name, part["p_name"] == per_name["s"])
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"), "n_sim"
        )
        # oracle parity: a part with no duplicate and no fuzzy
        # neighbor never appears in the pair relation
        .filter(F.col("n_sim") > 0)
    )


def fuzzy_pairs_doc_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate screen on 24-char document prefixes at edit
    distance 2 — the record-linkage shape applied to corpus dedup
    (catches planted near-dups whose heads drifted by a token)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("head")
    )
    return fuzzy_self_join(docs, "doc_id", "head", k=2).select(
        F.col("a_id").cast("long").alias("a_id"),
        F.col("b_id").cast("long").alias("b_id"),
        F.col("dist").cast("long").alias("dist"),
    )


QUERIES = {
    "fuzzy_pairs_customer_ed1": fuzzy_pairs_customer_ed1,
    "fuzzy_degree_part_ed2": fuzzy_degree_part_ed2,
    "fuzzy_pairs_doc_prefix": fuzzy_pairs_doc_prefix,
}

ORACLES = {
    "fuzzy_pairs_customer_ed1": """
        SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        FROM customer a JOIN customer b
          ON a.c_custkey < b.c_custkey
         AND abs(length(a.c_name) - length(b.c_name)) <= 1
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    "fuzzy_degree_part_ed2": """
        WITH pairs AS (
            SELECT a.p_partkey AS a_id, b.p_partkey AS b_id
            FROM part a JOIN part b
              ON a.p_partkey < b.p_partkey
             AND abs(length(a.p_name) - length(b.p_name)) <= 2
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        ), ends AS (
            SELECT a_id AS id FROM pairs
            UNION ALL SELECT b_id FROM pairs
        )
        SELECT CAST(id AS BIGINT) AS p_partkey,
               CAST(count(*) AS BIGINT) AS n_sim
        FROM ends GROUP BY id
    """,
    "fuzzy_pairs_doc_prefix": """
        WITH heads AS (
            SELECT doc_id, substr(text, 1, 24) AS head FROM documents
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        FROM heads a JOIN heads b
          ON a.doc_id < b.doc_id
         AND abs(length(a.head) - length(b.head)) <= 2
        WHERE levenshtein(a.head, b.head) <= 2
    """,
}


def fuzzy_trgm_pairs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard linkage on part names (value space, milli
    units): catches shared-content pairs edit distance ranks far
    apart (word swaps / shared words), the set-similarity complement
    of the ED entries. Exact — shared-trigram blocking is complete
    for any positive threshold."""
    from sqltask_spark.operators.linkage import trigram_value_pairs

    part = load_table(spark, sf_dir, "part")
    return trigram_value_pairs(part, "p_name", min_jaccard_milli=400)


QUERIES["fuzzy_trgm_pairs_part"] = fuzzy_trgm_pairs_part

ORACLES["fuzzy_trgm_pairs_part"] = """
WITH vals AS (
    SELECT p_name AS s, CAST(count(*) AS BIGINT) AS n
    FROM part GROUP BY p_name
), tg AS (
    SELECT DISTINCT s, substr(s, CAST(i AS INT), 3) AS t
    FROM vals, unnest(generate_series(1, length(s) - 2)) AS u(i)
), cnt AS (
    SELECT s, count(*) AS ntg FROM tg GROUP BY s
), common AS (
    SELECT a.s AS a_s, b.s AS b_s, count(*) AS c
    FROM tg a JOIN tg b ON a.t = b.t AND a.s < b.s
    GROUP BY 1, 2
)
SELECT a_s, va.n AS a_n, b_s, vb.n AS b_n,
       CAST((1000 * c) // (ca.ntg + cb.ntg - c) AS BIGINT)
           AS jacc_milli
FROM common
JOIN cnt ca ON ca.s = a_s
JOIN cnt cb ON cb.s = b_s
JOIN vals va ON va.s = a_s
JOIN vals vb ON vb.s = b_s
WHERE (1000 * c) // (ca.ntg + cb.ntg - c) >= 400
"""


def entity_clusters_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END entity resolution: fuzzy ED1 pairs on customer
    names → connected components → canonical survivor per entity
    (smallest custkey). The classic record-linkage pipeline — match,
    cluster, survive — each stage an already-audited operator
    (deletion-neighborhood join; label-propagation components with a
    loud round cap)."""
    from sqltask_spark.operators.graph import cluster_documents

    cust = load_table(spark, sf_dir, "customer")
    pairs = fuzzy_self_join(cust, "c_custkey", "c_name", k=1).select(
        F.col("a_id").cast("long").alias("id_a"),
        F.col("b_id").cast("long").alias("id_b"),
    )
    return cluster_documents(pairs).select(
        F.col("doc_id").cast("long").alias("c_custkey"),
        F.col("cluster_id").cast("long").alias("entity_id"),
        "is_canonical",
    ).orderBy("c_custkey")


QUERIES["entity_clusters_customer"] = entity_clusters_customer

ORACLES["entity_clusters_customer"] = """
WITH RECURSIVE pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
), edges AS MATERIALIZED (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
    SELECT u, u AS v FROM edges GROUP BY u
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT
    u AS c_custkey,
    MIN(v) AS entity_id,
    MIN(v) = u AS is_canonical
FROM reach
GROUP BY u
ORDER BY c_custkey
"""


def entity_balance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-adjusted aggregation — the query entity resolution
    exists FOR: account balance totals per resolved entity instead of
    per raw record, so near-duplicate customers stop double-counting.

    Matches are BLOCKED on nation (the textbook practice, and what
    keeps transitive closure from percolating: unblocked ED1 on dense
    sequential ids merges the whole table into ONE entity — the
    over-merge failure mode this entry demonstrates the fix for).
    Decimal-exact sums (the sessionize discipline) keep the double
    output order-independent and engine-identical."""
    from sqltask_spark.operators.graph import cluster_documents

    cust = load_table(spark, sf_dir, "customer")
    nat_a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_nationkey").alias("_na"),
    )
    nat_b = cust.select(
        F.col("c_custkey").alias("b_id"),
        F.col("c_nationkey").alias("_nb"),
    )
    pairs = (
        fuzzy_self_join(cust, "c_custkey", "c_name", k=1)
        .join(nat_a, "a_id")
        .join(nat_b, "b_id")
        .filter(F.col("_na") == F.col("_nb"))
        .select(
            F.col("a_id").cast("long").alias("id_a"),
            F.col("b_id").cast("long").alias("id_b"),
        )
    )
    clusters = cluster_documents(pairs).select(
        F.col("doc_id").alias("c_custkey"),
        F.col("cluster_id").alias("entity_id"),
    )
    return (
        cust.join(clusters, "c_custkey")
        .groupBy(F.col("entity_id").cast("long").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


QUERIES["entity_balance_rollup"] = entity_balance_rollup

ORACLES["entity_balance_rollup"] = """
WITH RECURSIVE pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND a.c_nationkey = b.c_nationkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
), edges AS MATERIALIZED (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
    SELECT u, u AS v FROM edges GROUP BY u
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), clusters AS (
    SELECT u AS c_custkey, MIN(v) AS entity_id FROM reach GROUP BY u
)
SELECT
    CAST(c.entity_id AS BIGINT) AS entity_id,
    CAST(count(*) AS BIGINT) AS n_members,
    CAST(SUM(CAST(cu.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        AS total_acctbal
FROM clusters c JOIN customer cu USING (c_custkey)
GROUP BY c.entity_id
"""
