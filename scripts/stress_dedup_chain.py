#!/usr/bin/env python
"""Dedup-chain scaling probe: the CAPPED production pipeline at a
chosen documents replication factor.

VERDICT r5 #8: the capped chain (df-capped Jaccard pairs →
connected-component clusters → keep-best survivors → PageRank) is the
pipeline a 100 TB run would execute; the sf1 gate proved it correct
at 10× driver scale, this script measures whether the caps actually
hold the work SUB-QUADRATIC another decade up. It replicates the
sf0.1 documents table ×reps (same replication shape as
scripts/gen_scale.py: replica 1 = true near-dup, replicas ≥2 =
interleaved unique tokens → corpus-like dedup structure, stable
per-shingle df), runs the four catalog entries unchanged, and prints
one JSON line with wall seconds, result rows, and per-entry shuffle
read/write bytes (from the Spark UI REST API — the number that
decides whether a step survives a 1000-executor cluster).

Usage: python scripts/stress_dedup_chain.py [reps] [base_sf_dir] [entry ...]
       reps=10 → ~50k docs (sf1-equivalent), 100 → ~500k (sf10-equiv)
       extra args replace the default ENTRIES list — e.g. the r7
       retrieval-family wave: search_bm25 search_hybrid_rrf
       dedup_tfidf_cosine (the remaining r6 shuffle-pin sites)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.queries import QUERIES  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402

ENTRIES = [
    "dedup_ngram_jaccard_capped",
    "dedup_clusters_capped",
    "dedup_keep_best",
    "doc_centrality_pagerank",
    "dedup_graph_triangles",
    "doc_novelty_score",
]

UI = "http://localhost:4040"


def _shuffle_totals() -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all completed stages."""
    try:
        with urllib.request.urlopen(f"{UI}/api/v1/applications", timeout=5) as r:
            app = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception as exc:  # UI scraping must never fail the probe
        print(f"# shuffle metrics unavailable: {exc}", file=sys.stderr)
        return (0, 0)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    entries = sys.argv[3:] or ENTRIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"stress_dedup_chain_x{reps}",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = f"/tmp/dedup_scale_x{reps}"
    path = os.path.join(tmp, "documents.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
        rep = spark.range(reps).withColumnRenamed("id", "_rep")
        text = (
            F.when(F.col("_rep") == 0, F.col("text"))
            .when(
                F.col("_rep") == 1, F.concat(F.col("text"), F.lit(" nearly"))
            )
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    " ",
                    F.concat(
                        F.lit(" tkn"), F.col("_rep").cast("string"),
                        F.lit(" "),
                    ),
                )
            )
        )
        big = docs.crossJoin(rep).select(
            (F.col("doc_id") * reps + F.col("_rep")).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        )
        big.withColumn("n_chars", F.length("text")).repartition(
            int(cpus)
        ).write.mode("overwrite").parquet(path)
    n_docs = spark.read.parquet(path).count()
    print(f"# corpus: {n_docs} documents (x{reps})", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in entries:
        spark.catalog.clearCache()
        r0, w0 = _shuffle_totals()
        t0 = time.perf_counter()
        n = QUERIES[name](spark, tmp).count()
        dt = round(time.perf_counter() - t0, 1)
        r1, w1 = _shuffle_totals()
        out[name] = {
            "sec": dt,
            "rows": n,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "dedup_chain_scaling",
                "unit": "sec",
                "reps": reps,
                "n_documents": n_docs,
                "value": round(sum(v["sec"] for v in out.values()), 1),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
