#!/usr/bin/env python
"""Scale stress: the LLM-pipeline surface at ~sf2-equivalent volume.

The provided testdata tops out at sf0.1 (5k documents / 2k vectors).
This script replicates it in a scale-revealing way and runs the
scale-sensitive catalog entries end-to-end, printing one JSON line of
wall-clock seconds — the local stand-in for "would this hold at
1000×?". Replication design:

- documents ×``DOC_REPS``: replica 1 appends a suffix token (a true
  near-dup of replica 0 → every base doc becomes a 2-member dedup
  cluster); replicas ≥2 interleave a replica-unique token between
  every word (different shingle sets → structurally DISTINCT docs
  with the same length/frequency statistics). So the dedup graph has
  realistic shape — clusters plus a large singleton majority — and
  per-shingle document frequency stays corpus-like instead of
  exploding with the replication factor.
- embeddings ×``EMB_REPS`` with per-replica perturbation (as in
  bench.py's crossover).

Usage: python scripts/stress_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.queries import QUERIES  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402

DOC_REPS = 20
EMB_REPS = 64

# NOTE: deliberately NOT dedup_clusters / dedup_ngram_jaccard —
# those catalog entries run the UNCAPPED inverted index (the
# oracle-fidelity mode), and on this replicated corpus the
# interleaved shingles are df-hot enough to make the uncapped
# candidate self-join quadratic (measured: all 32 cores pinned for
# minutes — the exact blowup max_shingle_df exists to prevent). The
# scale path is capped pairs → cluster_documents, timed as the
# synthetic "clusters_from_capped" entry below.
ENTRIES = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_capped",
    "contamination_overlap",
    "repetition_stats",
    "corpus_clean_pipeline",
    "chunk_documents",
    "text_stats",
    "redact_documents",
    "split_train_eval",
    "vocab_top_tokens",
    "pack_sequences",
    "ann_topk_ivf",
    "embedding_quantize_int8",
    "dup_span_stats",
    "domain_mix_weights",
    "bpe_learn_merges",
    "semdedup_keep",
    "lm_perplexity",
    "ann_topk_ivf_pq",
    "search_bm25",
    "dsir_weights",
    "ccnet_ppl_buckets",
    "doc_tfidf_vectors",
    "dedup_tfidf_cosine",
    "doc_centrality_pagerank",
    "topic_cluster_documents",
    # NOT knn_graph: the exact graph is O(n²) by definition — at
    # 128k vectors that is 8G pair scores; the documented scale path
    # for neighbor graphs is IVF cells (see operators.similarity).
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sqltask_spark_stress",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stress_scale_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = spark.range(DOC_REPS).withColumnRenamed("id", "rep")
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") * DOC_REPS + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .when(F.col("rep") == 1, F.concat(F.col("text"), F.lit(" nearly")))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                " ",
                F.concat(F.lit(" tkn"), F.col("rep").cast("string"), F.lit(" ")),
            )
        )
        .alias("text"),
        "lang",
        "source",
    )
    big_docs = big_docs.withColumn("n_chars", F.length("text"))
    big_docs.repartition(int(cpus)).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ereps = spark.range(EMB_REPS).withColumnRenamed("id", "rep")
    big_emb = emb.crossJoin(ereps).select(
        (F.col("vec_id") * EMB_REPS + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.col("rep").cast("double") * 0.001
        ).alias("embedding"),
        "label",
    )
    big_emb.repartition(int(cpus)).write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet")
    )

    n_docs = spark.read.parquet(os.path.join(tmp, "documents.parquet")).count()
    n_emb = spark.read.parquet(os.path.join(tmp, "embeddings.parquet")).count()
    print(f"# corpus: {n_docs} documents, {n_emb} embeddings", file=sys.stderr)

    times: dict[str, float] = {}
    for name in ENTRIES:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = QUERIES[name](spark, tmp).count()
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    # the production clustering path: CAPPED candidate pairs →
    # connected components (see ENTRIES note)
    from sqltask_spark.operators.dedup import ngram_jaccard_pairs
    from sqltask_spark.operators.graph import cluster_documents

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    big = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    pairs = ngram_jaccard_pairs(
        big, "doc_id", "text", shingle_n=3, threshold=0.5, max_shingle_df=50
    )
    # star, not label: this corpus's similarity graph has long chains
    # (measured ~30 label-propagation rounds), the star algorithm's
    # diameter-independent case
    n = cluster_documents(pairs, algorithm="star").count()
    times["clusters_from_capped"] = round(time.perf_counter() - t0, 2)
    print(
        f"# clusters_from_capped: {times['clusters_from_capped']}s "
        f"({n} rows)",
        file=sys.stderr,
    )

    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "stress_scale_wall_clock",
                "unit": "sec",
                "n_documents": n_docs,
                "n_embeddings": n_emb,
                "value": round(sum(times.values()), 2),
                "queries": times,
            }
        )
    )


if __name__ == "__main__":
    main()
