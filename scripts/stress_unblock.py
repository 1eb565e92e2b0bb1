#!/usr/bin/env python
"""Measure targeted unblock vs full compaction on a multi-generation
MinHash index (VERDICT r10 #4's cost claim, made a number).

Builds the index over $SPARK_GRAFT_SF_DIR documents in N_GENS
generations, tombstones ONE document from a middle generation, then
times (on two identical index copies):

  a) ``unblock_minhash_ids``  — rewrites only the generation holding
     the blocked id (stats-pruned, semi-join confirmed);
  b) ``compact_minhash_index`` — the r10 behaviour: full-index merge.

Prints one JSON line with both wall times and the work each did.
The gap grows with index size over window size — at 100 TB a sync
window re-admitting one takedown must not rewrite the corpus.

$STRESS_ID_MODE picks the generation id layout (VERDICT r11 #1):

- ``interleaved`` (default): generation g holds ``doc_id % N_GENS
  == g`` — every generation's [min,max] spans the id space, so
  range pruning proves nothing and pruning depends entirely on the
  per-generation id FILTERS. ``census_candidate_generations`` in
  the output is the count the census job actually read: with the
  filters it stays at ~1 regardless of generation count.
- ``monotonic``: contiguous id ranges per generation — the layout
  range pruning was already perfect for; the control arm.

$STRESS_N_GENS overrides the generation count (default 5) so the
no-growth-with-generations claim is measurable directly.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.operators.dedup_index import (  # noqa: E402
    append_to_minhash_index,
    build_minhash_index,
    committed_manifest,
    compact_minhash_index,
    delete_from_minhash_index,
    probe_minhash_index,
    unblock_minhash_ids,
)
from sqltask_spark.session import get_spark  # noqa: E402



def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="stress_unblock",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_gens = int(os.environ.get("STRESS_N_GENS", "5"))
    id_mode = os.environ.get("STRESS_ID_MODE", "interleaved")
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    # $STRESS_DOC_REPS replicates the corpus with disjoint ids and a
    # replica-unique token (distinct shingle sets — the dedup
    # structure does not explode with the factor) to reach the
    # data-bound regime where compaction cost grows with the CORPUS
    # while the targeted unblock stays generation-sized
    reps = int(os.environ.get("STRESS_DOC_REPS", "1"))
    if reps > 1:
        docs = docs.crossJoin(
            spark.range(reps).withColumnRenamed("id", "rep")
        ).select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.col("text"),
                F.concat(F.lit("rtok"), F.col("rep")),
            ).alias("text"),
        )
    n_docs = docs.count()
    if id_mode == "interleaved":
        gen_col = F.pmod(F.col("doc_id"), F.lit(n_gens))
    elif id_mode == "monotonic":
        # contiguous ranges: ids are dense post-replication, so a
        # simple integer division splits them into ordered blocks
        step = -(-n_docs // n_gens)
        gen_col = (F.col("doc_id") / F.lit(step)).cast("long")
    else:
        raise SystemExit(f"unknown STRESS_ID_MODE {id_mode!r}")
    docs = docs.withColumn("_gen", gen_col)
    tmp = tempfile.mkdtemp(prefix="stress_unblock_")
    a, b = f"{tmp}/idx_unblock", f"{tmp}/idx_compact"
    try:
        for idx in (a, b):
            build_minhash_index(
                docs.filter(F.col("_gen") == 0).drop("_gen"), idx
            )
            for g in range(1, n_gens):
                append_to_minhash_index(
                    idx,
                    docs.filter(F.col("_gen") == g).drop("_gen"),
                    "doc_id",
                    "text",
                )
        # one takedown from the MIDDLE generation, later re-admitted
        victim = docs.filter(
            F.col("_gen") == n_gens // 2
        ).orderBy("doc_id").limit(1).drop("_gen")
        for idx in (a, b):
            delete_from_minhash_index(idx, victim, "doc_id")

        t0 = time.perf_counter()
        r = unblock_minhash_ids(spark, a, victim, "doc_id")
        t_unblock = time.perf_counter() - t0

        t0 = time.perf_counter()
        compact_minhash_index(spark, b)
        t_compact = time.perf_counter() - t0

        # both paths must free the id identically: probe parity on a
        # twin of the victim's text after re-appending it to each
        vrow = victim.collect()[0]
        readd = spark.createDataFrame(
            [(vrow["doc_id"], vrow["text"])],
            "doc_id long, text string",
        )
        for idx in (a, b):
            append_to_minhash_index(idx, readd, "doc_id", "text")
        twin = spark.createDataFrame(
            [(900_000_000, (vrow["text"] or "") + " twin")],
            "doc_id long, text string",
        )

        def canon(idx: str) -> set:
            hits = probe_minhash_index(spark, idx, twin, threshold=0.5)
            out = {
                (h["batch_id"], h["corpus_id"])
                for h in hits.collect()
            }
            hits.unpersist()
            return out

        parity = canon(a) == canon(b)
        print(json.dumps({
            "n_docs": n_docs,
            "n_generations": n_gens,
            "id_mode": id_mode,
            "census_candidate_generations": r["candidate_generations"],
            "unblock_sec": round(t_unblock, 3),
            "compact_sec": round(t_compact, 3),
            "speedup": round(t_compact / t_unblock, 2),
            "rewritten_generations": len(r["rewritten_generations"]),
            "generations_after_unblock": len(
                committed_manifest(spark, a)["generations"]
            ),
            "probe_parity_after_readmit": parity,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
