#!/usr/bin/env python
"""Generate an sf1-equivalent dataset from provided sf0.1 parquet.

The driver-provided testdata tops out at sf0.1; the relational
surface's scale risks (o_custkey skew amplification, window-partition
growth, decimal-sum overflow headroom, top-k tie pressure) first show
an order of magnitude later. This replicates every table ×REPS with
TPC-H-consistent key structure so the FULL oracle gate
(scripts/check_oracle.py) and bench.py can run at the generated
scale — Spark and DuckDB still see identical bytes, so every
hash-comparison stays meaningful.

Replication design (replica r ∈ [0, REPS)):

- region/nation: copied verbatim (constant-size in TPC-H — they do
  NOT scale with SF).
- customer/supplier/part/orders/lineitem/events: every primary AND
  foreign key k becomes ``k·REPS + r`` — referential integrity holds
  within each replica, key ranges stay disjoint across replicas, and
  per-key fan-ins (orders per customer, lineitems per order) keep
  their sf0.1 distribution instead of multiplying — which is exactly
  how TPC-H itself scales. Non-key attributes are kept verbatim, so
  value distributions (dates, prices, segments) are unchanged.
- documents: ×DOC_REPS with the stress_scale replication shape —
  replica 1 is a true near-dup of replica 0 (suffix token), replicas
  ≥2 interleave a replica-unique token between words (distinct
  shingle sets, same length statistics) — so dedup structure stays
  corpus-like instead of exploding with the factor.
- embeddings: ×EMB_REPS with per-replica perturbation (+0.001·r),
  cast back to float to keep the column type stable. EMB_REPS is
  deliberately smaller than REPS: the one O(n²)-by-definition entry
  (exact knn_graph) is in the gate, and embeddings have no canonical
  TPC-H scaling anyway.

Usage: python scripts/gen_scale.py [dst_dir] [src_dir] [reps]
Defaults: /tmp/sf1_gen /root/testdata/sf0.1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.session import get_spark  # noqa: E402

DOC_REPS = 10
EMB_REPS = 4

#: key columns to remap per table (every other column copies verbatim)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_gen"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gen_scale",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for t in ("region", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: verbatim", file=sys.stderr)

    rep = spark.range(reps).withColumnRenamed("id", "_rep")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        cols = [
            (F.col(c) * reps + F.col("_rep")).alias(c)
            if c in keys
            else F.col(c)
            for c in df.columns
        ]
        big = df.crossJoin(rep).select(*cols)
        big.repartition(int(cpus)).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"# {t}: {n} rows (x{reps})", file=sys.stderr)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    drep = spark.range(DOC_REPS).withColumnRenamed("id", "_rep")
    text = (
        F.when(F.col("_rep") == 0, F.col("text"))
        .when(F.col("_rep") == 1, F.concat(F.col("text"), F.lit(" nearly")))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                " ",
                F.concat(
                    F.lit(" tkn"), F.col("_rep").cast("string"), F.lit(" ")
                ),
            )
        )
    )
    big_docs = docs.crossJoin(drep).select(
        (F.col("doc_id") * DOC_REPS + F.col("_rep")).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
    )
    big_docs.withColumn(
        "n_chars", F.length("text")
    ).repartition(int(cpus)).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"# documents: {n} rows (x{DOC_REPS})", file=sys.stderr)

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    erep = spark.range(EMB_REPS).withColumnRenamed("id", "_rep")
    big_emb = emb.crossJoin(erep).select(
        (F.col("vec_id") * EMB_REPS + F.col("_rep")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + F.col("_rep").cast("double") * 0.001,
        ).cast("array<float>").alias("embedding"),
        "label",
    )
    big_emb.repartition(int(cpus)).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )
    n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    print(f"# embeddings: {n} rows (x{EMB_REPS})", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
