"""Persisted MinHash-LSH near-dup index: build once, screen batches.

No reference counterpart (north-star extension). The per-call pair
operators (:func:`sqltask_spark.operators.dedup.minhash_dedup_pairs`)
re-shingle and re-sign the WHOLE corpus per invocation — right for a
one-shot dedup pass, wrong for the production ingest loop where a
small new batch must be screened against a 100 TB corpus every hour.
This module is the batch analog of the streaming screen
(:mod:`sqltask_spark.streaming.corpus`), shaped like the persistent
ANN index (:mod:`sqltask_spark.operators.ann_index`):

- **build** pays the corpus pass once and stores three relations:
  the LSH bucket postings ``(band, band_hash, id, bucket_size)``,
  the shingle-hash sets ``(id, h)`` for exact-Jaccard verification,
  and the signature parameters (a probe MUST band identically —
  they're read back, never re-specified).
- **probe** touches only batch-sized data plus the posting/shingle
  rows its buckets actually hit: signatures for the batch, one
  equi-join on (band, band_hash), exact Jaccard against the stored
  shingle sets of the candidates only. ``bucket_size`` is
  precomputed at build time so hot boilerplate buckets are skipped
  by a stored-column filter, not a runtime census.

Probing with the corpus itself reproduces the per-call operator's
pairs exactly (tested) — the index changes WHEN work happens, never
WHAT the result is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqltask_spark.operators.dedup import (
    _banded_signatures,
    _signatures_wide,
    shingled_docs,
)


def build_minhash_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
) -> None:
    """One corpus pass → postings + shingles + meta under ``path``."""
    assert num_perm % bands == 0, "bands must divide num_perm"
    shingled = shingled_docs(corpus, id_col, text_col, shingle_n).persist()
    try:
        wide = _signatures_wide(shingled, num_perm, seed)
        banded = _banded_signatures(wide, bands, num_perm // bands)
        sizes = banded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("bucket_size")
        )
        (
            banded.join(sizes, ["band", "band_hash"])
            .write.mode("overwrite")
            .parquet(f"{path}/postings")
        )
        shingled.write.mode("overwrite").parquet(f"{path}/shingles")
        spark = corpus.sparkSession
        spark.createDataFrame(
            [(num_perm, bands, seed, shingle_n)],
            "num_perm int, bands int, seed int, shingle_n int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    finally:
        shingled.unpersist()


def probe_minhash_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup matches of ``batch`` against the indexed corpus.

    Returns (batch_id, corpus_id, n_shared_bands, jaccard) for every
    batch document whose exact shingle Jaccard with an indexed
    document reaches ``threshold``. Self-matches (same id) are
    dropped so a corpus can be probed against its own index.
    """
    from sqltask_spark.data import materialize_and_release

    meta = spark.read.parquet(f"{path}/meta").first()
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket_size") <= F.lit(max_bucket_size)
    )
    corpus_sh = spark.read.parquet(f"{path}/shingles").select(
        F.col("id").alias("corpus_id"), F.col("h").alias("h_c")
    )
    bsh = shingled_docs(batch, id_col, text_col, meta["shingle_n"]).persist()
    try:
        wide = _signatures_wide(bsh, meta["num_perm"], meta["seed"])
        banded = _banded_signatures(
            wide, meta["bands"], meta["num_perm"] // meta["bands"]
        ).select(
            F.col("id").alias("batch_id"), "band", "band_hash"
        )
        cand = (
            banded.join(postings, ["band", "band_hash"])
            .filter(F.col("batch_id") != F.col("id"))
            .groupBy(
                "batch_id", F.col("id").alias("corpus_id")
            )
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
        b = bsh.select(F.col("id").alias("batch_id"), F.col("h").alias("h_b"))
        jac = F.size(F.array_intersect("h_b", "h_c")).cast("double") / F.size(
            F.array_union("h_b", "h_c")
        )
        out = (
            cand.join(b, "batch_id")
            .join(corpus_sh, "corpus_id")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("batch_id", "corpus_id", "n_shared_bands", "jaccard")
        )
        return materialize_and_release(out, bsh)
    except BaseException:
        bsh.unpersist()
        raise
