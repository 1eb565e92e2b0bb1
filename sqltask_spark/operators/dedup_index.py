"""Persisted MinHash-LSH near-dup index: build once, screen batches.

No reference counterpart (north-star extension). The per-call pair
operators (:func:`sqltask_spark.operators.dedup.minhash_dedup_pairs`)
re-shingle and re-sign the WHOLE corpus per invocation — right for a
one-shot dedup pass, wrong for the production ingest loop where a
small new batch must be screened against a 100 TB corpus every hour.
This module is the batch analog of the streaming screen
(:mod:`sqltask_spark.streaming.corpus`), shaped like the persistent
ANN index (:mod:`sqltask_spark.operators.ann_index`):

- **build** pays the corpus pass once and stores four relations:
  the LSH bucket postings ``(band, band_hash, id)``, the bucket
  SIZES ``(band, band_hash, bucket_size)`` (kept separate from the
  postings precisely so they stay mergeable — see append), the
  shingle-hash sets ``(id, h)`` for exact-Jaccard verification, and
  the signature parameters (a probe MUST band identically — they're
  read back, never re-specified).
- **probe** touches only batch-sized data plus the posting/shingle
  rows its buckets actually hit: signatures for the batch, one
  equi-join on (band, band_hash), exact Jaccard against the stored
  shingle sets of the candidates only. ``bucket_size`` is a stored
  join so hot boilerplate buckets are skipped without a runtime
  census.
- **append** closes the production ingest loop: after a probe
  admits a batch's novel documents, appending them makes the NEXT
  batch screen against them too — batch-sized work only (new
  postings and shingles land as appended files; the skinny sizes
  relation is the one rewritten artifact, merged as old ∪ new →
  sum). At 100 TB the index is built once and only ever appended.

Probing with the corpus itself reproduces the per-call operator's
pairs exactly (tested) — the index changes WHEN work happens, never
WHAT the result is; probe-after-append is bit-identical to a probe
of a fresh build over the union corpus (tested).
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
    """One corpus pass → postings + sizes + shingles + meta under
    ``path``."""
    assert num_perm % bands == 0, "bands must divide num_perm"
    shingled = shingled_docs(corpus, id_col, text_col, shingle_n).persist()
    try:
        wide = _signatures_wide(shingled, num_perm, seed)
        banded = _banded_signatures(wide, bands, num_perm // bands)
        banded.write.mode("overwrite").parquet(f"{path}/postings")
        (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("bucket_size"))
            .write.mode("overwrite")
            .parquet(f"{path}/sizes")
        )
        shingled.write.mode("overwrite").parquet(f"{path}/shingles")
        spark = corpus.sparkSession
        spark.createDataFrame(
            [(num_perm, bands, seed, shingle_n)],
            "num_perm int, bands int, seed int, shingle_n int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    finally:
        shingled.unpersist()


def append_to_minhash_index(
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Add ``batch`` to an existing index — the admit step of the
    ingest loop (screen with :func:`probe_minhash_index`, keep the
    novel documents, append exactly those).

    Batch-sized work only: new postings and shingles are APPENDED
    parquet files (never a corpus rewrite); the skinny
    ``(band, band_hash, bucket_size)`` sizes relation is re-derived
    as old ∪ new → sum and is the single rewritten artifact. Caller
    contract: ids must be new to the index (append the probe's
    ADMITTED set — re-appending an id would double its postings).
    Crash note: sizes is written LAST, so an interrupted append
    leaves sizes stale-low for the new buckets — re-running the same
    append after removing the partial files, or rebuilding, heals
    it; a production deployment would version the index directory.
    """
    spark = batch.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    bsh = shingled_docs(batch, id_col, text_col, meta["shingle_n"]).persist()
    try:
        wide = _signatures_wide(bsh, meta["num_perm"], meta["seed"])
        banded = _banded_signatures(
            wide, meta["bands"], meta["num_perm"] // meta["bands"]
        ).persist()
        banded.write.mode("append").parquet(f"{path}/postings")
        bsh.write.mode("append").parquet(f"{path}/shingles")
        new_sizes = banded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("bucket_size")
        )
        merged = (
            spark.read.parquet(f"{path}/sizes")
            .unionByName(new_sizes)
            .groupBy("band", "band_hash")
            .agg(F.sum("bucket_size").cast("long").alias("bucket_size"))
        )
        # write-new-then-swap, NEVER overwrite-in-place (the merge
        # plan reads the very files an in-place overwrite would
        # truncate) and never a driver collect (the sizes relation is
        # bucket-count-sized — corpus-scaled at 100 TB)
        import shutil

        merged.write.mode("overwrite").parquet(f"{path}/sizes__new")
        shutil.rmtree(f"{path}/sizes")
        shutil.move(f"{path}/sizes__new", f"{path}/sizes")
        banded.unpersist()
        # Spark's session-shared file-status cache still lists the
        # pre-append files (and misses the appended ones) — without
        # the refresh, the next probe reads a stale listing and dies
        # on FILE_NOT_EXIST for the swapped sizes relation
        for rel in ("postings", "shingles", "sizes"):
            spark.catalog.refreshByPath(f"{path}/{rel}")
    finally:
        bsh.unpersist()


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
    sizes = spark.read.parquet(f"{path}/sizes").filter(
        F.col("bucket_size") <= F.lit(max_bucket_size)
    )
    postings = spark.read.parquet(f"{path}/postings").join(
        sizes.select("band", "band_hash"), ["band", "band_hash"]
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
