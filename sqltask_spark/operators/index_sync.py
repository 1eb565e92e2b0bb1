"""Index ↔ table synchronization from the change feed.

The integration piece between the two storage primitives: a corpus
lives in a versioned MERGE parquet table
(:mod:`sqltask_spark.operators.merge` — upserts, deletes, change
feed) and is SERVED through the persistent MinHash index
(:mod:`sqltask_spark.operators.dedup_index`). Without this operator
a user must re-derive index mutations by hand; with it, the index is
a materialized view maintained INCREMENTALLY from `table_changes` —
work bounded by what the merges touched, never the corpus.

Update handling is where the LSM id-reuse hazard lives: an updated
document keeps its id, but a tombstoned id is deliberately
unavailable to `append_to_minhash_index` until compaction (its own
tombstone would kill the re-admission). So the sync applies, in
order: (1) tombstone deleted AND updated ids, (2) append pure
inserts, (3) if any updates exist, compact (frees the ids,
physically drops the stale postings) and append the post-images.
Every step is the existing idempotent/crash-atomic mutation, so a
crashed sync re-runs to the same state; the compaction step is the
one full-index cost and is paid only on update-carrying syncs — the
same amortization decision LSM engines make for in-place rewrites.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def sync_minhash_index_with_table(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    id_col: str,
    text_col: str,
    from_seq: int,
    to_seq: int | None = None,
) -> dict:
    """Apply the table's row-level changes in ``(from_seq, to_seq]``
    to the index. Returns counts per action. After the sync, probing
    the index is equivalent to probing a fresh build over the
    table's current state (pytest-pinned).

    Re-running the same window CONVERGES but is not a strict no-op:
    deletes and inserts no-op outright (idempotent mutations), while
    an update is re-applied — its current version tombstoned and the
    identical post-image re-appended — landing on the same state.
    Track the last-synced ``to_seq`` externally (e.g. the manifest
    ``batches`` ledger of a driving table) to avoid paying the
    re-apply compaction on retries.
    """
    from sqltask_spark.operators.dedup_index import (
        append_to_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
    )
    from sqltask_spark.operators.merge import table_changes

    changes = table_changes(
        spark, table_path, [id_col], from_seq, to_seq
    ).persist()
    try:
        gone = changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        n_tombstoned = delete_from_minhash_index(
            index_path, gone, id_col
        )
        inserts = changes.filter(
            F.col("_change_type") == "insert"
        ).select(id_col, text_col)
        n_inserted = append_to_minhash_index(
            index_path, inserts, id_col, text_col
        )
        updates = changes.filter(
            F.col("_change_type") == "update_postimage"
        ).select(id_col, text_col)
        n_updated = 0
        if updates.limit(1).count():
            # free the tombstoned ids so the post-images can re-enter
            # (the documented LSM id-reuse rule)
            compact_minhash_index(spark, index_path)
            n_updated = append_to_minhash_index(
                index_path, updates, id_col, text_col
            )
        return {
            "tombstoned": n_tombstoned,
            "inserted": n_inserted,
            "updated": n_updated,
            "compacted": bool(n_updated),
        }
    finally:
        changes.unpersist()


def sync_ivf_index_with_table(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    id_col: str,
    vec_col: str,
    from_seq: int,
    to_seq: int | None = None,
) -> dict:
    """The vector symmetry: apply an embeddings table's change feed
    to the persistent IVF index — deletes tombstone, inserts append
    under the FROZEN quantizer, updates tombstone + compact +
    re-append (the same LSM id-reuse rule as the MinHash sync).
    Distribution drift introduced by the synced batches is the
    monitored quantity, not this operator's job — run
    :func:`~sqltask_spark.operators.index_maintenance.
    rebuild_ivf_on_drift` on its own cadence. Re-running a window
    converges (updates re-applied, same state)."""
    from sqltask_spark.operators.ann_index import (
        append_to_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
    )
    from sqltask_spark.operators.merge import table_changes

    changes = table_changes(
        spark, table_path, [id_col], from_seq, to_seq
    ).persist()
    try:
        gone = changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        n_tombstoned = delete_from_ivf_index(index_path, gone, id_col)
        inserts = changes.filter(
            F.col("_change_type") == "insert"
        ).select(id_col, vec_col)
        n_inserted = append_to_ivf_index(
            index_path, inserts, id_col, vec_col
        )
        updates = changes.filter(
            F.col("_change_type") == "update_postimage"
        ).select(id_col, vec_col)
        n_updated = 0
        if updates.limit(1).count():
            compact_ivf_index(spark, index_path)
            n_updated = append_to_ivf_index(
                index_path, updates, id_col, vec_col
            )
        return {
            "tombstoned": n_tombstoned,
            "inserted": n_inserted,
            "updated": n_updated,
            "compacted": bool(n_updated),
        }
    finally:
        changes.unpersist()
