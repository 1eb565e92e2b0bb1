"""Index ↔ table synchronization from the change feed.

The integration piece between the two storage primitives: a corpus
lives in a versioned MERGE parquet table
(:mod:`sqltask_spark.operators.merge` — upserts, deletes, change
feed) and is SERVED through the persistent MinHash index
(:mod:`sqltask_spark.operators.dedup_index`). Without this operator
a user must re-derive index mutations by hand; with it, the index is
a materialized view maintained INCREMENTALLY from `table_changes` —
work bounded by what the merges touched, never the corpus.

Id re-use is where the LSM hazard lives: a tombstoned id is
deliberately unavailable to the append paths until compaction (its
own tombstone would kill the re-admission) — and that covers not
just this window's updates but a LATER window re-inserting a
previously deleted key, or an id taken down directly via
``delete_from_*_index``. So the sync applies, in order:
(1) tombstone deleted AND updated ids, (2) compact IF any id about
to be (re-)admitted is blocked by a live tombstone — detected with
one skinny id-intersection probe, so pure-insert windows against a
tombstone-free (or non-overlapping) index skip the full-index cost,
(3) ONE append of inserts ∪ update post-images. Every step is the
existing idempotent/crash-atomic mutation, so a crashed sync re-runs
to the same state; compaction is the one full-index cost and is paid
only when a blocked id actually needs freeing — the same
amortization decision LSM engines make for in-place rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _blocked(incoming_ids: DataFrame, tombstones, key: str) -> bool:
    """True iff any incoming id is blocked by a live tombstone —
    one skinny semi-join + limit(1). ``key`` is the tombstone
    relation's id column; ``incoming_ids`` must carry it too."""
    if tombstones is None:
        return False
    return bool(
        incoming_ids.join(tombstones, key, "left_semi")
        .limit(1)
        .count()
    )


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
    from sqltask_spark.operators import dedup_index as di
    from sqltask_spark.operators.merge import table_changes

    changes = table_changes(
        spark, table_path, [id_col], from_seq, to_seq
    ).persist()
    try:
        gone = changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        n_tombstoned = di.delete_from_minhash_index(
            index_path, gone, id_col
        )
        # ONE append of inserts ∪ update post-images — but first free
        # any incoming id a live tombstone blocks (this window's
        # updates, a re-inserted previously-deleted key, or a direct
        # takedown); skipping the check would make the append's
        # anti-join SILENTLY drop those ids and diverge the view
        incoming = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col)
        n_updates = changes.filter(
            F.col("_change_type") == "update_postimage"
        ).limit(1).count()
        m = di._committed(spark, index_path)
        compacted = _blocked(
            incoming.select(F.col(id_col).alias("id")),
            di._read_tombstones(spark, index_path, m),
            "id",
        )
        if compacted:
            di.compact_minhash_index(spark, index_path)
        n_appended = di.append_to_minhash_index(
            index_path, incoming, id_col, text_col
        )
        return {
            "tombstoned": n_tombstoned,
            "appended": n_appended,
            "had_updates": bool(n_updates),
            "compacted": compacted,
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
    from sqltask_spark.operators import ann_index as ai
    from sqltask_spark.operators.merge import table_changes

    changes = table_changes(
        spark, table_path, [id_col], from_seq, to_seq
    ).persist()
    try:
        gone = changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        n_tombstoned = ai.delete_from_ivf_index(
            index_path, gone, id_col
        )
        incoming = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, vec_col)
        n_updates = changes.filter(
            F.col("_change_type") == "update_postimage"
        ).limit(1).count()
        m = ai._committed(spark, index_path)
        compacted = _blocked(
            incoming.select(F.col(id_col).alias("neighbor_id")),
            ai._read_tombstones(spark, index_path, m),
            "neighbor_id",
        )
        if compacted:
            ai.compact_ivf_index(spark, index_path)
        n_appended = ai.append_to_ivf_index(
            index_path, incoming, id_col, vec_col
        )
        return {
            "tombstoned": n_tombstoned,
            "appended": n_appended,
            "had_updates": bool(n_updates),
            "compacted": compacted,
        }
    finally:
        changes.unpersist()
