"""MERGE INTO parquet tables: copy-on-write upserts, batch-ledger
idempotency, crash atomicity, time travel, compaction, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqltask_spark.operators import index_fs
from sqltask_spark.operators.merge import (
    compact_parquet_table,
    create_parquet_table,
    merge_into_parquet,
    read_parquet_table,
    table_history,
    vacuum_parquet_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_table(spark, path, n=10, parts=1):
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    if parts > 1:
        df = df.repartitionByRange(parts, "k")
    create_parquet_table(df, path)
    return df


def test_merge_counts_and_final_state(spark, tmp_path):
    path = str(tmp_path / "t1")
    _mk_table(spark, path, n=10)
    # update k=1,2; delete k=3; insert k=11; no-op delete of k=99
    src = spark.createDataFrame(
        [
            (1, 111, False),
            (2, 222, False),
            (3, 0, True),
            (11, 1100, False),
            (99, 0, True),
        ],
        "k long, v long, is_del boolean",
    )
    got = merge_into_parquet(
        spark, path, src, ["k"], batch_id="b1", delete_col="is_del"
    )
    assert got["updated"] == 2
    assert got["deleted"] == 1
    assert got["inserted"] == 1
    assert got["noop_deletes"] == 1
    assert got["skipped"] is False
    want = {(1, 111), (2, 222), (11, 1100)} | {
        (k, k * 10) for k in range(4, 11)
    }
    assert set(_rows(read_parquet_table(spark, path))) == want


def test_merge_retried_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "t2")
    _mk_table(spark, path, n=5)
    src = spark.createDataFrame([(1, 111)], "k long, v long")
    merge_into_parquet(spark, path, src, ["k"], batch_id="batch-7")
    before = _rows(read_parquet_table(spark, path))
    seq_before = index_fs.read_manifest(spark, path)["_seq"]
    again = merge_into_parquet(
        spark, path, src, ["k"], batch_id="batch-7"
    )
    assert again["skipped"] is True
    assert _rows(read_parquet_table(spark, path)) == before
    assert index_fs.read_manifest(spark, path)["_seq"] == seq_before


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    path = str(tmp_path / "t3")
    _mk_table(spark, path, n=100, parts=8)
    m0 = index_fs.read_manifest(spark, path)
    # keys 1..3 live in the low range partition(s) only
    src = spark.createDataFrame(
        [(1, -1), (2, -2), (3, -3)], "k long, v long"
    )
    got = merge_into_parquet(spark, path, src, ["k"])
    assert 0 < got["rewritten_files"] < len(m0["files"])
    m1 = index_fs.read_manifest(spark, path)
    carried = set(m0["files"]) & set(m1["files"])
    assert len(carried) == len(m0["files"]) - got["rewritten_files"]
    want = {(k, -k) for k in (1, 2, 3)} | {
        (k, k * 10) for k in range(4, 101)
    }
    assert set(_rows(read_parquet_table(spark, path))) == want


def test_merge_crash_before_commit_leaves_old_state(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t4")
    _mk_table(spark, path, n=6)
    before = _rows(read_parquet_table(spark, path))
    src = spark.createDataFrame([(1, 999), (77, 770)], "k long, v long")

    real = index_fs.commit_manifest

    def crash(*a, **kw):
        raise RuntimeError("injected crash at the commit point")

    monkeypatch.setattr(index_fs, "commit_manifest", crash)
    with pytest.raises(RuntimeError):
        merge_into_parquet(spark, path, src, ["k"], batch_id="bX")
    monkeypatch.setattr(index_fs, "commit_manifest", real)
    # readers still serve the pre-merge state bit-for-bit
    assert _rows(read_parquet_table(spark, path)) == before
    # re-running the merge heals and sweeps the crashed generation
    got = merge_into_parquet(spark, path, src, ["k"], batch_id="bX")
    assert got["skipped"] is False and got["inserted"] == 1
    live = {
        rel.split("/", 1)[0]
        for m in index_fs.read_all_manifests(spark, path)
        for rel in m["files"]
    }
    on_disk = set(index_fs.list_names(spark, f"{path}/data"))
    assert on_disk == live


def test_time_travel_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t5")
    _mk_table(spark, path, n=4)
    v0 = _rows(read_parquet_table(spark, path))
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, 111)], "k long, v long"),
        ["k"],
    )
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(9, 90)], "k long, v long"),
        ["k"],
    )
    assert _rows(read_parquet_table(spark, path, as_of=0)) == v0
    assert (1, 111) in _rows(read_parquet_table(spark, path, as_of=1))
    assert [h["seq"] for h in table_history(spark, path)] == [0, 1, 2]
    got = vacuum_parquet_table(spark, path, keep_versions=1)
    assert got["dropped_versions"] == [0, 1]
    with pytest.raises(ValueError, match="vacuumed"):
        read_parquet_table(spark, path, as_of=0)
    # newest state intact after the reclaim
    cur = _rows(read_parquet_table(spark, path))
    assert (9, 90) in cur and (1, 111) in cur


def test_compaction_is_row_identical(spark, tmp_path):
    path = str(tmp_path / "t6")
    _mk_table(spark, path, n=50, parts=8)
    for i in range(3):
        merge_into_parquet(
            spark,
            path,
            spark.createDataFrame([(200 + i, i)], "k long, v long"),
            ["k"],
        )
    before = _rows(read_parquet_table(spark, path))
    n_before = len(index_fs.read_manifest(spark, path)["files"])
    compact_parquet_table(spark, path)
    assert _rows(read_parquet_table(spark, path)) == before
    assert len(index_fs.read_manifest(spark, path)["files"]) <= n_before
    vacuum_parquet_table(spark, path, keep_versions=1)
    assert _rows(read_parquet_table(spark, path)) == before


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    path = str(tmp_path / "t7")
    _mk_table(spark, path, n=3)
    src = spark.createDataFrame(
        [(1, 10), (1, 20)], "k long, v long"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into_parquet(spark, path, src, ["k"])


def test_merge_rejects_mistyped_source_column(spark, tmp_path):
    """Name-matching columns with the WRONG type must fail before any
    write: unionByName would widen int→long and publish a generation
    whose parquet physical types conflict with the manifest schema —
    committed but unreadable. Nullability alone must NOT trip it."""
    path = str(tmp_path / "t_typed")
    _mk_table(spark, path, n=3)
    src = spark.createDataFrame([(1, 111)], "k long, v int")
    with pytest.raises(ValueError, match="types do not match"):
        merge_into_parquet(spark, path, src, ["k"])
    # same types, different nullability: fine
    ok = spark.createDataFrame([(1, 111)], "k long, v long")
    merge_into_parquet(spark, path, ok, ["k"])
    assert (1, 111) in _rows(read_parquet_table(spark, path))


def test_create_table_rejects_duplicate_stats_key(spark, tmp_path):
    """A declared stats/merge key must be unique in the seed — MERGE
    validates sources but never re-validates the table, and the
    change feed + file pruning assume one row per key."""
    path = str(tmp_path / "t_dupseed")
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k long, v long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        create_parquet_table(df, path, stats_col="k")
    # without a declared key the seed is accepted as-is
    create_parquet_table(df, str(tmp_path / "t_dupseed2"))


def test_maintain_parquet_table_policy(spark, tmp_path):
    """Small-files maintenance: merges fragment the table one file
    per touched generation; over the file-count threshold (and under
    the mean-size floor) maintain compacts row-identically and can
    vacuum history. Few-large-files tables are left alone."""
    from sqltask_spark.operators.index_maintenance import (
        maintain_parquet_table,
        parquet_table_health,
    )

    path = str(tmp_path / "t_maint")
    _mk_table(spark, path, n=8)
    for i in range(4):
        merge_into_parquet(
            spark,
            path,
            spark.createDataFrame(
                [(100 + i, i)], "k long, v long"
            ),
            ["k"],
        )
    h = parquet_table_health(spark, path)
    assert h["n_files"] >= 5 and h["n_versions"] == 5
    want = _rows(read_parquet_table(spark, path))
    # healthy-by-count: untouched
    r = maintain_parquet_table(spark, path, max_files=64)
    assert r["compacted"] is False
    # over the count threshold with tiny files: compact + vacuum
    r = maintain_parquet_table(
        spark, path, max_files=2, vacuum_keep_versions=1
    )
    assert r["compacted"] is True
    assert _rows(read_parquet_table(spark, path)) == want
    h2 = parquet_table_health(spark, path)
    assert h2["n_files"] < h["n_files"] and h2["n_versions"] == 1
    # large-mean-size guard: many files but big ones → no rewrite
    r = maintain_parquet_table(
        spark, path, max_files=0, min_mean_file_bytes=1
    )
    assert r["compacted"] is False


def test_merge_to_empty_and_back(spark, tmp_path):
    """Deleting every row commits an empty-file-list version that
    still reads (schema from the manifest), and a later merge
    repopulates it."""
    path = str(tmp_path / "t8")
    _mk_table(spark, path, n=2)
    wipe = spark.createDataFrame(
        [(1, 0, True), (2, 0, True)], "k long, v long, is_del boolean"
    )
    got = merge_into_parquet(
        spark, path, wipe, ["k"], delete_col="is_del"
    )
    assert got["deleted"] == 2
    empty = read_parquet_table(spark, path)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "v"]
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(5, 50)], "k long, v long"),
        ["k"],
    )
    assert _rows(read_parquet_table(spark, path)) == [(5, 50)]


def test_merge_stats_skipping_prunes_unread_files(spark, tmp_path):
    """Manifest-level data skipping: with per-file [min, max] key
    stats on a range-clustered table, a merge touching only low keys
    excludes the high-key files from the matched-file search WITHOUT
    reading them, results stay identical to the stat-less path, and
    stats follow the data through merges and compaction."""
    path = str(tmp_path / "t9")
    df = spark.range(1, 1001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).repartitionByRange(8, "k")
    create_parquet_table(df, path, stats_col="k")
    m0 = index_fs.read_manifest(spark, path)
    assert m0["stats_col"] == "k"
    assert set(m0["stats"]) == set(m0["files"])

    src = spark.createDataFrame(
        [(1, -1), (2, -2), (3, -3)], "k long, v long"
    )
    got = merge_into_parquet(spark, path, src, ["k"])
    # 8 range files; keys 1-3 live in one -> most were never scanned
    assert got["stats_pruned_files"] >= 6
    assert got["rewritten_files"] == 1
    assert got["updated"] == 3
    want = {(k, -k) for k in (1, 2, 3)} | {
        (k, k * 10) for k in range(4, 1001)
    }
    assert set(_rows(read_parquet_table(spark, path))) == want

    # a later merge at the HIGH end prunes the other side, and the
    # new generation written above carries its own stats
    m1 = index_fs.read_manifest(spark, path)
    assert set(m1["stats"]) == set(m1["files"])
    got2 = merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(999, 0)], "k long, v long"),
        ["k"],
    )
    assert got2["stats_pruned_files"] >= 6
    assert got2["updated"] == 1

    # compaction recomputes stats over the fresh generation
    compact_parquet_table(spark, path)
    m2 = index_fs.read_manifest(spark, path)
    assert set(m2["stats"]) == set(m2["files"]) and m2["files"]
    final = {(k, -k) for k in (1, 2, 3)} | {(999, 0)} | {
        (k, k * 10) for k in range(4, 1001) if k != 999
    }
    assert set(_rows(read_parquet_table(spark, path))) == final


def test_merge_without_stats_never_prunes(spark, tmp_path):
    path = str(tmp_path / "t10")
    _mk_table(spark, path, n=20, parts=4)
    got = merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, -1)], "k long, v long"),
        ["k"],
    )
    assert got["stats_pruned_files"] == 0
    assert got["updated"] == 1


def test_table_changes_row_level_feed(spark, tmp_path):
    """Change feed between versions reads only the file-level
    manifest diff and classifies exactly the touched rows: an
    update emits pre+post images, a delete the pre-image, an insert
    the post-image — and survivor rows that merely moved files
    during the rewrite do NOT appear."""
    from sqltask_spark.operators.merge import table_changes

    path = str(tmp_path / "cdf")
    _mk_table(spark, path, n=10, parts=2)  # keys 1-10, two files
    src = spark.createDataFrame(
        [(1, 111, False), (3, 0, True), (11, 1100, False)],
        "k long, v long, is_del boolean",
    )
    merge_into_parquet(
        spark, path, src, ["k"], delete_col="is_del"
    )
    got = {
        (r["_change_type"], r["k"]): r["v"]
        for r in table_changes(spark, path, ["k"], 0, 1).collect()
    }
    assert got == {
        ("update_preimage", 1): 10,
        ("update_postimage", 1): 111,
        ("delete", 3): 30,
        ("insert", 11): 1100,
    }
    # compaction rewrites every file but changes no rows: the feed
    # across it is empty
    compact_parquet_table(spark, path)
    assert table_changes(spark, path, ["k"], 1, 2).count() == 0
    # spanning multiple versions composes the net effect vs v0
    net = {
        (r["_change_type"], r["k"])
        for r in table_changes(spark, path, ["k"], 0).collect()
    }
    assert ("insert", 11) in net and ("delete", 3) in net


def test_table_changes_vacuumed_version_errors(spark, tmp_path):
    from sqltask_spark.operators.merge import table_changes

    path = str(tmp_path / "cdf2")
    _mk_table(spark, path, n=3)
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, -1)], "k long, v long"),
        ["k"],
    )
    vacuum_parquet_table(spark, path, keep_versions=1)
    with pytest.raises(ValueError, match="does not exist"):
        table_changes(spark, path, ["k"], 0, 1)


def test_add_table_column_schema_evolution(spark, tmp_path):
    """Add-column evolution: no data file is touched, existing rows
    read NULL for the new column, a later merge writes real values
    for the rows it rewrites, and time travel to the pre-evolution
    version still serves the old schema."""
    from sqltask_spark.operators.merge import add_table_column

    path = str(tmp_path / "evo")
    _mk_table(spark, path, n=4)
    files_before = index_fs.read_manifest(spark, path)["files"]
    add_table_column(spark, path, "tag", "string")
    m = index_fs.read_manifest(spark, path)
    assert m["files"] == files_before  # metadata-only commit
    cur = read_parquet_table(spark, path)
    assert [f.name for f in cur.schema.fields] == ["k", "v", "tag"]
    assert all(r["tag"] is None for r in cur.collect())
    # a merge now carries the new column
    src = spark.createDataFrame(
        [(1, 111, "fresh"), (9, 90, "new")], "k long, v long, tag string"
    )
    merge_into_parquet(spark, path, src, ["k"])
    got = {r["k"]: r["tag"] for r in read_parquet_table(
        spark, path
    ).collect()}
    assert got[1] == "fresh" and got[9] == "new" and got[2] is None
    # pre-evolution version: old two-column schema
    v0 = read_parquet_table(spark, path, as_of=0)
    assert [f.name for f in v0.schema.fields] == ["k", "v"]
    # duplicate add errors
    with pytest.raises(ValueError, match="already exists"):
        add_table_column(spark, path, "tag", "string")


def test_merge_filter_skipping_hashed_keys(spark, tmp_path):
    """r12: per-file key Bloom filters (third stats element) prune
    the matched-file search by CONTENT. On a hash-partitioned table
    every file's [min, max] spans the key space, so range skipping
    proves nothing — yet a 3-key merge must not read the other
    files. Pinned the strong way: the files the filter prunes are
    physically DELETED before the merge, and the merge still
    succeeds with exact counts."""
    import os

    path = str(tmp_path / "t_bloom")
    df = spark.range(1, 1001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).repartition(8, "k")  # hash layout: interleaved keys per file
    create_parquet_table(df, path, stats_col="k")
    m0 = index_fs.read_manifest(spark, path)
    assert len(m0["files"]) == 8
    ents = m0["stats"]
    assert all(len(ents[rel]) == 3 for rel in m0["files"])
    # ranges all overlap — range pruning alone is useless here
    los = [ents[rel][0] for rel in m0["files"]]
    his = [ents[rel][1] for rel in m0["files"]]
    assert max(los) < min(his)

    # three keys that live in ONE file (hash co-location via lookup)
    by_file = {
        r["f"]: r["ks"]
        for r in spark.read.parquet(f"{path}/data/{m0['files'][0].split('/')[0]}")
        .select(
            F.col("_metadata.file_path").alias("f"),
            F.col("k").alias("ks"),
        )
        .groupBy("f")
        .agg(F.collect_list("ks").alias("ks"))
        .withColumnRenamed("ks", "ks")
        .collect()
    }
    home_file, keys = next(iter(by_file.items()))
    keys = sorted(keys)[:3]
    src = spark.createDataFrame(
        [(int(k), -int(k)) for k in keys], "k long, v long"
    )

    # compute EXACTLY the files the filter proves key-free, and
    # delete them — the merge must never open one
    probe_pos = index_fs.filter_probe_positions(
        src.select("k"), "k"
    )
    prunable = [
        rel
        for rel in m0["files"]
        if index_fs.generation_prunable(
            {
                "min_id": ents[rel][0],
                "max_id": ents[rel][1],
                "filter": {
                    "k": index_fs.ID_FILTER_K,
                    "bits": index_fs.ID_FILTER_WORDS * 64,
                    "words": ents[rel][2],
                },
            },
            None,
            probe_pos,
        )
    ]
    # content pruning does real work on the hashed layout (>= 5 of
    # 8 files provably key-free; range pruning would keep all 8)
    assert len(prunable) >= 5
    assert not any(home_file.endswith("/" + rel) for rel in prunable)
    for rel in prunable:
        os.remove(f"{path}/data/{rel}")

    got = merge_into_parquet(spark, path, src, ["k"])
    assert got["stats_pruned_files"] == len(prunable)
    assert got["updated"] == 3 and got["inserted"] == 0

    # old-format (2-element) stats entries stay readable: on a FRESH
    # hashed table, strip the filters from the committed manifest and
    # merge — range pruning proves nothing on this layout, so zero
    # files prune, but correctness is intact
    path2 = str(tmp_path / "t_bloom_old")
    create_parquet_table(
        spark.range(1, 101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).repartition(4, "k"),
        path2, stats_col="k",
    )
    m1 = index_fs.read_manifest(spark, path2)
    stripped = {rel: e[:2] for rel, e in m1["stats"].items()}
    index_fs.commit_manifest(
        spark, path2,
        {**{kk: vv for kk, vv in m1.items() if kk != "_seq"},
         "stats": stripped},
        m1["_seq"],
    )
    got2 = merge_into_parquet(
        spark, path2,
        spark.createDataFrame([(50, 77)], "k long, v long"),
        ["k"],
    )
    assert got2["updated"] == 1
    assert (50, 77) in set(_rows(read_parquet_table(spark, path2)))


def test_point_lookup_reads_only_candidate_files(spark, tmp_path):
    """read_parquet_table_keys: the serving-state primitive — a
    K-key lookup on a hashed-layout table opens only the files the
    per-file stats (range + Bloom) cannot rule out. Pinned by
    physically deleting every provably key-free file: the lookup
    still returns exactly the full-scan answer."""
    import os

    from sqltask_spark.operators.merge import read_parquet_table_keys

    path = str(tmp_path / "t_lookup")
    create_parquet_table(
        spark.range(1, 1001).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).repartition(8, "k"),
        path, stats_col="k",
    )
    m = index_fs.read_manifest(spark, path)
    keys = [17, 444, 901]
    want = {(k, k * 10) for k in keys}
    got = read_parquet_table_keys(spark, path, keys)
    assert set(_rows(got)) == want

    # delete every file the stats prove key-free; lookup unchanged
    probe_pos = index_fs.filter_probe_positions(
        spark.createDataFrame([(k,) for k in keys], "k long"), "k"
    )
    ents = m["stats"]
    prunable = [
        rel for rel in m["files"]
        if index_fs.generation_prunable(
            {"min_id": ents[rel][0], "max_id": ents[rel][1],
             "filter": {"k": index_fs.ID_FILTER_K,
                        "bits": index_fs.ID_FILTER_WORDS * 64,
                        "words": ents[rel][2]}},
            None, probe_pos,
        )
    ]
    assert prunable  # hashed layout, 3 keys → some files provably free
    for rel in prunable:
        os.remove(f"{path}/data/{rel}")
    assert set(_rows(read_parquet_table_keys(spark, path, keys))) == want
    # empty key list and absent keys behave
    assert read_parquet_table_keys(spark, path, []).count() == 0
    assert read_parquet_table_keys(spark, path, [10_000]).count() == 0
    # a stats-less table refuses loudly instead of full-scanning
    path2 = str(tmp_path / "t_lookup_nostats")
    _mk_table(spark, path2, n=5)
    with pytest.raises(ValueError, match="stats_col"):
        read_parquet_table_keys(spark, path2, [1])


def test_batch_ledger_trim_bounded_and_convergent(spark, tmp_path):
    """r12: trim_batch_ledger bounds the ledger's growth (one string
    per ingest epoch, carried in every newer manifest, parsed on
    every read). A replay younger than the kept tail still
    ledger-skips; one older than it re-applies and CONVERGES for
    MERGE (same content -> same state) — the documented
    bounded-redelivery-horizon trade."""
    from sqltask_spark.operators.index_maintenance import (
        maintain_parquet_table,
    )
    from sqltask_spark.operators.merge import trim_batch_ledger

    path = str(tmp_path / "t_ledger")
    _mk_table(spark, path, n=10)
    batches = []
    for i in range(4):
        src = spark.createDataFrame([(i + 1, 1000 + i)], "k long, v long")
        merge_into_parquet(spark, path, src, ["k"], batch_id=f"b{i}")
        batches.append((f"b{i}", src))
    r = maintain_parquet_table(spark, path, ledger_keep_batches=2)
    assert r["ledger_trimmed"] == 2
    m = index_fs.read_manifest(spark, path)
    assert m["batches"] == ["b2", "b3"]
    # below bound: no-op, no commit
    assert trim_batch_ledger(spark, path, 2) == 0
    assert index_fs.read_manifest(spark, path)["_seq"] == m["_seq"]
    state = set(_rows(read_parquet_table(spark, path)))
    # kept tail: ledger-skips
    got = merge_into_parquet(
        spark, path, batches[3][1], ["k"], batch_id="b3"
    )
    assert got["skipped"] is True
    # trimmed out: re-applies, same content -> identical state
    got = merge_into_parquet(
        spark, path, batches[0][1], ["k"], batch_id="b0"
    )
    assert got["skipped"] is False
    assert set(_rows(read_parquet_table(spark, path))) == state


def test_timestamp_as_of_read(spark, tmp_path):
    """TIMESTAMP AS OF: every manifest publish stamps _committed_at;
    a wall-clock read resolves to the newest version committed at or
    before the cutoff, errors loudly before history began, and
    refuses ambiguous double-travel arguments."""
    import time

    import pytest
    from pyspark.sql import functions as F

    from sqltask_spark.operators import index_fs
    from sqltask_spark.operators.merge import (
        create_parquet_table,
        merge_into_parquet,
        read_parquet_table,
    )

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    create_parquet_table(df1, path)
    t0 = index_fs.read_manifest(spark, path)["_committed_at"]
    time.sleep(0.05)
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    merge_into_parquet(spark, path, df2, ["id"], batch_id="b2")
    t1 = index_fs.read_manifest(spark, path)["_committed_at"]
    assert t1 >= t0

    def rows(**kw):
        return sorted(
            tuple(r)
            for r in read_parquet_table(spark, path, **kw)
            .select("id", "v").collect()
        )

    # between the two commits → version 0 state
    assert rows(as_of_ts=t0) == [(1, "a"), (2, "b")]
    # at/after the merge → merged state
    assert rows(as_of_ts=t1) == [(1, "a"), (2, "B"), (3, "c")]
    assert rows(as_of_ts=t1 + 10_000) == rows()
    # before history began → loud
    with pytest.raises(ValueError, match="committed at or before"):
        read_parquet_table(spark, path, as_of_ts=t0 - 60_000)
    with pytest.raises(ValueError, match="not both"):
        read_parquet_table(spark, path, as_of=0, as_of_ts=t0)


def test_point_lookup_timestamp_as_of(spark, tmp_path):
    """Serving-state wall-clock travel: 'what was this key's row
    yesterday' through read_parquet_table_keys(as_of_ts=...)."""
    import time

    import pytest

    from sqltask_spark.operators.merge import read_parquet_table_keys

    path = str(tmp_path / "t_keys_ts")
    create_parquet_table(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, v string"
        ),
        path, stats_col="k",
    )
    t0 = index_fs.read_manifest(spark, path)["_committed_at"]
    time.sleep(0.05)
    merge_into_parquet(
        spark, path,
        spark.createDataFrame([(2, "B2")], "k long, v string"),
        ["k"], batch_id="b2",
    )
    assert [
        tuple(r)
        for r in read_parquet_table_keys(
            spark, path, [2], as_of_ts=t0
        ).collect()
    ] == [(2, "b")]
    assert [
        tuple(r)
        for r in read_parquet_table_keys(spark, path, [2]).collect()
    ] == [(2, "B2")]
    with pytest.raises(ValueError, match="not both"):
        read_parquet_table_keys(spark, path, [2], as_of=0, as_of_ts=t0)
