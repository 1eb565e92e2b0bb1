"""Versioned-manifest plumbing shared by the persistent indexes.

No reference counterpart (north-star extension; the reference,
``/root/reference/sqltask``, has no index artifacts at all). Both
persistent indexes (:mod:`sqltask_spark.operators.dedup_index`,
:mod:`sqltask_spark.operators.ann_index`) follow the same commit
protocol, the one Delta/Iceberg-style table formats use for exactly
this problem:

- every mutation writes ONLY NEW files (a fresh ``gen=g%06d``
  generation directory; for relations that must be rewritten whole,
  a fresh versioned directory) — nothing a committed reader can see
  is ever modified or truncated in place;
- the mutation becomes visible by writing the next numbered manifest
  (``manifests/manifest-%012d.json``) listing exactly the committed
  generation set. Readers take the NEWEST PARSEABLE manifest, so a
  crash at any point before the manifest lands leaves the index
  serving the pre-append state bit-for-bit, and a torn manifest file
  (partial write) is skipped in favor of its predecessor;
- orphan data directories (written by a crashed append, never named
  by the newest manifest) are detectable mechanically and swept by
  the next writer before it starts.

All filesystem access goes through the Hadoop ``FileSystem`` API of
the live SparkSession — NOT ``os``/``shutil`` — so the identical code
path serves ``file:``, ``hdfs:``, and object stores. Manifests are
created with ``overwrite=False``: on HDFS/posix, two racing writers
cannot both win the same sequence number (create-exclusive), which
turns the documented single-writer contract into a loud error instead
of silent corruption. (On S3 create-exclusivity is weaker; a
production deployment there would layer a conditional-PUT or a lock,
exactly as the table formats do.)
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

MANIFEST_DIR = "manifests"
_MANIFEST_FMT = "manifest-%012d.json"


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop
    conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.delete(p, True)


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names under ``path`` (empty when absent)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(s.getPath().getName() for s in fs.listStatus(p))


def _read_manifest_file(spark: SparkSession, full: str) -> dict | None:
    """Parse one manifest file; ``None`` when torn/unparseable."""
    fs, jp = _fs(spark, full)
    jvm = spark._jvm
    stream = fs.open(jp)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    try:
        data = json.loads(text)
    except ValueError:
        return None
    return data if isinstance(data, dict) else None


def list_manifest_seqs(spark: SparkSession, path: str) -> list[int]:
    """Committed manifest sequence numbers under ``path``, ascending
    (torn files included — they are filtered at read time)."""
    return sorted(
        int(n[len("manifest-"):-len(".json")])
        for n in list_names(spark, f"{path}/{MANIFEST_DIR}")
        if n.startswith("manifest-") and n.endswith(".json")
    )


def read_manifest_at(
    spark: SparkSession, path: str, seq: int
) -> dict | None:
    """The manifest with exactly sequence ``seq`` (time-travel read),
    or ``None`` when absent or torn. Unlike :func:`read_manifest`
    there is no fallback — a travel request names ONE version."""
    full = f"{path}/{MANIFEST_DIR}/{_MANIFEST_FMT % seq}"
    if not path_exists(spark, full):
        return None
    data = _read_manifest_file(spark, full)
    if data is not None:
        data["_seq"] = seq
    return data


def read_all_manifests(spark: SparkSession, path: str) -> list[dict]:
    """Every parseable manifest under ``path``, ascending by seq —
    the union of their file references is what a vacuum/orphan sweep
    must treat as live when older versions stay readable."""
    out = []
    for seq in list_manifest_seqs(spark, path):
        data = read_manifest_at(spark, path, seq)
        if data is not None:
            out.append(data)
    return out


def live_union(spark: SparkSession, path: str, key: str) -> set[str]:
    """Union of manifest field ``key`` (a name or list of names)
    over ALL parseable manifests — the set a writer's orphan sweep
    must treat as committed when older versions stay time-travel
    readable. Names referenced only by pre-compaction manifests may
    already be gone from disk; a sweep against this set simply never
    resurrects or deletes them."""
    out: set[str] = set()
    for m in read_all_manifests(spark, path):
        v = m.get(key, [])
        out |= {v} if isinstance(v, str) else set(v)
    return out


def read_manifest(spark: SparkSession, path: str) -> dict | None:
    """Newest parseable manifest under ``path``, or ``None``.

    A partially written newest file (torn by a crash mid-create) is
    skipped — its predecessor still describes a complete, committed
    index state. The manifest's own sequence number rides along as
    ``_seq`` for the next :func:`commit_manifest`.
    """
    for seq in reversed(list_manifest_seqs(spark, path)):
        data = read_manifest_at(spark, path, seq)
        if data is not None:
            return data  # torn write — fall back to the predecessor
    return None


def commit_manifest(
    spark: SparkSession, path: str, data: dict, prev_seq: int
) -> None:
    """Atomically publish ``data`` as manifest ``prev_seq + 1``.

    ``overwrite=False`` makes the sequence number a create-exclusive
    claim: a second writer racing for the same slot errors instead of
    clobbering (single-writer is the documented contract; this makes
    violating it loud).
    """
    payload = dict(data)
    payload.pop("_seq", None)
    fs, _ = _fs(spark, path)
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{MANIFEST_DIR}/{_MANIFEST_FMT % (prev_seq + 1)}"
    )
    out = fs.create(jp, False)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def next_gen(manifest: dict | None) -> str:
    """Next generation name after the committed ones (``g%06d``)."""
    gens = (manifest or {}).get("generations", [])
    if not gens:
        return "g%06d" % 0
    return "g%06d" % (1 + max(int(g[1:]) for g in gens))


def fresh_gen(
    spark: SparkSession, parents: list[str], manifest: dict | None
) -> str:
    """Generation name unused by the committed manifest AND by any
    directory on disk under ``parents`` — so an atomic REBUILD of an
    existing index writes only new files (a committed reader keeps
    scanning the old generation untouched until the new manifest
    lands) instead of overwriting in place."""
    import re

    nums = [-1]
    for g in (manifest or {}).get("generations", []):
        nums.append(int(g[1:]))
    for parent in parents:
        for n in list_names(spark, parent):
            mm = re.search(r"g(\d{6})$", n)
            if mm:
                nums.append(int(mm.group(1)))
    return "g%06d" % (1 + max(nums))


def drop_manifests(
    spark: SparkSession, path: str, keep_versions: int
) -> list[int]:
    """Delete all but the newest ``keep_versions`` manifest files —
    the retention step every vacuum starts with. Returns the dropped
    sequence numbers. Time travel to a dropped version errors loudly
    afterwards (the standard retention trade, exactly as the table
    formats define it). Writer-context only, like every mutation."""
    if keep_versions < 1:
        raise ValueError(
            f"keep_versions must be >= 1, got {keep_versions}"
        )
    seqs = list_manifest_seqs(spark, path)
    drop = seqs[:-keep_versions] if len(seqs) > keep_versions else []
    for seq in drop:
        delete_path(
            spark, f"{path}/{MANIFEST_DIR}/{_MANIFEST_FMT % seq}"
        )
    return drop


def id_bounds(df, id_col: str) -> dict | None:
    """``{"min_id", "max_id"}`` of ``df[id_col]`` for the manifest's
    per-generation statistics, or ``None`` when the id type is not
    JSON-stable-orderable (only int and str are: their Python
    comparison matches Spark's — numeric order for ints, and UTF-8
    binary order for strings, which equals code-point order). One
    column-pruned aggregate over data the caller is writing anyway.

    The stats serve GENERATION PRUNING for targeted rewrites
    (:func:`~sqltask_spark.operators.dedup_index.unblock_minhash_ids`)
    — a conservative superset range is always valid, so rewrites keep
    a generation's old bounds rather than re-measuring."""
    from pyspark.sql import functions as F

    r = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    lo, hi = r["lo"], r["hi"]
    if isinstance(lo, bool) or not isinstance(lo, (int, str)):
        return None
    return {"min_id": lo, "max_id": hi}


def count_and_bounds(df, id_col: str) -> "tuple[int, dict | None]":
    """``(row_count, id_bounds)`` in ONE aggregate action — the
    append paths already pay a count job on the batch, so the
    generation stats ride along for free instead of adding a second
    job per mutation."""
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ).collect()[0]
    lo, hi = r["lo"], r["hi"]
    if isinstance(lo, bool) or not isinstance(lo, (int, str)):
        return int(r["n"]), None
    return int(r["n"]), {"min_id": lo, "max_id": hi}


def bounds_disjoint(stats: dict | None, bounds: dict | None) -> bool:
    """True iff the two [min,max] id ranges PROVABLY do not overlap —
    the only case generation pruning may skip a physical check.
    Missing stats or mismatched types (an index whose id column
    changed representation) are never provable → False."""
    if not stats or not bounds:
        return False
    a_lo, a_hi = stats["min_id"], stats["max_id"]
    b_lo, b_hi = bounds["min_id"], bounds["max_id"]
    if {type(a_lo), type(b_lo)} not in ({int}, {str}):
        return False
    return a_hi < b_lo or a_lo > b_hi


def sweep_orphans(
    spark: SparkSession, parent: str, committed: set[str], prefix: str
) -> list[str]:
    """Delete child dirs of ``parent`` matching ``prefix`` that no
    committed manifest names — the debris of a crashed append. Returns
    the swept names. Safe under the single-writer contract (only the
    next WRITER sweeps, never a reader)."""
    swept = []
    for name in list_names(spark, parent):
        if name.startswith(prefix) and name not in committed:
            delete_path(spark, f"{parent}/{name}")
            swept.append(name)
    return swept
