"""Z-order layout: Morton math and real row-group skipping gains."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqltask_spark.data import load_table
from sqltask_spark.operators.layout import (
    morton_interleave,
    rowgroup_spans,
    skipped_fraction,
    zorder_write,
)


def _py_morton(vals, bits):
    z = 0
    k = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + (k - 1 - j))
    return z


def test_morton_interleave_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (7, 7), (1, 6), (255, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r.z
        for r in df.select(
            morton_interleave([F.col("a"), F.col("b")], 8).alias("z")
        ).collect()
    ]
    assert got == [_py_morton(v, 8) for v in rows]


def test_morton_preserves_locality_ordering(spark):
    # points in the same quadrant must sort together: z-values of the
    # low-low quadrant all precede any high-high point
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_interleave([F.col("a"), F.col("b")], 3).alias("z")
        ).collect()
    }
    low = max(z[(x, y)] for x in range(4) for y in range(4))
    high = min(z[(x, y)] for x in range(4, 8) for y in range(4, 8))
    assert low < high


def test_zorder_write_improves_multi_dim_skipping(spark, sf_dir, tmp_path):
    """The figure of merit: for a box predicate on BOTH layout
    columns, the z-ordered table's row-group stats let a reader skip
    a large fraction of rows; a round-robin layout skips ~nothing."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    ev.repartition(16).write.parquet(plain)
    zorder_write(ev, zord, by=["user_id", "event_id"], n_files=16)

    # same rows either way
    assert (
        spark.read.parquet(zord).count()
        == spark.read.parquet(plain).count()
    )

    cols = ["user_id", "event_id"]
    sp_plain = rowgroup_spans(plain, cols)
    sp_zord = rowgroup_spans(zord, cols)

    lo_u, hi_u = 5, 7        # ~20% of user_id 0..14
    lo_e, hi_e = 100, 299    # ~20% of event_id 0..999
    plain_u = skipped_fraction(sp_plain["user_id"], lo_u, hi_u)
    plain_e = skipped_fraction(sp_plain["event_id"], lo_e, hi_e)
    z_u = skipped_fraction(sp_zord["user_id"], lo_u, hi_u)
    z_e = skipped_fraction(sp_zord["event_id"], lo_e, hi_e)

    # round-robin files span the whole domain → no skipping at all
    assert plain_u == 0.0 and plain_e == 0.0
    # z-order clusters BOTH dimensions at once — that's the point
    # (a single-column sort would max out one and zero the other)
    assert z_u > 0.3 and z_e > 0.3

    # and the result of a filtered read is identical
    pred = (
        (F.col("user_id").between(lo_u, hi_u))
        & (F.col("event_id").between(lo_e, hi_e))
    )
    want = sorted(
        r.event_id for r in ev.filter(pred).select("event_id").collect()
    )
    got = sorted(
        r.event_id
        for r in spark.read.parquet(zord)
        .filter(pred)
        .select("event_id")
        .collect()
    )
    assert got == want


def test_rowgroup_spans_empty_parts_and_missing_stats(tmp_path):
    """Zero-row part files (repartitionByRange can emit empty
    partitions) and stat-less row groups must not crash the span
    census; missing stats count as unskippable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sqltask_spark.operators.layout import (
        rowgroup_spans,
        skipped_fraction,
    )

    d = str(tmp_path / "parts")
    import os
    os.makedirs(d)
    pq.write_table(
        pa.table({"x": pa.array([], type=pa.int64())}),
        os.path.join(d, "empty.parquet"),
    )
    pq.write_table(pa.table({"x": [1, 2, 3]}), os.path.join(d, "full.parquet"))
    spans = rowgroup_spans(d, ["x"])["x"]
    assert (1, 3, 3) in spans
    # a predicate far outside [1,3] skips the full group; the
    # stat-less/empty groups contribute no rows either way
    frac = skipped_fraction(spans, 10, 20)
    assert frac == 1.0
    # explicit missing-stats group: always touched
    assert skipped_fraction([(None, None, 5), (1, 3, 5)], 10, 20) == 0.5
