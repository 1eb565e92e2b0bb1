"""Z-order (Morton) data layout for multi-dimensional data skipping.

No reference counterpart (north-star extension). At 100 TB the
dominant cost of most queries is the SCAN, and parquet readers skip
row groups whose column min/max stats exclude the predicate. A table
sorted by one column skips perfectly on that column and not at all on
any other; interleaving the bits of several columns' cell ids
(Morton / Z-order) clusters the data so that EVERY interleaved column
has tight per-row-group ranges — multi-dimensional skipping from one
layout pass (the same technique Delta's OPTIMIZE ZORDER BY applies).

Pipeline: one cheap min/max aggregate per layout pass → scale each
dimension to a ``bits``-wide integer cell id → interleave bits with a
plan-time-unrolled shift/or expression (pure codegen, no UDF) →
``repartitionByRange`` on the z-value (one range shuffle; Spark
samples boundaries) → sort within partitions → write. Cost is one
shuffle of the data — the layout is paid once and amortized over
every subsequent scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell_id(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer cell in
    [0, 2^bits): floor((x - mn) / (mx - mn) * (2^bits - 1)).
    Degenerate (mn == mx) dimensions collapse to cell 0; NULLs sort
    first as cell 0."""
    span = (mx - mn).cast("double")
    scaled = F.when(
        span > 0,
        ((col.cast("double") - mn.cast("double")) / span)
        * F.lit(float((1 << bits) - 1)),
    ).otherwise(F.lit(0.0))
    return F.coalesce(
        F.floor(scaled).cast("long"), F.lit(0).cast("long")
    )


def morton_interleave(cells: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each cell id into one z-value.

    Unrolled at plan time into shift/and/or arithmetic — for k
    columns × ``bits`` bits that is k·bits constant-folded terms
    inside whole-stage codegen (k·bits ≤ ~64 keeps the z-value in a
    long and the expression tree small).
    """
    k = len(cells)
    if k * bits > 63:
        raise ValueError(
            f"{k} columns x {bits} bits exceeds a 63-bit z-value"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cells):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            # bit i of column j lands at position i*k + (k-1-j):
            # earlier columns get the more significant slot per level
            z = z.bitwiseOR(
                F.shiftleft(bit, i * k + (k - 1 - j))
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    bits: int = 16,
    n_files: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``by``.

    One min/max aggregate (broadcast as a 1-row frame), one range
    shuffle on the z-value, one within-partition sort — then the
    z-value helper column is dropped so the stored schema equals the
    input schema. ``n_files`` bounds the output file count (defaults
    to the session's shuffle parallelism); every output file's row
    groups carry tight min/max stats on ALL ``by`` columns.
    """
    spark = df.sparkSession
    if n_files is None:
        n_files = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    aggs = []
    for c in by:
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    stats = df.agg(*aggs)
    cells = [
        _cell_id(
            F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits
        )
        for c in by
    ]
    z = morton_interleave(cells, bits).alias("_zvalue")
    (
        df.crossJoin(F.broadcast(stats))
        .select(*df.columns, z)
        .repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )


def rowgroup_spans(path: str, columns: Sequence[str]):
    """Per-row-group (min, max, rows) stats from the parquet footers —
    the exact information a reader's predicate skipping consults.
    Metadata-only read. Returns {column: [(mn, mx, n_rows), ...]}."""
    import glob
    import os

    import pyarrow.parquet as pq

    out: dict[str, list] = {c: [] for c in columns}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:
            # zero-row part file (repartitionByRange can emit empty
            # partitions on small/skewed data) — nothing to span
            continue
        # column name→index from the schema, not row_group(0)
        names = {
            md.schema.column(i).path: i for i in range(md.num_columns)
        }
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in columns:
                st = rg.column(names[c]).statistics
                if st is None or not st.has_min_max:
                    # stats absent → a reader cannot skip this group;
                    # record an unbounded span so skipped_fraction
                    # counts it as always-touched
                    out[c].append((None, None, rg.num_rows))
                else:
                    out[c].append((st.min, st.max, rg.num_rows))
    return out


def skipped_fraction(spans, lo, hi) -> float:
    """Fraction of rows a reader skips for ``col BETWEEN lo AND hi``
    given that column's row-group spans — the layout's figure of
    merit."""
    total = sum(n for _, _, n in spans)
    touched = sum(
        n
        for mn, mx, n in spans
        # missing stats (None) = unskippable: the reader must touch it
        if mn is None or mx is None or not (mx < lo or mn > hi)
    )
    return 1.0 - touched / total if total else 0.0
