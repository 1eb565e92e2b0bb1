#!/usr/bin/env python
"""Fuzzy-join scale sweep: wall + candidate volume vs corpus size.

The deletion-neighborhood join's cost model is rows × (len+1)
variants for blocking plus output-sized verify — LINEAR in the
corpus for fixed name length, never the rows² of the naive
predicate join. This sweep generates synthetic 12-digit account ids
(dense — the adversarial case: every id has ~100 ED1 neighbors in
the id space) at several scales and reports wall, candidate rows,
and emitted pairs, so the growth RATE is on record, not asserted.

Usage: python scripts/stress_linkage.py [scale ...]   (default 3)
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.operators.linkage import fuzzy_self_join  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    spark = get_spark(
        app_name="stress_linkage",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        conf={
            "spark.sql.shuffle.partitions":
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "spark.ui.enabled": "false",
        },
    )
    for n in scales:
        ids = spark.range(1, n + 1).select(
            F.col("id"),
            F.format_string("ACCT-%012d", F.col("id")).alias("name"),
        )
        t0 = time.time()
        pairs = fuzzy_self_join(ids, "id", "name", k=1)
        n_pairs = pairs.count()
        wall = time.time() - t0
        print(json.dumps({
            "rows": n,
            "pairs_ed1": n_pairs,
            "wall_sec": round(wall, 1),
            "pairs_per_row": round(n_pairs / n, 2),
            "wall_per_mrow": round(wall * 1e6 / n, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
