#!/usr/bin/env python
"""sf1 sweep for the histogram-quantile store family (VERDICT r11
#4): exercise ``hist_store_sink`` (ledgered streaming folds + replay)
and ``maintain_hist_store`` growth at $SPARK_GRAFT_SF_DIR scale
(default /tmp/sf1_gen — scripts/gen_scale.py output) and certify:

1. three-epoch sink fold == direct one-shot build (cells identical);
2. a full same-content replay moves NOTHING (ledger bit-identity);
3. a deliberately narrow store saturates, ``maintain_hist_store``
   rebuilds wider from the census until healthy, and the exact
   per-group median sits inside every certified [lo, hi) interval
   along the way.

Prints one JSON line: PASS booleans + row/group counts + walls.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.operators import index_fs  # noqa: E402
from sqltask_spark.operators.index_maintenance import (  # noqa: E402
    maintain_hist_store,
)
from sqltask_spark.operators.merge import (  # noqa: E402
    read_parquet_table,
)
from sqltask_spark.operators.sketch_store import (  # noqa: E402
    create_hist_store,
    hist_saturation,
    read_hist_meta,
    read_hist_quantiles,
)
from sqltask_spark.session import get_spark  # noqa: E402
from sqltask_spark.streaming.corpus import hist_store_sink  # noqa: E402


def cells(spark, path):
    return sorted(
        (r["g"], int(r["b"]), int(r["cnt"]))
        for r in read_parquet_table(spark, path).collect()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1_gen")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sweep_hist_sf1",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("n_chars").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    n_docs = docs.count()
    tmp = tempfile.mkdtemp(prefix="sweep_hist_")
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs}
    try:
        # --- 1+2: streaming sink epochs vs direct build, plus replay
        store = f"{tmp}/sink_store"
        sink = hist_store_sink(
            store, "source", "n_chars", bucket_width=64,
            n_buckets=64, app_id="sweep",
        )
        epochs = [
            docs.filter(F.pmod("doc_id", F.lit(3)) == i)
            for i in range(3)
        ]
        t0 = time.perf_counter()
        for i, b in enumerate(epochs):
            sink(b, i)
        out["sink_3_epochs_sec"] = round(time.perf_counter() - t0, 2)
        direct = f"{tmp}/direct_store"
        create_hist_store(
            docs, direct, "source", "n_chars",
            bucket_width=64, n_buckets=64,
        )
        out["fold_equals_direct"] = cells(spark, store) == cells(
            spark, direct
        )
        seq = index_fs.read_manifest(spark, store)["_seq"]
        t0 = time.perf_counter()
        for i, b in enumerate(epochs):
            sink(b, i)  # full same-content replay
        out["replay_sec"] = round(time.perf_counter() - t0, 2)
        out["replay_noop"] = (
            index_fs.read_manifest(spark, store)["_seq"] == seq
        )
        out["state_rows"] = read_parquet_table(spark, store).count()
        out["n_groups"] = docs.select("source").distinct().count()

        # --- 3: saturation → rebuild-wider growth at sf1
        narrow = f"{tmp}/narrow_store"
        create_hist_store(
            docs, narrow, "source", "n_chars",
            bucket_width=4, n_buckets=16,
        )
        sat0 = max(
            int(r["top_bucket_milli"])
            for r in hist_saturation(spark, narrow).collect()
        )
        out["narrow_top_bucket_milli"] = sat0
        exact = {
            r["source"]: int(r["m"])
            for r in docs.groupBy("source")
            .agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
            .collect()
        }
        grew, medians_ok = 0, True
        t0 = time.perf_counter()
        for _ in range(12):
            r = maintain_hist_store(
                spark, narrow, docs, "source", "n_chars",
                max_top_bucket_milli=100,
            )
            if not r["rebuilt"]:
                break
            grew += 1
            for q in read_hist_quantiles(spark, narrow, [500]).collect():
                med = exact[q["g"]]
                if q["lo"] > med or (
                    q["hi"] is not None and med > q["hi"]
                ):
                    medians_ok = False
        out["growth_sec"] = round(time.perf_counter() - t0, 2)
        out["growth_rebuilds"] = grew
        out["healthy_after_growth"] = not r["rebuilt"]
        out["final_width"] = read_hist_meta(spark, narrow)[0]
        out["median_in_interval_every_step"] = medians_ok
        out["PASS"] = bool(
            out["fold_equals_direct"]
            and out["replay_noop"]
            and out["healthy_after_growth"]
            and medians_ok
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
