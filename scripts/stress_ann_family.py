#!/usr/bin/env python
"""ANN/similarity-family scaling probe (VERDICT r6 Next #5).

The dedup chain got the two-decade 5k→50k→500k treatment in r6 (and
it caught the broadcast-OOM bug); the IVF index build, the
distributed no-driver-collect probe, and the sign-LSH pair path — all
touched by the same r6 shuffle-join pins — had only sf0.1-scale
evidence. This script replicates the sf0.1 embeddings table ×reps,
runs the three operators, and prints one JSON line with wall seconds,
result rows, and per-step shuffle read/write bytes from the Spark UI
REST API.

Replication shape (mirrors scripts/stress_dedup_chain.py's corpus-like
structure): replica 0 = original, replica 1 = true near-duplicate
(+1e-3 per component — stays above the 0.6 cosine pair threshold), and
replicas ≥2 circular-shift the vector by (rep mod dim−1)+1 positions —
near-orthogonal to the original for random embeddings. Shift classes
repeat every dim−1 replicas, so replicas in the same class ALSO get a
per-generation (rep div (dim−1)) sign-flip pattern on alternating
components (cosine is scale-invariant but not sign-pattern-invariant:
flipping half the components drives same-class cross-generation
cosine to ~0). Expected LSH pairs therefore grow LINEARLY in corpus
size (each original pairs with its one near-dup), never
quadratically — the first 250-rep run without the sign flips measured
exactly that failure mode (734k true pairs from ε-only same-class
replicas; the operator survived it in 198s, which is itself recorded
as the hot-corpus robustness point).

Scale discipline under test:
- index build: √n cell auto-scale (constant expected cell occupancy);
- distributed probe: fixed 2,000-query batch, salted cell join, no
  driver collect — cost should grow ~√n (candidates/query =
  n_probe · n / √n), strongly sub-linear per corpus decade;
- LSH pairs: n_planes grown with log2(n / target_occupancy) — the
  production occupancy rule (cf. bench.py's xover comment) — holding
  bucket occupancy ~constant so the bucket join stays linear. The
  target is ~16/bucket (the pair-enumeration regime: candidate pairs
  ≈ n · occupancy · tables / 2, so occupancy IS the per-doc work;
  bench's 128k-vector xover uses ~8/bucket for the same reason).

Usage: python scripts/stress_ann_family.py [reps] [base_sf_dir]
       reps=3 → 6k vectors, 25 → 50k, 250 → 500k
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqltask_spark.session import get_spark  # noqa: E402

UI = "http://localhost:4040"


def _shuffle_totals() -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all completed stages."""
    try:
        with urllib.request.urlopen(f"{UI}/api/v1/applications", timeout=5) as r:
            app = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception as exc:  # UI scraping must never fail the probe
        print(f"# shuffle metrics unavailable: {exc}", file=sys.stderr)
        return (0, 0)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"stress_ann_x{reps}",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = f"/tmp/ann_scale_x{reps}"
    path = os.path.join(tmp, "embeddings.parquet")
    if not os.path.exists(path):
        emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
        dim = len(emb.select("embedding").first()["embedding"])
        rep = spark.range(reps).withColumnRenamed("id", "_rep")
        shifted = (
            "concat(slice(embedding, (_rep % (size(embedding) - 1)) + 2, "
            "size(embedding)), "
            "slice(embedding, 1, (_rep % (size(embedding) - 1)) + 1))"
        )
        # per-generation sign flips: generation g = rep div (dim-1);
        # component i flips when bit (i % 2) of g is set — distinct
        # generations of the same shift class differ in ~half their
        # signs, so their cosine collapses to ~0 (or −1, equally
        # below threshold)
        signed = F.expr(
            f"transform({shifted}, (x, i) -> "
            "CAST(x AS DOUBLE) * CAST(1 - 2 * "
            "(shiftright(_rep div (size(embedding) - 1), i % 2) & 1) "
            "AS DOUBLE))"
        )
        vec = (
            F.when(F.col("_rep") == 0, F.col("embedding"))
            .when(
                F.col("_rep") == 1,
                F.transform("embedding", lambda x: x + F.lit(0.001)),
            )
            .otherwise(
                F.transform(
                    signed,
                    lambda x: x + F.col("_rep").cast("double") * 1e-4,
                )
            )
        )
        big = emb.crossJoin(rep).select(
            (F.col("vec_id") * reps + F.col("_rep")).alias("vec_id"),
            vec.cast("array<double>").alias("embedding"),
        )
        big.repartition(int(cpus)).write.mode("overwrite").parquet(path)
        print(f"# dim={dim}", file=sys.stderr)
    corpus = spark.read.parquet(path)
    n = corpus.count()
    print(f"# corpus: {n} vectors (x{reps})", file=sys.stderr)

    out: dict[str, dict] = {}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        r0, w0 = _shuffle_totals()
        t0 = time.perf_counter()
        rows = fn()
        dt = round(time.perf_counter() - t0, 1)
        r1, w1 = _shuffle_totals()
        out[name] = {
            "sec": dt,
            "rows": rows,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    # 1. IVF index build, √n cell auto-scale
    from sqltask_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf_index_distributed,
    )

    idx = os.path.join(tmp, "ivf_index")
    n_cells = build_ivf_index(
        corpus, idx, "vec_id", "embedding", n_cells=None
    )
    # rebuild timed (the first call above warmed the sample/codepaths
    # and tells us the cell count for the report)
    timed(
        "ivf_index_build",
        lambda: build_ivf_index(
            corpus, idx, "vec_id", "embedding", n_cells=None
        ),
    )
    out["ivf_index_build"]["n_cells"] = n_cells

    # 2. distributed probe: fixed 2,000-query batch, no driver collect
    queries = corpus.filter(F.col("vec_id") % reps == 0).limit(2000)
    timed(
        "ivf_probe_distributed",
        lambda: probe_ivf_index_distributed(
            spark, idx, queries, "vec_id", "embedding", k=10, n_probe=8
        ).count(),
    )

    # 3. sign-LSH near-pairs at production occupancy (~500/bucket)
    from sqltask_spark.operators.similarity import (
        cosine_near_pairs_lsh_fixed,
    )

    n_planes = max(4, math.ceil(math.log2(max(n, 2) / 16)))
    timed(
        f"lsh_pairs_planes{n_planes}",
        lambda: cosine_near_pairs_lsh_fixed(
            corpus,
            "vec_id",
            "embedding",
            threshold=0.6,
            n_planes=n_planes,
            tables=8,
            seed=101,
            max_bucket_size=1000,
        ).count(),
    )

    print(
        json.dumps(
            {
                "metric": "ann_family_scaling",
                "unit": "sec",
                "reps": reps,
                "n_vectors": n,
                "value": round(sum(v["sec"] for v in out.values()), 1),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
