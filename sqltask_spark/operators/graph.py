"""Distributed connected components — dedup-pair clustering.

Near-dup detection (minhash / simhash / n-gram Jaccard in
:mod:`sqltask_spark.operators.dedup`) emits PAIRS; a training-data
pipeline needs CLUSTERS — every document labeled with a canonical
representative so one survivor per group can be kept. That is
connected components over the pair graph.

Algorithm: min-label propagation. Each node starts labeled with its
own id; every round each node takes the min of its label and its
neighbors' labels; fixpoint = component labels (the min node id in
the component). Rounds needed = graph diameter, which for dedup
graphs is small (near-dup clusters are dense, quasi-clique blobs —
diameter 2-4 in practice). For adversarially long chains, the
O(log n)-round large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) is the
published upgrade; the propagation round below is the same
join+min-aggregate primitive either way.

Scale design:
- Each round is ONE shuffle-join (edges ⋈ labels on dst) + ONE
  map-side-combined min-aggregate — no driver-side graph state ever.
- Convergence is detected from an aggregate the round already pays
  for: labels only ever DECREASE, so ``sum(label)`` is strictly
  decreasing until fixpoint and a scalar comparison replaces an
  expensive changed-rows join.
- ``localCheckpoint(eager=True)`` each round truncates the lineage —
  without it the plan doubles per iteration and Catalyst analysis
  time, not the data, becomes the bottleneck (the classic iterative-
  algorithm failure mode on Spark).

The reference engine has no graph operator (it delegates everything
to the source DB); this is part of the training-data-pipeline surface
the rebuild adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of an undirected edge list with its component.

    Parameters
    ----------
    edges : DataFrame with two node-id columns (long-castable).
        Undirected interpretation; self-loops and duplicate edges are
        fine (dropped / deduped internally).
    src, dst : the two column names.
    max_iter : hard round cap (diameter bound). Raises if the
        fixpoint is not reached — silent partial clustering would
        corrupt a dedup pass.

    Returns
    -------
    DataFrame(node: long, component: long) — one row per node that
    appears in any edge; ``component`` is the smallest node id in the
    node's connected component. Singleton nodes (no edges) are not
    emitted; callers keep them as their own cluster.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    # symmetrize once so each round is a single directed join
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    prev_sum = labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
    if prev_sum is None:  # empty edge set
        return labels.select("node", F.col("label").alias("component"))

    for _ in range(max_iter):
        msgs = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def cluster_documents(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Dedup-pair list → per-document cluster assignment.

    Returns (doc_id, cluster_id, is_canonical): ``cluster_id`` is the
    smallest doc id in the connected component, ``is_canonical`` marks
    the one survivor a keep-one-per-cluster pass retains. Only
    documents that appear in at least one pair are emitted — all other
    documents are trivially their own cluster and need no row at
    100 TB scale (emitting them would turn a pair-sized result into a
    corpus-sized one).
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
