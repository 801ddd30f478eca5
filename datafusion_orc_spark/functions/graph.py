"""Distributed connected components (min-label propagation).

Used by the near-duplicate clustering query (plans/queries.py
q_dup_clusters) to turn verified duplicate PAIRS into keep-one-per-
cluster groups. One equi-join + groupBy-min per round, converging in
O(component diameter) rounds — near-dup clusters are near-cliques, so
2-4 rounds in practice. Lineage is truncated with localCheckpoint every
few rounds and superseded label generations are unpersisted, so a long
chain cannot blow up the driver's plan or pin executor storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 3


def min_label_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Undirected pair list -> (node, label) with label = min node id
    reachable in the component.

    Raises after ``max_rounds`` without convergence (component diameter
    exceeding the bound means this algorithm is the wrong shape — switch
    to alternating large-star/small-star contraction, O(log^2 n) rounds
    on any graph)."""
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionAll(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    prev_cached = None
    try:
        for it in range(max_rounds):
            prop = (
                edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), "label")
            )
            new_labels = (
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            if (it + 1) % _CHECKPOINT_EVERY == 0:
                # truncate lineage: max_rounds of join-on-join would blow
                # up the driver's plan long before the data hurts
                new_labels = new_labels.localCheckpoint(eager=False)
            new_labels = new_labels.cache()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") < F.col("o.label"))
                .count()
            )  # driver-side scalar: convergence check, not row data
            if prev_cached is not None:
                prev_cached.unpersist()  # superseded generation
            prev_cached = new_labels
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"min_label_components: no convergence in {max_rounds} rounds — "
            f"component diameter exceeds the bound; use large-star/small-star "
            f"contraction for chain-shaped graphs"
        )
    finally:
        edges.unpersist()
