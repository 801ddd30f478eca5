"""Distributed connected components (min-label propagation with
pointer jumping).

Used by the near-duplicate clustering query (plans/queries.py
q_dup_clusters) to turn verified duplicate PAIRS into keep-one-per-
cluster groups. Each round combines one neighbor-propagation step
(equi-join + groupBy-min) with one POINTER-JUMPING step
(label <- label(label), the classic path-doubling trick), so label
distance doubles per round and the loop converges in O(log diameter)
rounds instead of O(diameter) — the r7 shape needed one round per hop
and slowed ~2.5x per round as lineage grew. Every generation is
materialized with an EAGER localCheckpoint, which keeps the per-round
plan (and wall) constant; the fixed point — label = min node id of the
component — is unchanged, so callers and oracles see identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Undirected pair list -> (node, label) with label = min node id
    reachable in the component.

    Raises after ``max_rounds`` without convergence. With pointer
    jumping a diameter-d component needs ~log2(d) rounds, so hitting the
    bound means the input is pathological (e.g. a 2^50-hop chain), not
    merely chain-shaped as in the r7 O(d) variant.
    """
    # materialize `pairs` ONCE before mirroring: it is typically an
    # expensive subquery (the verified-Jaccard graph) and the symmetric
    # unionAll would otherwise compute it once per branch; the checkpoint
    # also keeps it out of every round's join lineage
    p = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    edges = (
        p.unionAll(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # init = one fused propagation step: label(n) = min(n, neighbors(n)).
    # Both edge directions exist, so every node appears as src. Labels
    # are always node ids within the component, monotonically
    # non-increasing — the invariants pointer jumping needs.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(F.col("src").alias("node"), F.least("src", "mn").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _it in range(max_rounds):
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        # pointer jump: follow each node's label to THAT node's label.
        # Every label value is itself a node in `labels` (invariant
        # above), so the inner join loses nothing the union's `labels`
        # branch doesn't keep.
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.label").alias("label"))
        )
        new_labels = (
            labels.unionByName(prop)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )  # driver-side scalar: convergence check, not row data
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"min_label_components: no convergence in {max_rounds} rounds — "
        f"with pointer jumping that is a ~2^{max_rounds}-hop component; "
        f"the input graph is pathological"
    )
