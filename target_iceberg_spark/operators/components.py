"""Connected components via distributed min-label propagation.

The last stage of a near-dup pipeline: candidate pairs form a graph;
each connected component is one duplicate cluster; the survivor is the
minimum id. Implemented as iterative min-label propagation — the same
scheme GraphX/GraphFrames use — with the driver coordinating
iterations (Spark's model for iterative algorithms):

  labels(v) := v
  repeat: labels(v) := min(labels(v), min over neighbors' labels)
  until fixpoint (converges in O(component diameter) rounds).

Each round is one join + one map-side-combinable groupBy-min. Lineage
is cut with localCheckpoint every round — without it the plan doubles
per iteration and planning time explodes. Duplicate clusters have tiny
diameters (near-dup similarity is near-transitive), so the loop ends
after a handful of rounds even on huge graphs; the fixpoint check is
an aggregate (did any label change), not a collect of labels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``pairs``;
    component = smallest vertex id reachable (undirected)."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    # seed labels with min(v, min neighbor) — the first propagation
    # round folded into label init (one combinable groupBy instead of a
    # full join round); star-shaped dup clusters converge immediately
    labels = (
        edges.groupBy(F.col("s").alias("v"))
        .agg(F.least(F.min("d"), F.min("s")).alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # min over neighbors' labels, partially aggregated BEFORE the
        # join back to labels (map-side combine shrinks the shuffle)
        neighbor_min = (
            edges.join(labels, edges.d == labels.v)
            .groupBy(F.col("s").alias("nv"))
            .agg(F.min("comp").alias("ncomp"))
        )
        # one left join folds the neighbor min in AND carries a changed
        # flag, so convergence is a scan of the checkpointed result
        # instead of a second join-count job per round
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.nv, "left")
            .select(
                "v",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
                (F.col("ncomp") < F.col("comp")).alias("chg"),
            )
            .localCheckpoint()
        )
        labels = new_labels.drop("chg")
        if new_labels.where("chg").isEmpty():
            break
    else:
        # exhausting max_iter with changes pending means labels are NOT
        # components yet — silently returning them would mis-cluster
        # long chains (diameter > max_iter)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations; raise max_iter (diameter of some component "
            "exceeds it)"
        )
    return labels.select(F.col("v").alias("vertex"), F.col("comp").alias("component"))
