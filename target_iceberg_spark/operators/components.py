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
    labels = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.d == labels.v)
            .select(F.col("s").alias("v"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
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
