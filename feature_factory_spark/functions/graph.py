"""Distributed connected components over a pair (edge) frame.

Used by the dedup operators to turn verified near-dup PAIRS into
duplicate CLUSTERS: with pairs (1,5),(3,5) the greedy smaller-id policy
keeps both 1 and 3, but they belong to one transitive cluster whose
canonical representative is 1. Min-label propagation fixes that.

Algorithm: iterative min-label propagation (the simple variant of
large-star/small-star map-reduce connected components). Each iteration
is one join + one aggregate (two shuffles); convergence is checked with
a driver-side count action. Near-dup graphs have tiny diameters (usually
<= 3), so this converges in a handful of rounds; ``max_iterations``
bounds the worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import FeatureFactoryError


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 15,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    is the minimum node id reachable through the pair graph.

    Raises FeatureFactoryError if labels have not converged after
    ``max_iterations`` rounds (graph diameter exceeds the cap): an
    unconverged result would silently keep several "representatives"
    per true cluster, i.e. let duplicates survive dedup. Raise the cap
    for pathological chain-shaped graphs."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # every iteration's join + convergence count re-reads the edge
        # frame; persist once, release before returning
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for it in range(max_iterations):
        # label(n) <- min(label(n), min over neighbors of label(neighbor))
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nb_min"), F.col("component"))
                ).alias("component"),
            )
        )
        if (it + 1) % 3 == 0:
            # truncate the lineage every few rounds: each iteration nests
            # the previous plan inside a join, and on high-diameter graphs
            # the growing tree dominates planning time long before the
            # iteration cap does
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise FeatureFactoryError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the cap); raise "
            "max_iterations"
        )
    edges.unpersist()
    return labels


def duplicate_ids(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """ids to DROP so that each transitive duplicate cluster keeps exactly
    its minimum-id representative. One column: ``dup_id``."""
    comp = connected_components(pairs, a_col, b_col)
    return comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("dup_id")
    )
