"""Iterative graph operators.

``connected_components`` labels each node of an undirected edge set
with the minimum node id reachable from it — the canonical clustering
step after near-dup pair mining (pairs → dedup clusters → keep one
representative per component).

Spark-first shape: iterative min-label propagation as a driver loop of
DataFrame joins with an early-exit convergence check. Each iteration
``localCheckpoint``s the label table — without lineage truncation the
plan doubles every round and the job dies long before 100 TB. On a
cluster, swap localCheckpoint for a reliable checkpoint dir. Rounds
needed = graph diameter (dedup clusters are shallow; cap defensively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "da",
    dst: str = "db",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    min reachable node id. Raises if not converged within max_iter."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.distinct().localCheckpoint()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        # The changed-flag rides the label row itself (ncomp < comp ⇔
        # this round improved the label), so convergence needs no
        # re-join of new vs old. The lazy localCheckpoint materializes
        # inside the SAME job as the changed-count action below: one
        # job launch per iteration instead of three (eager checkpoint +
        # join + count).
        new_labels = (
            labels.join(neigh, labels.node == neigh.a, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("ncomp"), F.col("comp")) < F.col("comp")
                ).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
