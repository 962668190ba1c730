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


def connected_components_star(
    edges: DataFrame,
    src: str = "da",
    dst: str = "db",
    max_iter: int = 30,
) -> DataFrame:
    """(node, comp) via alternating large-star/small-star contraction
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the any-topology scale twin of ``connected_components``:
    min-label propagation needs graph-DIAMETER rounds (a 1,000-link
    chain of pairwise near-dups = 1,000 shuffle rounds), star
    contraction provably converges in O(log n) alternations on any
    graph. Both produce the identical min-id labeling, so the two
    forms share one oracle.

    Round shape: each star op is ONE groupBy-min (the per-node
    minimum neighbor) + ONE join back onto the edge set — neighbor
    sets are never collected into an array, so a hot node (one giant
    near-dup cluster) costs a shuffle skew, not a single-task OOM.
    Edges stay in canonical child(larger) → parent(smaller) direction
    throughout; at the fixpoint the edge set IS the star forest, each
    child pointing at its component's minimum id. localCheckpoint
    truncates lineage per round (swap for a reliable checkpoint dir
    on a cluster)."""
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )

    def _large_star(E: DataFrame) -> DataFrame:
        und = E.unionByName(
            E.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = und.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        return (
            und.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def _small_star(E: DataFrame) -> DataFrame:
        mins = E.groupBy("a").agg(F.min("b").alias("m"))
        moved = (
            E.join(mins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        return moved.unionByName(
            mins.select("a", F.col("m").alias("b"))
        ).distinct()

    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # set equality on distinct sets: same cardinality + empty
        # difference (left_anti) ⇒ fixpoint
        n_new = e2.count()
        if n_new == e.count() and (
            e2.join(e, ["a", "b"], "left_anti").count() == 0
        ):
            roots = e2.select(F.col("b").alias("node")).subtract(
                e2.select(F.col("a").alias("node"))
            )
            return e2.select(
                F.col("a").alias("node"), F.col("b").alias("comp")
            ).unionByName(
                roots.select("node", F.col("node").alias("comp"))
            )
        e = e2
    raise RuntimeError(
        f"connected_components_star: no convergence in {max_iter} rounds"
    )
