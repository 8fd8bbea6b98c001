"""Connected components over near-duplicate pair graphs.

Dedup operators (``operators/dedup.py``) emit PAIRS; an actual corpus
cleanup needs transitive CLUSTERS (a~b, b~c → {a,b,c} is one duplicate
group) and one survivor per cluster. The reference has nothing of the
kind (its whole surface is per-chunk pandas); this is the north-star
step between near-dup detection and a filtered training corpus.

Algorithm: iterative min-label propagation on DataFrames — every node
starts labeled with itself; each round takes the min of its own and its
neighbors' labels; fixpoint = every node labeled with its component's
minimum id. Rounds needed = graph diameter, and duplicate clusters are
shallow (near-clique), so 2-4 rounds in practice. Each round is one
shuffle (join + groupBy on node); the driver only checks a converged
count. For adversarial long-chain graphs at 100 TB you'd switch to the
large-star/small-star contraction (Kiveris et al. '14) for O(log n)
rounds — same per-round plan shape, so the physical story is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = the smallest node id reachable from it (a canonical,
    deterministic cluster id). Isolated nodes never enter the edge list
    and are by definition their own singleton clusters — callers keep
    them implicitly.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.persist()
    # each round is localCheckpoint'ed, not persisted: labels(t+1)
    # references labels(t) TWICE (the neighbor aggregate and the join),
    # so an unbroken lineage doubles the logical plan per round and
    # Catalyst re-analysis OOMs the driver near ~12 rounds. Checkpointing
    # materializes the round, truncates lineage, and the ContextCleaner
    # frees a round's blocks when the next round drops the reference —
    # nothing leaks to the caller.
    labels = (
        und.select(F.col("a").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("component"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.b == labels.n)
            .groupBy("a")
            .agg(F.min("component").alias("__nm__"))
        )
        # carry the previous label so convergence is a filter over the
        # checkpointed result, not an extra self-join per round
        new_labels = (
            labels.join(neigh_min, labels.n == neigh_min.a, "left")
            .select(
                "n",
                F.col("component").alias("__old__"),
                F.least(
                    F.col("component"), F.coalesce(F.col("__nm__"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("component") != F.col("__old__")).count()
        labels = new_labels
        if changed == 0:
            converged = True
            break

    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(graph diameter exceeds max_iter); raise max_iter or use a "
            f"star-contraction variant for long-chain graphs"
        )
    return labels.select(F.col("n").alias("node"), "component")


def cluster_survivors(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """One row per duplicate cluster: (component, survivor) where the
    survivor is the cluster's minimum id — which IS the component label
    by construction, so this is a distinct over components, not an
    aggregate over nodes."""
    cc = connected_components(edges, src, dst)
    return cc.select("component").distinct().select(
        "component", F.col("component").alias("survivor")
    )
