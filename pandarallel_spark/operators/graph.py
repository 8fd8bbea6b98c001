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
    labels = (
        und.select(F.col("a").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("component"))
        .persist()
    )
    labels.count()

    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.b == labels.n)
            .groupBy("a")
            .agg(F.min("component").alias("__nm__"))
        )
        new_labels = (
            labels.join(neigh_min, labels.n == neigh_min.a, "left")
            .select(
                "n",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nm__"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("x")
            .join(labels.alias("y"), F.col("x.n") == F.col("y.n"))
            .filter(F.col("x.component") != F.col("y.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    und.unpersist()
    return labels.select(F.col("n").alias("node"), "component")


def cluster_survivors(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """One row per duplicate cluster: (component, survivor) where the
    survivor is the cluster's minimum id (== the component label, by
    construction of ``connected_components``)."""
    cc = connected_components(edges, src, dst)
    return cc.groupBy("component").agg(F.min("node").alias("survivor"))
