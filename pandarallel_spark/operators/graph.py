"""Connected components over near-duplicate pair graphs.

Dedup operators (``operators/dedup.py``) emit PAIRS; an actual corpus
cleanup needs transitive CLUSTERS (a~b, b~c → {a,b,c} is one duplicate
group) and one survivor per cluster. The reference has nothing of the
kind (its whole surface is per-chunk pandas); this is the north-star
step between near-dup detection and a filtered training corpus.

Two algorithms, same output contract:

- ``"star"`` (default, r9) — the alternating large-star/small-star
  contraction of Kiveris et al., "Connected Components in MapReduce
  and Beyond" (SoCC '14): each round rewires every node's larger
  neighbors (large-star) then its smaller neighbors (small-star) to
  the minimum of its neighborhood. Converges in O(log² n) rounds
  WORST case (≈ 2·log n in practice) regardless of graph diameter —
  the 100 TB form: an adversarial long chain that would take
  propagation O(diameter) rounds finishes in a handful. Each half-
  round is one groupBy + one join on the node key.
- ``"propagation"`` — iterative min-label propagation: every node
  takes the min of its own and its neighbors' labels per round;
  rounds needed = graph diameter. One shuffle per round with a
  smaller constant than star's two half-rounds, so it can edge out
  star on shallow near-clique dup graphs, but it is the wrong
  asymptotic for unknown topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandarallel_spark.operators._memo import truncate_lineage


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = the smallest node id reachable from it (a canonical,
    deterministic cluster id). Isolated nodes never enter the edge list
    and are by definition their own singleton clusters — callers keep
    them implicitly.
    """
    if algorithm == "star":
        return _cc_star(edges, src, dst, max_iter)
    if algorithm == "propagation":
        return _cc_propagation(edges, src, dst, max_iter)
    raise ValueError(
        f"algorithm must be 'star' or 'propagation', got {algorithm!r}"
    )


def _cc_star(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. '14, Alg. 3).

    Invariants per round (each half is one groupBy(min) + one join —
    the same physical shape as a propagation round, so the at-scale
    story is identical per round; there are just O(log² n) of them
    instead of O(diameter)):

    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u}). Every edge is processed from its SMALLER
      endpoint's neighborhood, so connectivity is preserved and all
      surviving edges point strictly downward (child > parent).
    - small-star(u): with edges now child→parent (parent < child),
      node u and all its parents re-attach to the minimum parent.

    The fixpoint is a star forest: every node points directly at its
    component's minimum. Convergence is an exact SET comparison of
    consecutive edge sets (both are ``.distinct()`` by construction):
    equal cardinality AND full intersection, computed as ONE
    left-join + count aggregate per round whose scan side also
    materializes the round's lazy checkpoint — exactly one job per
    round. r14 (guide §2.4, remove shuffles outright): the previous
    two-``exceptAll`` multiset probe paid an eager checkpoint job
    plus a probe job that aggregated the union of both edge sets
    TWICE per round; an intermediate rewrite (count, then anti-join
    when counts agreed) still paid two jobs on count-equal rounds,
    which near-clique dedup graphs hit on most rounds. Rounds are
    lineage-truncated like the propagation variant: labels(t+1) reads
    labels(t) twice, and an unbroken lineage would double the logical
    plan per round — localCheckpoint by default, RELIABLE checkpoint
    under the ``spark.pandarallel_spark.reliableCheckpoint`` opt-in
    (r10: a multi-hour contraction over billions of edges should
    survive executor churn; see ``_memo.truncate_lineage``).
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # lazy truncation + count: the count action materializes the
    # checkpoint blocks AND returns the cardinality in ONE job (an
    # eager checkpoint followed by a count would be two)
    e0 = truncate_lineage(
        raw.filter(F.col("a") != F.col("b")).distinct(), eager=False
    )
    # nodes appearing ONLY in self-loop edges never enter the star
    # rounds but are still their own components (the propagation
    # variant labels them; dedup pair lists never contain self-loops,
    # so this set is normally empty and the anti-join below is free)
    loops = (
        raw.filter(F.col("a") == F.col("b"))
        .select(F.col("a").alias("node"))
        .distinct()
    )
    cur_n = e0.count()
    if cur_n == 0:
        return loops.select("node", F.col("node").alias("component"))

    cur = e0
    converged = False
    for _ in range(max_iter):
        # --- large-star: symmetric neighborhoods ---------------------
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("__mn__"))
        m = mins.select(
            "a", F.least("__mn__", F.col("a")).alias("__m__")
        )
        large = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("__m__").alias("b"))
            .distinct()
        )
        # --- small-star: edges all point downward now ----------------
        pmin = large.groupBy("a").agg(F.min("b").alias("__m__"))
        rewired = (
            large.join(pmin, "a")
            .filter(F.col("b") != F.col("__m__"))
            .select(F.col("b").alias("a"), F.col("__m__").alias("b"))
        )
        self_edges = pmin.select("a", F.col("__m__").alias("b"))
        nxt = truncate_lineage(
            rewired.unionByName(self_edges).distinct(), eager=False
        )
        # exact fixpoint test on the (small, distinct) edge sets in ONE
        # job: a left join of nxt against cur aggregated to
        # (|nxt|, |nxt ∩ cur|). Both sets are distinct, so
        # |nxt| == |cur| and |nxt ∩ cur| == |nxt| ⟺ cur == nxt. The
        # lazy checkpoint materializes inside this same job (the probe
        # scans nxt), so a round pays exactly one action — the first
        # r14 form (count, then an anti-join when the counts agreed)
        # still paid two jobs on count-equal rounds, which near-clique
        # dedup graphs hit on most rounds.
        probe = (
            nxt.join(cur.withColumn("__in__", F.lit(1)), ["a", "b"], "left")
            .agg(
                F.count(F.lit(1)).alias("__n__"),
                F.count("__in__").alias("__m__"),
            )
            .collect()[0]
        )
        nxt_n = probe["__n__"]
        unchanged = nxt_n == cur_n and probe["__m__"] == nxt_n
        cur, cur_n = nxt, nxt_n
        if unchanged:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            f"rounds — raise max_iter (the alternating algorithm needs "
            f"O(log² n) rounds worst case, ≈2·log n in practice)"
        )
    # fixpoint: every non-root node carries exactly one edge to its
    # component min; roots appear only on the parent side
    members = cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = cur.select(F.col("b").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    labeled = members.unionByName(roots)
    lone_loops = loops.join(labeled, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return labeled.unionByName(lone_loops)


def _cc_propagation(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.persist()
    # each round is lineage-truncated (localCheckpoint by default,
    # reliable checkpoint under the reliableCheckpoint opt-in), not
    # persisted: labels(t+1) references labels(t) TWICE (the neighbor
    # aggregate and the join), so an unbroken lineage doubles the
    # logical plan per round and Catalyst re-analysis OOMs the driver
    # near ~12 rounds. Checkpointing materializes the round, truncates
    # lineage, and the ContextCleaner frees a round's blocks when the
    # next round drops the reference — nothing leaks to the caller.
    labels = truncate_lineage(
        und.select(F.col("a").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("component")),
        eager=True,
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
        new_labels = truncate_lineage(
            labels.join(neigh_min, labels.n == neigh_min.a, "left")
            .select(
                "n",
                F.col("component").alias("__old__"),
                F.least(
                    F.col("component"), F.coalesce(F.col("__nm__"), F.col("component"))
                ).alias("component"),
            ),
            # lazy: the changed-count action below materializes the
            # checkpoint blocks AND counts in one job per round (r14)
            eager=False,
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
            f"(graph diameter exceeds max_iter); use algorithm='star' "
            f"(the default) for long-chain graphs, or raise max_iter"
        )
    return labels.select(F.col("n").alias("node"), "component")


def cluster_survivors(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "star",
    scores: DataFrame | None = None,
    id_col: str = "id",
    score_col: str = "score",
    components: DataFrame | None = None,
) -> DataFrame:
    """One row per duplicate cluster: (component, survivor).

    Default policy: the survivor is the cluster's minimum id — which IS
    the component label by construction, so this is a distinct over
    components, not an aggregate over nodes.

    ``scores`` opts into a QUALITY-based survivor (r9 — the policy a
    cleanup pipeline usually wants, mirroring ``exact_dedup``'s
    ``keep_by``): pass a (id, score) table and the survivor becomes the
    cluster member with the highest score, ties broken by min id
    (total, deterministic). Nodes missing from ``scores`` rank below
    every scored member (NULL-last), so a partial score table still
    yields a survivor per cluster. One extra join on the node id plus a
    max_by aggregate per component — both on label rows, never data
    rows. ``components`` accepts a precomputed (node, component)
    labeling so callers that already ran ``connected_components`` (e.g.
    ``near_dedup_corpus``) don't pay the eager contraction twice."""
    cc = (
        components
        if components is not None
        else connected_components(edges, src, dst, algorithm=algorithm)
    )
    if scores is None:
        return cc.select("component").distinct().select(
            "component", F.col("component").alias("survivor")
        )
    sc_col = F.col(score_col)
    if isinstance(
        scores.schema[score_col].dataType, (T.FloatType, T.DoubleType)
    ):
        # NaN orders ABOVE every real double in Spark and NaN == NaN is
        # true, so an unguarded max would crown a broken-metric member
        # (review finding r9; same NaN class the sampling weights fix
        # handled in r8). Map NaN → NULL: ranked below every scored
        # member, degrading to min-id only when nothing real is scored.
        sc_col = F.when(~F.isnan(sc_col), sc_col)
    sc = scores.select(F.col(id_col).alias("node"), sc_col.alias("__score__"))
    joined = cc.join(sc, "node", "left")
    # two-stage, type-generic (works for string ids too): per-component
    # max score (NULL when nothing scored), then min id among the
    # members achieving it — when no member is scored every member
    # qualifies and the policy degrades to min-id
    stats = joined.groupBy("component").agg(F.max("__score__").alias("__ms__"))
    return (
        joined.join(stats, "component")
        .filter(
            F.col("__ms__").isNull() | (F.col("__score__") == F.col("__ms__"))
        )
        .groupBy("component")
        .agg(F.min("node").alias("survivor"))
    )
