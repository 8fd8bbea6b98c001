"""Focused tests for the r14 `_cc_star` convergence probe rewrite
(count + one-sided anti-join over distinct edge sets, replacing the
two-exceptAll multiset diff). The probe decides when the contraction
STOPS, so the risk surface is premature convergence (wrong components)
or missed convergence (spurious RuntimeError) — both checked here
against an exact union-find ground truth on shapes that need different
round counts (near-cliques converge in ~2, long chains exercise the
O(log n) tail and several counts-equal probe rounds).
"""

from __future__ import annotations

import random

import pytest

from pandarallel_spark.operators.graph import connected_components


def _ground_truth(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "name, edges",
    [
        # near-clique duplicate groups: the common dedup-pair shape,
        # converges almost immediately (probe fires on round 1-2)
        (
            "cliques",
            [(i, j) for base in (0, 100, 200) for i in range(base, base + 6)
             for j in range(i + 1, base + 6)],
        ),
        # one long chain: maximal round count for the node count —
        # consecutive rounds shrink the edge set slowly, so several
        # rounds present EQUAL-SIZED but different edge sets to the
        # probe (the anti-join branch must reject them)
        ("chain", [(i, i + 1) for i in range(64)]),
        # mixed: chain + cliques + isolated pair + self-loop
        (
            "mixed",
            [(i, i + 1) for i in range(20)]
            + [(i, j) for i in range(50, 55) for j in range(i + 1, 55)]
            + [(90, 91), (95, 95)],
        ),
    ],
)
def test_star_matches_union_find(spark, name, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, algorithm="star").collect()
    }
    want = _ground_truth(edges)
    assert got == want, f"{name}: star CC diverged from union-find"


def test_star_random_graphs_match_union_find(spark):
    rng = random.Random(1405)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 80))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, algorithm="star").collect()
        }
        assert got == _ground_truth(edges), f"trial {trial} diverged"
