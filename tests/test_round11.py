"""Round-11 hardening regressions: the r10 verdict's ranked tasks
(incremental bucket cap, ingest compaction/retention, ivf_index_append,
auto-sized candidate broadcast, torn-batch replay) and the r10 ADVICE
fixes (fresh-checkpoint refusal, strictLazy-safe reliable truncation,
centroid sidecar, strictLazy merge validation warning)."""

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.dedup import minhash_lsh_pairs
from pandarallel_spark.operators.incremental import (
    incremental_dedup_corpus,
    minhash_index_build,
    minhash_pairs_incremental,
)

_KW = dict(n=2, num_perm=16)


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "text"])
    ).select(F.col("id").cast("long"), "text")


# ---------------------------------------------------------------------------
# Task 1 — bucket_cap on the incremental delta×index band join
# ---------------------------------------------------------------------------


def test_incremental_bucket_cap_bounds_delta_x_index(spark):
    """20 DISTINCT near-identical index entries × 8 near-identical
    fresh delta sets: every (band, hash) bucket holds ~all 20 index
    entries, so the uncapped delta×index candidate set is ~quadratic.
    With bucket_cap the index side of hot buckets collapses to its hub
    — the per-NEW-doc verdict (which new docs match old content) must
    be unchanged, every surviving pair at identical jaccard."""
    n_old, n_new = 20, 8
    base = " ".join(f"w{i}" for i in range(40))
    old = _mk(spark, [(i, f"{base} unique{i}") for i in range(n_old)])
    new = _mk(
        spark, [(100 + i, f"{base} fresh{i}") for i in range(n_new)]
    )
    index = minhash_index_build(old, "id", "text", **_KW)
    kw = dict(threshold=0.5, bands=8, include_new_pairs=False)

    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_pairs_incremental(
            new, "id", "text", index, old_docs=old, **kw
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_pairs_incremental(
            new, "id", "text", index, old_docs=old, bucket_cap=2, **kw
        ).collect()
    }
    # the uncapped form pairs (nearly) every delta set with every index
    # entry; the cap is a real bound — star pairs ≤ bands × delta sets
    assert len(uncapped) >= 0.9 * n_old * n_new
    assert len(capped) < len(uncapped)
    assert len(capped) <= 8 * n_new  # bands × delta sets, linear envelope
    # subset at identical jaccard (every pair still exactly verified)
    assert set(capped) <= set(uncapped)
    assert all(uncapped[p] == j for p, j in capped.items())
    # the ingest DECISION is preserved: same set of matched new docs
    assert {b for _, b in capped} == {b for _, b in uncapped} == {
        100 + i for i in range(n_new)
    }

    # a generous cap is a no-op; a nonsensical one raises
    loose = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_pairs_incremental(
            new, "id", "text", index, old_docs=old, bucket_cap=n_old + 1, **kw
        ).collect()
    }
    assert loose == uncapped
    with pytest.raises(ValueError, match="bucket_cap"):
        minhash_pairs_incremental(
            new, "id", "text", index, old_docs=old, bucket_cap=0, **kw
        )


def test_incremental_bucket_cap_forwards_to_self_join(spark):
    """bucket_cap must also bound the delta's OWN self-join: 20
    near-identical fresh docs against an unrelated index — the src="new"
    pairs come back star-shaped (linear), not the full clique."""
    n_new = 20
    base = " ".join(f"w{i}" for i in range(40))
    old = _mk(spark, [(0, "entirely unrelated index content about joins")])
    new = _mk(spark, [(100 + i, f"{base} fresh{i}") for i in range(n_new)])
    index = minhash_index_build(old, "id", "text", **_KW)
    kw = dict(threshold=0.5, bands=8, old_docs=old)

    full = [
        r
        for r in minhash_pairs_incremental(
            new, "id", "text", index, **kw
        ).collect()
        if r.src == "new"
    ]
    star = [
        r
        for r in minhash_pairs_incremental(
            new, "id", "text", index, bucket_cap=2, **kw
        ).collect()
        if r.src == "new"
    ]
    assert len(full) >= 0.9 * n_new * (n_new - 1) / 2
    assert 0 < len(star) < len(full)
    assert len(star) <= 8 * n_new


# ---------------------------------------------------------------------------
# ADVICE r10 — strictLazy contract fixes
# ---------------------------------------------------------------------------


def test_truncate_lineage_lazy_site_respects_strict_lazy(spark, tmp_path):
    """reliableCheckpoint + strictLazy: a LAZY call site must not launch
    surprise persist/checkpoint jobs — it falls back to the lazy
    localCheckpoint instead (eager sites keep the reliable branch)."""
    from pandarallel_spark.operators._memo import truncate_lineage

    df = spark.range(10)
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.pandarallel_spark.reliableCheckpoint", "true")
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        lazy = truncate_lineage(df, eager=False)
        # building the lazy truncation launched NOTHING
        assert tracker.getJobIdsForGroup(None) == before
        assert lazy.count() == 10
        # an explicitly eager site still takes the reliable branch
        eager = truncate_lineage(df, eager=True)
        assert eager.count() == 10
        assert eager._jdf.queryExecution().analyzed().toString().startswith(
            "LogicalRDD"
        ) or "Scan ExistingRDD" in eager._jdf.queryExecution(
        ).executedPlan().toString()
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
        spark.conf.set("spark.pandarallel_spark.reliableCheckpoint", "false")


def test_index_merge_strict_lazy_warns_and_checks_types(spark):
    """Under strictLazy the merge metadata probe is forbidden: the merge
    still happens but warns it is unvalidated, and a plan-visible type
    drift is rejected outright."""
    old = _mk(spark, [(0, "the quick brown fox jumps over the lazy dog")])
    new = _mk(spark, [(1, "the quick brown fox jumps over the lazy cat")])
    from pandarallel_spark.operators.incremental import minhash_index_merge

    ia = minhash_index_build(old, "id", "text", **_KW)
    ib = minhash_index_build(new, "id", "text", **_KW)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            merged = minhash_index_merge(ia, ib)
        assert any("UNVALIDATED" in str(x.message) for x in w)
        # the plan built lazily; counting it outside strict scope works
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
        assert merged.count() == 2
        spark.conf.set("spark.pandarallel_spark.strictLazy", "true")

        # a type drift is caught by the plan-only check even there
        ic = ib.withColumn("__eid__", F.col("__eid__").cast("string"))
        with pytest.raises(ValueError, match="schema mismatch"):
            minhash_index_merge(ia, ic)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
