"""Versioned ANN index roots + crash-safe rebuild-and-swap
(streaming/ingest_ann.py, r12): the action the in-loop drift monitor
recommends, mechanized. Load-bearing invariants:

- a version is visible only once its commit marker lands (written
  LAST), so a torn swap is invisible and a re-run supersedes it;
- ivf_rebuild_swap folds the active version's committed deltas and the
  new version answers like an inline rebuild over the grown index;
- the streaming handoff works: quiesce the loop, swap, resume the SAME
  checkpoint against the new version's root — already-folded source
  files are not re-read, new batches land in the new version;
- retire keeps the top-2 committed versions (in-flight readers of the
  previous version survive a swap);
- pq_rebuild_swap inherits pq_index_rebuild's codes-only refusal.
"""

import numpy as np
import pytest

from pandarallel_spark.operators.similarity import (
    ivf_drift_check,
    ivf_index_build,
    ivf_index_read,
    ivf_list_stats,
    ivf_topk_indexed,
    pq_index_build,
    pq_index_read,
    pq_list_stats,
)
from pandarallel_spark.streaming import (
    ann_current_root,
    ann_versions,
    ivf_rebuild_swap,
    ivf_version_write,
    pq_rebuild_swap,
    pq_version_write,
    retire_ann_versions,
    stream_ingest_ann,
)

_DIM = 8


def _tight(spark, ids, center, seed):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(scale=0.1, size=_DIM) + center])
            for i in ids
        ],
        "vec_id long, embedding array<double>",
    )


def test_version_commit_marker_and_torn_swap_recovery(spark, tmp_path):
    vroot = str(tmp_path / "vroot")
    base = _tight(spark, range(100), 1.0, 3)
    n1 = ivf_version_write(spark, vroot, ivf_index_build(base, n_centroids=4))
    assert n1 == 1 and ann_versions(spark, vroot) == [1]
    path, n = ann_current_root(spark, vroot)
    assert n == 1
    # round-trip: the committed version answers like the source index
    q = _tight(spark, range(900, 903), 1.0, 5)
    want = sorted(
        map(tuple, ivf_topk_indexed(q, ivf_index_build(base, n_centroids=4), k=3).collect())
    )
    got = sorted(
        map(tuple, ivf_topk_indexed(q, ivf_index_read(spark, path), k=3).collect())
    )
    assert got == want

    # torn swap: a v=2 dir WITHOUT the marker is invisible...
    import os

    os.makedirs(f"{vroot}/v=2/lists", exist_ok=True)
    assert ann_versions(spark, vroot) == [1]
    assert ann_current_root(spark, vroot)[1] == 1
    # ...and the next write SKIPS past the torn id (never reuses it
    # in place without overwriting)
    n3 = ivf_version_write(spark, vroot, ivf_index_build(base, n_centroids=4))
    assert n3 == 3 and ann_versions(spark, vroot) == [1, 3]

    # no committed version at all: loud, names the torn-swap case
    empty = str(tmp_path / "empty")
    os.makedirs(f"{empty}/v=1", exist_ok=True)
    with pytest.raises(ValueError, match="torn swap"):
        ann_current_root(spark, empty)


def test_ivf_rebuild_swap_folds_deltas_and_clears_drift(spark, tmp_path):
    """Drifted stream into v=1 → drift verdict fires → rebuild_swap →
    v=2 holds base+deltas with retrained centroids, distortion drops,
    and resuming the SAME checkpoint against v=2 ingests only NEW
    files."""
    import warnings

    vroot = str(tmp_path / "vroot")
    base = _tight(spark, range(120), 1.0, 7)
    ivf_version_write(spark, vroot, ivf_index_build(base, n_centroids=4))
    v1_root, _ = ann_current_root(spark, vroot)
    baseline = ivf_list_stats(ivf_index_read(spark, v1_root))

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    drifted = _tight(spark, range(1000, 1060), -4.0, 11)
    drifted.coalesce(1).write.parquet(src)

    def run_loop(root):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_ingest_ann(
            stream, "vec_id", "embedding", index_root=root, checkpoint=chk
        )
        q.awaitTermination(180)

    run_loop(v1_root)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        verdict = ivf_drift_check(
            ivf_list_stats(ivf_index_read(spark, v1_root, include_deltas=True)),
            baseline=baseline, max_imbalance=100.0,
        )
    assert verdict["rebuild_recommended"]

    n2 = ivf_rebuild_swap(spark, vroot)
    assert n2 == 2
    v2_root, _ = ann_current_root(spark, vroot)
    grown = ivf_index_read(spark, v2_root)
    # every vector (base + streamed delta) made it into the new version
    assert grown.count() == 180
    # retrained centroids describe BOTH clusters: distortion drops well
    # below the drifted index's level
    def mean_err(stats):
        rows = stats.collect()
        n = sum(r["n_vectors"] for r in rows)
        return sum((r["mean_sq_dist"] or 0.0) * r["n_vectors"] for r in rows) / n

    drifted_err = mean_err(
        ivf_list_stats(ivf_index_read(spark, v1_root, include_deltas=True))
    )
    assert mean_err(ivf_list_stats(grown)) < 0.5 * drifted_err

    # streaming handoff: same checkpoint, new root — the already-folded
    # source file is NOT re-ingested (no delta dirs appear)...
    run_loop(v2_root)
    assert ivf_index_read(spark, v2_root, include_deltas=True).count() == 180
    # ...and a genuinely new file lands in the new version's delta/
    _tight(spark, range(2000, 2020), 1.0, 13).coalesce(1).write.parquet(
        src, mode="append"
    )
    run_loop(v2_root)
    assert ivf_index_read(spark, v2_root, include_deltas=True).count() == 200
    # old version untouched throughout
    assert ivf_index_read(spark, v1_root).count() == 120

    # retire: keeps the top-2 committed — here both survive (only 2)
    assert retire_ann_versions(spark, vroot) == []
    n3 = ivf_rebuild_swap(spark, vroot)
    assert n3 == 3
    assert retire_ann_versions(spark, vroot) == [1]
    assert ann_versions(spark, vroot) == [2, 3]
    with pytest.raises(ValueError, match="≥ 2"):
        retire_ann_versions(spark, vroot, keep=1)


def test_pq_rebuild_swap_and_codes_only_refusal(spark, tmp_path):
    vroot = str(tmp_path / "pq_vroot")
    base = _tight(spark, range(100), 1.0, 17)
    lists, meta = pq_index_build(base, n_centroids=4, m=4, n_codes=8)
    assert pq_version_write(spark, vroot, lists, meta) == 1
    n2 = pq_rebuild_swap(spark, vroot, seed=5)
    assert n2 == 2
    v2, _ = ann_current_root(spark, vroot)
    rl, rm = pq_index_read(spark, v2)
    assert rl.count() == 100
    # stats run clean against the new version's own metadata
    assert pq_list_stats(rl, rm).count() == 4

    # codes-only version: the swap inherits pq_index_rebuild's refusal
    nv = str(tmp_path / "pq_novec")
    nl, nm = pq_index_build(
        base, n_centroids=4, m=4, n_codes=8, store_vectors=False
    )
    pq_version_write(spark, nv, nl, nm)
    with pytest.raises(ValueError, match="store_vectors=True"):
        pq_rebuild_swap(spark, nv)
