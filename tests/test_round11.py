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
# Task 2 + 6 — ingest housekeeping (compaction, retention), fresh-checkpoint
# refusal (ADVICE r10 medium), torn-batch replay
# ---------------------------------------------------------------------------

_BASE = "the quick brown fox jumps over the lazy dog again and again"
_WAVES = [
    [(100, _BASE + " alpha"),
     (101, "first wave unique doc about join reordering")],
    [(200, _BASE + " alpha"),  # exact dup of 100 → dropped
     (201, "second wave fresh doc about shuffle partitions")],
    [(300, "second wave fresh doc about shuffle partitions"),  # dup of 201
     (301, "third wave genuinely new content on broadcast joins")],
]
_INGEST_KW = dict(n=2, num_perm=16, threshold=0.4, bands=8)


def _write_waves(spark, src, waves):
    for i, w in enumerate(waves):
        spark.createDataFrame(w, "id long, text string").coalesce(1).write.parquet(
            src, mode="append" if i else "overwrite"
        )


def _run_ingest(spark, src, corpus_root, index_root, chk):
    from pandarallel_spark.streaming import stream_ingest_dedup

    q = stream_ingest_dedup(
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        "id", "text",
        corpus_root=corpus_root, index_root=index_root, checkpoint=chk,
        **_INGEST_KW,
    )
    q.awaitTermination(180)
    return q


def test_compact_and_retain_preserve_reader_and_resume(spark, tmp_path):
    """Compaction folds every committed batch dir but the newest into
    one: read_retained_corpus is row-identical before/after, the
    surviving dir carries the SECOND-highest committed id (the newest
    batch stays replayable), index retention keeps the top versions —
    and a resumed stream keeps deduping correctly against the
    compacted state."""
    from pandarallel_spark.streaming import (
        compact_retained_corpus,
        read_retained_corpus,
        retain_index_versions,
    )

    src = str(tmp_path / "src")
    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    chk = str(tmp_path / "chk")
    _write_waves(spark, src, _WAVES)
    _run_ingest(spark, src, corpus_root, index_root, chk)

    before = sorted(
        (r.id, r.text)
        for r in read_retained_corpus(spark, corpus_root).collect()
    )
    dirs_before = sorted(
        x.name for x in (tmp_path / "corpus").iterdir()
        if x.name.startswith("ingest_batch=")
    )
    assert len(dirs_before) == 3

    target = compact_retained_corpus(spark, corpus_root)
    assert target == 1  # second-highest committed id; batch 2 untouched
    after = sorted(
        (r.id, r.text)
        for r in read_retained_corpus(spark, corpus_root).collect()
    )
    assert after == before
    dirs_after = sorted(
        x.name for x in (tmp_path / "corpus").iterdir()
        if x.name.startswith("ingest_batch=")
    )
    assert dirs_after == ["ingest_batch=1", "ingest_batch=2"]
    # nothing left to compact → no-op
    assert compact_retained_corpus(spark, corpus_root) is None

    dropped = retain_index_versions(spark, index_root, keep=2)
    assert dropped == [0]
    assert sorted(
        x.name for x in (tmp_path / "index").iterdir() if x.name.startswith("v=")
    ) == ["v=1", "v=2"]
    with pytest.raises(ValueError, match="keep"):
        retain_index_versions(spark, index_root, keep=1)

    # resume with a fourth wave: a dup of a COMPACTED doc must still be
    # recognized and dropped; genuinely new content survives
    _write_waves(spark, src, _WAVES + [[
        (400, _BASE + " alpha"),  # dup of compacted wave-1 content
        (401, "fourth wave novel doc about adaptive query execution"),
    ]])
    _run_ingest(spark, src, corpus_root, index_root, chk)
    got = sorted(r.id for r in read_retained_corpus(spark, corpus_root).collect())
    assert 401 in got and 400 not in got
    assert [i for (i, _) in before] == [i for i in got if i < 400]


def test_interrupted_compaction_rolls_forward(spark, tmp_path):
    """A crash between the manifest write and the directory swap leaves
    a pending manifest: readers refuse loudly, and the next compaction
    call rolls the swap forward to the exact same rows."""
    import json

    from pandarallel_spark.streaming import (
        compact_retained_corpus,
        read_retained_corpus,
    )
    from pandarallel_spark.streaming.ingest import _fs

    corpus_root = str(tmp_path / "corpus")
    all_rows = []
    for b in range(4):
        rows = [(10 * b + j, f"doc {b}-{j} about topic {b}") for j in range(2)]
        all_rows += rows
        spark.createDataFrame(rows, "id long, text string").write.parquet(
            f"{corpus_root}/ingest_batch={b}"
        )
    # simulate the torn state: tmp (combined 0+1) durably written and
    # the manifest recorded, but no source deleted yet
    spark.read.parquet(
        f"{corpus_root}/ingest_batch=0", f"{corpus_root}/ingest_batch=1"
    ).write.parquet(f"{corpus_root}/.compact_tmp")
    jvm, fs, root = _fs(spark, corpus_root)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(root, "_compacting"), True)
    out.writeUTF(json.dumps({"sources": [0, 1], "target": 1}))
    out.close()

    with pytest.raises(RuntimeError, match="compaction is pending"):
        read_retained_corpus(spark, corpus_root)

    # the next call rolls forward, then compacts the rest as usual
    compact_retained_corpus(spark, corpus_root)
    got = sorted(
        (r.id, r.text) for r in read_retained_corpus(spark, corpus_root).collect()
    )
    assert got == sorted(all_rows)
    assert not (tmp_path / "corpus" / "_compacting").exists()
    assert not (tmp_path / "corpus" / ".compact_tmp").exists()


def test_fresh_checkpoint_over_old_outputs_is_refused(spark, tmp_path):
    """Restarting with a NEW checkpoint dir over existing output roots
    resets batch numbering to 0 — the loop must refuse (batch 0 sees
    committed directories from later batches) instead of silently
    overwriting ingest_batch=0 / v=0 (ADVICE r10)."""
    src = str(tmp_path / "src")
    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    _write_waves(spark, src, _WAVES)
    _run_ingest(spark, src, corpus_root, index_root, str(tmp_path / "chk"))
    dirs_before = sorted(x.name for x in (tmp_path / "corpus").iterdir())

    from pandarallel_spark.streaming import stream_ingest_dedup

    q = stream_ingest_dedup(
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        "id", "text",
        corpus_root=corpus_root, index_root=index_root,
        checkpoint=str(tmp_path / "chk_fresh"),  # ← relocated checkpoint
        **_INGEST_KW,
    )
    with pytest.raises(Exception, match="checkpoint"):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()
    # nothing was overwritten
    assert sorted(x.name for x in (tmp_path / "corpus").iterdir()) == dirs_before


def test_torn_batch_replay_overwrites_cleanly(spark, tmp_path):
    """Kill between the corpus write and the index write of the LAST
    batch (corpus dir committed, index version missing, checkpoint
    commit gone): the restarted stream must replay that batch, rewrite
    both outputs, and land on exactly the pre-crash state."""
    from pandarallel_spark.streaming import read_retained_corpus

    src = str(tmp_path / "src")
    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    chk = str(tmp_path / "chk")
    _write_waves(spark, src, _WAVES)
    _run_ingest(spark, src, corpus_root, index_root, chk)

    want_ids = sorted(r.id for r in read_retained_corpus(spark, corpus_root).collect())
    want_index = {
        r["__fp__"]: (r["__sz__"], r["__eid__"], r["__members__"])
        for r in spark.read.parquet(f"{index_root}/v=2").collect()
    }

    # tear batch 2: the index write "never happened" and neither did the
    # checkpoint's commit record — the classic crash window
    import shutil

    shutil.rmtree(tmp_path / "index" / "v=2")
    (tmp_path / "chk" / "commits" / "2").unlink()
    crc = tmp_path / "chk" / "commits" / ".2.crc"
    if crc.exists():  # local-FS checksum shadow of the commit record
        crc.unlink()

    _run_ingest(spark, src, corpus_root, index_root, chk)
    assert sorted(
        r.id for r in read_retained_corpus(spark, corpus_root).collect()
    ) == want_ids
    got_index = {
        r["__fp__"]: (r["__sz__"], r["__eid__"], r["__members__"])
        for r in spark.read.parquet(f"{index_root}/v=2").collect()
    }
    assert got_index == want_index


# ---------------------------------------------------------------------------
# ADVICE r10 — strictLazy contract fixes
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Task 4 — auto-sized candidate broadcast
# ---------------------------------------------------------------------------


def test_broadcast_candidates_auto_probes_and_bounds(spark):
    """\"auto\" broadcasts only when the bounded probe proves the
    candidate set fits under the cap; both outcomes are
    result-identical to the explicit booleans, and strictLazy resolves
    to False without launching any job."""
    from pandarallel_spark.operators.dedup import (
        minhash_lsh_pairs,
        resolve_broadcast_candidates,
    )

    docs = _mk(spark, [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different content about spark engines"),
    ])
    kw = dict(n=2, num_perm=16, bands=8, threshold=0.4)
    want = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(
            docs, "id", "text", broadcast_candidates=True, **kw
        ).collect()
    }
    # small corpus: auto probes → fits → broadcast; same rows
    auto = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
    }
    assert auto == want and len(want) > 0

    # a cap of 0 can never fit → auto resolves to the AQE path; rows
    # are still identical (only the join hint changes)
    spark.conf.set("spark.pandarallel_spark.candidateBroadcastCap", "0")
    try:
        tiny = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
        }
        assert tiny == want
        probe = spark.range(5).select(F.lit("x").alias("__fa__"))
        assert resolve_broadcast_candidates(probe, "auto") is False
    finally:
        spark.conf.unset("spark.pandarallel_spark.candidateBroadcastCap")
    probe = spark.range(5).select(F.lit("x").alias("__fa__"))
    assert resolve_broadcast_candidates(probe, "auto") is True
    assert resolve_broadcast_candidates(probe, True) is True
    assert resolve_broadcast_candidates(probe, False) is False

    # strictLazy: no probe job — auto is False, decided plan-side
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        assert resolve_broadcast_candidates(probe, "auto") is False
        assert tracker.getJobIdsForGroup(None) == before
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


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


# ---------------------------------------------------------------------------
# Task 3 — IVF index append + centroid sidecar (ADVICE r10)
# ---------------------------------------------------------------------------


def _ivf_fixtures(spark, seed=31, dim=8, n_corpus=200, n_new=60, n_q=6):
    rng = np.random.default_rng(seed)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_corpus)],
        "vec_id long, embedding array<double>",
    )
    # new ids all ABOVE the corpus ids, so first-n-by-id centroids of
    # the union equal the original corpus's — the precondition for the
    # append == rebuild-over-union equivalence asserted below
    new = spark.createDataFrame(
        [(1000 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_new)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(5000 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_q)],
        "vec_id long, embedding array<double>",
    )
    return corpus, new, queries


def test_ivf_index_append_equals_rebuild_and_inline(spark, tmp_path):
    """append(index, new) must assign new vectors with the index's OWN
    centroids: index ∪ appended is row-for-row what a rebuild over the
    unioned corpus produces (same centroid rule by construction), and
    ivf_topk_indexed over it equals the inline ivf_topk on the union —
    including through a partitioned parquet append."""
    from pandarallel_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_topk,
        ivf_topk_indexed,
    )

    corpus, new, queries = _ivf_fixtures(spark)
    n_cent = 10
    index = ivf_index_build(corpus, n_centroids=n_cent)
    appended = ivf_index_append(index, new)

    def rows(df):
        return sorted(
            (r["c_id"], r["__cid__"], tuple(r["__cvec__"]),
             r["__ivf_dim__"], tuple(r["__ivf_cids__"]))
            for r in df.collect()
        )

    rebuilt = ivf_index_build(
        corpus.unionByName(new), n_centroids=n_cent
    )
    assert rows(index.unionByName(appended)) == rows(rebuilt)

    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_topk(
            queries, corpus.unionByName(new), k=4, n_centroids=n_cent, nprobe=3
        ).collect()
    )
    got = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_topk_indexed(
            queries, index.unionByName(appended), k=4, nprobe=3
        ).collect()
    )
    assert got == inline

    # the persisted-ingest move: append lands NEW files in the same
    # partitioned layout; reading back answers identically
    pth = str(tmp_path / "ivf")
    index.write.partitionBy("__cid__").parquet(pth)
    ivf_index_append(spark.read.parquet(pth), new).write.mode(
        "append"
    ).partitionBy("__cid__").parquet(pth)
    got_p = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_topk_indexed(
            queries, spark.read.parquet(pth), k=4, nprobe=3
        ).collect()
    )
    assert got_p == inline

    # schema guard + strictLazy gate
    with pytest.raises(ValueError, match="not an IVF index"):
        ivf_index_append(corpus, new)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="ivf_index_append"):
            ivf_index_append(index, new)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_ivf_sidecar_write_read_round_trip(spark, tmp_path):
    """ivf_index_write persists the centroid set ONCE (sidecar), not
    per row; ivf_index_read reattaches it as literals — answers equal
    the in-row format's, partition pruning still fires, and the on-disk
    list rows carry no metadata arrays."""
    import re

    from pandarallel_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_read,
        ivf_index_write,
        ivf_topk,
        ivf_topk_indexed,
    )

    corpus, _, queries = _ivf_fixtures(spark)
    n_cent = 10
    index = ivf_index_build(corpus, n_centroids=n_cent)
    pth = str(tmp_path / "ivf_sc")
    ivf_index_write(index, pth)

    # the lists on disk are lean: no per-row centroid arrays
    lists = spark.read.parquet(f"{pth}/lists")
    assert set(lists.columns) == {"c_id", "__cvec__", "__cid__"}
    meta = spark.read.parquet(f"{pth}/meta")
    assert meta.count() == 1

    loaded = ivf_index_read(spark, pth)
    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_topk(
            queries, corpus, k=4, n_centroids=n_cent, nprobe=3
        ).collect()
    )
    got_df = ivf_topk_indexed(queries, loaded, k=4, nprobe=3)
    got = sorted((r.q_id, r.rank, r.c_id, r.score) for r in got_df.collect())
    assert got == inline

    # static pruning holds through the sidecar path: the lists scan
    # carries the literal probed-cid partition filter
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "__cid__" in pf.group(1) and " IN " in pf.group(1), plan[:1500]

    # overwrite semantics + strictLazy gate on the read
    ivf_index_write(index, pth, mode="overwrite")
    assert ivf_index_read(spark, pth).count() == corpus.count()
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="ivf_index_read"):
            ivf_index_read(spark, pth)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


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


# ---------------------------------------------------------------------------
# IVF drift probe: ivf_list_stats + ivf_drift_check
# ---------------------------------------------------------------------------


def test_ivf_list_stats_match_numpy(spark):
    """Per-list mean squared distortion equals an independent numpy
    computation over the index's own rows (stored vector vs stored
    assignment's centroid, both on the quantized grid)."""
    from pandarallel_spark.operators.similarity import (
        _np_quant,
        ivf_index_build,
        ivf_list_stats,
    )

    corpus, _, _ = _ivf_fixtures(spark)
    index = ivf_index_build(corpus, n_centroids=8)
    got = {
        r["__cid__"]: (r["n_vectors"], r["mean_sq_dist"])
        for r in ivf_list_stats(index).collect()
    }

    rows = index.collect()
    meta = rows[0]
    cids = list(meta["__ivf_cids__"])
    cmat = _np_quant(np.array([list(v) for v in meta["__ivf_cvecs__"]]))
    per_list = {}
    for r in rows:
        q = _np_quant(np.array([list(r["__cvec__"])]))[0]
        c = cmat[cids.index(r["__cid__"])]
        per_list.setdefault(r["__cid__"], []).append(float(((q - c) ** 2).sum()))
    want = {k: (len(v), float(np.mean(v))) for k, v in per_list.items()}
    assert set(got) == set(want)
    for k, (n, m) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(m, rel=1e-12)


def test_ivf_drift_check_flags_drift_and_imbalance(spark):
    """A fresh index passes against its own baseline; appending a
    SHIFTED distribution (ivf_index_append keeps the original
    centroids by design) pushes distortion and imbalance past the
    bounds and recommends a rebuild, loudly."""
    import warnings

    from pandarallel_spark.operators.similarity import (
        ivf_drift_check,
        ivf_index_append,
        ivf_index_build,
        ivf_list_stats,
    )

    corpus, _, _ = _ivf_fixtures(spark)
    index = ivf_index_build(corpus, n_centroids=8)
    base = ivf_list_stats(index)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning on the healthy index
        rep = ivf_drift_check(base, baseline=base)
    assert rep["rebuild_recommended"] is False
    assert rep["distortion_ratio"] == pytest.approx(1.0)
    assert rep["imbalance"] >= 1.0

    # drifted delta: far from every trained centroid, collapses into
    # whichever list is nearest -> distortion and imbalance both blow up
    rng = np.random.default_rng(99)
    dim = 8
    shifted = spark.createDataFrame(
        [
            (2000 + i, [float(x + 25.0) for x in rng.normal(size=dim)])
            for i in range(600)
        ],
        "vec_id long, embedding array<double>",
    )
    grown = index.unionByName(ivf_index_append(index, shifted))
    with pytest.warns(UserWarning, match="rebuild recommended"):
        rep2 = ivf_drift_check(ivf_list_stats(grown), baseline=base)
    assert rep2["rebuild_recommended"] is True
    assert rep2["distortion_ratio"] > 2.0
    assert rep2["reasons"]

    # validation
    with pytest.raises(ValueError, match="ivf_list_stats frame"):
        ivf_drift_check(index)
    with pytest.raises(ValueError, match="not an IVF index"):
        from pandarallel_spark.operators.similarity import ivf_list_stats as s

        s(corpus)


def test_ivf_drift_counts_empty_lists_in_imbalance(spark):
    """Concentration with the REST of the lists empty (e.g. after
    compaction or drift) must read as imbalance — ivf_list_stats emits
    zero rows for every centroid in the metadata universe, not just
    the present ones."""
    from pandarallel_spark.operators.similarity import (
        ivf_drift_check,
        ivf_index_build,
        ivf_list_stats,
    )

    corpus, _, _ = _ivf_fixtures(spark)
    index = ivf_index_build(corpus, n_centroids=8)
    one_list = index.filter(
        F.col("__cid__") == index.select("__cid__").first()[0]
    )
    stats = {r["__cid__"]: r for r in ivf_list_stats(one_list).collect()}
    assert len(stats) == 8  # full centroid universe, not just present
    assert sum(1 for r in stats.values() if r["n_vectors"] == 0) == 7
    assert all(
        r["mean_sq_dist"] is None for r in stats.values() if r["n_vectors"] == 0
    )
    with pytest.warns(UserWarning, match="imbalance"):
        rep = ivf_drift_check(ivf_list_stats(one_list))
    assert rep["imbalance"] == pytest.approx(8.0)
    assert rep["rebuild_recommended"] is True


def test_embedding_seed_must_fit_index_metadata(spark):
    """__idx_seed__ persists as int32 — a wider seed would silently
    wrap and later cycles would project onto DIFFERENT planes than the
    stored bits; refuse at build time."""
    from pandarallel_spark.operators.incremental_embedding import (
        embedding_index_build,
    )

    df = spark.createDataFrame([(1, [1.0, 0.0])], "id long, emb array<double>")
    with pytest.raises(ValueError, match="32-bit"):
        embedding_index_build(df, "id", "emb", planes=8, seed=2**33, dim=2)


def test_ivf_drift_check_rejects_vectorless_stats(spark):
    """Hand-built or degenerate stats frames with zero total vectors
    raise loudly on BOTH sides instead of 0/0-NaN silently disabling
    the distortion check."""
    from pandarallel_spark.operators.similarity import (
        ivf_drift_check,
        ivf_index_build,
        ivf_list_stats,
    )

    empty_stats = spark.createDataFrame(
        [(0, 0, None), (1, 0, None)],
        "__cid__ bigint, n_vectors bigint, mean_sq_dist double",
    )
    with pytest.raises(ValueError, match="holds no vectors"):
        ivf_drift_check(empty_stats)
    corpus, _, _ = _ivf_fixtures(spark)
    good = ivf_list_stats(ivf_index_build(corpus, n_centroids=8))
    with pytest.raises(ValueError, match="POPULATED build-time"):
        ivf_drift_check(good, baseline=empty_stats)
