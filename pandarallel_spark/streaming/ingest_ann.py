"""Continuous ANN ingest: a Structured Streaming loop around the
persisted IVF index — the similarity twin of ``ingest.py``'s dedup
loop, closing the last ingest asymmetry (dedup has had a streaming
loop since r10; the IVF index could only be appended batch-wise).

Layout, on top of :func:`similarity.ivf_index_write`'s root:

- ``{root}/lists/``        — the base index (partitioned by __cid__)
- ``{root}/meta/``         — the one-row centroid sidecar
- ``{root}/delta/b={id}/`` — one dir per micro-batch, each itself
  partitioned by ``__cid__`` so static probed-list pruning holds for
  delta rows exactly as for base rows (overwrite per dir)

Idempotency is the dedup loop's scheme verbatim: Structured Streaming
replays a failed batch with the same batchId, the replay OVERWRITES
its own ``b={id}`` dir, and readers trust only ``_SUCCESS``-committed
dirs — so a crash mid-write is invisible. The same reset-checkpoint
refusal applies: delta dirs from batches LATER than the current one
mean the checkpoint and the index root have come apart.

Housekeeping: :func:`compact_ivf_deltas` folds committed delta dirs
strictly below the newest into one (the shared tmp-then-manifest
crash protocol, partition layout preserved); the full fold into
``lists/`` is MECHANIZED (r12) by the versioned-root API at the bottom
of this module: ``{vroot}/v={n}/`` dirs each holding a complete index
root, committed by an ``_INDEX_COMMITTED`` marker written LAST —
:func:`ivf_rebuild_swap`/:func:`pq_rebuild_swap` read the active
version with its committed deltas, retrain from the stored vectors,
and write+commit the next version in one crash-safe call (a torn swap
leaves an uncommitted dir readers ignore); :func:`ann_current_root`
resolves the active version, :func:`retire_ann_versions` drops
superseded ones keeping the top two.

Centroids are NEVER retrained by the loop (appends assign with the
index's own stored centroids — the IVF trade); staleness is watched
either out-of-band (``similarity.ivf_list_stats``/``ivf_drift_check``
over ``ivf_index_read(root, include_deltas=True)`` on whatever cadence
the deployment likes) or — r12 — IN the loop via the
``drift_check_every=N`` hook both loops take: every N non-empty
batches the loop runs the matching stats operator over the grown
index, feeds :func:`similarity.ivf_drift_check` (against the
build-time ``drift_baseline`` snapshot when given), and hands the
verdict — ``rebuild_recommended`` and all — to the ``on_drift``
callback, closing the loop the r11 drift operators opened: the
monitoring now lives where the drift accumulates. Rebuild with
``ivf_index_rebuild``/``pq_index_rebuild`` when it fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandarallel_spark.streaming.ingest import (
    _committed_batches,
    _compact_numbered_dirs,
    _fs,
    _list_numbered,
    _refuse_pending_compaction,
)

# the VERSION-level commit marker: meta/ and lists/ each carry Spark's
# own per-directory _SUCCESS, but a version is only trustworthy once
# ALL its parts are durable — the marker is written LAST, so a torn
# swap leaves an uncommitted v= dir readers never see
_VERSION_MARKER = "_INDEX_COMMITTED"


def compact_ivf_deltas(spark: SparkSession, index_root: str) -> int | None:
    """Fold the committed ``delta/b=`` dirs STRICTLY BELOW the highest
    committed batch into one, preserving the ``__cid__`` partition
    layout — returns the surviving dir's batch id (or None when fewer
    than two qualify). Crash-safe and replay-compatible by the same
    argument as :func:`ingest.compact_retained_corpus` (the newest dir
    stays untouched because its batch may replay); run it between
    stream runs."""
    return _compact_numbered_dirs(
        spark, f"{index_root}/delta", "b=", partition_by=["__cid__"]
    )


def read_ivf_deltas(spark: SparkSession, index_root: str) -> DataFrame | None:
    """The committed delta rows ``(c_id, __cvec__, __cid__)`` — only
    ``_SUCCESS``-carrying ``delta/b=`` dirs, so a torn batch's
    half-written dir never reaches a reader. None when no deltas exist.
    Refuses while a delta compaction manifest is pending."""
    droot = f"{index_root}/delta"
    _refuse_pending_compaction(spark, droot, "compact_ivf_deltas", "reading")
    committed = _committed_batches(spark, droot, "b=")
    if not committed:
        return None
    # basePath makes Spark treat the b= dirs as partitions of ONE table
    # (reading several __cid__-partitioned roots without it trips
    # CONFLICTING_DIRECTORY_STRUCTURES); the batch id column is then
    # dropped — it is bookkeeping, not data
    df = spark.read.option("basePath", droot).parquet(
        *[f"{droot}/b={b}" for b in committed]
    )
    return df.select(
        "c_id", "__cvec__", df["__cid__"].cast("bigint").alias("__cid__")
    )


def compact_pq_deltas(spark: SparkSession, index_root: str) -> int | None:
    """PQ twin of :func:`compact_ivf_deltas` — the generic fold works
    on any ``delta/b=`` layout partitioned by ``__cid__``, whatever
    columns the rows carry (here ``__codes__`` and optionally
    ``__cvec__``); ONE implementation, two names."""
    return compact_ivf_deltas(spark, index_root)


def _delta_ingest_loop(
    stream: DataFrame,
    *,
    index_root: str,
    checkpoint: str,
    tool: str,
    prepare,
    trigger_available_now: bool,
    monitor=None,
    partition_by: list[str] | None = None,
):
    """The shared delta-ingest scaffolding of both ANN loops: per
    micro-batch — empty-batch skip, pending-compaction refusal,
    reset-checkpoint stale-dir refusal, ``prepare(batch_df)`` to the
    writable rows, idempotent overwrite of ``delta/b={batchId}``
    partitioned by ``__cid__``, then the optional ``monitor(batch_id)``
    hook AFTER the write commits (so the check sees the batch it
    follows; a replayed batch re-runs its check — monitoring is
    idempotent-safe because it writes nothing). One definition so a
    fix to the replay protocol cannot reach one loop and miss the
    other."""
    spark = stream.sparkSession
    droot = f"{index_root}/delta"

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        _refuse_pending_compaction(
            spark, droot, tool, "resuming the ingest loop"
        )
        stale = sorted(
            b for b in _list_numbered(spark, droot, "b=") if b > batch_id
        )
        if stale:
            raise RuntimeError(
                f"batch {batch_id} found delta dirs from LATER batches: "
                f"{stale[:4]}{'…' if len(stale) > 4 else ''} — the "
                "checkpoint was reset or relocated independently of "
                "index_root. Resume with the original checkpoint, or "
                "start over against a fresh root."
            )
        w = prepare(batch_df).write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{droot}/b={batch_id}")
        if monitor is not None:
            try:
                monitor(batch_id)
            except Exception as exc:  # noqa: BLE001 — observation must
                # never take down ingest: the monitor runs AFTER the
                # delta write but BEFORE the checkpoint commit, so a
                # raising callback (metrics sink down, stats job
                # transient failure) would fail the batch and
                # crash-loop the replay on the same error forever
                # (review finding r12). Warn loudly instead.
                import warnings

                warnings.warn(
                    f"drift monitor failed on batch {batch_id} "
                    f"({exc!r}) — ingest continues; the check re-runs "
                    "on the next cadence hit",
                    stacklevel=2,
                )

    w = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _drift_monitor(
    spark: SparkSession,
    index_root: str,
    kind: str,
    *,
    every: int,
    baseline: DataFrame | None,
    on_drift,
    max_imbalance: float,
    max_distortion_ratio: float,
    meta: DataFrame | None = None,
    dim: int | None = None,
):
    """The every-N-batches drift hook shared by both loops: run the
    family's list-stats operator over the GROWN index (base + committed
    deltas), feed :func:`similarity.ivf_drift_check` (which WARNS on an
    exceeded bound), and hand the verdict — with the triggering
    ``batch_id`` added — to ``on_drift``. Counts non-empty batches, not
    batch ids (ids need not be consecutive across restarts). Cost: one
    scan of the index every N batches — the deployment's cadence dial;
    nothing is written, so a replayed batch re-checking is harmless."""
    if every < 1:
        raise ValueError(f"drift_check_every must be ≥ 1, got {every}")
    state = {"n": 0}

    def monitor(batch_id: int) -> None:
        state["n"] += 1
        if state["n"] % every:
            return
        from pandarallel_spark.operators.similarity import (
            ivf_drift_check,
            ivf_list_stats,
            ivf_index_read,
            pq_index_read,
            pq_list_stats,
        )

        if kind == "ivf":
            grown = ivf_index_read(spark, index_root, include_deltas=True)
            stats = ivf_list_stats(grown, dim=dim)
        else:
            grown_lists, _m = pq_index_read(
                spark, index_root, include_deltas=True
            )
            stats = pq_list_stats(grown_lists, meta)
        verdict = ivf_drift_check(
            stats,
            baseline=baseline,
            max_imbalance=max_imbalance,
            max_distortion_ratio=max_distortion_ratio,
        )
        verdict["batch_id"] = batch_id
        if on_drift is not None:
            on_drift(verdict)

    return monitor


def _check_batch_width(
    batch_df: DataFrame, vec_col: str, dim: int, op: str
) -> None:
    """One bounded row: a delta whose vectors are the wrong width must
    fail loudly at the batch boundary naming both dims, not as an
    opaque numpy matmul shape error inside an executor (and, in a
    streaming loop, a poison-pill replay)."""
    head = batch_df.select(vec_col).limit(1).collect()
    if head and head[0][vec_col] is not None:
        got = len(list(head[0][vec_col]))
        if got != dim:
            raise ValueError(
                f"{op}: the index was built on {dim}-wide vectors but "
                f"this delta's {vec_col!r} vectors are {got}-wide — "
                "re-embed the delta or rebuild the index"
            )


def read_pq_deltas(
    spark: SparkSession, index_root: str, columns: list[str]
) -> DataFrame | None:
    """The committed PQ delta rows, projected to the base lists'
    ``columns`` (so the union is schema-exact whichever
    ``store_vectors`` layout the index uses) — only
    ``_SUCCESS``-carrying ``delta/b=`` dirs; None when no deltas
    exist. Refuses while a delta compaction manifest is pending."""
    droot = f"{index_root}/delta"
    _refuse_pending_compaction(spark, droot, "compact_pq_deltas", "reading")
    committed = _committed_batches(spark, droot, "b=")
    if not committed:
        return None
    df = spark.read.option("basePath", droot).parquet(
        *[f"{droot}/b={b}" for b in committed]
    )
    return df.withColumn(
        "__cid__", df["__cid__"].cast("bigint")
    ).select(*columns)


def stream_ingest_pq(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    index_root: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    drift_check_every: int | None = None,
    drift_baseline: DataFrame | None = None,
    on_drift=None,
    drift_max_imbalance: float = 4.0,
    drift_max_distortion_ratio: float = 2.0,
):
    """The PQ twin of :func:`stream_ingest_ann`: a continuous encode
    loop over an index persisted by :func:`similarity.pq_index_write`.
    Centroids AND codebooks are recovered from the metadata sidecar
    ONCE at loop start (the loop never retrains — the PQ append
    trade); each micro-batch pays one Arrow-batched encode pass
    (coarse assignment + per-subspace code argmin, no shuffle) and
    one overwrite of its ``delta/b={id}`` dir partitioned by
    ``__cid__`` — the same idempotency, ``_SUCCESS``-gating, and
    reset-checkpoint refusal as the Flat loop. Delta rows follow the
    base lists' ``store_vectors`` layout, so
    ``pq_topk_indexed(queries, *pq_index_read(spark, root,
    include_deltas=True))`` answers over the grown index with the
    exact rerank (or pure-ADC ranking) the base index was built
    with.

    ``drift_check_every=N`` (r12) runs :func:`similarity.pq_list_stats`
    over the grown index every N non-empty batches, feeds
    :func:`similarity.ivf_drift_check` against ``drift_baseline`` (the
    build-time stats snapshot; None checks imbalance only), and hands
    the verdict + ``batch_id`` to ``on_drift`` — reconstruction error
    IS codebook staleness, so this hook is how a continuously-fed PQ
    index learns it needs :func:`similarity.pq_index_rebuild`. Requires
    a ``store_vectors=True`` index (refused loudly at loop start —
    codes-only rows carry no vectors to measure against)."""
    from pandarallel_spark.operators._memo import eager_build_guard
    from pandarallel_spark.operators.similarity import (
        _pq_encode,
        _pq_index_meta,
        pq_index_read,
    )

    spark = stream.sparkSession
    eager_build_guard(
        spark,
        "stream_ingest_pq metadata recovery (one-row bounded collect)",
        "The ingest loop is eager by design — run it from a session "
        "that permits build-time jobs.",
    )
    lists, meta = pq_index_read(spark, index_root)
    (dim, _, _, by_residual, vec_type, cent_ids, c_mat, cb) = _pq_index_meta(
        meta, "stream_ingest_pq"
    )
    store_vectors = "__cvec__" in lists.columns
    out_cols = [c for c in lists.columns if c != "__cid__"] + ["__cid__"]
    monitor = None
    if drift_check_every is not None:
        if not store_vectors:
            raise ValueError(
                "stream_ingest_pq: drift_check_every needs a "
                "store_vectors=True index — codes-only rows carry no "
                "vectors to measure reconstruction error against; "
                "monitor a vector-carrying twin, or rebuild on a fixed "
                "cadence instead"
            )
        monitor = _drift_monitor(
            spark, index_root, "pq",
            every=drift_check_every, baseline=drift_baseline,
            on_drift=on_drift, max_imbalance=drift_max_imbalance,
            max_distortion_ratio=drift_max_distortion_ratio, meta=meta,
        )

    def prepare(batch_df: DataFrame) -> DataFrame:
        _check_batch_width(batch_df, vec_col, dim, "stream_ingest_pq")
        return _pq_encode(
            batch_df, id_col, vec_col, c_mat, cent_ids, cb, by_residual,
            vec_type, store_vectors=store_vectors,
        ).select(*out_cols)

    return _delta_ingest_loop(
        stream,
        index_root=index_root,
        checkpoint=checkpoint,
        tool="compact_pq_deltas",
        prepare=prepare,
        trigger_available_now=trigger_available_now,
        monitor=monitor,
        partition_by=["__cid__"],
    )


def stream_ingest_ann(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    index_root: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    drift_check_every: int | None = None,
    drift_baseline: DataFrame | None = None,
    on_drift=None,
    drift_max_imbalance: float = 4.0,
    drift_max_distortion_ratio: float = 2.0,
):
    """Run the ANN ingest loop over ``stream``; returns the started
    ``StreamingQuery``. ``index_root`` must hold an index persisted by
    :func:`similarity.ivf_index_write` (the loop never creates one —
    centroids come from training, which is a batch decision).

    The centroid set is recovered from the sidecar ONCE, when the loop
    starts (the loop's own contract is that centroids never change
    while it runs); each micro-batch then pays exactly one
    Arrow-batched assignment matmul over its own rows (no shuffle, no
    per-batch driver collect, no per-batch lists/ listing) and one
    overwrite of its ``delta/b={id}`` dir partitioned by ``__cid__``.
    Query the growing index with ``ivf_topk_indexed(queries,
    ivf_index_read(spark, root, include_deltas=True))`` — answers come
    from the STORED centroids, exactly like ``ivf_index_append``: they
    equal the inline path on the unioned corpus whenever the union's
    centroid rule would pick the same centroids (delta ids above the
    base ids), and otherwise differ precisely because the index keeps
    its trained centroids while a from-scratch inline run would train
    on the union — the IVF append trade, not a bug.

    ``drift_check_every=N`` (r12) runs :func:`similarity.ivf_list_stats`
    over the grown index every N non-empty batches, feeds
    :func:`similarity.ivf_drift_check` against ``drift_baseline`` (the
    build-time stats snapshot; None checks imbalance only), and hands
    the verdict + ``batch_id`` to ``on_drift`` — when
    ``rebuild_recommended`` fires, retrain with
    :func:`similarity.ivf_index_rebuild` and swap roots.
    """
    from pandarallel_spark.operators.similarity import (
        _ivf_assign,
        _ivf_index_meta,
        ivf_index_read,
    )

    spark = stream.sparkSession
    # one-time metadata recovery — the loop refuses to start without a
    # persisted index, and never retrains its centroids
    # (ivf_index_read carries the strictLazy gate)
    index = ivf_index_read(spark, index_root)
    dim, cent_ids, c_mat, _ = _ivf_index_meta(index, "stream_ingest_ann")
    vec_type = dict(index.dtypes)["__cvec__"]
    monitor = None
    if drift_check_every is not None:
        monitor = _drift_monitor(
            spark, index_root, "ivf",
            every=drift_check_every, baseline=drift_baseline,
            on_drift=on_drift, max_imbalance=drift_max_imbalance,
            max_distortion_ratio=drift_max_distortion_ratio, dim=dim,
        )

    def prepare(batch_df: DataFrame) -> DataFrame:
        _check_batch_width(batch_df, vec_col, dim, "stream_ingest_ann")
        return _ivf_assign(
            batch_df, id_col, vec_col, c_mat, cent_ids, vec_type
        ).select("c_id", "__cvec__", "__cid__")

    return _delta_ingest_loop(
        stream,
        index_root=index_root,
        checkpoint=checkpoint,
        tool="compact_ivf_deltas",
        prepare=prepare,
        trigger_available_now=trigger_available_now,
        monitor=monitor,
        partition_by=["__cid__"],
    )


# ---------------------------------------------------------------------------
# versioned index roots: the rebuild-and-swap the drift verdict calls for
# ---------------------------------------------------------------------------


def ann_versions(spark: SparkSession, vroot: str) -> list[int]:
    """COMMITTED index versions under a versioned root — ``v={n}`` dirs
    carrying the ``_INDEX_COMMITTED`` marker (written last by the swap,
    so a torn swap's half-written version is invisible). Sorted
    ascending; the max is the active version."""
    jvm, fs, _ = _fs(spark, vroot)
    out = []
    for n in _list_numbered(spark, vroot, "v="):
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{vroot}/v={n}/{_VERSION_MARKER}")
        ):
            out.append(n)
    return sorted(out)


def ann_current_root(spark: SparkSession, vroot: str) -> tuple[str, int]:
    """Path + id of the ACTIVE (highest committed) version — the root
    to hand to ``*_index_read`` / the streaming loops. Raises when no
    committed version exists (an uncommitted ``v=`` dir alone means a
    swap tore before its marker; re-run the swap)."""
    versions = ann_versions(spark, vroot)
    if not versions:
        raise ValueError(
            f"no committed index version under {vroot!r} — write one "
            "with ivf_version_write/pq_version_write (a bare v= dir "
            "without the commit marker is a torn swap; re-run it)"
        )
    n = versions[-1]
    return f"{vroot}/v={n}", n


def _commit_version(spark: SparkSession, vroot: str, n: int) -> None:
    jvm, fs, _ = _fs(spark, vroot)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{vroot}/v={n}/{_VERSION_MARKER}"),
        True,
    ).close()


def _next_version_dir(spark: SparkSession, vroot: str) -> tuple[str, int]:
    """The next version id: one past the highest EXISTING ``v=`` dir
    (committed or torn — a torn dir's id is never reused; the dir is
    simply skipped past, stays invisible to readers for want of a
    commit marker, and is deleted by :func:`retire_ann_versions` once
    enough committed versions sit above it)."""
    existing = _list_numbered(spark, vroot, "v=")
    n = (max(existing) + 1) if existing else 1
    return f"{vroot}/v={n}", n


def ivf_version_write(spark: SparkSession, vroot: str, index: DataFrame) -> int:
    """Write ``index`` as the next committed version under ``vroot``
    (``v={n}/`` in :func:`similarity.ivf_index_write`'s layout, commit
    marker last — crash-safe: a torn write leaves an uncommitted dir
    that :func:`ann_current_root` ignores and the next write's id skips
    past). Returns the new version id."""
    from pandarallel_spark.operators.similarity import ivf_index_write

    path, n = _next_version_dir(spark, vroot)
    ivf_index_write(index, path, mode="overwrite")
    _commit_version(spark, vroot, n)
    return n


def pq_version_write(
    spark: SparkSession, vroot: str, lists: DataFrame, meta: DataFrame
) -> int:
    """PQ twin of :func:`ivf_version_write`."""
    from pandarallel_spark.operators.similarity import pq_index_write

    path, n = _next_version_dir(spark, vroot)
    pq_index_write(lists, meta, path, mode="overwrite")
    _commit_version(spark, vroot, n)
    return n


def ivf_rebuild_swap(
    spark: SparkSession,
    vroot: str,
    n_centroids: int | None = None,
    train: str = "kmeans",
    kmeans_iters: int = 8,
) -> int:
    """THE action the drift verdict recommends, end to end: read the
    active version WITH its committed deltas, retrain from the index's
    own stored vectors (:func:`similarity.ivf_index_rebuild`), write
    the result as the next version, and commit it — the
    write-new-then-swap discipline as one crash-safe call. The old
    version stays readable throughout (and afterwards, until
    :func:`retire_ann_versions` drops it); a crash at ANY point leaves
    an uncommitted ``v=`` dir that readers ignore and a re-run
    supersedes. Returns the new version id.

    Streaming handoff: stop the loop FIRST and let its final batch
    commit (``availableNow`` loops quiesce on ``awaitTermination``) —
    the swap folds exactly the COMMITTED deltas, so resuming the SAME
    checkpoint against the new version's root continues cleanly
    (already-folded source files are not re-read; new batch ids land
    in the new version's empty ``delta/``). Swapping under a torn
    final batch would double that batch's rows when its replay
    re-writes a delta the rebuild already folded — quiesce, then swap.
    Reset any drift baseline after the swap (list ids are a new
    ``__cid__`` space)."""
    from pandarallel_spark.operators.similarity import (
        ivf_index_read,
        ivf_index_rebuild,
    )

    cur, _n = ann_current_root(spark, vroot)
    grown = ivf_index_read(spark, cur, include_deltas=True)
    rebuilt = ivf_index_rebuild(
        grown, n_centroids=n_centroids, train=train, kmeans_iters=kmeans_iters
    )
    return ivf_version_write(spark, vroot, rebuilt)


def pq_rebuild_swap(
    spark: SparkSession,
    vroot: str,
    n_centroids: int | None = None,
    m: int | None = None,
    n_codes: int | None = None,
    train: str = "kmeans",
    kmeans_iters: int = 8,
    seed: int = 0,
) -> int:
    """PQ twin of :func:`ivf_rebuild_swap`: fold the active version's
    committed deltas, retrain codebooks + coarse anchors from the
    stored vectors (:func:`similarity.pq_index_rebuild` — so a
    ``store_vectors=False`` version refuses loudly), write + commit the
    next version. Same quiesce-then-swap streaming handoff and same
    reset-the-baseline consequence as the Flat form."""
    from pandarallel_spark.operators.similarity import (
        pq_index_read,
        pq_index_rebuild,
    )

    cur, _n = ann_current_root(spark, vroot)
    lists, meta = pq_index_read(spark, cur, include_deltas=True)
    new_lists, new_meta = pq_index_rebuild(
        lists, meta, n_centroids=n_centroids, m=m, n_codes=n_codes,
        train=train, kmeans_iters=kmeans_iters, seed=seed,
    )
    return pq_version_write(spark, vroot, new_lists, new_meta)


def retire_ann_versions(
    spark: SparkSession, vroot: str, keep: int = 2
) -> list[int]:
    """Delete superseded index versions, keeping the ``keep`` highest
    COMMITTED ones (plus any torn dir above them — its id is never
    reused, and it is cleaned up here once committed versions supersede
    it); returns the deleted ids. ``keep`` must be ≥ 2 so a
    reader mid-scan on the previous version never has it deleted out
    from under the query that started before the swap. Deletion-only —
    trivially crash-safe."""
    if keep < 2:
        raise ValueError(
            f"keep must be ≥ 2 (got {keep}): a reader that planned "
            "against the previous version may still be scanning it"
        )
    committed = ann_versions(spark, vroot)
    live = set(committed[-keep:])
    jvm, fs, _ = _fs(spark, vroot)
    dropped = []
    for n in _list_numbered(spark, vroot, "v="):
        if n not in live and committed and n < max(live, default=0):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{vroot}/v={n}"), True)
            dropped.append(n)
    return sorted(dropped)
