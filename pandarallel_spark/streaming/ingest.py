"""Continuous dedup ingest: a Structured Streaming loop around the
persistable MinHash index (``method="minhash"``) or the embedding
sign-bit-LSH index (``method="embedding"`` — there the retained corpus
is never read at all; the index carries the vectors).

``operators/incremental.py`` / ``operators/incremental_embedding.py``
give one ingest CYCLE as a pure function
``(delta, index) → (kept, updated_index)``. This module turns it into a
running pipeline: a ``foreachBatch`` sink where every micro-batch
dedups against everything previously retained and both outputs land
idempotently, so the stream can crash and resume without dropping or
double-ingesting a document.

Idempotency scheme (plain parquet — no table format required):

- kept docs  → ``{corpus_root}/ingest_batch={batchId}/`` (overwrite)
- index      → ``{index_root}/v={batchId}/``             (overwrite)

Structured Streaming replays a failed micro-batch with the SAME
``batchId`` and the same input rows (source offsets live in the
checkpoint), and each replay reads only state from batches strictly
BEFORE it — the latest index version ``v < batchId`` and corpus dirs
``ingest_batch < batchId`` — so a half-written attempt is invisible to
its own retry and simply overwritten. That is the file-sink
exactly-once recipe re-expressed for a read-modify-write loop: state
transitions are keyed by batch id instead of relying on append-only
manifests.

Scale notes: per batch, the delta pays one signature aggregate and the
index side two equi-joins (``incremental_dedup_corpus``); the retained
corpus is read ONLY for candidate-exemplar verification (id-pushdown
scans) and not at all with ``verify="estimate"``. The corpus and index
accumulate one directory per batch — the loop itself never rewrites
old batches (that immutability is exactly what makes replays safe);
housekeeping is :func:`compact_retained_corpus` (fold committed batch
dirs into one, crash-recoverable, replay-compatible) and
:func:`retain_index_versions` (drop superseded index versions), both
run between stream runs on whatever cadence the deployment likes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from pandarallel_spark.operators._memo import truncate_lineage
from pandarallel_spark.operators.incremental import (
    incremental_dedup_corpus,
    minhash_index_build,
)


def _list_numbered(spark: SparkSession, root: str, prefix: str) -> list[int]:
    """Child directories of ``root`` named ``{prefix}{int}`` via the
    Hadoop FileSystem API — works against HDFS/S3/local alike, and sees
    exactly what a parquet read would see."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith(prefix):
            try:
                out.append(int(name[len(prefix):]))
            except ValueError:
                pass
    return out


def _fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    return jvm, path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _committed_batches(spark: SparkSession, root: str, prefix: str) -> list[int]:
    """Ids of ``{prefix}{int}`` child dirs carrying the committer's
    ``_SUCCESS`` marker — the set a reader may trust."""
    jvm, fs, path = _fs(spark, root)
    out = []
    if fs.exists(path):
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if name.startswith(prefix) and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                try:
                    out.append(int(name[len(prefix):]))
                except ValueError:
                    pass
    return sorted(out)


_COMPACT_MANIFEST = "_compacting"
_COMPACT_TMP = ".compact_tmp"


def _compaction_manifest(spark: SparkSession, corpus_root: str) -> dict | None:
    jvm, fs, root = _fs(spark, corpus_root)
    mpath = jvm.org.apache.hadoop.fs.Path(root, _COMPACT_MANIFEST)
    if not fs.exists(mpath):
        return None
    inp = fs.open(mpath)
    try:
        return json.loads(inp.readUTF())
    finally:
        inp.close()


def _refuse_pending_compaction(
    spark: SparkSession, root_path: str, tool: str, doing: str
) -> None:
    """ONE definition of the pending-manifest guard every reader and
    loop shares: an interrupted compaction leaves ``_compacting``
    behind, and anything that reads or writes the numbered dirs must
    refuse until ``tool`` rolls it forward."""
    if _compaction_manifest(spark, root_path) is not None:
        raise RuntimeError(
            f"an interrupted compaction is pending under {root_path!r} "
            f"(manifest {_COMPACT_MANIFEST!r} present) — run {tool} to "
            f"roll it forward before {doing}"
        )


def _finish_compaction(
    spark: SparkSession, root_path: str, man: dict, prefix: str
) -> None:
    """Complete (or roll forward) a compaction recorded in the manifest:
    the tmp dir was durably committed BEFORE the manifest was written,
    so finishing is always safe — delete the listed source dirs, move
    the tmp into the target's place, drop the manifest. Idempotent:
    every step checks what already happened."""
    jvm, fs, root = _fs(spark, root_path)
    P = jvm.org.apache.hadoop.fs.Path
    tmp = P(root, _COMPACT_TMP)
    target = P(root, f"{prefix}{man['target']}")
    if fs.exists(tmp):
        for b in man["sources"]:
            src = P(root, f"{prefix}{b}")
            if fs.exists(src):
                fs.delete(src, True)
        if not fs.rename(tmp, target):
            raise IOError(
                f"compaction: rename {_COMPACT_TMP} -> "
                f"{prefix}{man['target']} failed under {root_path!r}"
            )
    else:
        # rename already happened on a previous attempt: only stray
        # sources (all ≠ target by construction) might remain
        for b in man["sources"]:
            if b != man["target"]:
                src = P(root, f"{prefix}{b}")
                if fs.exists(src):
                    fs.delete(src, True)
    fs.delete(P(root, _COMPACT_MANIFEST), False)


def compact_retained_corpus(spark: SparkSession, corpus_root: str) -> int | None:
    """Fold the committed ``ingest_batch=`` dirs STRICTLY BELOW the
    highest committed batch into one, returning the surviving dir's
    batch id (or None when fewer than two dirs qualify).

    A long-running loop grows one directory per micro-batch; listing
    cost and small-file count grow with it. Compaction rewrites batches
    ``b₀ < … < bₖ < max`` into ``ingest_batch=bₖ`` — the docs are
    byte-identical, only the directory layout changes, so
    :func:`read_retained_corpus` returns the same rows before and
    after.

    Replay compatibility (why the HIGHEST committed dir is never
    touched): Structured Streaming may re-run the newest batch ``m``
    even when its output committed (the checkpoint's own commit record
    lands after ``foreachBatch`` returns). A replay of ``m`` reads
    dirs ``< m`` and OVERWRITES dir ``m`` — so every compacted id must
    stay below ``m``, and ``bₖ < m`` guarantees the replay sees exactly
    the content it saw the first time. Ids above the compaction target
    are never created by it, so the resumed loop's "read strictly
    before me" rule keeps holding.

    Crash safety: the combined tmp dir is durably written (with its
    ``_SUCCESS``) and a manifest naming sources + target is recorded
    BEFORE any source is deleted; a crash at any later point is rolled
    forward by the next call (or surfaced loudly by
    :func:`read_retained_corpus` / the ingest loop, which refuse to
    run while a manifest is pending). Run it between stream runs — a
    reader racing the directory swap can see a partial listing, same
    caveat the module docstring gives for replays.
    """
    return _compact_numbered_dirs(spark, corpus_root, "ingest_batch=")


def _compact_numbered_dirs(
    spark: SparkSession,
    root_path: str,
    prefix: str,
    partition_by: list[str] | None = None,
) -> int | None:
    """The generic fold-committed-dirs-below-the-max core shared by
    :func:`compact_retained_corpus` (``ingest_batch=`` under the corpus
    root) and the ANN delta compaction (``b=`` under an IVF index's
    ``delta/``; ``partition_by=["__cid__"]`` keeps the folded dir's
    static-pruning layout). Same tmp-then-manifest crash protocol."""
    pending = _compaction_manifest(spark, root_path)
    if pending is not None:
        _finish_compaction(spark, root_path, pending, prefix)
    committed = _committed_batches(spark, root_path, prefix)
    sources = committed[:-1]  # strictly below the max committed id
    if len(sources) < 2:
        return pending["target"] if pending is not None else None
    target = sources[-1]
    jvm, fs, root = _fs(spark, root_path)
    P = jvm.org.apache.hadoop.fs.Path
    tmp = P(root, _COMPACT_TMP)
    if fs.exists(tmp):  # stale tmp from a crash BEFORE its manifest: discard
        fs.delete(tmp, True)
    reader = spark.read
    if partition_by:
        # sub-partitioned sources (e.g. __cid__= inside each b= dir)
        # need a basePath to read as one table; the prefix key then
        # appears as a partition column and is dropped — bookkeeping,
        # not data
        reader = reader.option("basePath", root_path)
    df = reader.parquet(*[f"{root_path}/{prefix}{b}" for b in sources])
    if partition_by:
        df = df.drop(prefix.rstrip("="))
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(tmp))
    man = {"sources": sources, "target": target}
    out = fs.create(P(root, _COMPACT_MANIFEST), True)
    try:
        out.writeUTF(json.dumps(man))
    finally:
        out.close()
    _finish_compaction(spark, root_path, man, prefix)
    return target


def retain_index_versions(
    spark: SparkSession, index_root: str, keep: int = 2
) -> list[int]:
    """Delete superseded ``v=`` index versions, keeping the ``keep``
    highest ids; returns the deleted ids.

    Every batch reads only the HIGHEST version below its own id, so
    versions below that are dead weight — one full index copy each.
    ``keep`` must be ≥ 2: the newest version may belong to a batch
    whose checkpoint commit tore (its replay ignores it and reads the
    version below), so the top TWO are both live until the next batch
    commits. Deletion-only and therefore trivially crash-safe — an
    interrupted run just leaves more versions behind.
    """
    if keep < 2:
        raise ValueError(
            f"keep must be ≥ 2 (got {keep}): the newest version may be a "
            "torn batch's — its replay reads the version below it"
        )
    ids = sorted(_list_numbered(spark, index_root, "v="))
    drop = ids[:-keep]
    jvm, fs, root = _fs(spark, index_root)
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, f"v={v}"), True)
    return drop


def read_retained_corpus(
    spark: SparkSession, corpus_root: str, bootstrap_docs: str | None = None
) -> DataFrame:
    """The retained corpus as of the last COMMITTED batches: reads only
    ``ingest_batch=N`` directories carrying the committer's ``_SUCCESS``
    marker, so a crash's half-written directory is invisible to
    downstream readers (a bare ``parquet(f"{root}/ingest_batch=*")``
    glob would pick it up). Include the bootstrap corpus by passing the
    same ``bootstrap_docs`` path the loop was started with. Committed
    directories are immutable — a replay only ever rewrites the one
    uncommitted batch — but a reader racing that exact rewrite can
    still see it mid-overwrite; a deployment that needs full
    reader/writer isolation should layer a table format on top.

    Schemas are UNIONED across directories (per-directory reads folded
    with ``unionByName(allowMissingColumns=True)``): a
    ``method="substr"`` corpus carries ``text_deduped`` on its batch
    dirs but not on the bootstrap dir, and a bare multi-path
    ``parquet(*paths)`` would take whichever file's footer Spark
    samples first — silently dropping the column or not depending on
    listing order. The per-directory fold is deterministic (bootstrap
    rows read ``text_deduped = NULL`` — they entered unstripped; read
    their text as ``coalesce(text_deduped, text)``) and costs one
    schema sample PER DIRECTORY, not a ``mergeSchema`` footer job over
    every file of every batch."""
    _refuse_pending_compaction(
        spark, corpus_root, "compact_retained_corpus", "reading"
    )
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(corpus_root)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    # sorted by BATCH ID: fs.listStatus makes no ordering promise, and
    # paths[0] anchors the fold's base schema / column order — an
    # unsorted fold would make the output schema depend on filesystem
    # listing order
    numbered = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("ingest_batch=") and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                try:
                    numbered.append((int(name[len("ingest_batch="):]),
                                     str(st.getPath())))
                except ValueError:
                    pass
    paths = [p for _, p in sorted(numbered)]
    if bootstrap_docs is not None:
        paths.append(bootstrap_docs)
    if not paths:
        raise ValueError(
            f"no committed ingest batches under {corpus_root!r} "
            "(and no bootstrap_docs given)"
        )
    out = spark.read.parquet(paths[0])
    for p in paths[1:]:
        out = out.unionByName(
            spark.read.parquet(p), allowMissingColumns=True
        )
    return out


def stream_ingest_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    *,
    corpus_root: str,
    index_root: str,
    checkpoint: str,
    method: str = "minhash",
    bootstrap_docs: str | None = None,
    n: int | None = None,
    num_perm: int | None = None,
    dim: int | None = None,
    planes: int | None = None,
    seed: int | None = None,
    k: int | None = None,
    min_count: int | None = None,
    keep_first: bool | None = None,
    threshold: float | None = None,
    bands: int = 16,
    verify: str | None = None,
    keep_by: str | None = None,
    trigger_available_now: bool = True,
    **cycle_kwargs,
):
    """Run the ingest-dedup loop over ``stream``; returns the started
    ``StreamingQuery``.

    ``method="minhash"`` (default): each micro-batch loads the latest
    index version (< this batch) and runs ``incremental_dedup_corpus``
    against it — with the retained corpus readable for exact
    verification when ``verify="exact"`` (the default), or index-only
    with ``verify="estimate"`` — then writes the kept docs and the
    updated index under this batch's id. Signature dials: ``n``
    (shingle width, default 3) / ``num_perm`` (default 64); Jaccard
    ``threshold`` defaults to 0.5.

    ``method="embedding"``: ``text_col`` names the ``array<float or
    double>`` EMBEDDING column and each batch runs
    ``incremental_dedup_embeddings`` — the retained corpus is NEVER
    read (the index carries the vectors; verification is always
    exact), so ``verify=`` does not apply and raises if passed. Dials:
    ``planes`` (default 64) / ``seed`` (default 202) / ``dim``
    (REQUIRED — the empty bootstrap index cannot infer a vector
    width); cosine ``threshold`` defaults to 0.8. Passing the wrong
    method's dials raises instead of being silently ignored.

    ``method="substr"``: each batch runs ``incremental_substr_corpus``
    — documents are never DROPPED; their duplicated passages (vs the
    retained corpus and the delta itself) are STRIPPED, so every
    retained doc carries a ``text_deduped`` column next to the
    original text, and the index gains the grams of the text that
    actually entered the corpus. Index-only like the embedding method
    (``verify=``/``keep_by=`` do not apply). Dials: ``k`` (shingle
    width, default 20) / ``min_count`` (default 2) / ``keep_first``
    (default False — True keeps each purely-delta-internal passage's
    first occurrence).

    Batch 0 (or any batch arriving before an index exists) bootstraps:
    from ``bootstrap_docs`` (a parquet path holding an already-retained
    corpus with the same id and text/embedding columns) when given,
    else from an empty index, with the signature scheme pinned by the
    dials above (later batches validate against the embedded index
    metadata, so a config drift fails loudly instead of silently
    matching nothing).

    The loop is eager per batch (clustering rounds), like the batch
    pipeline — strict-lazy sessions cannot host it, by design.

    Read the retained corpus downstream with
    :func:`read_retained_corpus` — it filters to directories whose
    batch actually committed (``_SUCCESS`` marker), so a crash's
    half-written directory never reaches a reader.

    The checkpoint dir must live and die with ``corpus_root`` /
    ``index_root``: batch ids come from the checkpoint, so resetting or
    relocating it alone would restart numbering at 0 over the old
    outputs. The loop detects that (output directories from batches
    later than the current one) and refuses to run rather than
    silently corrupting the retained corpus.
    """
    if method not in ("minhash", "embedding", "substr"):
        raise ValueError(
            f"method must be 'minhash', 'embedding' or 'substr', got "
            f"{method!r}"
        )
    if method == "substr":
        wrong = [
            p for p, v in (
                ("n", n), ("num_perm", num_perm), ("dim", dim),
                ("planes", planes), ("seed", seed), ("verify", verify),
                ("threshold", threshold), ("keep_by", keep_by),
            ) if v is not None
        ]
        if wrong:
            raise ValueError(
                f"stream_ingest_dedup(method='substr') does not use "
                f"{wrong} — passages are stripped, never docs dropped, "
                "always exactly from the index; its dials are "
                "k=/min_count=/keep_first="
            )
        k = 20 if k is None else k
        min_count = 2 if min_count is None else min_count
        keep_first = False if keep_first is None else keep_first
    elif method == "embedding":
        wrong = [p for p, v in (("n", n), ("num_perm", num_perm),
                                ("k", k), ("min_count", min_count),
                                ("keep_first", keep_first),
                                ("verify", verify)) if v is not None]
        if wrong:
            raise ValueError(
                f"stream_ingest_dedup(method='embedding') does not use "
                f"{wrong} — there are no shingles, and verification is "
                "always exact from the index's stored vectors; its dials "
                "are dim=/planes=/seed= and the cosine threshold="
            )
        if dim is None:
            raise ValueError(
                "method='embedding' requires dim= (the empty bootstrap "
                "index cannot infer a vector width)"
            )
        planes = 64 if planes is None else planes
        seed = 202 if seed is None else seed
        threshold = 0.8 if threshold is None else threshold
    else:
        wrong = [p for p, v in (("dim", dim), ("planes", planes),
                                ("seed", seed), ("k", k),
                                ("min_count", min_count),
                                ("keep_first", keep_first)) if v is not None]
        if wrong:
            raise ValueError(
                f"stream_ingest_dedup(method='minhash') does not use "
                f"{wrong} — its signature dials are n=/num_perm="
            )
        n = 3 if n is None else n
        num_perm = 64 if num_perm is None else num_perm
        threshold = 0.5 if threshold is None else threshold
        verify = "exact" if verify is None else verify
        if verify not in ("exact", "estimate"):
            raise ValueError(
                f"verify must be 'exact' or 'estimate', got {verify!r}"
            )
    spark = stream.sparkSession
    # the no-bootstrap empty index comes from the REAL build path over
    # an empty frame with the stream's own id/text types — one source of
    # truth for the index schema, nothing hand-duplicated here
    empty_frame = spark.createDataFrame([], stream.schema)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        _refuse_pending_compaction(
            spark, corpus_root, "compact_retained_corpus",
            "resuming the ingest loop",
        )
        # Idempotency is keyed on the streaming batchId, which lives in
        # the CHECKPOINT: restarting against a fresh/relocated
        # checkpoint resets it to 0, and batch 0 would then bootstrap
        # from scratch and overwrite ingest_batch=0 / v=0 while stale
        # higher-numbered directories stay visible to readers — silent
        # retained-corpus corruption (ADVICE r10). A GENUINE replay
        # only ever sees ids ≤ its own (batches run serially), so any
        # id strictly above this batch proves the checkpoint and the
        # output roots have come apart. Refuse loudly.
        stale = sorted(
            {
                f"{corpus_root}/ingest_batch={b}"
                for b in _list_numbered(spark, corpus_root, "ingest_batch=")
                if b > batch_id
            }
            | {
                f"{index_root}/v={v}"
                for v in _list_numbered(spark, index_root, "v=")
                if v > batch_id
            }
        )
        if stale:
            raise RuntimeError(
                f"batch {batch_id} found output directories from LATER "
                f"batches: {stale[:4]}{'…' if len(stale) > 4 else ''} — the "
                "checkpoint dir was reset or relocated independently of "
                "corpus_root/index_root. Resume with the original "
                "checkpoint, or start over against fresh output roots; the "
                "checkpoint must live and die with its outputs."
            )
        batch_df = batch_df.persist()
        try:
            versions = [
                v for v in _list_numbered(spark, index_root, "v=") if v < batch_id
            ]
            prior = [
                b
                for b in _list_numbered(spark, corpus_root, "ingest_batch=")
                if b < batch_id
            ]
            if method == "substr":
                from pandarallel_spark.operators.incremental_substr import (
                    incremental_substr_corpus,
                    substr_index_build,
                )

                if versions:
                    index = spark.read.parquet(f"{index_root}/v={max(versions)}")
                elif bootstrap_docs is not None:
                    # computed ONCE, like the minhash bootstrap below
                    index = truncate_lineage(
                        substr_index_build(
                            spark.read.parquet(bootstrap_docs), id_col,
                            text_col, k=k,
                        ),
                        eager=True,
                    )
                else:
                    index = substr_index_build(
                        empty_frame, id_col, text_col, k=k
                    )
                # index-only: passages strip against the gram counts,
                # the corpus is never read
                kept, updated = incremental_substr_corpus(
                    batch_df, id_col, text_col, index,
                    k=k, min_count=min_count, keep_first=keep_first,
                    **cycle_kwargs,
                )
            elif method == "embedding":
                from pandarallel_spark.operators.incremental_embedding import (
                    embedding_index_build,
                    incremental_dedup_embeddings,
                )

                if versions:
                    index = spark.read.parquet(f"{index_root}/v={max(versions)}")
                elif bootstrap_docs is not None:
                    # computed ONCE, like the minhash bootstrap below
                    index = truncate_lineage(
                        embedding_index_build(
                            spark.read.parquet(bootstrap_docs), id_col,
                            text_col, planes=planes, seed=seed, dim=dim,
                        ),
                        eager=True,
                    )
                else:
                    index = embedding_index_build(
                        empty_frame, id_col, text_col,
                        planes=planes, seed=seed, dim=dim,
                    )
                # the retained corpus is never read: the index carries
                # the vectors and verification is always exact
                kept, updated = incremental_dedup_embeddings(
                    batch_df, id_col, text_col, index,
                    threshold=threshold, bands=bands,
                    dim=dim, planes=planes, seed=seed,
                    keep_by=keep_by, **cycle_kwargs,
                )
            else:
                if versions:
                    index = spark.read.parquet(f"{index_root}/v={max(versions)}")
                elif bootstrap_docs is not None:
                    # compute the bootstrap index ONCE: left lazy it would
                    # re-run the full bootstrap-corpus aggregate for the
                    # metadata probe, every index reference in the pair
                    # plan, AND the updated-index write
                    index = truncate_lineage(
                        minhash_index_build(
                            spark.read.parquet(bootstrap_docs), id_col,
                            text_col, n=n, num_perm=num_perm,
                        ),
                        eager=True,
                    )
                else:
                    index = minhash_index_build(
                        empty_frame, id_col, text_col, n=n, num_perm=num_perm
                    )
                old_paths = (
                    [bootstrap_docs] if bootstrap_docs is not None else []
                ) + [f"{corpus_root}/ingest_batch={b}" for b in prior]
                old_docs = (
                    spark.read.parquet(*old_paths)
                    if verify == "exact" and old_paths
                    else None
                )
                kept, updated = incremental_dedup_corpus(
                    batch_df, id_col, text_col, index,
                    old_docs=old_docs,
                    threshold=threshold, bands=bands, n=n, num_perm=num_perm,
                    keep_by=keep_by,
                    **({"verify": verify} if old_docs is not None else {}),
                    **cycle_kwargs,
                )
            kept.write.mode("overwrite").parquet(
                f"{corpus_root}/ingest_batch={batch_id}"
            )
            updated.write.mode("overwrite").parquet(f"{index_root}/v={batch_id}")
        finally:
            batch_df.unpersist()

    w = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
