"""Continuous dedup ingest: a Structured Streaming loop around the
persistable MinHash index.

``operators/incremental.py`` gives one ingest CYCLE as a pure function
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
accumulate one directory per batch — compact them offline on whatever
cadence the deployment likes; the loop itself never rewrites old
batches (that immutability is exactly what makes replays safe).
"""

from __future__ import annotations

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
    reader/writer isolation should layer a table format on top."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(corpus_root)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    paths = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("ingest_batch=") and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                paths.append(str(st.getPath()))
    if bootstrap_docs is not None:
        paths.append(bootstrap_docs)
    if not paths:
        raise ValueError(
            f"no committed ingest batches under {corpus_root!r} "
            "(and no bootstrap_docs given)"
        )
    return spark.read.parquet(*paths)


def stream_ingest_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    *,
    corpus_root: str,
    index_root: str,
    checkpoint: str,
    bootstrap_docs: str | None = None,
    n: int = 3,
    num_perm: int = 64,
    threshold: float = 0.5,
    bands: int = 16,
    verify: str = "exact",
    keep_by: str | None = None,
    trigger_available_now: bool = True,
    **cycle_kwargs,
):
    """Run the ingest-dedup loop over ``stream``; returns the started
    ``StreamingQuery``.

    Each micro-batch: load the latest index version (< this batch),
    run ``incremental_dedup_corpus`` against it — with the retained
    corpus readable for exact verification when ``verify="exact"``,
    or index-only with ``verify="estimate"`` — then write the kept
    docs and the updated index under this batch's id. Batch 0 (or any
    batch arriving before an index exists) bootstraps: from
    ``bootstrap_docs`` (a parquet path holding an already-retained
    corpus with the same id/text columns) when given, else from an
    empty index, with the signature scheme pinned by ``n``/``num_perm``
    (later batches validate against the embedded index metadata, so a
    config drift fails loudly instead of silently matching nothing).

    The loop is eager per batch (clustering rounds), like the batch
    pipeline — strict-lazy sessions cannot host it, by design.

    Read the retained corpus downstream with
    :func:`read_retained_corpus` — it filters to directories whose
    batch actually committed (``_SUCCESS`` marker), so a crash's
    half-written directory never reaches a reader.
    """
    if verify not in ("exact", "estimate"):
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    spark = stream.sparkSession
    # the no-bootstrap empty index comes from the REAL build path over
    # an empty frame with the stream's own id/text types — one source of
    # truth for the index schema, nothing hand-duplicated here
    empty_frame = spark.createDataFrame([], stream.schema)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
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
            if versions:
                index = spark.read.parquet(f"{index_root}/v={max(versions)}")
            elif bootstrap_docs is not None:
                # compute the bootstrap index ONCE: left lazy it would
                # re-run the full bootstrap-corpus aggregate for the
                # metadata probe, every index reference in the pair
                # plan, AND the updated-index write
                index = truncate_lineage(
                    minhash_index_build(
                        spark.read.parquet(bootstrap_docs), id_col, text_col,
                        n=n, num_perm=num_perm,
                    ),
                    eager=True,
                )
            else:
                index = minhash_index_build(
                    empty_frame, id_col, text_col, n=n, num_perm=num_perm
                )
            old_paths = ([bootstrap_docs] if bootstrap_docs is not None else []) + [
                f"{corpus_root}/ingest_batch={b}" for b in prior
            ]
            old_docs = (
                spark.read.parquet(*old_paths) if verify == "exact" and old_paths
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
