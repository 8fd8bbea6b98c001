"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.2); these are the
north-star extensions a training-data pipeline runs on a live feed:
cross-batch exact dedup (keep the first occurrence of a key, forever)
and per-key running counters. State is per-key and bounded by the
distinct-key count; on a real cluster state lives in the state store
(RocksDB/HDFS-checkpointed), so a 100 TB/day stream holds only keys,
not data, in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Cross-micro-batch exact dedup: emits each key's first-seen row
    once, drops every later arrival (any batch, forever).

    ``dropDuplicates`` on a stream needs a watermark to bound state and
    forgets keys past it; this keeps keys indefinitely — the semantics
    exact dedup of a training corpus actually needs.
    """
    out_schema = stream.schema
    out_names = [f.name for f in out_schema.fields]

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; key already emitted in a past batch
                pass
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][out_names]
        state.update((True,))
        if first is not None:
            yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=T.StructType([T.StructField("seen", T.BooleanType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key cumulative event count, emitted once per micro-batch the
    key appears in — a stateful counter ``groupBy().count()`` can't
    express in append mode."""
    key_fields = [stream.schema[k] for k in key_cols]
    out_schema = T.StructType(
        [*key_fields, T.StructField("n_events_total", T.LongType())]
    )

    def counter(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch_n = sum(len(pdf) for pdf in pdfs)
        n += batch_n
        state.update((n,))
        row = dict(zip(key_cols, key))
        row["n_events_total"] = n
        yield pd.DataFrame([row])

    return stream.groupBy(*key_cols).applyInPandasWithState(
        counter,
        outputStructType=out_schema,
        stateStructType=T.StructType([T.StructField("n", T.LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def content_dedup_stream(
    stream: DataFrame, text_col: str, fp_col: str = "__fp__"
) -> DataFrame:
    """Streaming content dedup: the streaming twin of
    ``operators/dedup.fingerprint_dedup``. The bag-of-words fingerprint
    (sorted-distinct-token md5 — a pure Column expression, computed in
    the scan) keys the same cross-batch first-seen state as
    ``dedup_stream``: the first document with a given normalized content
    is emitted, every later arrival (same batch or any future one) is
    dropped. State holds one boolean per distinct fingerprint — bounded
    by corpus vocabulary of contents, not stream volume."""
    from pandarallel_spark.operators.text import fingerprint

    if fp_col in stream.columns:
        raise ValueError(
            f"content_dedup_stream: input already has a column named "
            f"{fp_col!r}; pass fp_col= to avoid clobbering it"
        )
    with_fp = stream.withColumn(fp_col, fingerprint(text_col))
    return dedup_stream(with_fp, [fp_col]).drop(fp_col)
