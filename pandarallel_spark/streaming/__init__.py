"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.2); this package is the
north-star extension: windowed aggregations with watermarks over the
``events`` table, runnable both as a batch demo (driver oracle checks)
and as a real ``readStream`` → ``writeStream`` pipeline (tests use the
file source with ``Trigger.AvailableNow`` semantics and a memory sink).
"""

from pandarallel_spark.streaming.ingest import (
    compact_retained_corpus,
    read_retained_corpus,
    retain_index_versions,
    stream_ingest_dedup,
)
from pandarallel_spark.streaming.ingest_ann import (
    ann_current_root,
    ann_versions,
    compact_ivf_deltas,
    compact_pq_deltas,
    ivf_rebuild_swap,
    ivf_version_write,
    pq_rebuild_swap,
    pq_version_write,
    read_ivf_deltas,
    read_pq_deltas,
    retire_ann_versions,
    stream_ingest_ann,
    stream_ingest_pq,
)
from pandarallel_spark.streaming.ingest_bpe import (
    compact_bpe_deltas,
    read_word_histogram,
    stream_ingest_bpe,
    write_base_histogram,
)
from pandarallel_spark.streaming.joins import stream_stream_interval_join
from pandarallel_spark.streaming.stateful import (
    content_dedup_stream,
    dedup_stream,
    running_counts,
    streaming_heavy_hitters,
)
from pandarallel_spark.streaming.windows import (
    sessionize,
    sliding_window_agg,
    stream_events,
    stream_sessions,
    stream_to_parquet,
    tumbling_window_agg,
)

__all__ = [
    "ann_current_root",
    "ann_versions",
    "ivf_rebuild_swap",
    "ivf_version_write",
    "pq_rebuild_swap",
    "pq_version_write",
    "retire_ann_versions",
    "compact_retained_corpus",
    "compact_bpe_deltas",
    "compact_ivf_deltas",
    "compact_pq_deltas",
    "read_word_histogram",
    "stream_ingest_bpe",
    "write_base_histogram",
    "read_ivf_deltas",
    "read_pq_deltas",
    "read_retained_corpus",
    "retain_index_versions",
    "stream_ingest_ann",
    "stream_ingest_pq",
    "stream_ingest_dedup",
    "stream_stream_interval_join",
    "content_dedup_stream",
    "dedup_stream",
    "running_counts",
    "streaming_heavy_hitters",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize",
    "stream_events",
    "stream_sessions",
    "stream_to_parquet",
]
