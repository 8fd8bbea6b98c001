"""Operator implementations.

Each module maps one slice of the reference's surface (SURVEY.md §2.1)
or a north-star extension (§2.3) onto Spark primitives:

- ``apply``      — DataFrame.parallel_apply (axis 0/1), parallel_applymap
- ``series``     — Series.parallel_apply, Series.parallel_map
- ``window``     — rolling / expanding, global and grouped
- ``groupby``    — DataFrameGroupBy.parallel_apply
- ``dedup``      — exact / MinHash-LSH (exact-first set collapse) / SimHash /
  n-gram Jaccard / ExactSubstr dedup
- ``similarity`` — embedding cosine top-k (brute force, LSH-bucketed,
  IVF-Flat, IVF-PQ with driver or distributed codebook training;
  coarse centroids anchor-picked or k-means-trained distributively,
  with a drift-driven index rebuild)
- ``text``       — language id, quality scoring, token counts, fingerprints
- ``multimodal`` — binary media columns: real PPM/BMP/PNG (Adam7, 16-bit)/
  JPEG (baseline + progressive)/PCM-WAV codecs + batch plumbing
- ``join``       — as-of and range joins
- ``relational`` — top-k per group, skew-safe distinct, rollup, set ops
- ``sampling``   — deterministic hash split / per-group, weighted, stratified
  sample / temperature mixing / sequence packing
- ``graph``      — connected components (star contraction), cluster survivors
- ``incremental`` — persistable MinHash signature index + delta-vs-corpus
  near-dedup (the ingest-loop path: never re-scan the retained corpus)
- ``incremental_embedding`` — the embedding twin: persistable
  sign-bit-LSH index (quantized vectors + packed plane bits) +
  delta-vs-index cosine near-dedup, verification exact from the index
- ``incremental_substr`` — the ExactSubstr twin: persistable k-gram
  count index + delta span stripping against the retained corpus
  (index count + delta count replays the corpus-wide criterion)
- ``bpe``        — BPE tokenizer training (distributed word histogram →
  exact driver merge learning) + Arrow-batched distributed encoding;
  the histogram is the ingest artifact (merge == whole-build, retrain
  from the persisted histogram without re-scanning the corpus)
- ``quality_model`` — trained curated-vs-crawl quality classifier
  (pyspark.ml logistic regression over the JVM feature expressions),
  the CCNet/GPT-3-style filter tier above the fixed heuristic
- ``semantic``   — SSL-Prototypes curation: distributed k-means
  clusters, prototype-distance scoring, per-cluster hard/easy pruning
- ``curate``     — one-call trained-tier pipeline: quality filter →
  prototype prune → near-dedup → shuffle-shard export, with lineage
  truncation at stage boundaries and one up-front strictLazy gate
- ``embedding_codec`` — int8 storage codec for embedding columns
  (per-vector symmetric scalar quantization, 4× fewer bytes on disk;
  pure-projection encode/decode, half-step error bound pinned) —
  storage compression, orthogonal to similarity's PQ search codes
- ``sketches``   — KLL quantile-sketch rollups (mergeable per-key
  distribution partials) and Theta set sketches (distinct counts with
  union/intersection/difference — corpus-overlap estimation from two
  kilobyte sketches); completes the mergeable-summaries set next to
  relational's HLL rollup and Misra-Gries heavy hitters
"""
