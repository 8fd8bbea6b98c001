"""Operator implementations.

Each module maps one slice of the reference's surface (SURVEY.md §2.1)
or a north-star extension (§2.3) onto Spark primitives:

- ``apply``      — DataFrame.parallel_apply (axis 0/1), parallel_applymap
- ``series``     — Series.parallel_apply, Series.parallel_map
- ``window``     — rolling / expanding, global and grouped
- ``groupby``    — DataFrameGroupBy.parallel_apply
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
- ``similarity`` — embedding cosine top-k (brute force, LSH-bucketed, IVF-Flat)
- ``text``       — language id, quality scoring, token counts, fingerprints
- ``multimodal`` — binary media columns: schema + batch plumbing (decode stubbed)
- ``join``       — as-of and range joins
- ``relational`` — top-k per group, skew-safe distinct, rollup, set ops
- ``sampling``   — deterministic hash split / per-group sample / sequence packing
"""
