"""Incremental near-dedup against a persistable MinHash index.

At 100 TB nobody re-shingles the whole corpus per crawl. The batch
pipeline (``dedup.minhash_lsh_pairs`` → ``near_dedup_corpus``) answers
"dedup THIS corpus"; a production ingest loop instead asks, every few
hours, "which of these NEW documents duplicate anything we already
keep?" — and the corpus side of that question must be answerable from
a small precomputed artifact, not a full re-scan.

The artifact here is the **MinHash signature index**: one row per
DISTINCT shingle set in the retained corpus —

    (__fp__, __sz__, __eid__, __members__, __sig__, __idx_n__, __idx_perm__)

set fingerprint, distinct-shingle count, exemplar (min) doc id, member
count, the ``num_perm``-long minhash signature, and two constant
metadata columns (RLE'd to ~nothing in parquet) that pin the shingle
width and permutation count the index was built with. Size:
distinct sets × (num_perm + 4) longs — for a billion-doc corpus with
64 permutations, tens of GB where the corpus is tens of TB. Band
hashes are NOT stored: they derive from the signature
(``xxhash64`` over consecutive elements), so ``bands`` stays a
QUERY-time recall/cost dial instead of a baked-in index property.

The delta query (``minhash_pairs_incremental``) touches:

- the DELTA, fully (one signature aggregate — the same single-shuffle
  shape as the batch path — shared by the old-matching, the delta's
  self-pairing, and the index update);
- the INDEX, via one fingerprint equi-join (exact duplicates) plus one
  (band, hash) equi-join (near-duplicate candidates) — both sized by
  the index, never the corpus;
- the OLD CORPUS, only when exact verification is requested, and then
  only the candidate EXEMPLAR rows (an id semi-join the parquet scan
  can push down). With ``verify="estimate"`` the old corpus is never
  read at all: Jaccard is estimated from the stored signatures
  (matching-component fraction, standard error ≈ √(J(1−J)/num_perm)).

Reference frame: the reference (pandarallel) has no dedup surface at
all — this module extends the LLM-pipeline tier (SURVEY.md §2.3) the
same way ``dedup.py`` does, re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandarallel_spark.operators._memo import (
    eager_build_guard,
    plan_data_key,
    truncate_lineage,
)
from pandarallel_spark.operators.dedup import (
    _bands_explode_expr,
    _hmin_exprs,
    _set_signature_agg,
    _shingle_rows_distinct,
    _sig_array_expr,
    minhash_lsh_pairs,
    resolve_broadcast_candidates,
)
from pandarallel_spark.operators.graph import (
    cluster_survivors,
    connected_components,
)

_META_COLS = ("__idx_n__", "__idx_perm__")


def _delta_signatures(
    new_df: DataFrame, id_col: str, text_col: str, n: int, num_perm: int
) -> DataFrame:
    """The delta's (id, sz, fp, h0..h{p−1}) table, lineage-truncated so
    every consumer (old matching, self-pairing, index update) reads the
    one computed table instead of re-running the shingle aggregate."""
    return truncate_lineage(
        _set_signature_agg(new_df, id_col, text_col, n, num_perm), eager=False
    )


def _index_from_signatures(s1: DataFrame, n: int, num_perm: int) -> DataFrame:
    """Signature table → index rows: collapse identical shingle sets to
    one row carrying the MIN member id as exemplar."""
    agg = s1.groupBy("__fp__").agg(
        F.min("__sz__").alias("__sz__"),
        F.min("__id__").alias("__eid__"),
        F.count(F.lit(1)).alias("__members__"),
        *_hmin_exprs(num_perm),
    )
    return agg.select(
        "__fp__",
        "__sz__",
        "__eid__",
        "__members__",
        _sig_array_expr(num_perm).alias("__sig__"),
        F.lit(n).cast("int").alias("__idx_n__"),
        F.lit(num_perm).cast("int").alias("__idx_perm__"),
    )


def minhash_index_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """Build the signature index for a (retained) corpus.

    One corpus scan, one shuffle: the same ``_set_signature_agg`` the
    batch path uses (docs × (num_perm+3) longs through the exchange,
    map-side partials) followed by a fingerprint collapse — identical
    shingle sets share one index row, carrying the MIN member id as the
    exemplar. Docs with < n tokens produce no shingles and therefore no
    index row (they can never near-dup anything, matching the batch
    domain).

    The result is a plain DataFrame — persist it with
    ``.write.parquet(...)`` and reload with ``spark.read.parquet`` for
    the next ingest cycle; everything downstream checks the embedded
    metadata columns instead of trusting the caller to remember
    ``n``/``num_perm``.
    """
    return _index_from_signatures(
        _set_signature_agg(df, id_col, text_col, n, num_perm), n, num_perm
    )


def _check_index_schema(index: DataFrame) -> None:
    for c in (*_META_COLS, "__fp__", "__sig__", "__sz__", "__eid__"):
        if c not in index.columns:
            raise ValueError(
                f"not a minhash signature index: missing column {c!r} "
                "(build one with minhash_index_build)"
            )


def _index_meta(index: DataFrame) -> tuple[int, int] | None:
    """(n, num_perm) from the index's constant metadata columns, via a
    ONE-ROW bounded probe (a parquet-backed index answers this from a
    single row group). None for an empty index. Strict-lazy sessions
    must pass the parameters explicitly instead (the guard names the
    escape hatch)."""
    _check_index_schema(index)
    eager_build_guard(
        index.sparkSession,
        "minhash index metadata probe (one-row bounded collect)",
        "Pass n=/num_perm= explicitly to skip the probe.",
    )
    row = index.select(*_META_COLS).limit(1).collect()
    if not row:
        return None
    return int(row[0]["__idx_n__"]), int(row[0]["__idx_perm__"])


def _resolve_meta(
    index: DataFrame, n: int | None, num_perm: int | None
) -> tuple[int, int]:
    """The (n, num_perm) an incremental call must use: explicit
    parameters win (and skip the probe — the strict-lazy path);
    otherwise the index's embedded metadata; batch defaults (3, 64)
    only for an EMPTY index with nothing explicit. Passing parameters
    that could silently disagree with a non-empty index is the one
    unrecoverable mistake, so explicit+probe-allowed still validates."""
    if n is not None and num_perm is not None:
        _check_index_schema(index)
        try:
            meta = _index_meta(index)
        except RuntimeError:  # strict-lazy: trust the explicit params
            return n, num_perm
        if meta is not None and meta != (n, num_perm):
            raise ValueError(
                f"explicit (n, num_perm) = {(n, num_perm)} contradicts the "
                f"index's embedded metadata {meta} — an index only matches "
                "deltas shingled and hashed exactly the way it was built"
            )
        return n, num_perm
    if n is not None or num_perm is not None:
        raise ValueError(
            "pass BOTH n= and num_perm= or neither — a half-specified "
            "signature scheme cannot be checked against the index"
        )
    meta = _index_meta(index)
    return meta if meta is not None else (3, 64)


def minhash_index_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two indexes built with the same (n, num_perm), collapsing
    shared fingerprints — ``merge(build(A), build(B))`` row-for-row
    equals ``build(A ∪ B)`` (signatures agree per fingerprint by
    construction; exemplar = min of mins; member counts add). One
    fingerprint-keyed aggregate; a metadata mismatch raises up front,
    at the price of a one-row probe per side (skipped internally when
    both sides are known-compatible by construction, and skipped under
    strictLazy — the merge itself is pure plan building, so forbidding
    build-time jobs must not forbid merging; there the check degrades
    to a plan-only column-type comparison plus a loud ``UserWarning``
    that the (n, num_perm) validation did not run)."""
    _check_index_schema(a)
    _check_index_schema(b)
    try:
        ma, mb = _index_meta(a), _index_meta(b)
    except RuntimeError:
        # strictLazy: merge rather than not at all, but (n, num_perm)
        # live in DATA the guard forbids reading — validate what the
        # PLAN alone can (column types; a type drift is a definite
        # incompatibility) and warn that the metadata check is skipped,
        # because merging indexes with different (n, num_perm) here
        # would produce a silently corrupt index (ADVICE r10).
        ta = {f.name: f.dataType for f in a.schema.fields}
        tb = {f.name: f.dataType for f in b.schema.fields}
        mismatched = sorted(
            c for c in set(ta) & set(tb) if ta[c] != tb[c]
        )
        if mismatched:
            raise ValueError(
                f"index schema mismatch on column(s) {mismatched}: "
                f"{[(c, str(ta[c]), str(tb[c])) for c in mismatched]} — "
                "these indexes were not built the same way"
            )
        import warnings

        warnings.warn(
            "minhash_index_merge under strictLazy cannot read the "
            "indexes' embedded (n, num_perm) metadata — the merge is "
            "UNVALIDATED beyond column types; merging indexes built "
            "with different shingle widths or permutation counts "
            "silently corrupts the result. Verify compatibility "
            "out-of-band or merge outside strict-lazy scope.",
            stacklevel=2,
        )
        return _merge_unchecked(a, b)
    if ma is not None and mb is not None and ma != mb:
        raise ValueError(
            f"index metadata mismatch: (n, num_perm) {ma} vs {mb} — "
            "indexes must be built with identical shingle width and "
            "permutation count to be mergeable"
        )
    return _merge_unchecked(a, b)


def _merge_unchecked(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("__fp__")
        .agg(
            F.min("__sz__").alias("__sz__"),
            F.min("__eid__").alias("__eid__"),
            F.sum("__members__").alias("__members__"),
            F.first("__sig__").alias("__sig__"),
            F.first("__idx_n__").alias("__idx_n__"),
            F.first("__idx_perm__").alias("__idx_perm__"),
        )
        .select(
            "__fp__", "__sz__", "__eid__", "__members__", "__sig__",
            "__idx_n__", "__idx_perm__",
        )
    )


def _band_cols(sig_col: str, bands: int, rows_per_band: int) -> list:
    """Band hashes from a signature ARRAY column — ``xxhash64`` over
    ``element_at`` of bigint elements hashes the same values the batch
    path hashes from its wide bigint columns, so candidates generated
    here agree exactly with ``minhash_lsh_pairs`` on the same data.
    Single-parse F.expr strings, like every wide block in this family."""
    return [
        F.expr(
            "xxhash64("
            + ", ".join(
                f"element_at({sig_col}, {b * rows_per_band + r + 1})"
                for r in range(rows_per_band)
            )
            + f") AS __b{b}__"
        )
        for b in range(bands)
    ]


def _bands_long(df: DataFrame, key: str, sig_col: str, bands: int, rpb: int):
    banded = df.select(key, *_band_cols(sig_col, bands, rpb))
    return banded.select(key, _bands_explode_expr(bands).alias("bh")).select(
        key, F.col("bh.band").alias("__band__"), F.col("bh.h").alias("__h__")
    )


def minhash_pairs_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    old_docs: DataFrame | None = None,
    old_id_col: str | None = None,
    old_text_col: str | None = None,
    threshold: float = 0.5,
    bands: int = 16,
    n: int | None = None,
    num_perm: int | None = None,
    verify: str | None = None,
    include_new_pairs: bool = True,
    broadcast_candidates: bool | str = "auto",
    bucket_cap: int | None = None,
    _s1: DataFrame | None = None,
    _meta: tuple[int, int] | None = None,
    **new_pair_kwargs,
) -> DataFrame:
    """Near-dup pairs between a DELTA and an indexed corpus — without
    re-scanning the corpus.

    Output: ``(id_a, id_b, jaccard, src, exact)`` where

    - ``src="old"``: ``id_a`` is the matched index entry's EXEMPLAR doc
      id, ``id_b`` the new doc id. The exemplar stands for its whole
      duplicate cluster — the index intentionally does not carry member
      lists, because the ingest decision is per-NEW-doc ("does this
      duplicate anything retained?"), not per-old-doc.
    - ``src="new"``: both ids are new docs (``minhash_lsh_pairs`` over
      the delta, same parameters and the SAME precomputed signature
      table — the delta is shingled once; skipped with
      ``include_new_pairs=False``). Extra ``new_pair_kwargs``
      (``intra_pairs=``, …) forward to it, as do
      ``broadcast_candidates`` and ``bucket_cap``.

    ``bucket_cap`` bounds hot ``(band, hash)`` buckets on BOTH joins:
    the delta's self-join (forwarded to ``minhash_lsh_pairs``, the r10
    star-through-hub mechanics) AND the delta×index band join, where
    buckets whose index side exceeds the cap pair each delta set with
    the bucket's min-fingerprint index entry only — candidates stay
    linear in the delta instead of B_idx × B_delta, with recall loss
    bounded by the LSH band-miss probability (every emitted pair is
    still verified, so precision is unchanged).

    ``exact`` is True for fingerprint-identical matches (Jaccard 1.0 by
    construction) and for exactly verified near matches; False only
    under ``verify="estimate"``.

    ``n``/``num_perm`` default to the index's embedded metadata (a
    one-row probe); pass them explicitly under strictLazy — explicit
    values are validated against the metadata whenever the probe is
    permitted, because a delta hashed differently from its index
    silently matches nothing.

    ``verify``: ``"exact"`` (default when ``old_docs`` is given)
    re-shingles ONLY the candidate exemplars — the new ones from the
    delta, the old ones from ``old_docs`` through an id join the
    parquet scan can push down — and intersects through the candidate
    pair list (work Σ_pairs·|A|, the batch path's shape).
    ``"estimate"`` (default when ``old_docs`` is None) never touches
    the old corpus: Jaccard ≈ matching-signature-component fraction, a
    pure ``zip_with``/``aggregate`` JVM expression with standard error
    √(J(1−J)/num_perm) — at num_perm=64 about ±0.06, so leave a margin
    between ``threshold`` and the Jaccard you actually care about, or
    verify the survivors downstream.

    Scale shape: the delta pays one signature aggregate; the index side
    pays one fp equi-join plus one (band, h) equi-join, both sized by
    the index; nothing is quadratic in either corpus, and the only
    ``F.broadcast`` hints sit on candidate-bounded sides (the
    output-sized fp sets and exemplar maps), NEVER on the index itself
    — ``broadcast_candidates="auto"`` (default) keeps even those only
    when a bounded count probe proves the candidate set fits (see
    ``dedup.resolve_broadcast_candidates``); pass False to force the
    AQE path. Exact duplicates are matched on the fingerprint FIRST and
    excluded from banding, so a boilerplate page arriving a million
    times collides with its index entry through one fp join, never
    through B² band buckets.
    """
    if verify is None:
        verify = "exact" if old_docs is not None else "estimate"
    if verify not in ("exact", "estimate"):
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    if verify == "exact" and old_docs is None:
        raise ValueError(
            "verify='exact' needs old_docs (the retained corpus, for "
            "candidate-exemplar re-shingling) — pass it, or use "
            "verify='estimate' to work from the index alone"
        )
    if _meta is not None:
        n, num_perm = _meta
    else:
        n, num_perm = _resolve_meta(index, n, num_perm)
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"bands ({bands}) must be positive and evenly divide the "
            f"signature's num_perm ({num_perm})"
        )
    rpb = num_perm // bands
    old_id = old_id_col or id_col
    old_text = old_text_col or text_col

    # delta signatures: same single-shuffle aggregate as the batch path;
    # reused by the exact join, the banding, the member fan-out, AND the
    # delta's self-pairing below
    s1 = (
        _s1
        if _s1 is not None
        else _delta_signatures(new_df, id_col, text_col, n, num_perm)
    )
    members = s1.select("__id__", "__fp__")
    new_sets = s1.groupBy("__fp__").agg(
        F.min("__sz__").alias("__sz__"),
        F.min("__id__").alias("__neid__"),
        *_hmin_exprs(num_perm),
    ).select(
        "__fp__",
        "__sz__",
        "__neid__",
        _sig_array_expr(num_perm).alias("__sig__"),
    )

    idx = index.select(
        F.col("__fp__").alias("__ofp__"),
        F.col("__sz__").alias("__osz__"),
        F.col("__eid__").alias("__oeid__"),
        F.col("__sig__").alias("__osig__"),
    )

    # 1 — exact duplicates: one fingerprint equi-join, fanned to every
    # delta member (Jaccard 1.0 by the fingerprint's set-identity)
    exact_pairs = (
        members.join(idx, members["__fp__"] == idx["__ofp__"])
        .select(
            F.col("__oeid__").alias("id_a"),
            F.col("__id__").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
            F.lit("old").alias("src"),
            F.lit(True).alias("exact"),
        )
    )

    # 2 — near duplicates: band join between the delta's UNMATCHED sets
    # and the index, candidates verified exactly or by signature
    fresh = new_sets.join(
        idx.select("__ofp__"),
        new_sets["__fp__"] == F.col("__ofp__"),
        "left_anti",
    )
    nb = _bands_long(fresh, "__fp__", "__sig__", bands, rpb)
    ob = _bands_long(
        idx.select(F.col("__ofp__"), F.col("__osig__")), "__ofp__", "__osig__",
        bands, rpb,
    )
    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be ≥ 1 or None, got {bucket_cap}")
    if bucket_cap is not None:
        # hot-bucket bound, the incremental twin of the batch self-join's
        # r10 fix (dedup.py minhash_lsh_pairs): per-bucket INDEX-side
        # count + hub ride a window over the SAME (band, hash)
        # partitioning the join shuffles on — no extra exchange. Buckets
        # whose index side exceeds the cap pair each delta set with the
        # bucket's min-fingerprint index entry ONLY, so candidates per
        # bucket are ≤ cap × B_delta (small buckets) or B_delta (star),
        # linear in the delta — never B_idx × B_delta. The delta side
        # needs no cap of its own: every bound above is already linear
        # in it, and a delta-side star would erase the per-NEW-doc
        # old-match verdict the ingest decision is made from. Recall:
        # a true (new, old) pair inside an over-cap bucket whose new set
        # fails to verify against the bucket hub is found through its
        # other bands−1 collisions — the same (1−j^r)^(bands−1) bound as
        # the batch path; precision is unchanged (every candidate is
        # still verified).
        wb = Window.partitionBy("__band__", "__h__")
        obl = ob.select(
            "__ofp__",
            "__band__",
            "__h__",
            F.count(F.lit(1)).over(wb).alias("__obn__"),
            F.min("__ofp__").over(wb).alias("__obm__"),
        )
        small_idx = obl.filter(F.col("__obn__") <= bucket_cap).select(
            "__ofp__", "__band__", "__h__"
        )
        hub_idx = (
            obl.filter(F.col("__obn__") > bucket_cap)
            .select("__band__", "__h__", F.col("__obm__").alias("__ofp__"))
            .distinct()
        )
        cand_raw = nb.join(
            small_idx.unionByName(hub_idx), ["__band__", "__h__"]
        ).select("__fp__", "__ofp__")
    else:
        cand_raw = nb.join(ob, ["__band__", "__h__"]).select("__fp__", "__ofp__")
    candidates = truncate_lineage(cand_raw.distinct(), eager=False)
    if verify == "estimate":
        est = (
            candidates.join(fresh.select("__fp__", "__sz__", "__sig__"), "__fp__")
            .join(idx, "__ofp__")
            .select(
                "__fp__",
                "__oeid__",
                (
                    F.aggregate(
                        F.zip_with(
                            "__sig__",
                            "__osig__",
                            lambda x, y: (x == y).cast("int"),
                        ),
                        F.lit(0),
                        lambda acc, v: acc + v,
                    ).cast("double")
                    / F.lit(num_perm)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        near = est.select("__fp__", "__oeid__", "jaccard", F.lit(False).alias("exact"))
    else:
        # exact verification — re-shingle ONLY candidate exemplars: the
        # candidate fp sets (broadcast when hinted) push the id filters
        # toward both parquet scans. Broadcast hints go on
        # CANDIDATE-derived sides only — they are output-bounded; the
        # index and both corpora stay join-sided (huge by assumption),
        # AQE still broadcasts them at runtime if small. "auto"
        # (default): a bounded count probe over the truncated candidate
        # table decides; False under strictLazy (see
        # dedup.resolve_broadcast_candidates).
        # memoize the probe on BOTH candidate-determining sources (the
        # delta and the index) — either lacking a file identity skips
        # memoization, never the probe itself
        _k_delta = plan_data_key(
            new_df, "minhash_inc_bc", id_col, text_col, n, num_perm,
            bands, bucket_cap,
        )
        _k_index = plan_data_key(index)
        _bc_key = (
            (_k_delta, _k_index)
            if _k_delta is not None and _k_index is not None
            else None
        )
        _maybe_bc = (
            F.broadcast
            if resolve_broadcast_candidates(
                candidates, broadcast_candidates, memo_key=_bc_key
            )
            else (lambda d: d)
        )
        new_cand = fresh.select("__fp__", "__neid__").join(
            _maybe_bc(candidates.select("__fp__").distinct()), "__fp__"
        )
        new_docs_c = (
            new_df.join(
                _maybe_bc(new_cand), new_df[id_col] == F.col("__neid__")
            )
            .select("__fp__", F.col(text_col))
            .dropDuplicates(["__fp__"])
        )
        old_cand = idx.select("__ofp__", "__oeid__").join(
            _maybe_bc(candidates.select("__ofp__").distinct()), "__ofp__"
        )
        old_docs_c = (
            old_docs.join(
                _maybe_bc(old_cand), old_docs[old_id] == F.col("__oeid__")
            )
            .select("__ofp__", F.col(old_text).alias("__otext__"))
            .dropDuplicates(["__ofp__"])
        )
        new_sh = _shingle_rows_distinct(new_docs_c, "__fp__", text_col, n).select(
            F.col("__id__").alias("__fp__"), "__s__"
        )
        old_sh = _shingle_rows_distinct(
            old_docs_c, "__ofp__", "__otext__", n
        ).select(F.col("__id__").alias("__ofp__"), "__s__")
        inter = (
            candidates.join(new_sh, "__fp__")
            .join(old_sh, ["__ofp__", "__s__"])
            .groupBy("__fp__", "__ofp__")
            .agg(F.count(F.lit(1)).alias("__inter__"))
        )
        near = (
            inter.join(fresh.select("__fp__", "__sz__"), "__fp__")
            .join(idx.select("__ofp__", "__osz__", "__oeid__"), "__ofp__")
            .select(
                "__fp__",
                "__oeid__",
                (
                    F.col("__inter__").cast("double")
                    / (F.col("__sz__") + F.col("__osz__") - F.col("__inter__"))
                ).alias("jaccard"),
                F.lit(True).alias("exact"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    near_pairs = near.join(members, "__fp__").select(
        F.col("__oeid__").alias("id_a"),
        F.col("__id__").alias("id_b"),
        "jaccard",
        F.lit("old").alias("src"),
        "exact",
    )

    out = exact_pairs.unionByName(near_pairs)
    if include_new_pairs:
        nn = minhash_lsh_pairs(
            new_df, id_col, text_col, n=n, num_perm=num_perm, bands=bands,
            threshold=threshold, broadcast_candidates=broadcast_candidates,
            bucket_cap=bucket_cap, _s1=s1, **new_pair_kwargs,
        ).select(
            "id_a", "id_b", "jaccard",
            F.lit("new").alias("src"), F.lit(True).alias("exact"),
        )
        out = out.unionByName(nn)
    return out


def _retained_wins_closure(
    new_df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    keep_by: str | None,
) -> DataFrame:
    """The ingest-cycle survivor policy, shared by every incremental
    dedup signal (MinHash here, embeddings in
    ``incremental_embedding.py``): given the cycle's pair list —
    ``(id_a, id_b, src)`` with ``src="old"`` rows carrying the NEW doc
    id in ``id_b`` — return the delta rows that enter the corpus.

    Retained content always wins: the delta's self-pair graph is
    clustered FIRST (connected components over the ``src="new"``
    edges), and any cluster containing a doc that matches retained
    content drops WHOLE — the batch pipeline's transitive closure over
    OLD ∪ NEW, with the old side as the survivor. Old-free clusters
    keep one member each (min id, or the best ``keep_by`` score).

    Callers run the temp-column check and the eager-build guard BEFORE
    building ``pairs`` (the clustering rounds below are eager), and
    pass ``pairs`` already lineage-truncated — it is read three times
    here.
    """
    old_hits = pairs.filter(F.col("src") == "old").select(
        F.col("id_b").alias("__hit__")
    ).distinct()
    # cluster the FULL delta self-pair graph, then close over old
    # matches: a component containing any old-hit member is dropped
    # whole (transitive chains included — the batch pipeline's
    # connected-components closure, with the old side as the survivor)
    nn = pairs.filter(F.col("src") == "new").select("id_a", "id_b")
    cc = truncate_lineage(connected_components(nn, "id_a", "id_b"), eager=False)
    hit_comps = (
        cc.join(old_hits, cc["node"] == F.col("__hit__"))
        .select("component")
        .distinct()
    )
    cc_free = cc.join(hit_comps, "component", "left_anti")
    if keep_by is None:
        surv = cc_free.select("component").distinct().select(
            F.col("component").alias("__keep__")
        )
    else:
        scores = new_df.select(
            F.col(id_col).alias("id"), F.col(keep_by).alias("score")
        )
        surv = cluster_survivors(
            nn, scores=scores, id_col="id", score_col="score",
            components=cc_free,
        ).select(F.col("survivor").alias("__keep__"))
    # drop list: direct old hits ∪ every member of a hit component ∪
    # non-survivors of the old-free clusters — all pair/label-sized
    drop = (
        old_hits.select(F.col("__hit__").alias("__drop__"))
        .unionByName(
            cc.join(hit_comps, "component").select(F.col("node").alias("__drop__"))
        )
        .unionByName(
            cc_free.select(F.col("node").alias("__drop__")).join(
                surv, F.col("__drop__") == F.col("__keep__"), "left_anti"
            )
        )
        .distinct()
    )
    return new_df.join(drop, new_df[id_col] == F.col("__drop__"), "left_anti")


def incremental_dedup_corpus(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    old_docs: DataFrame | None = None,
    threshold: float = 0.5,
    bands: int = 16,
    n: int | None = None,
    num_perm: int | None = None,
    keep_by: str | None = None,
    **pair_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """One ingest cycle: ``(kept_new_docs, updated_index)``.

    Policy (the standard ingest contract): retained content always wins
    — reopening old survivor decisions would mean rewriting immutable
    corpus partitions every cycle. Concretely, the delta's self-pair
    graph is clustered FIRST, and any cluster containing a doc that
    matches retained content is dropped WHOLE: a chain
    ``old ≈ a, a ≈ b`` drops both ``a`` and ``b`` even when ``b`` alone
    sits below the threshold against the old doc — exactly the
    connected-components closure the batch pipeline applies over
    OLD ∪ NEW. Clusters free of old matches keep one survivor each
    (min id, or best ``keep_by`` score). The updated index is the old
    index merged with the index of the KEPT docs only — built from the
    cycle's already-computed signature table, so the delta is shingled
    exactly once per cycle — and the next cycle dedups against exactly
    what the corpus now retains.

    The returned frames are lazy apart from the clustering rounds
    (eager, strictLazy-gated like ``near_dedup_corpus``); a production
    loop writes ``kept`` to the corpus and ``updated_index`` to the
    index location (write the index to a NEW path, then swap — reading
    and overwriting the same parquet path in one job is a Spark
    anti-pattern).
    """
    for tmp in ("__hit__", "__drop__", "__keep__"):
        if tmp in new_df.columns:
            raise ValueError(
                f"incremental_dedup_corpus: input already has a column "
                f"named {tmp!r}; rename it before calling"
            )
    eager_build_guard(
        new_df.sparkSession,
        "incremental_dedup_corpus clustering (star-contraction rounds "
        "run eagerly at call time)",
        "Build the pair/cluster stages explicitly outside strict-lazy "
        "scope, or run this call from a session that permits build-time "
        "jobs.",
    )
    n, num_perm = _resolve_meta(index, n, num_perm)
    pair_kwargs.setdefault("intra_pairs", "star")
    s1 = _delta_signatures(new_df, id_col, text_col, n, num_perm)
    # the pair list is read three times below (old filter, clustering,
    # the hit-component closure) — cut the lineage so the band joins
    # run once, not three times
    pairs = truncate_lineage(
        minhash_pairs_incremental(
            new_df, id_col, text_col, index, old_docs=old_docs,
            threshold=threshold, bands=bands, include_new_pairs=True,
            _s1=s1, _meta=(n, num_perm), **pair_kwargs,
        ),
        eager=False,
    )
    kept = _retained_wins_closure(new_df, id_col, pairs, keep_by)
    # the kept docs' signatures are already in s1 — one semi-join, no
    # second shingle pass. Unchecked merge: the fresh index is built
    # with the OLD index's own (n, num_perm) by construction.
    kept_s1 = s1.join(
        kept.select(F.col(id_col).alias("__kid__")),
        s1["__id__"] == F.col("__kid__"),
    ).drop("__kid__")
    updated = _merge_unchecked(
        index, _index_from_signatures(kept_s1, n, num_perm)
    )
    return kept, updated
