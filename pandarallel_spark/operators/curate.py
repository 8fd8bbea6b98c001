"""One-call corpus curation — the TRAINED-tier pipeline a pretraining
data team actually runs (SURVEY.md §2.3; the heuristic-tier twin is the
graded ``corpus_cleanup_pipeline`` workload row):

    trained quality filter  →  SSL-prototype prune  →  near-dedup
                            →  deterministic shuffle-shard export

Each stage exists — and is tested — on its own
(:class:`~pandarallel_spark.operators.quality_model.QualityFilter`,
:func:`~pandarallel_spark.operators.semantic.prune_prototypes`,
:func:`~pandarallel_spark.operators.dedup.near_dedup_corpus`,
:func:`~pandarallel_spark.operators.sampling.shuffle_shards`); this
module composes them with the stage-boundary discipline the pieces
can't impose on each other:

- **lineage truncation between stages** (``truncate_lineage`` —
  ``localCheckpoint`` by default, reliable ``checkpoint()`` under the
  ``reliableCheckpoint`` opt-in): every stage after the first consumes
  its input MORE THAN ONCE (k-means fit + scoring pass + join-back;
  shingle pass + anti-join), so without a cut each stage would re-run
  the whole upstream chain — the quality filter's regex features are
  the expensive tail — once per downstream scan. With the cut, each
  stage's work runs exactly once.
- **one strictLazy gate up front**: prototype pruning and clustering
  are eager by design; the composed call refuses under strictLazy
  BEFORE any stage runs, naming the lazy subset that would work.

Stage order follows the cost gradient: the quality filter is a pure
JVM projection (cheapest — run it first so every later stage sees a
smaller corpus), prototype pruning pays one k-means fit + one scan,
near-dedup pays shingling + banding, and the shard export is the final
single shuffle. Pruning before dedup also matches the SSL-Prototypes
setting (Sorscher et al. 2022 prune a deduplicated-ish corpus; exact
copies that survive to the prune stage all land in one cluster and are
then removed by the dedup stage anyway — order changes cost, not the
set of kept documents, for copies).

Reference frame: the reference repo (pandarallel) has no pipeline
surface; this is the RefinedWeb/FineWeb-shaped composition
re-expressed as one Spark plan chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandarallel_spark.operators._memo import eager_build_guard, truncate_lineage


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extract_html: bool = False,
    min_text_ratio: float | None = None,
    lang_profiles: DataFrame | None = None,
    keep_langs: list[str] | None = None,
    langid_kwargs: dict | None = None,
    min_quality: float | None = None,
    quality=None,
    min_prob: float = 0.5,
    vec_col: str | None = None,
    keep_frac: float | None = None,
    prototype_policy: str = "hard",
    prototype_k: int = 16,
    prototype_seed: int = 7,
    dedup_method: str | None = "minhash",
    dedup_threshold: float | None = None,
    keep_by: str | None = None,
    dedup_kwargs: dict | None = None,
    n_shards: int | None = None,
    shard_seed: int = 42,
    shard_col: str = "shard",
    position_col: str | None = None,
    checkpoint_stages: bool = True,
) -> DataFrame:
    """Curate a corpus in one call; every stage is optional and skipped
    stages cost nothing. Returns the curated DataFrame (original
    schema, plus ``shard_col``/``position_col`` when sharding).

    - ``extract_html`` (r12): run
      :func:`~pandarallel_spark.operators.text.html_to_text` over
      ``text_col`` FIRST — curation step zero for a web corpus, so the
      quality features, shingles, and embeddings downstream see prose
      instead of markup. A pure projection fused into the first scan;
      the column is replaced in place (the raw HTML is the input's
      concern, not the curated output's).
    - ``min_text_ratio`` (r13, needs ``extract_html``): drop pages
      whose visible-text fraction (extracted length / raw length, the
      classic boilerplate signal —
      :func:`~pandarallel_spark.operators.text.html_text_ratio`) falls
      below the threshold. Fused with the extraction so the strip
      chain runs once, not once for the ratio and once for the text.
      NULL-text and zero-length raw pages have no defined ratio and
      are DROPPED by this gate (a page with no raw bytes has no
      visible text to keep) — whereas ``extract_html`` alone passes
      NULL-text rows through as NULL (ADVICE r13).
    - ``lang_profiles`` + ``keep_langs`` (r13): Cavnar-Trenkle
      language filter (:mod:`~pandarallel_spark.operators.langid`) —
      classify ``text_col`` against the given profile table (e.g.
      :func:`~pandarallel_spark.operators.langid.seed_language_profiles`)
      and keep only the listed languages. Rows whose language can't be
      derived (NULL text) are dropped. Must be passed together.
      ``langid_kwargs`` (r14) forwards classification dials —
      notably the unknown-language rejection
      (``max_rel_dist=``/``min_margin=``/``max_dist=``, see
      :func:`~pandarallel_spark.operators.langid.identify_language`):
      with dials set, documents no profile explains classify ``"und"``
      and are dropped unless ``"und"`` is listed in ``keep_langs``.
    - ``min_quality`` (r13): the HEURISTIC quality tier —
      :func:`~pandarallel_spark.operators.text.quality_score` ≥
      threshold as a pure filter fused into the scan; the cheap
      first-pass gate in front of (or instead of) the trained filter.
    - ``quality``: a trained
      :class:`~pandarallel_spark.operators.quality_model.QualityFilter`
      (or anything with its ``apply(df, text_col, min_prob)`` contract);
      rows scoring below ``min_prob`` are dropped. ``None`` skips.
    - ``keep_frac`` + ``vec_col``: SSL-prototype pruning — keep
      ``keep_frac`` of every semantic cluster (``prototype_policy``
      ``"hard"`` keeps the far-from-prototype tail, ``"easy"`` the
      core; ``prototype_k``/``prototype_seed`` are the k-means dials).
      ``None`` skips.
    - ``dedup_method``: forwarded to
      :func:`~pandarallel_spark.operators.dedup.near_dedup_corpus`
      (``"minhash"``/``"ngram"``/``"simhash"`` run over ``text_col``;
      ``"embedding"`` — SemDeDup — runs over ``vec_col``).
      ``dedup_threshold``/``keep_by``/``dedup_kwargs`` pass through.
      ``None`` skips.
    - ``n_shards``: finish with
      :func:`~pandarallel_spark.operators.sampling.shuffle_shards` —
      the deterministic pre-training export layout; ``position_col``
      additionally materializes the in-shard order. ``None`` skips.
    - ``checkpoint_stages``: truncate lineage at each stage boundary
      (see the module docstring — strongly recommended; disable only
      for plan inspection). Checkpoints only fire when a prune/dedup
      stage follows, so a quality- or quality+shards-only chain stays
      fully lazy (and strictLazy-safe) regardless of this flag.

    Scale shape: the corpus shrinks monotonically through the chain
    and each stage reads its (checkpointed) input instead of replaying
    upstream work; no stage adds a scan the standalone operator
    wouldn't pay. Determinism: every stage is content-hash / seeded —
    the same corpus curates identically on any cluster size.
    """
    lang_on = lang_profiles is not None or keep_langs is not None
    if langid_kwargs and not lang_on:
        raise ValueError(
            "curate_corpus: langid_kwargs only applies to the language "
            "stage — pass lang_profiles= and keep_langs= too"
        )
    if lang_on and (lang_profiles is None or keep_langs is None):
        raise ValueError(
            "curate_corpus: the language stage needs BOTH lang_profiles= "
            "(e.g. langid.seed_language_profiles(spark)) and keep_langs="
        )
    if lang_on and not list(keep_langs):
        # isin() with zero args is silently false for every row — an
        # empty keep list would delete the whole corpus without a word
        # (review finding r13)
        raise ValueError(
            "curate_corpus: keep_langs is empty — it would silently drop "
            "every row; list the languages to keep"
        )
    if lang_on and "__lang_ct__" in df.columns:
        raise ValueError(
            "curate_corpus: input already has a column named "
            "'__lang_ct__' (the language stage's helper); rename it "
            "before calling"
        )
    if min_text_ratio is not None and not extract_html:
        raise ValueError(
            "curate_corpus: min_text_ratio is the visible-text fraction "
            "of an HTML page — it needs extract_html=True"
        )
    stages_on = [
        quality is not None,
        keep_frac is not None,
        dedup_method is not None,
        n_shards is not None,
    ]
    pre_stages_on = extract_html or lang_on or min_quality is not None
    if not any(stages_on) and not pre_stages_on:
        raise ValueError(
            "curate_corpus: every stage is disabled (extract_html=False, "
            "lang_profiles=None, min_quality=None, quality=None, "
            "keep_frac=None, dedup_method=None, n_shards=None) — enable "
            "at least one, or drop the call"
        )
    if keep_frac is not None and vec_col is None:
        raise ValueError(
            "curate_corpus: prototype pruning (keep_frac=) needs the "
            "embedding column — pass vec_col="
        )
    if dedup_method == "embedding" and vec_col is None:
        raise ValueError(
            "curate_corpus: dedup_method='embedding' (SemDeDup) needs "
            "the embedding column — pass vec_col="
        )
    # one gate up front: clustering/dedup stages run eager jobs — fail
    # BEFORE stage one under strictLazy rather than midway through the
    # pipeline. Stage-boundary checkpoints fire when a MULTI-SCAN stage
    # follows (prune/dedup via stages_on[1:3]; the r13 language stage
    # consumes its input twice, so extraction checkpoints ahead of it)
    # — a quality- or quality+shards-only chain stays fully lazy even
    # with checkpoint_stages=True (ADVICE r12)
    runs_eager = (
        keep_frac is not None
        or dedup_method is not None
        or (checkpoint_stages and lang_on and extract_html)
    )
    if runs_eager:
        eager_build_guard(
            df.sparkSession,
            "curate_corpus stages (clustering/dedup/stage checkpoints "
            "run eagerly at call time)",
            "Chains without prune/dedup stages (and without the "
            "extract_html+language combination) are fully lazy "
            "regardless of checkpoint_stages; compose the eager stages "
            "explicitly outside strict-lazy scope otherwise.",
        )

    out = df
    if extract_html:
        from pandarallel_spark.operators.text import html_to_text

        if min_text_ratio is not None:
            # fuse ratio + extraction: one strip-chain evaluation per
            # row (ratio = extracted length / raw length), then the
            # extracted text replaces the raw column. NULL text / empty
            # raw → NULL ratio → the >= predicate is NULL → dropped:
            # the documented (ADVICE r13) empty-page behavior of this
            # gate, deliberately stricter than bare extract_html
            out = (
                out.withColumn("__xt__", html_to_text(text_col))
                .filter(
                    F.length("__xt__").cast("double")
                    / F.nullif(F.length(text_col).cast("double"), F.lit(0.0))
                    >= F.lit(float(min_text_ratio))
                )
                .withColumn(text_col, F.col("__xt__"))
                .drop("__xt__")
            )
        else:
            out = out.withColumn(text_col, html_to_text(text_col))
        if checkpoint_stages and (
            lang_on or (quality is None and any(stages_on[1:3]))
        ):
            # the 14-step regex chain must not re-run once per
            # downstream scan: the language stage consumes its input
            # twice (gram pipeline + join-back), and without a quality
            # stage to carry a later cut the prune/dedup stages would
            # replay it too (review finding r12)
            out = truncate_lineage(out)
    if lang_on:
        from pandarallel_spark.operators.langid import with_language

        out = with_language(
            out, id_col, text_col, lang_profiles, out_col="__lang_ct__",
            **(langid_kwargs or {}),
        ).filter(F.col("__lang_ct__").isin(*keep_langs)).drop("__lang_ct__")
        if checkpoint_stages and quality is None and any(stages_on[1:3]):
            # no trained-quality cut to carry it: the classification
            # pipeline must not replay once per prune/dedup scan
            out = truncate_lineage(out)
    if min_quality is not None:
        from pandarallel_spark.operators.text import quality_score

        # heuristic tier: a pure expression filter — rides the scan,
        # no cut needed (single consumer until the next stage)
        out = out.filter(quality_score(text_col) >= F.lit(float(min_quality)))
    if quality is not None:
        out = quality.apply(out, text_col, min_prob=min_prob)
        if checkpoint_stages and any(stages_on[1:3]):
            # the regex-feature projection must not re-run once per
            # downstream scan of the filtered corpus
            out = truncate_lineage(out)
    if keep_frac is not None:
        from pandarallel_spark.operators.semantic import prune_prototypes

        out = prune_prototypes(
            out,
            id_col=id_col,
            vec_col=vec_col,
            keep_frac=keep_frac,
            policy=prototype_policy,
            k=prototype_k,
            seed=prototype_seed,
        )
        if checkpoint_stages and dedup_method is not None:
            out = truncate_lineage(out)
    if dedup_method is not None:
        from pandarallel_spark.operators.dedup import near_dedup_corpus

        sig_col = vec_col if dedup_method == "embedding" else text_col
        out = near_dedup_corpus(
            out,
            id_col,
            sig_col,
            method=dedup_method,
            keep_by=keep_by,
            threshold=dedup_threshold,
            **(dedup_kwargs or {}),
        )
    if n_shards is not None:
        from pandarallel_spark.operators.sampling import shuffle_shards

        out = shuffle_shards(
            out,
            id_col,
            n_shards,
            seed=shard_seed,
            shard_col=shard_col,
            position_col=position_col,
        )
    return out


def write_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    mode: str = "overwrite",
    report_before: DataFrame | None = None,
    report_keys: list[str] | None = None,
) -> DataFrame | None:
    """The curation pipeline's terminal step in one call (r12 verdict
    task #5): write ``df`` partitioned by ``shard_col`` — the
    pre-training export layout ``shuffle_shards`` prepared, one
    directory per shard so a trainer reads shard ``k`` with partition
    pruning and zero list-everything cost — and, when ``report_before``
    is given, compute :func:`curation_report` between it and the data
    AS WRITTEN (read back from ``path``, so the report counts what
    actually landed, not what the plan promised) and persist it under
    ``{path}/_curation_report``. The leading underscore keeps the
    report invisible to parquet discovery over ``path`` (Spark and
    DuckDB both skip ``_``-prefixed entries), so the shard table stays
    clean. Returns the written report DataFrame, or ``None`` when no
    ``report_before`` was given."""
    if shard_col not in df.columns:
        raise ValueError(
            f"write_shards: no {shard_col!r} column — run shuffle_shards "
            "(or curate_corpus(n_shards=...)) first, or pass shard_col="
        )
    if report_before is not None and mode != "overwrite":
        # an appended write would report old+new rows against a
        # new-batch 'before' (kept_frac > 1, negative n_dropped) and
        # stack report rows from different writes (review finding r13)
        raise ValueError(
            "write_shards: report_before only makes sense with "
            f"mode='overwrite' (got mode={mode!r}) — with append the "
            "read-back mixes batches; compute curation_report "
            "explicitly for incremental writes"
        )
    df.write.partitionBy(shard_col).mode(mode).parquet(path)
    if report_before is None:
        return None
    spark = df.sparkSession
    report = curation_report(
        report_before, spark.read.parquet(path), keys=report_keys
    )
    report_path = f"{path}/_curation_report"
    report.write.mode(mode).parquet(report_path)
    return spark.read.parquet(report_path)


def curation_report(
    before: DataFrame,
    after: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-group kept/dropped accounting between a pipeline's input and
    its output — the run log every curation job wants next to its
    artifacts: ``(*keys, n_before, n_after, n_dropped, kept_frac)``,
    one row per group present on EITHER side (a group the pipeline
    emptied shows ``n_after = 0``, not a missing row; a group that
    appeared — impossible for a pure filter chain, loud if a bug makes
    it possible — shows ``n_before = 0``). ``keys=None`` gives the
    single global row.

    Plan shape: one map-side-combined count aggregate per side over the
    key columns only (column pruning keeps the scans narrow) and a
    |groups|-sized full-outer join — at 100 TB the report costs two
    count scans, nothing row-sized moves. Lazy end to end: attach it to
    the same write the pipeline runs, or collect it for logging."""
    keys = list(keys or [])
    reserved = {"n_before", "n_after", "n_dropped", "kept_frac"}
    bad = [
        k
        for k in keys
        if k in reserved or (k.startswith("__b_") or k.startswith("__a_"))
    ]
    if bad:
        # a key literally named n_before (etc.) would collide with the
        # agg aliases and fail downstream with an opaque ambiguity
        # error; the __b_/__a_ prefixes are this function's own rename
        # namespace (ADVICE r12)
        raise ValueError(
            f"curation_report: key column(s) {bad} collide with the "
            f"reserved output columns {sorted(reserved)} or the "
            "internal __b_*/__a_* rename namespace — rename them first"
        )
    if not keys:
        b = before.agg(F.count(F.lit(1)).alias("n_before"))
        a = after.agg(F.count(F.lit(1)).alias("n_after"))
        joined = b.join(a)
        key_cols: list = []
    else:
        # per-side key renames: `after` usually derives from `before`
        # (a filter chain), so attribute references into the two
        # aggregates are ambiguous self-join columns — distinct names
        # sidestep the resolver entirely
        b = before.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_before")
        ).select(
            *[F.col(k).alias(f"__b_{k}__") for k in keys], "n_before"
        )
        a = after.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_after")
        ).select(
            *[F.col(k).alias(f"__a_{k}__") for k in keys], "n_after"
        )
        # NULL-SAFE key equality: a plain equi-join never matches NULL
        # keys, which would split a NULL-keyed group into two wrong
        # rows (n_after=0 + a phantom n_before=0 with negative
        # n_dropped — review finding r12)
        cond = None
        for k in keys:
            c = F.col(f"__b_{k}__").eqNullSafe(F.col(f"__a_{k}__"))
            cond = c if cond is None else (cond & c)
        joined = b.join(a, cond, "full_outer")
        key_cols = [
            F.coalesce(F.col(f"__b_{k}__"), F.col(f"__a_{k}__")).alias(k)
            for k in keys
        ]
    nb = F.coalesce(F.col("n_before"), F.lit(0))
    na = F.coalesce(F.col("n_after"), F.lit(0))
    return joined.select(
        *key_cols,
        nb.alias("n_before"),
        na.alias("n_after"),
        (nb - na).alias("n_dropped"),
        F.when(nb > 0, na.cast("double") / nb.cast("double")).alias(
            "kept_frac"
        ),
    )
