"""One-call curation pipeline (operators/curate.py): trained quality
filter → SSL-prototype prune → near-dedup → shuffle-shard export.

Load-bearing invariants:
- the pipeline IS the explicit composition of its standalone stages,
  row-for-row (same seeds, same inputs — no hidden reordering);
- end to end: junk is removed, per-cluster redundancy is pruned, dup
  texts lose all but one member, and the shard layout is deterministic
  across reruns;
- stage-boundary lineage truncation means the FINAL plan re-scans no
  source files (the r11 verdict's "no extra corpus scans" bar);
- validation names disabled/misconfigured stages; strictLazy refuses
  up front.

Reference frame: RefinedWeb/FineWeb-style curation; the reference repo
(pandarallel) has no pipeline surface.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.curate import curate_corpus
from pandarallel_spark.operators.quality_model import train_quality_filter

_CLEAN = [
    "the quick brown fox jumps over the lazy dog and runs into the field",
    "a clear and well formed sentence with normal words of usual length",
    "spark compiles the declarative plan into stages and runs them",
    "the weather in the valley was mild and the harvest was plentiful",
    "she walked to the market and bought bread and cheese for the family",
    "engineers write tests so that the behavior of the system is pinned",
    "the committee agreed to publish the findings in the spring report",
    "a calm river flows past the old mill at the edge of the town",
]
_GARBAGE = [
    "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~",
    "zzzzzzzzzzzz qqqqqqqqqqq xxxxxxxxxxxx jjjjjjjjjjjj wwwwwwwww",
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "AAAAA BBBBB CCCCC DDDDD EEEEE FFFFF GGGGG HHHHH IIIII JJJJJ",
]


def _quality(spark):
    pos = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CLEAN)], "id long, text string"
    )
    neg = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(_GARBAGE)], "id long, text string"
    )
    return train_quality_filter(pos, neg, "text")


def _corpus(spark, dim=8):
    """36 docs: 24 distinct good ones in two embedding clusters (ids
    0-15 the redundant core at +2, ids 16-23 spread at -2), two EXACT
    text duplicates of good docs (ids 50/51), and 10 junk docs (ids
    70-79)."""
    from itertools import combinations

    rng = np.random.default_rng(17)
    rows = []
    # each good doc concatenates a DISTINCT pair of clean sentences, so
    # cross-doc shingle Jaccard stays ~1/3 (< the 0.5 dedup threshold)
    # while the text still reads as curated to the quality filter
    pairs = list(combinations(range(len(_CLEAN)), 2))[:24]
    for i, (a, b) in enumerate(pairs):
        text = f"{_CLEAN[a]} {_CLEAN[b]}"
        center = 2.0 if i < 16 else -2.0
        emb = [float(x) for x in rng.normal(scale=0.2, size=dim) + center]
        rows.append((i, text, emb))
    # exact duplicates of docs 0 and 1 (higher ids: min-id survivor
    # keeps the originals)
    for j, src in ((50, 0), (51, 1)):
        emb = [float(x) for x in rng.normal(scale=0.2, size=dim) + 2.0]
        rows.append((j, rows[src][1], emb))
    for j in range(10):
        emb = [float(x) for x in rng.normal(scale=0.2, size=dim) - 2.0]
        rows.append((70 + j, _GARBAGE[j % len(_GARBAGE)], emb))
    return spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )


def test_curate_corpus_is_the_explicit_composition(spark):
    """The one-call pipeline equals quality.apply → prune_prototypes →
    near_dedup_corpus → shuffle_shards composed by hand with the same
    dials, row-for-row (ids, shards, positions)."""
    from pandarallel_spark.operators.dedup import near_dedup_corpus
    from pandarallel_spark.operators.sampling import shuffle_shards
    from pandarallel_spark.operators.semantic import prune_prototypes

    df = _corpus(spark)
    qf = _quality(spark)
    kw = dict(
        keep_frac=0.75, prototype_k=2, prototype_seed=11,
        dedup_threshold=0.5, n_shards=4, shard_seed=9, position_col="pos",
    )
    got = curate_corpus(
        df, "doc_id", "text", quality=qf, vec_col="embedding", **kw
    )

    step = qf.apply(df, "text", min_prob=0.5)
    step = prune_prototypes(
        step, id_col="doc_id", vec_col="embedding",
        keep_frac=0.75, policy="hard", k=2, seed=11,
    )
    step = near_dedup_corpus(step, "doc_id", "text", threshold=0.5)
    want = shuffle_shards(step, "doc_id", 4, seed=9, position_col="pos")

    key = lambda r: (r["doc_id"], r["shard"], r["pos"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_curate_corpus_end_to_end_behavior(spark):
    """Junk removed, redundancy pruned per cluster, exact dups lose the
    higher-id member, shard layout reproduces identically on a rerun."""
    df = _corpus(spark)
    qf = _quality(spark)
    kw = dict(
        quality=qf, vec_col="embedding",
        keep_frac=0.5, prototype_k=2, prototype_seed=11,
        n_shards=4, position_col="pos",
    )
    out = curate_corpus(df, "doc_id", "text", **kw)
    rows = out.collect()
    kept = {r["doc_id"] for r in rows}

    # junk gone (quality stage)
    assert not (kept & set(range(70, 80)))
    # redundancy pruned: the quality survivors (26 docs) shrink by the
    # per-cluster keep fraction before dedup — strictly fewer than 26
    assert len(kept) < 26
    # dups dropped: never BOTH members of an exact-dup pair
    assert not ({0, 50} <= kept) and not ({1, 51} <= kept)
    # deterministic export layout: a full rerun reproduces (id, shard,
    # pos) exactly
    rerun = curate_corpus(df, "doc_id", "text", **kw).collect()
    key = lambda r: (r["doc_id"], r["shard"], r["pos"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, rerun))
    # schema: original columns + the export columns
    assert out.columns == ["doc_id", "text", "embedding", "shard", "pos"]


def test_curate_corpus_stage_checkpoints_cut_source_rescans(spark, tmp_path):
    """With checkpoint_stages=True (default) the FINAL plan reads the
    stage checkpoints, never the source files — each stage's work runs
    once no matter how many scans the next stage makes. Disabling the
    cuts leaves source scans in the final plan (the thing the default
    prevents)."""
    pth = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(pth)
    df = spark.read.parquet(pth)
    qf = _quality(spark)
    kw = dict(
        quality=qf, vec_col="embedding", keep_frac=0.75, prototype_k=2,
    )
    cut = curate_corpus(df, "doc_id", "text", **kw)
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan[:2000]

    uncut = curate_corpus(df, "doc_id", "text", checkpoint_stages=False, **kw)
    plan2 = uncut._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") >= 2, plan2[:2000]
    # same result either way — the cuts are a cost choice, not semantics
    assert sorted(r["doc_id"] for r in cut.collect()) == sorted(
        r["doc_id"] for r in uncut.collect()
    )


def test_curate_corpus_optional_stages_and_validation(spark):
    df = _corpus(spark)
    # dedup-only (the default stage set): drops exactly the dup tails
    out = curate_corpus(df, "doc_id", "text")
    kept = {r["doc_id"] for r in out.collect()}
    assert 50 not in kept and 51 not in kept and 0 in kept and 1 in kept
    # 24 distinct good docs + the 4 junk template survivors (junk isn't
    # quality-filtered here, but its exact-duplicate copies dedup away)
    assert kept == set(range(24)) | {70, 71, 72, 73}

    with pytest.raises(ValueError, match="every stage is disabled"):
        curate_corpus(df, "doc_id", "text", dedup_method=None)
    with pytest.raises(ValueError, match="vec_col"):
        curate_corpus(df, "doc_id", "text", keep_frac=0.5)
    with pytest.raises(ValueError, match="vec_col"):
        curate_corpus(df, "doc_id", "text", dedup_method="embedding")

    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="curate_corpus"):
            curate_corpus(df, "doc_id", "text")
        # the documented fully-lazy subset builds under strictLazy
        lazy = curate_corpus(
            df, "doc_id", "text", quality=_quality_lazy(spark),
            dedup_method=None, n_shards=2, checkpoint_stages=False,
        )
        assert "shard" in lazy.columns
        # ADVICE r12: checkpoint_stages=True must NOT refuse a chain
        # that never actually checkpoints (checkpoints only fire when a
        # prune/dedup stage follows) — quality+shards is lazy either way
        lazy_default = curate_corpus(
            df, "doc_id", "text", quality=_quality_lazy(spark),
            dedup_method=None, n_shards=2,
        )
        assert "shard" in lazy_default.columns
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def _quality_lazy(spark):
    """Train OUTSIDE the strictLazy scope the test enables afterwards."""
    spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
    try:
        return _quality(spark)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "true")


def test_curate_corpus_html_stage_zero(spark):
    """extract_html=True replaces the text column with the extracted
    prose BEFORE any other stage, so dedup sees the underlying content:
    two pages whose prose is identical but whose markup differs must
    collapse to one survivor."""
    rows = [
        (1, "<html><body><p>the same exact story about the calm river "
            "mill town</p></body></html>"),
        # identical prose, different markup + chrome
        (2, "<div class='art'><h1></h1><p>the same exact story about "
            "the calm river mill town</p><script>nav();</script></div>"),
        (3, "<p>a completely different tale of harvest in the high "
            "valley farms</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(df, "doc_id", "text", extract_html=True)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3}  # min-id survivor of the markup twins
    assert "<" not in got[1] and got[1].startswith("the same exact story")

    # extract-only call is valid (a pure reformat pass)
    only = curate_corpus(
        df, "doc_id", "text", extract_html=True, dedup_method=None
    )
    assert only.count() == 3
    with pytest.raises(ValueError, match="every stage is disabled"):
        curate_corpus(df, "doc_id", "text", dedup_method=None)


def test_curation_report_accounting(spark):
    """Per-group kept/dropped accounting: emptied groups show n_after=0
    (never a missing row), fractions are exact, and the global form is
    one row."""
    from pandarallel_spark.operators.curate import curation_report

    before = spark.createDataFrame(
        [(i, "web" if i < 6 else "books") for i in range(10)],
        "doc_id long, source string",
    )
    after = before.filter((F.col("doc_id") % 2 == 0) & (F.col("source") == "web"))
    rep = {
        r["source"]: r
        for r in curation_report(before, after, keys=["source"]).collect()
    }
    assert rep["web"]["n_before"] == 6 and rep["web"]["n_after"] == 3
    assert rep["web"]["kept_frac"] == pytest.approx(0.5)
    assert rep["books"]["n_after"] == 0 and rep["books"]["n_dropped"] == 4
    g = curation_report(before, after).collect()
    assert len(g) == 1 and g[0]["n_before"] == 10 and g[0]["n_after"] == 3

    # ADVICE r12: key names colliding with the report's own output
    # columns (or its __b_/__a_ rename namespace) refuse loudly instead
    # of failing downstream with an ambiguity error
    renamed = before.withColumnRenamed("source", "n_before")
    with pytest.raises(ValueError, match="reserved output columns"):
        curation_report(renamed, renamed, keys=["n_before"])
    shadowed = before.withColumnRenamed("source", "__b_x__")
    with pytest.raises(ValueError, match="rename namespace"):
        curation_report(shadowed, shadowed, keys=["__b_x__"])


def test_scale_report_narrates_smells(spark):
    """scale_report flags the single-partition and row-Python smells on
    a bad plan and stays quiet on a clean aggregate."""
    from pandarallel_spark.plans import scale_report

    df = spark.range(100).withColumnRenamed("id", "k")
    bad = scale_report(df.repartition(1))
    assert "single-partition exchange" in bad
    clean = scale_report(df.groupBy((F.col("k") % 10).alias("g")).count())
    assert "no scale smells detected" in clean


def test_curation_report_null_keys_and_html_truncation(spark, tmp_path):
    """Review-finding pins (r12): (a) NULL-keyed groups stay ONE row
    (null-safe join — a plain equi-join split them into an n_after=0
    row plus a phantom negative-n_dropped row); (b) extract_html with
    quality=None still truncates lineage before the multi-scan stages,
    so the regex chain never reaches the final plan."""
    from pandarallel_spark.operators.curate import curation_report

    before = spark.createDataFrame(
        [(1, None), (2, None), (3, "web")], "doc_id long, src string"
    )
    after = before.filter(F.col("doc_id") != 2)
    rows = curation_report(before, after, keys=["src"]).collect()
    by = {r["src"]: r for r in rows}
    assert len(rows) == 2  # NULL group is one row, not two
    assert by[None]["n_before"] == 2 and by[None]["n_after"] == 1
    assert by[None]["n_dropped"] == 1
    assert by[None]["kept_frac"] == pytest.approx(0.5)

    pth = str(tmp_path / "html_corpus")
    spark.createDataFrame(
        [(i, f"<p>unique words {i} alpha beta gamma delta {i}</p>")
         for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(pth)
    src = spark.read.parquet(pth)
    out = curate_corpus(src, "doc_id", "text", extract_html=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan[:1500]
    assert out.count() == 12


def test_shuffle_shards_rejects_shard_position_collision(spark):
    from pandarallel_spark.operators.sampling import shuffle_shards

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="both"):
        shuffle_shards(docs, "doc_id", 2, shard_col="s", position_col="s")


def test_curate_corpus_r13_stages(spark):
    """The r13 optional stages compose: html_text_ratio gate (fused
    with extraction), Cavnar-Trenkle language filter, and the
    heuristic quality tier — each equals its hand-built equivalent."""
    from pandarallel_spark.operators.langid import (
        SEED_TEST,
        seed_language_profiles,
    )
    from pandarallel_spark.operators.text import (
        html_text_ratio,
        quality_score,
    )

    prose = "the quiet village kept its old stone bridge in good repair"
    chrome = "<div>" + "<span class='nav'></span>" * 40 + "<p>hi</p></div>"
    rows = [
        (1, f"<p>{prose} and the mill wheel turned all day long</p>", "en"),
        (2, chrome, "en"),  # boilerplate: low visible-text ratio
        (3, f"<p>{SEED_TEST['de'][0]} {SEED_TEST['de'][1]}</p>", "de"),
        (4, f"<p>{SEED_TEST['fr'][0]} {SEED_TEST['fr'][1]}</p>", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, truth string")
    profs = seed_language_profiles(spark)

    # ratio gate drops the chrome page; extraction replaces the column
    out = curate_corpus(
        df, "doc_id", "text", extract_html=True, min_text_ratio=0.3,
        dedup_method=None,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3, 4} and "<" not in got[1]
    # hand-built equivalent (ratio on raw, then extract)
    ratios = {
        r["doc_id"]: r["rt"]
        for r in df.select(
            "doc_id", html_text_ratio("text").alias("rt")
        ).collect()
    }
    assert ratios[2] < 0.3 and all(ratios[i] >= 0.3 for i in (1, 3, 4))

    # ratio gate + language filter compose: the chrome page (whose
    # 2-char extract would classify as noise) falls to the ratio gate,
    # then only the requested langs survive classification
    kept = curate_corpus(
        df, "doc_id", "text", extract_html=True, min_text_ratio=0.3,
        lang_profiles=profs, keep_langs=["de", "fr"], dedup_method=None,
    )
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    # helper column does not leak
    assert "__lang_ct__" not in kept.columns

    # heuristic quality tier equals the raw expression filter
    junk = spark.createDataFrame(
        [(10, "zzz qqq $$$"), (11, prose + " " + prose)],
        "doc_id long, text string",
    )
    hq = curate_corpus(junk, "doc_id", "text", min_quality=0.5,
                       dedup_method=None)
    exp = junk.filter(quality_score("text") >= 0.5)
    assert [r["doc_id"] for r in hq.collect()] == [
        r["doc_id"] for r in exp.collect()
    ]

    # validation
    with pytest.raises(ValueError, match="extract_html=True"):
        curate_corpus(df, "doc_id", "text", min_text_ratio=0.3,
                      dedup_method=None)
    with pytest.raises(ValueError, match="BOTH lang_profiles"):
        curate_corpus(df, "doc_id", "text", keep_langs=["en"],
                      dedup_method=None)
    # review pins (r13): empty keep list would silently drop the whole
    # corpus (isin() with zero args is false everywhere); a leaked
    # helper column would fail with an opaque ambiguity error
    with pytest.raises(ValueError, match="keep_langs is empty"):
        curate_corpus(df, "doc_id", "text", lang_profiles=profs,
                      keep_langs=[], dedup_method=None)
    with pytest.raises(ValueError, match="__lang_ct__"):
        curate_corpus(df.withColumn("__lang_ct__", F.lit("x")),
                      "doc_id", "text", lang_profiles=profs,
                      keep_langs=["en"], dedup_method=None)


def test_write_shards_and_report(spark, tmp_path):
    """write_shards: partitioned layout on disk, report computed from
    the data AS WRITTEN, report dir invisible to discovery over the
    shard table."""
    from pandarallel_spark.operators.curate import curate_corpus, write_shards

    docs = _corpus(spark)
    curated = curate_corpus(
        docs, "doc_id", "text", dedup_method="minhash", n_shards=3,
    )
    path = str(tmp_path / "shards")
    report = write_shards(
        curated, path, report_before=docs.select("doc_id", "text")
    )
    back = spark.read.parquet(path)
    # partition pruning layout: one dir per shard, report dir hidden
    import os

    entries = sorted(os.listdir(path))
    assert [e for e in entries if e.startswith("shard=")]
    assert "_curation_report" in entries
    assert back.count() == curated.count()
    assert set(back.columns) == set(curated.columns)
    rep = report.collect()
    assert len(rep) == 1
    assert rep[0]["n_before"] == docs.count()
    assert rep[0]["n_after"] == back.count()
    assert rep[0]["n_dropped"] == docs.count() - back.count()

    with pytest.raises(ValueError, match="shuffle_shards"):
        write_shards(docs, str(tmp_path / "no_shard_col"))
    # review pin (r13): an appended report would mix batches
    with pytest.raises(ValueError, match="mode='overwrite'"):
        write_shards(curated, path, mode="append", report_before=docs)


def test_curate_langid_rejection_dials(spark):
    """r14: langid_kwargs forwards the unknown-language rejection dials
    — an out-of-profile (Cyrillic) page classifies 'und' and is dropped
    unless 'und' is listed in keep_langs; without dials the same page
    sails through as its nearest profile language (the r13 gap)."""
    from pandarallel_spark.operators.langid import (
        SEED_TEST,
        seed_language_profiles,
    )

    profs = seed_language_profiles(spark)
    rows = [
        (1, SEED_TEST["en"][0]),
        (2, SEED_TEST["de"][0]),
        (3, "быстрая коричневая лиса прыгает через ленивую собаку у реки"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dials = {"max_rel_dist": 0.95, "min_margin": 400}
    # without dials the Cyrillic page lands on SOME profile language —
    # and an en+de keep list cannot exclude it reliably; with dials it
    # is 'und' and dropped
    kept = curate_corpus(
        df, "doc_id", "text", lang_profiles=profs,
        keep_langs=["en", "de"], langid_kwargs=dials, dedup_method=None,
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    # the und bucket is addressable: keep ONLY the rejected rows
    und_only = curate_corpus(
        df, "doc_id", "text", lang_profiles=profs,
        keep_langs=["und"], langid_kwargs=dials, dedup_method=None,
    )
    assert {r["doc_id"] for r in und_only.collect()} == {3}
    with pytest.raises(ValueError, match="langid_kwargs"):
        curate_corpus(df, "doc_id", "text", langid_kwargs=dials,
                      dedup_method=None)
