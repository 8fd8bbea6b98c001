"""Cavnar–Trenkle language id (operators/langid.py). Load-bearing:

- differential vs an independent pure-Python C&T implementation
  (counts → rank profiles → out-of-place distance → argmin) on the
  held-out seed sentences — predictions AND exact distances;
- accuracy: every held-out seed sentence classifies to its language
  (eight languages: six Latin-script including the es/it/pt
  near-neighbors, plus the zh/ja han-vs-kana split);
- DuckDB replay (ct_classify_sql) is bit-exact — the property that
  lets the langid kind ride a graded row;
- edge inputs (empty, digits-only) stay total and deterministic.

Reference frame: Cavnar & Trenkle SDAIR'94; the reference repo
(pandarallel) has no language-id surface (SURVEY.md §2.3 scope).
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.langid import (
    DEFAULT_NS,
    DEFAULT_TOP_K,
    SEED_TEST,
    SEED_TRAIN,
    char_ngrams,
    ct_classify_sql,
    identify_language,
    seed_language_profiles,
    seed_test_docs,
    seed_test_docs_sql,
    seed_values_sql,
    train_language_profiles,
    with_language,
)


# --- independent pure-Python reference ------------------------------------


def _py_norm(text: str) -> str:
    import unicodedata

    out = []
    for ch in text.lower():
        out.append(ch if unicodedata.category(ch).startswith("L") else " ")
    return " " + " ".join("".join(out).split()) + " "


def _py_grams(text: str, ns=DEFAULT_NS) -> list[str]:
    t = _py_norm(text)
    return [t[i : i + n] for n in ns for i in range(len(t) - n + 1)]


def _py_profile(texts, ns=DEFAULT_NS, top_k=DEFAULT_TOP_K) -> dict[str, int]:
    c = Counter()
    for t in texts:
        c.update(_py_grams(t, ns))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return {g: i + 1 for i, (g, _) in enumerate(ranked)}


def _py_classify(text, profiles, ns=DEFAULT_NS, doc_top_k=DEFAULT_TOP_K,
                 penalty=None):
    penalty = penalty if penalty is not None else doc_top_k
    dp = _py_profile([text], ns, doc_top_k)
    best = None
    for lang in sorted(profiles):
        p = profiles[lang]
        dist = sum(
            abs(dr - p[g]) if g in p else penalty for g, dr in dp.items()
        )
        if best is None or (dist, lang) < best:
            best = (dist, lang)
    return best[1], best[0]


def test_differential_vs_python_reference(spark):
    """Spark predictions and exact integer distances equal the
    independent reference on every held-out sentence."""
    profiles = seed_language_profiles(spark)
    docs = seed_test_docs(spark)
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(docs, "id", "text", profiles).collect()
    }
    py_prof = {lg: _py_profile(SEED_TRAIN[lg]) for lg in SEED_TRAIN}
    rows = docs.collect()
    n_test = sum(len(v) for v in SEED_TEST.values())
    assert len(got) == len(rows) == n_test == 32
    for r in rows:
        lang, dist = _py_classify(r["text"], py_prof)
        assert got[r["id"]] == (lang, dist), (r["lang"], r["text"][:30])
        # accuracy: held-out sentences classify to their language
        assert lang == r["lang"]


def test_duckdb_replay_is_bit_exact(spark):
    import duckdb

    profiles = seed_language_profiles(spark)
    docs = seed_test_docs(spark)
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(docs, "id", "text", profiles).collect()
    }
    sql = (
        "WITH __docs AS (SELECT id, t FROM " + seed_test_docs_sql() + "), "
        "__train AS (SELECT lang, t FROM " + seed_values_sql(SEED_TRAIN) + "), "
        + ct_classify_sql("__docs", "__train")
        + " SELECT id, lang_pred, dist FROM __ct"
    )
    oracle = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == oracle


def test_char_ngrams_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "ab, c7d"), (2, ""), (3, "1234 !!"), (4, None)],
        "id long, t string",
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", char_ngrams("t").alias("g")).collect()
    }
    assert rows[1] == _py_grams("ab, c7d")
    # empty/digits-only normalize to the bare pad — grams exist, stay total
    assert rows[2] == _py_grams("") == [" ", " ", "  "]
    assert rows[3] == _py_grams("1234 !!")
    # NULL text falls through the sequence guard to the empty array:
    # no grams -> the doc drops out of identify_language (and gets a
    # NULL lang from with_language's left join)
    assert rows[4] == []

    # classification of degenerate docs is still total and deterministic
    profiles = seed_language_profiles(spark)
    out = identify_language(
        df.filter(F.col("t").isNotNull()), "id", "t", profiles
    )
    got = {r["id"]: r["lang_ct"] for r in out.collect()}
    assert set(got) == {1, 2, 3} and all(v in SEED_TRAIN for v in got.values())


def test_no_overlap_doc_still_scored(spark):
    """Review pin (r13): a document must never vanish from the output
    for want of profile overlap — an earlier 'fast path' dropped such
    docs entirely. Two regimes: at default ns a Thai sentence shares
    ONLY the boundary-space gram with every profile (all languages tie,
    alphabetical winner); at ns=(2,3) it shares NOTHING and every
    language scores the full penalty·k_doc. Both must match the
    pure-Python reference exactly."""
    thai = "อากาศวันนี้ดีมากเราไปเดินเล่นกันเถอะ"
    rows = [(1, thai), (2, "the weather is lovely today")]
    df = spark.createDataFrame(rows, "id long, t string")

    profiles = seed_language_profiles(spark)
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(df, "id", "t", profiles).collect()
    }
    assert set(got) == {1, 2}
    py_prof = {lg: _py_profile(SEED_TRAIN[lg]) for lg in SEED_TRAIN}
    for i, t in rows:
        assert got[i] == _py_classify(t, py_prof)
    assert got[1][0] == sorted(SEED_TRAIN)[0]  # all-tie, alphabetical
    assert got[2][0] == "en"

    # TRUE zero overlap: no 1-grams, so even the boundary space can't
    # match — the doc still appears, every language at penalty*k_doc
    ns = (2, 3)
    prof23 = seed_language_profiles(spark, ns=ns)
    got23 = identify_language(df, "id", "t", prof23, ns=ns).collect()
    by = {r["id"]: (r["lang_ct"], r["lang_ct_dist"]) for r in got23}
    assert set(by) == {1, 2}
    py23 = {lg: _py_profile(SEED_TRAIN[lg], ns=ns) for lg in SEED_TRAIN}
    assert by[1] == _py_classify(thai, py23, ns=ns)
    k_doc = len(_py_profile([thai], ns=ns))
    assert by[1] == (sorted(SEED_TRAIN)[0], 300 * k_doc)


def test_general_path_without_1grams(spark):
    """ns without 1-grams takes the cross-fill path (no boundary-space
    guarantee): still differential-equal to the reference and still
    accurate on the held-out seeds."""
    ns = (2, 3)
    corpus = spark.createDataFrame(
        [(lg, s) for lg in sorted(SEED_TRAIN) for s in SEED_TRAIN[lg]],
        "lang string, text string",
    )
    profiles = train_language_profiles(corpus, "text", "lang", ns=ns)
    docs = seed_test_docs(spark)
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(docs, "id", "text", profiles, ns=ns).collect()
    }
    py_prof = {lg: _py_profile(SEED_TRAIN[lg], ns=ns) for lg in SEED_TRAIN}
    for r in docs.collect():
        lang, dist = _py_classify(r["text"], py_prof, ns=ns)
        assert got[r["id"]] == (lang, dist) and lang == r["lang"]


def test_seed_profiles_equal_distributed_training(spark):
    """The driver-side seed-profile shortcut is row-for-row the
    distributed train_language_profiles result — same counts, same
    (-count, gram) total order, same top_k cut."""
    corpus = spark.createDataFrame(
        [(lg, s) for lg in sorted(SEED_TRAIN) for s in SEED_TRAIN[lg]],
        "lang string, text string",
    )
    want = sorted(
        map(tuple, train_language_profiles(corpus, "text", "lang").collect())
    )
    got = sorted(map(tuple, seed_language_profiles(spark).collect()))
    assert got == want


def test_train_profiles_shape_and_with_language(spark):
    corpus = spark.createDataFrame(
        [(lg, s) for lg in sorted(SEED_TRAIN) for s in SEED_TRAIN[lg]],
        "lang string, text string",
    )
    prof = train_language_profiles(corpus, "text", "lang", top_k=50)
    rows = prof.collect()
    assert len(rows) == len(SEED_TRAIN) * 50
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rank"])
    for lg, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, 51)), lg
    # the most frequent gram of any letters+space alphabet is the space
    assert all(
        r["gram"] == " " for r in rows if r["rank"] == 1
    )

    docs = seed_test_docs(spark)
    tagged = with_language(docs, "id", "text", seed_language_profiles(spark))
    assert set(tagged.columns) == {"id", "lang", "text", "lang_ct"}
    n_test = sum(len(v) for v in SEED_TEST.values())
    assert tagged.filter(F.col("lang_ct") == F.col("lang")).count() == n_test


# --- r14: unknown-language rejection dials ---------------------------------


def test_rejection_dials_emit_und(spark):
    """With the graded dials (max_rel_dist=0.95, min_margin=400) every
    held-out seed sentence keeps its label (32/32) and every
    script-disjoint / letterless OOD fixture emits 'und' — while the
    dist column still carries the winning (pre-rejection) evidence."""
    from pandarallel_spark.operators.langid import OOD_TEST, ood_test_docs

    profiles = seed_language_profiles(spark)
    docs = (
        seed_test_docs(spark).select("id", "text")
        .unionByName(ood_test_docs(spark))
    )
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(
            docs, "id", "text", profiles,
            max_rel_dist=0.95, min_margin=400,
        ).collect()
    }
    for r in seed_test_docs(spark).collect():
        assert got[r["id"]][0] == r["lang"], r["text"][:30]
    for i in range(len(OOD_TEST)):
        lang, dist = got[3000000 + i]
        assert lang == "und", OOD_TEST[i][:30]
        assert dist is not None and dist > 0


def test_rejection_duckdb_replay_bit_exact(spark):
    import duckdb

    from pandarallel_spark.operators.langid import (
        ood_test_docs,
        ood_test_docs_sql,
    )

    profiles = seed_language_profiles(spark)
    docs = (
        seed_test_docs(spark).select("id", "text")
        .unionByName(ood_test_docs(spark))
    )
    got = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(
            docs, "id", "text", profiles,
            max_rel_dist=0.95, min_margin=400,
        ).collect()
    }
    sql = (
        "WITH __docs AS (SELECT id, t FROM " + seed_test_docs_sql()
        + " UNION ALL SELECT id, t FROM " + ood_test_docs_sql() + "), "
        "__train AS (SELECT lang, t FROM " + seed_values_sql(SEED_TRAIN) + "), "
        + ct_classify_sql(
            "__docs", "__train", max_rel_dist=0.95, min_margin=400,
        )
        + " SELECT id, lang_pred, dist FROM __ct"
    )
    oracle = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == oracle


def test_rejection_max_dist_absolute(spark):
    """max_dist is a hard absolute cap: 0 rejects every document."""
    profiles = seed_language_profiles(spark)
    docs = seed_test_docs(spark)
    out = identify_language(
        docs, "id", "text", profiles, max_dist=0
    ).collect()
    assert out and all(r["lang_ct"] == "und" for r in out)


def test_rejection_single_language_margin_passes(spark):
    """A one-language profile table has no runner-up — min_margin can
    never reject (the lead is NULL), matching the documented contract."""
    rows = [(lg, s) for lg in ("en",) for s in SEED_TRAIN[lg]]
    train = spark.createDataFrame(rows, "lang string, text string")
    profiles = train_language_profiles(train, "text", "lang")
    docs = spark.createDataFrame(
        [(1, "the readers arrive with their books")], "id long, text string"
    )
    out = identify_language(
        docs, "id", "text", profiles, min_margin=10**9
    ).collect()
    assert out[0]["lang_ct"] == "en"


def test_rejection_validation_and_label_collision(spark):
    profiles = seed_language_profiles(spark)
    docs = seed_test_docs(spark)
    with pytest.raises(ValueError, match="max_rel_dist"):
        identify_language(docs, "id", "text", profiles, max_rel_dist=1.5)
    with pytest.raises(ValueError, match="min_margin"):
        identify_language(docs, "id", "text", profiles, min_margin=0)
    # a winning profile language equal to unknown_label is unreadable
    # output — the lazy in-plan guard raises at execution
    und_train = spark.createDataFrame(
        [("und", s) for s in SEED_TRAIN["en"]], "lang string, text string"
    )
    und_prof = train_language_profiles(und_train, "text", "lang")
    with pytest.raises(Exception, match="collides"):
        identify_language(
            docs, "id", "text", und_prof, min_margin=1
        ).collect()


def test_nearest_col_matches_separate_passes(spark):
    """r14 optimization hook: one dialed pass with ``nearest_col``
    carries the same labels/distances as two separate calls — the
    pre-rejection column equals a plain (undialed) classification of
    the same docs, the dialed column is unchanged, and restricting the
    shared pass to a subset of ids equals classifying that subset alone
    (per-document independence)."""
    from pandarallel_spark.operators.langid import ood_test_docs

    profiles = seed_language_profiles(spark)
    docs = seed_test_docs(spark).select("id", "text").unionByName(
        ood_test_docs(spark)
    )
    shared = identify_language(
        docs, "id", "text", profiles,
        max_rel_dist=0.95, min_margin=400, nearest_col="near",
    ).collect()
    plain = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(docs, "id", "text", profiles).collect()
    }
    dialed = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(
            docs, "id", "text", profiles, max_rel_dist=0.95, min_margin=400
        ).collect()
    }
    assert len(shared) == len(plain) == len(dialed)
    for r in shared:
        assert (r["near"], r["lang_ct_dist"]) == plain[r["id"]]
        assert (r["lang_ct"], r["lang_ct_dist"]) == dialed[r["id"]]
    # subset restriction == classifying the subset alone
    seeds_only = {
        r["id"]: (r["lang_ct"], r["lang_ct_dist"])
        for r in identify_language(
            seed_test_docs(spark), "id", "text", profiles
        ).collect()
    }
    assert {
        r["id"]: (r["near"], r["lang_ct_dist"])
        for r in shared
        if r["id"] < 3000000
    } == seeds_only
