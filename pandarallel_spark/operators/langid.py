"""Language identification — Cavnar & Trenkle n-gram rank profiles
("N-Gram-Based Text Categorization", SDAIR'94), re-expressed as pure
relational Spark (SURVEY.md §2.3; r12 verdict task #2 — the one
standard curation stage the engine lacked: ``stratified_sample_sources``'
temperature mixing and ``curate_corpus`` both presumed a ``lang``
column somebody else produced).

Method (public, hash-free — which is what makes it SQL-replayable and
therefore oracle-gradable):

1. normalize text: lowercase, collapse every non-letter run to one
   space, pad with single spaces (the pad makes word-boundary grams
   first-class, the classic C&T trick);
2. extract character n-grams (default n ∈ {1,2,3}) over the padded
   string — one deviation from the paper, which n-grams per padded
   word: whole-string grams give the same boundary information with
   one expression and no per-word loop;
3. a LANGUAGE PROFILE is the top-``k`` grams ranked by frequency
   (ties broken by gram, so profiles are total-order deterministic);
4. a document is scored against each profile by the OUT-OF-PLACE
   distance: for each of the document's top-``k`` grams,
   ``|doc_rank - profile_rank|`` when the gram is in the profile, a
   fixed ``penalty`` (the paper's "maximum out-of-place") when not;
   lowest total distance wins, ties broken by language code.

Scale shape: training aggregates the labeled corpus once (explode →
map-side-combined count → per-language rank window) into a profile
table of ``|langs| × top_k`` rows — kilobytes, broadcast everywhere
after. Classification is explode → count → rank per document (shuffles
partitioned BY DOCUMENT, so it scales out linearly and no key is
hotter than the longest document's distinct-gram count, itself capped
by ``doc_top_k``), a broadcast join against the profiles, and one
ranking window. Zero Python in the plan — every step is JVM
expressions Catalyst can push and fuse; DuckDB replays every step
bit-for-bit (integer counts and ranks; the regex stays in the Java∩RE2
subset like text.BPE_PATTERN).

The built-in seed corpus (``SEED_TRAIN``/``SEED_TEST``) is a small set
of sentences written for this module across eight languages — six
Latin-script plus Chinese and Japanese (``[^\p{L}]+`` keeps han/kana
characters, and kana grams separate ja from zh) — enough signal for
the rank profiles to separate them, and a deterministic fixture both
engines can embed as literals. Real deployments should train on their
own labeled sample via :func:`train_language_profiles`; profiles are
plain DataFrames, so they persist/load as parquet like any other
table.

Reference frame: the reference repo (pandarallel, core.py) has no
language-id surface; this is LLM-pipeline scope (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Java ∩ RE2: \p{L} works identically in Spark's regexp_replace and
# DuckDB's RE2 (same contract as text.BPE_PATTERN)
_NON_LETTER = r"[^\p{L}]+"
DEFAULT_NS: tuple[int, ...] = (1, 2, 3)
DEFAULT_TOP_K = 300

# ---------------------------------------------------------------------------
# built-in seed corpus (six Latin-script languages + zh/ja, lowercase so
# normalization parity never depends on locale-sensitive case mapping)
# ---------------------------------------------------------------------------

SEED_TRAIN: dict[str, tuple[str, ...]] = {
    "en": (
        "the quick brown fox jumps over the lazy dog near the river",
        "she said that the weather would be fine for the long walk home",
        "this is the story of a small town and the people who live there",
        "we should think about what the children want before the holidays",
        "there are many ways to cook a good meal with fresh vegetables",
        "he could not remember where the old keys had been left yesterday",
        "the library opens early and the readers arrive with their books",
        "every morning the birds sing in the garden behind the house",
        "it would have been better to ask for help when the work started",
        "they watched the ships come into the harbour under a grey sky",
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "sie sagte dass das wetter für den langen heimweg schön sein würde",
        "dies ist die geschichte einer kleinen stadt und ihrer menschen",
        "wir sollten überlegen was die kinder vor den ferien wollen",
        "es gibt viele wege ein gutes essen mit frischem gemüse zu kochen",
        "er konnte sich nicht erinnern wo die alten schlüssel geblieben waren",
        "die bibliothek öffnet früh und die leser kommen mit ihren büchern",
        "jeden morgen singen die vögel im garten hinter dem haus",
        "es wäre besser gewesen um hilfe zu bitten als die arbeit begann",
        "sie sahen die schiffe unter einem grauen himmel in den hafen kommen",
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux près de la rivière",
        "elle a dit que le temps serait beau pour le long chemin du retour",
        "voici l'histoire d'une petite ville et des gens qui y vivent",
        "nous devrions penser à ce que veulent les enfants avant les vacances",
        "il y a beaucoup de façons de préparer un bon repas avec des légumes frais",
        "il ne se souvenait plus où les vieilles clés avaient été laissées hier",
        "la bibliothèque ouvre tôt et les lecteurs arrivent avec leurs livres",
        "chaque matin les oiseaux chantent dans le jardin derrière la maison",
        "il aurait mieux valu demander de l'aide quand le travail a commencé",
        "ils regardaient les navires entrer dans le port sous un ciel gris",
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "ella dijo que el tiempo sería bueno para el largo camino a casa",
        "esta es la historia de un pueblo pequeño y de la gente que vive allí",
        "deberíamos pensar en lo que quieren los niños antes de las vacaciones",
        "hay muchas maneras de cocinar una buena comida con verduras frescas",
        "él no podía recordar dónde habían quedado las llaves viejas ayer",
        "la biblioteca abre temprano y los lectores llegan con sus libros",
        "cada mañana los pájaros cantan en el jardín detrás de la casa",
        "habría sido mejor pedir ayuda cuando empezó el trabajo",
        "miraban los barcos entrar al puerto bajo un cielo gris",
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
        "lei ha detto che il tempo sarebbe stato bello per la lunga strada di casa",
        "questa è la storia di una piccola città e della gente che ci vive",
        "dovremmo pensare a cosa vogliono i bambini prima delle vacanze",
        "ci sono molti modi per cucinare un buon pasto con verdure fresche",
        "non riusciva a ricordare dove fossero rimaste le vecchie chiavi ieri",
        "la biblioteca apre presto e i lettori arrivano con i loro libri",
        "ogni mattina gli uccelli cantano nel giardino dietro la casa",
        "sarebbe stato meglio chiedere aiuto quando il lavoro è iniziato",
        "guardavano le navi entrare nel porto sotto un cielo grigio",
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso perto do rio",
        "ela disse que o tempo estaria bom para o longo caminho de casa",
        "esta é a história de uma cidade pequena e das pessoas que vivem lá",
        "devíamos pensar no que as crianças querem antes das férias",
        "há muitas maneiras de cozinhar uma boa refeição com legumes frescos",
        "ele não conseguia lembrar onde as chaves velhas tinham ficado ontem",
        "a biblioteca abre cedo e os leitores chegam com os seus livros",
        "toda manhã os pássaros cantam no jardim atrás da casa",
        "teria sido melhor pedir ajuda quando o trabalho começou",
        "eles olhavam os navios entrar no porto sob um céu cinzento",
    ),
    # CJK (r13 extension): \p{L} keeps han/kana characters, so the same
    # rank-profile machinery separates them — Japanese profiles are
    # dominated by kana grams Chinese text never contains
    "zh": (
        "今天的天气很好我们一起去公园散步吧",
        "他说这本书的故事发生在一个小镇上",
        "我们应该在假期之前想一想孩子们想要什么",
        "用新鲜的蔬菜做一顿好饭有很多方法",
        "他不记得旧钥匙昨天放在哪里了",
        "图书馆每天早上开门读者们带着书来",
        "每天早晨鸟儿在房子后面的花园里唱歌",
        "工作开始的时候最好先请别人帮忙",
        "他们看着船在灰色的天空下进入港口",
        "她说天气会很好适合走很长的路回家",
    ),
    "ja": (
        "今日は天気がいいので公園まで散歩に行きましょう",
        "彼はこの本の物語が小さな町で起こると言った",
        "休みの前に子どもたちが何を望むか考えるべきだ",
        "新鮮な野菜でおいしい食事を作る方法はたくさんある",
        "彼は古い鍵を昨日どこに置いたか思い出せなかった",
        "図書館は朝早く開き読者は本を持ってやって来る",
        "毎朝鳥たちが家の裏の庭で歌っている",
        "仕事を始めるときは助けを求めたほうがよかった",
        "彼らは灰色の空の下で船が港に入るのを見ていた",
        "彼女は長い帰り道の天気はきっといいと言った",
    ),
}

# out-of-profile fixtures (r14, the rejection-dial contract): scripts
# disjoint from every seed profile (Cyrillic, Greek) and letterless
# text — each scores near the all-unmatched maximum against ALL eight
# profiles (margin ~0, rel-dist ~1.0), so min_margin/max_rel_dist
# reject them while every SEED_TEST sentence stays correctly labeled.
# (A Dutch page, by contrast, genuinely sits inside the in-profile
# margin band of the 10-sentence de/en seeds — see identify_language's
# docstring; near-relative rejection needs domain-trained profiles.)
OOD_TEST: tuple[str, ...] = (
    "быстрая коричневая лиса прыгает через ленивую собаку у реки",
    "учитель попросил учеников написать о своем лете",
    "η γρηγορη καφε αλεπου πηδαει πανω απο το τεμπελικο σκυλι",
    "12345 67890 11111 22222 33333",
)

SEED_TEST: dict[str, tuple[str, ...]] = {
    "en": (
        "the teacher asked the students to write about their summer",
        "a warm wind came through the open window during the night",
        "nobody knew why the lights in the old house were still on",
        "the train was late so we waited with coffee at the station",
    ),
    "de": (
        "der lehrer bat die schüler über ihren sommer zu schreiben",
        "ein warmer wind kam in der nacht durch das offene fenster",
        "niemand wusste warum das licht im alten haus noch brannte",
        "der zug hatte verspätung also warteten wir mit kaffee am bahnhof",
    ),
    "fr": (
        "le professeur a demandé aux élèves d'écrire sur leur été",
        "un vent chaud est entré par la fenêtre ouverte pendant la nuit",
        "personne ne savait pourquoi les lumières de la vieille maison brillaient encore",
        "le train était en retard alors nous avons attendu avec du café à la gare",
    ),
    "es": (
        "el maestro pidió a los alumnos que escribieran sobre su verano",
        "un viento cálido entró por la ventana abierta durante la noche",
        "nadie sabía por qué las luces de la casa vieja seguían encendidas",
        "el tren llegó tarde así que esperamos con café en la estación",
    ),
    "it": (
        "il maestro ha chiesto agli alunni di scrivere della loro estate",
        "un vento caldo è entrato dalla finestra aperta durante la notte",
        "nessuno sapeva perché le luci della vecchia casa fossero ancora accese",
        "il treno era in ritardo così abbiamo aspettato con un caffè alla stazione",
    ),
    "pt": (
        "o professor pediu aos alunos que escrevessem sobre o seu verão",
        "um vento quente entrou pela janela aberta e não deixou ninguém dormir",
        "ninguém sabia por que as luzes da casa velha ainda estavam acesas",
        "o trem estava atrasado então esperamos com café na estação",
    ),
    "zh": (
        "老师让学生们写一写他们的暑假生活",
        "夜里一阵暖风从打开的窗户吹了进来",
        "没有人知道为什么老房子里的灯还亮着",
        "火车晚点了所以我们在车站喝咖啡等着",
    ),
    "ja": (
        "先生は生徒たちに夏休みのことを書くように言った",
        "夜の間に暖かい風が開いた窓から入ってきた",
        "古い家の明かりがまだついている理由は誰も知らなかった",
        "電車が遅れたので駅でコーヒーを飲みながら待った",
    ),
}


# ---------------------------------------------------------------------------
# expression building blocks (pure Column — JVM-side, fuse into the scan)
# ---------------------------------------------------------------------------


def normalize_for_langid(col: Column | str) -> Column:
    """Lowercase, collapse non-letter runs to single spaces, pad with
    one space each side — the gram alphabet is letters + the boundary
    space, nothing else, so punctuation/digit noise can't leak into
    profiles."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), _NON_LETTER, " "))
    return F.concat(F.lit(" "), norm, F.lit(" "))


def char_ngrams(col: Column | str, ns: tuple[int, ...] = DEFAULT_NS) -> Column:
    """All character n-grams (WITH multiplicity — the profiles rank by
    frequency) of the normalized padded text, for every n in ``ns``.
    One array expression; the sequence guard keeps short strings from
    producing Spark's descending ``sequence(1, 0) = [1, 0]``."""
    pt = normalize_for_langid(col)
    ln = F.length(pt)

    def gram_at(n: int):
        # a SINGLE-parameter lambda: F.transform inspects arity and
        # would pass the ARRAY INDEX as a second argument, silently
        # clobbering a `n=n` default-capture (found the hard way)
        return lambda i: pt.substr(i, F.lit(n))

    parts = []
    for n in ns:
        idx = F.when(ln >= n, F.sequence(F.lit(1), ln - F.lit(n - 1))).otherwise(
            F.array().cast("array<int>")
        )
        parts.append(F.transform(idx, gram_at(n)))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


# ---------------------------------------------------------------------------
# train / classify
# ---------------------------------------------------------------------------


def train_language_profiles(
    df: DataFrame,
    text_col: str,
    lang_col: str,
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Rank profiles from a labeled corpus: ``(lang, gram, rank)`` with
    ``rank`` 1..``top_k`` per language (frequency-descending, gram-
    ascending ties — total order, so the same corpus trains the same
    profile on any cluster). One explode + map-side-combined count +
    one rank window partitioned by language; output is
    ``|langs| × top_k`` rows — persist it as parquet next to the model
    artifacts and broadcast it at classify time."""
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(text_col, ns)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("__c__"))
    w = Window.partitionBy("lang").orderBy(
        F.col("__c__").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def _py_char_ngrams(text: str, ns: tuple[int, ...]) -> list[str]:
    """Driver-side twin of :func:`char_ngrams` for the STATIC seed
    corpus. Parity rests on two facts: the seeds are pre-lowercased
    (no locale-sensitive case mapping runs), and Python's
    ``unicodedata`` letter categories agree with Java's ``\\p{L}`` for
    every character the seeds use (Latin + common CJK — a Unicode-
    version skew on NEWER code points could diverge, which is why
    ``tests/test_langid.py::test_seed_profiles_equal_distributed_training``
    pins this function row-for-row against the Spark trainer; any seed
    edit that breaks the agreement fails there, loudly)."""
    import unicodedata

    letters = "".join(
        ch if unicodedata.category(ch).startswith("L") else " "
        for ch in text.lower()
    )
    t = " " + " ".join(letters.split()) + " "
    return [t[i : i + n] for n in ns for i in range(len(t) - n + 1)]


def seed_language_profiles(
    spark,
    langs: tuple[str, ...] | None = None,
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Profiles for the built-in ``SEED_TRAIN`` corpus — the zero-setup
    path for the eight seed languages (six Latin-script + zh/ja). For
    anything beyond (more languages, domain text), train on a real
    labeled sample via :func:`train_language_profiles`.

    The ranking runs DRIVER-SIDE (the corpus is ~80 static sentences;
    a distributed train would be ~5 stages of pure scheduling overhead
    per call) with the identical count-desc/gram-asc total order —
    pytest pins the result row-for-row equal to
    :func:`train_language_profiles` on the same corpus, and the
    oracle-graded rows replay the SQL training path independently."""
    from collections import Counter

    langs = langs or tuple(sorted(SEED_TRAIN))
    rows = []
    for lg in langs:
        counts: Counter = Counter()
        for s in SEED_TRAIN[lg]:
            counts.update(_py_char_ngrams(s, ns))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rows += [
            (lg, g, i + 1) for i, (g, _) in enumerate(ranked[:top_k])
        ]
    return spark.createDataFrame(rows, "lang string, gram string, rank int")


def identify_language(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: DataFrame,
    ns: tuple[int, ...] = DEFAULT_NS,
    doc_top_k: int = DEFAULT_TOP_K,
    penalty: int | None = None,
    out_col: str = "lang_ct",
    dist_col: str = "lang_ct_dist",
    max_dist: int | None = None,
    max_rel_dist: float | None = None,
    min_margin: int | None = None,
    unknown_label: str = "und",
    nearest_col: str | None = None,
) -> DataFrame:
    """Classify each document: ``(id_col, out_col, dist_col)`` — the
    winning language and its integer out-of-place distance (exact
    arithmetic, which is what lets the DuckDB oracle grade this).

    ``nearest_col`` (r14, optimization hook): when set, the output
    additionally carries the PRE-rejection winner language under that
    name. The rejection dials are a pure CASE over columns the winner
    window already computed (dist, runner-up lead, k_doc), so exposing
    the undialed label is free — it lets one classification pass feed
    both a plain and a rejection-dialed consumer instead of running
    the explode/count/rank/score plan twice (classification is
    per-document independent: every shuffle is partitioned by
    ``id_col``, so the same document scores identically in any batch).

    ``penalty`` is the out-of-place cost of a document gram absent
    from a profile; default ``doc_top_k`` (the paper's "maximum"
    scaled to the document profile length). Set ``doc_top_k`` lower
    than training's ``top_k`` for short inputs — a 60-char query has
    ~150 grams and the extra slots would just be noise.

    Unknown-language rejection (r14 — the r13 verdict's #2 task; C&T's
    own practice): by default every document is assigned its NEAREST
    profile language, so a language outside the profile set silently
    lands on its closest neighbor. Three independent dials emit
    ``unknown_label`` (default ``"und"``) instead:

    - ``max_dist`` — reject when the winning distance exceeds this
      absolute cap (scales with document profile size; prefer
      ``max_rel_dist`` for mixed-length corpora);
    - ``max_rel_dist`` — reject when ``dist / (penalty · k_doc)``
      (k_doc = the document's scored gram count; the ratio is 1.0 for
      a document sharing NO gram with the profile) exceeds this
      dimensionless cap — e.g. 0.95 rejects script-disjoint text
      (Cyrillic vs Latin profiles) at any document length;
    - ``min_margin`` — reject when the runner-up language's distance
      is within ``min_margin`` of the winner (ties — letterless text,
      script-disjoint text where every profile scores ~identically —
      have margin 0 and reject at any positive setting). A profile
      table with a single language has no runner-up and never
      margin-rejects.

    ``dist_col`` always carries the winning (pre-rejection) distance —
    the evidence for the und verdict, not erased by it. Discriminating
    power scales with profile quality: against the 10-sentence seed
    profiles a Dutch page still lands within the in-profile margin
    band of de/en (no dial setting separates it without breaking
    in-profile sentences), while script-disjoint or letterless inputs
    separate cleanly; train domain profiles via
    :func:`train_language_profiles` when near-relative rejection
    matters. ``unknown_label`` may not collide with a trained profile
    language (raises — the output would be unreadable).

    Plan: all shuffles are partitioned by document id (gram count,
    rank window, the (id, lang) score aggregate, the winner window);
    the profile table and the tiny language list are broadcasts — the
    ×|langs| gram expansion happens map-side against them and
    collapses in the same stage's partial aggregation, so nothing
    corpus-sized ever co-shuffles with anything but itself.

    NULL text has no grams, so the document is absent from the output
    (:func:`with_language`'s left join surfaces it with a NULL lang);
    empty/letterless text still classifies — its profile is just the
    boundary-space grams."""
    if penalty is None:
        penalty = doc_top_k
    if max_rel_dist is not None and not 0.0 < float(max_rel_dist) <= 1.0:
        raise ValueError(
            f"max_rel_dist must be in (0, 1], got {max_rel_dist} — it is "
            "the winning distance as a fraction of the all-unmatched "
            "maximum penalty·k_doc"
        )
    if min_margin is not None and int(min_margin) < 1:
        raise ValueError(
            f"min_margin must be ≥ 1, got {min_margin} — 0 would never "
            "reject (margins are non-negative integers)"
        )
    grams = df.select(
        F.col(id_col), F.explode(char_ngrams(text_col, ns)).alias("__g__")
    )
    counts = grams.groupBy(id_col, "__g__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__c__").desc(), F.col("__g__").asc()
    )
    doc_prof = (
        counts.withColumn("__dr__", F.row_number().over(w))
        .filter(F.col("__dr__") <= doc_top_k)
        .select(id_col, "__g__", "__dr__")
    )
    prof = F.broadcast(
        profiles.select(
            F.col("lang").alias("__lang__"),
            F.col("gram").alias("__g__"),
            F.col("rank").alias("__pr__"),
        )
    )
    # every (doc, lang) pair must be scored, matched or not — a doc
    # sharing NO gram with some (or any!) profile still gets that
    # language's distance penalty·k_doc, exactly as the SQL replay
    # computes it. (An r13 "fast path" skipped the unmatched fill on
    # the assumption that the boundary-space gram matches every pair;
    # the review killed it: long unsegmented-script docs can push ' '
    # out of the top-doc_top_k cut, and a doc with no profile overlap
    # would vanish from the output entirely.) Complete BY CONSTRUCTION:
    # expand each doc gram across the |langs| broadcast list, left-join
    # the profile on (gram, lang), and aggregate coalesce(|dr−pr|,
    # penalty) — one map-side-combined shuffle on (id, lang), no
    # separate k_doc aggregate, no post-hoc fill join. The ×|langs|
    # expansion happens map-side against broadcasts and collapses in
    # the same stage's partial aggregation.
    # (r15: a coalesce(1) before this distinct removes its tiny hash
    # Exchange from the plan, but measured ~1 s SLOWER per draw on the
    # graded row — the single-partition build serializes the broadcast
    # job for no byte savings. The exchange carries |langs|·top_k rows
    # at any corpus scale; leave it.)
    langs = F.broadcast(
        profiles.select(F.col("lang").alias("__lang__")).distinct()
    )
    scored = (
        doc_prof.crossJoin(langs)
        .join(prof, ["__g__", "__lang__"], "left")
        .groupBy(id_col, "__lang__")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("__dr__") - F.col("__pr__")),
                    F.lit(int(penalty)),
                )
            ).cast("bigint").alias("__dist__"),
            # k_doc: one row per scored doc gram — the max_rel_dist
            # denominator, computed in the same partial aggregation
            F.count(F.lit(1)).alias("__k__"),
        )
    )
    # winner + runner-up via ONE id-keyed aggregate instead of a
    # row_number/lead window (r15, guide §2.4): the scored table holds
    # exactly |langs| rows per document, so the winner selection is a
    # bounded top-2 — collect the (dist, lang) structs (lexicographic
    # array_sort == the window's dist-asc/lang-asc total order) and
    # slice the first two. Same doc-id clustering as the score
    # aggregate, so like the window it plans with no extra Exchange —
    # but the window's full Sort of the scored table (O(R log R) per
    # partition, real at corpus scale) becomes a hash aggregate with a
    # ≤|langs|-element in-memory sort per document. try_element_at(2)
    # is NULL for a single-language profile table (ANSI element_at
    # would throw on the missing index), matching lead()'s
    # no-runner-up NULL.
    top2 = scored.groupBy(id_col).agg(
        F.expr(
            "slice(array_sort(collect_list(struct(__dist__, __lang__))),"
            " 1, 2) AS __t2__"
        ),
        # k_doc is identical across a doc's language rows (one row per
        # scored doc gram in each) — min picks the shared value
        F.min("__k__").alias("__k__"),
    )
    ranked = top2.select(
        F.col(id_col),
        F.element_at("__t2__", 1)["__lang__"].alias("__lang__"),
        F.element_at("__t2__", 1)["__dist__"].alias("__dist__"),
        F.col("__k__"),
        F.try_element_at("__t2__", F.lit(2))["__dist__"].alias("__d2__"),
    )
    reject = F.lit(False)
    if max_dist is not None:
        reject = reject | (F.col("__dist__") > F.lit(int(max_dist)))
    if max_rel_dist is not None:
        reject = reject | (
            F.col("__dist__").cast("double")
            > F.lit(float(max_rel_dist))
            * F.lit(int(penalty))
            * F.col("__k__").cast("double")
        )
    if min_margin is not None:
        reject = reject | (
            F.col("__d2__").isNotNull()
            & ((F.col("__d2__") - F.col("__dist__")) < F.lit(int(min_margin)))
        )
    if max_dist is None and max_rel_dist is None and min_margin is None:
        lang_out = F.col("__lang__")
    else:
        # a trained language named like the rejection label would make
        # the output unreadable — validated lazily inside the plan (no
        # eager job; same idiom as sketches.py's dtype-pin guard)
        lang_out = F.when(
            F.col("__lang__") == F.lit(unknown_label),
            F.raise_error(
                F.lit(
                    f"identify_language: profile language "
                    f"{unknown_label!r} collides with unknown_label — "
                    "pick a different rejection label"
                )
            ).cast("string"),
        ).otherwise(
            F.when(reject, F.lit(unknown_label)).otherwise(F.col("__lang__"))
        )
    out_cols = [
        F.col(id_col),
        lang_out.alias(out_col),
        F.col("__dist__").alias(dist_col),
    ]
    if nearest_col is not None:
        out_cols.append(F.col("__lang__").alias(nearest_col))
    return ranked.select(*out_cols)


def with_language(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: DataFrame,
    out_col: str = "lang_ct",
    **kwargs,
) -> DataFrame:
    """``df`` plus the predicted-language column — the curation-stage
    shape (``curate_corpus`` keep_langs / ``temperature_mix`` feed).
    One equi-join back on ``id_col``; the distance column is dropped
    (ask :func:`identify_language` directly when you want it)."""
    preds = identify_language(
        df, id_col, text_col, profiles, out_col=out_col, **kwargs
    ).drop("lang_ct_dist" if "dist_col" not in kwargs else kwargs["dist_col"])
    return df.join(preds, id_col, "left")


# ---------------------------------------------------------------------------
# DuckDB replay (oracle generation — same contract as text.html_strip_sql)
# ---------------------------------------------------------------------------


def _sql_ngram_list(pt_expr: str, ns: tuple[int, ...]) -> str:
    """DuckDB list expression for char_ngrams over a padded-text SQL
    expression — generate_series is empty when the bound is < 1, so no
    guard is needed (unlike Spark's descending sequence)."""
    parts = [
        f"list_transform(generate_series(1, length({pt_expr}) - {n - 1}), "
        f"i -> substr({pt_expr}, i, {n}))"
        for n in ns
    ]
    return " || ".join(parts)


def ct_classify_sql(
    docs_rel: str,
    train_rel: str,
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = DEFAULT_TOP_K,
    doc_top_k: int = DEFAULT_TOP_K,
    penalty: int | None = None,
    max_dist: int | None = None,
    max_rel_dist: float | None = None,
    min_margin: int | None = None,
    unknown_label: str = "und",
    prefix: str = "__",
) -> str:
    """A DuckDB CTE chain replaying train + classify bit-for-bit.
    ``docs_rel`` must expose ``(id, t)``, ``train_rel`` ``(lang, t)``;
    the result relation is ``(id, lang_pred, dist)`` named
    ``{prefix}ct`` (pass a distinct ``prefix`` to embed two chains —
    e.g. the plain and rejection-dial classifications — in one
    query). Every step is the same integer arithmetic the Spark plan
    runs (counts, dense ranks with the identical DESC/ASC tie order,
    out-of-place sums, r14's rejection CASE over dist / runner-up
    lead / penalty·k), which is the property that makes the langid
    kinds oracle-gradable."""
    if penalty is None:
        penalty = doc_top_k
    norm = (
        "' ' || trim(regexp_replace(lower({t}), '[^\\p{{L}}]+', ' ', 'g')) "
        "|| ' '"
    )
    tr_pt = norm.format(t="t")
    p = prefix
    rej = []
    if max_dist is not None:
        rej.append(f"dist > {int(max_dist)}")
    if max_rel_dist is not None:
        rej.append(
            f"CAST(dist AS DOUBLE) > {float(max_rel_dist)!r} * "
            f"{int(penalty)} * CAST(k AS DOUBLE)"
        )
    if min_margin is not None:
        rej.append(f"(d2 IS NOT NULL AND d2 - dist < {int(min_margin)})")
    esc = unknown_label.replace("'", "''")
    pred = (
        f"CASE WHEN {' OR '.join(rej)} THEN '{esc}' ELSE lang END"
        if rej
        else "lang"
    )
    return f"""
{p}tr_g AS (SELECT lang, unnest({_sql_ngram_list('pt', ns)}) AS g
  FROM (SELECT lang, {tr_pt} AS pt FROM {train_rel})),
{p}tr_c AS (SELECT lang, g, count(*) AS c FROM {p}tr_g GROUP BY 1, 2),
{p}prof AS (SELECT lang, g, pr FROM (
  SELECT lang, g, row_number() OVER (
    PARTITION BY lang ORDER BY c DESC, g ASC) AS pr FROM {p}tr_c)
  WHERE pr <= {top_k}),
{p}d_g AS (SELECT id, unnest({_sql_ngram_list('pt', ns)}) AS g
  FROM (SELECT id, {tr_pt} AS pt FROM {docs_rel})),
{p}d_c AS (SELECT id, g, count(*) AS c FROM {p}d_g GROUP BY 1, 2),
{p}dg AS (SELECT id, g, dr FROM (
  SELECT id, g, row_number() OVER (
    PARTITION BY id ORDER BY c DESC, g ASC) AS dr FROM {p}d_c)
  WHERE dr <= {doc_top_k}),
{p}ks AS (SELECT id, max(dr) AS k FROM {p}dg GROUP BY 1),
{p}m AS (SELECT {p}dg.id, {p}prof.lang,
    sum(abs({p}dg.dr - {p}prof.pr)) AS md, count(*) AS mc
  FROM {p}dg JOIN {p}prof ON {p}dg.g = {p}prof.g GROUP BY 1, 2),
{p}sc AS (SELECT {p}ks.id, l.lang, {p}ks.k,
    CAST(coalesce({p}m.md, 0)
         + {penalty} * ({p}ks.k - coalesce({p}m.mc, 0)) AS BIGINT) AS dist
  FROM {p}ks CROSS JOIN (SELECT DISTINCT lang FROM {p}prof) l
  LEFT JOIN {p}m ON {p}m.id = {p}ks.id AND {p}m.lang = l.lang),
{p}ct AS (SELECT id, {pred} AS lang_pred, dist FROM (
  SELECT *, row_number() OVER w AS rn, lead(dist) OVER w AS d2
  FROM {p}sc WINDOW w AS (PARTITION BY id ORDER BY dist ASC, lang ASC))
  WHERE rn = 1)
"""


def seed_values_sql(which: dict[str, tuple[str, ...]]) -> str:
    """``(lang, t)`` VALUES relation for a seed dict — single quotes
    escaped the SQL way."""
    rows = [
        f"('{lg}', '{s.replace(chr(39), chr(39) * 2)}')"
        for lg in sorted(which)
        for s in which[lg]
    ]
    return "(SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(lang, t))"


def seed_test_docs_sql() -> str:
    """``(id, lang, t)`` VALUES relation for SEED_TEST with the same
    deterministic ids :func:`seed_test_docs` assigns."""
    rows = []
    for i, (lg, s) in enumerate(
        (lg, s) for lg in sorted(SEED_TEST) for s in SEED_TEST[lg]
    ):
        esc = s.replace("'", "''")
        rows.append(f"({1000000 + i}, '{lg}', '{esc}')")
    return "(SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(id, lang, t))"


def seed_test_docs(spark) -> DataFrame:
    """SEED_TEST as ``(id, lang, text)`` rows — ids deterministic and
    disjoint from the testdata doc_id space (1e6+)."""
    rows = [
        (1000000 + i, lg, s)
        for i, (lg, s) in enumerate(
            (lg, s) for lg in sorted(SEED_TEST) for s in SEED_TEST[lg]
        )
    ]
    return spark.createDataFrame(rows, "id long, lang string, text string")


def ood_test_docs(spark) -> DataFrame:
    """OOD_TEST as ``(id, text)`` rows — deterministic ids in a 3e6+
    range disjoint from both the testdata doc_ids and SEED_TEST."""
    rows = [(3000000 + i, s) for i, s in enumerate(OOD_TEST)]
    return spark.createDataFrame(rows, "id long, text string")


def ood_test_docs_sql() -> str:
    """``(id, t)`` VALUES relation mirroring :func:`ood_test_docs`."""
    rows = [
        f"({3000000 + i}, '{s.replace(chr(39), chr(39) * 2)}')"
        for i, s in enumerate(OOD_TEST)
    ]
    return "(SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(id, t))"
