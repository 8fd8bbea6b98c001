"""Mergeable sketch analytics beyond distinct counts — KLL quantile
sketches and Theta set sketches (Apache DataSketches via Spark 4.1's
built-in ``kll_*`` / ``theta_*`` functions; JVM aggregates, zero
Python).

``relational.py`` already carries two of the classic mergeable
summaries (Agarwal et al., "Mergeable Summaries", PODS'12): HLL for
per-key distinct counts (``sketch_rollup``) and Misra-Gries for
frequent items (``heavy_hitters``). This module adds the remaining two
a 100 TB ingest pipeline wants persisted next to each partition:

- **KLL quantiles** (Karnin/Lang/Liberty, FOCS'16): per-key sketch
  PARTIALS computed once per ingest slice (e.g. per day per source),
  kilobytes each; any coarser rollup later answers p50/p95/p99 of
  token counts / doc lengths / quality scores by MERGING sketches —
  the backfill never re-scans raw data, and the normalized rank error
  is ~1.65/√k (k=200 → ~1.2%) regardless of input size. Below k
  values the sketch stores everything and quantiles are EXACT.
- **Theta sketches**: distinct-count sketches that support set
  EXPRESSIONS — union, intersection, difference — which HLL
  fundamentally cannot (HLL only unions). That is the corpus-planning
  primitive: "how many doc fingerprints does crawl B share with crawl
  A", "how much NEW content does this source add", "estimated Jaccard
  between two corpora" — answered from two kilobyte sketches instead
  of a distinct-join over everything (:func:`corpus_overlap`).

Both are order-independent and deterministic for a fixed input set
(hash-based), so partials are stable under repartitioning; both obey
merge == whole-build (pytest-pinned in the exact regime, rank/relative
tolerances past it). Estimates are engine-specific (DataSketches), so
these stay pytest-verified rather than DuckDB-oracle-graded — the same
standing as the streaming operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KLL_DTYPES = ("bigint", "float", "double")


def _kll_fn(name: str, dtype: str):
    if dtype not in _KLL_DTYPES:
        raise ValueError(
            f"dtype must be one of {_KLL_DTYPES}, got {dtype!r} — it names "
            "the KLL sketch family (DataSketches keeps long/float/double "
            "sketches binary-incompatible), not the input column's type"
        )
    return getattr(F, f"{name}_{dtype}")


def _kll_dtype_for(df: DataFrame, col: str) -> tuple[str, Column]:
    """Map a numeric input column onto a KLL family: integral → bigint,
    float → float, double/decimal → double. Returns (dtype, cast col).
    Loud on non-numeric input — a silent string cast would sketch NULLs."""
    t = df.schema[col].dataType
    if isinstance(t, T.IntegralType):
        return "bigint", F.col(col).cast("bigint")
    if isinstance(t, T.FloatType):
        return "float", F.col(col)
    if isinstance(t, (T.DoubleType, T.DecimalType)):
        return "double", F.col(col).cast("double")
    raise TypeError(
        f"quantile sketches need a numeric column; {col!r} is "
        f"{t.simpleString()} — cast or derive a numeric signal first"
    )


def quantile_sketch_rollup(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 200,
    sketch_col: str | None = None,
) -> DataFrame:
    """Per-key KLL quantile-sketch PARTIALS — the incremental-rollup
    primitive for distributions, the quantile sibling of
    :func:`relational.sketch_rollup`'s HLL form: compute once per
    ingest slice, persist the binary sketch next to the key, and
    answer any COARSER quantile question later by merging sketches
    (:func:`quantile_sketch_merge`) instead of re-scanning raw data.

    Output: ``(*keys, {col}_kll binary, {col}_kll_dtype string)`` —
    the dtype column pins which KLL family the bytes belong to
    (DataSketches keeps long/float/double sketches binary-incompatible;
    a merge across families must fail loudly, not decode garbage).

    ``k`` is the accuracy/size dial (normalized rank error ≈ 1.65/√k;
    200 → ~1.2%, a few KB per key). NULL values are ignored (SQL
    convention); insertion is order-independent so partials are
    deterministic under repartitioning. One map-side-combined shuffle
    of |keys| kilobyte rows — the raw data never moves."""
    dtype, c = _kll_dtype_for(df, col)
    sketch_col = sketch_col or f"{col}_kll"
    agg = _kll_fn("kll_sketch_agg", dtype)
    return df.groupBy(*keys).agg(
        agg(c, F.lit(int(k))).alias(sketch_col),
        # F.first would be nondeterministic in general; a literal is
        # constant-folded and exact
    ).withColumn(f"{sketch_col}_dtype", F.lit(dtype))


def quantile_sketch_merge(
    partials: DataFrame,
    keys: list[str],
    sketch_col: str,
    quantiles: Sequence[float],
    dtype: str | None = None,
) -> DataFrame:
    """Merge KLL partials up to a coarser key set and extract quantile
    values: ``kll_merge_agg`` over the binary column, then one
    ``p{q}`` column per requested rank (``0.5 → p50``, ``0.999 →
    p99_9``). Input is the (tiny) partials table from
    :func:`quantile_sketch_rollup` — the raw data never participates;
    pass ``keys=[]`` for the global distribution.

    ``dtype`` defaults to the ``{sketch_col}_dtype`` pin the rollup
    wrote; pass it explicitly when merging hand-built partials. Mixed
    families in one table raise: inferred dtype runs a bounded distinct
    over the pin column; an EXPLICIT dtype with the pin column present
    is validated lazily row-by-row (``raise_error`` guard fused into
    the merge — a mismatched family fails with a named error instead
    of an opaque JVM deserialization fault; ADVICE r12). Pin-less
    tables with explicit dtype are trusted as documented."""
    for q in quantiles:
        if not 0.0 <= float(q) <= 1.0:
            raise ValueError(f"quantile ranks must be in [0, 1], got {q}")
    pin = f"{sketch_col}_dtype"
    if dtype is None:
        if pin not in partials.columns:
            raise ValueError(
                f"no {pin!r} column to infer the KLL family from — pass "
                "dtype='bigint'|'float'|'double' explicitly"
            )
        from pandarallel_spark.operators._memo import eager_build_guard

        eager_build_guard(
            partials.sparkSession,
            "quantile_sketch_merge KLL-family probe (bounded distinct "
            "over the dtype pin column)",
            "Pass dtype= explicitly to skip the probe.",
        )
        pins = [r[0] for r in partials.select(pin).distinct().limit(3).collect()]
        if len(pins) != 1:
            raise ValueError(
                f"partials mix KLL families {sorted(pins)} — merge them "
                "separately (the binary formats are incompatible)"
            )
        dtype = pins[0]
        merge_input: Column = F.col(sketch_col)
    elif pin in partials.columns:
        # explicit dtype + pin present: validate lazily — a when/
        # otherwise(raise_error) guard evaluates per row inside the
        # merge itself, so a mismatched family fails with this named
        # error before the bytes ever reach the incompatible
        # deserializer (ADVICE r12); no extra job, no extra scan
        merge_input = F.when(
            F.col(pin) == F.lit(dtype), F.col(sketch_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "quantile_sketch_merge: partial's "
                        f"{pin}="
                    ),
                    F.coalesce(F.col(pin), F.lit("NULL")),
                    F.lit(
                        f" does not match dtype={dtype!r} — KLL "
                        "long/float/double sketch formats are binary-"
                        "incompatible; merge each family separately"
                    ),
                )
            ).cast("binary")
        )
    else:
        merge_input = F.col(sketch_col)
    merge = _kll_fn("kll_merge_agg", dtype)
    getq = _kll_fn("kll_sketch_get_quantile", dtype)
    getn = _kll_fn("kll_sketch_get_n", dtype)
    merged = partials.groupBy(*keys).agg(merge(merge_input).alias("__kll__"))

    def pname(q: float) -> str:
        s = f"{float(q) * 100:g}".replace(".", "_")
        return f"p{s}"

    return merged.select(
        *keys,
        getn("__kll__").alias("n"),
        *[
            getq(F.col("__kll__"), F.lit(float(q))).alias(pname(q))
            for q in quantiles
        ],
    )


def theta_rollup(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str | None = None,
) -> DataFrame:
    """Per-key Theta sketch PARTIALS — distinct-count partials that,
    unlike the HLL form, later support set EXPRESSIONS (union,
    intersection, difference — :func:`theta_rollup_merge`,
    :func:`corpus_overlap`). Persist next to the key at ingest; a few
    KB per key at the default ``lg_k=12`` (relative standard error
    ≈ 1/√2¹² ≈ 1.6%). NULLs are ignored; insertion is hash-based and
    order-independent, so partials are deterministic under
    repartitioning."""
    sketch_col = sketch_col or f"{col}_theta"
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(col), F.lit(int(lg_k))).alias(sketch_col)
    )


def theta_rollup_merge(
    partials: DataFrame,
    keys: list[str],
    sketch_col: str,
    estimate_col: str | None = None,
) -> DataFrame:
    """Union Theta partials up to a coarser key set and estimate the
    distinct count — the HLL ``sketch_rollup_merge`` contract on the
    set-operation-capable sketch. Pass ``keys=[]`` for the grand
    total."""
    estimate_col = estimate_col or f"{sketch_col}_estimate"
    merged = partials.groupBy(*keys).agg(
        F.theta_union_agg(F.col(sketch_col)).alias("__u__")
    )
    return merged.select(
        *keys, F.theta_sketch_estimate(F.col("__u__")).alias(estimate_col)
    )


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    b_col: str | None = None,
    lg_k: int = 14,
) -> DataFrame:
    """Estimated set relationship between two corpora from two
    kilobyte sketches — the dedup-planning question ("how much of
    crawl B is already in crawl A / how much NEW content does this
    source add / roughly how similar are these two corpora") answered
    WITHOUT the distinct-join over everything an exact answer costs at
    100 TB. ``col`` names the identity column (a content fingerprint,
    url hash, doc id); ``b_col`` defaults to the same name in ``b``.

    Returns ONE lazy row: ``(n_a, n_b, n_union, n_intersection,
    n_only_a, n_only_b, jaccard)`` — all estimates double. Plan shape:
    one global sketch aggregate per side (map-side combined, each
    emitting a single kilobyte row), a 1×1 broadcast cross join, then
    pure sketch expressions — the corpora are scanned once each and
    never shuffled. ``lg_k=14`` (~0.8% RSE) because intersections
    compound the error of both operands; raise it if the expected
    overlap is a tiny fraction of either side. Exact below 2^lg_k
    distinct values per side (pytest-pinned)."""
    b_col = b_col or col
    sa = a.agg(F.theta_sketch_agg(F.col(col), F.lit(int(lg_k))).alias("__a__"))
    sb = b.agg(
        F.theta_sketch_agg(F.col(b_col), F.lit(int(lg_k))).alias("__b__")
    )
    est = F.theta_sketch_estimate
    joined = sa.join(F.broadcast(sb))
    return joined.select(
        est(F.col("__a__")).alias("n_a"),
        est(F.col("__b__")).alias("n_b"),
        est(F.theta_union("__a__", "__b__")).alias("n_union"),
        est(F.theta_intersection("__a__", "__b__")).alias("n_intersection"),
        est(F.theta_difference("__a__", "__b__")).alias("n_only_a"),
        est(F.theta_difference("__b__", "__a__")).alias("n_only_b"),
    ).select(
        "*",
        F.when(
            F.col("n_union") > 0, F.col("n_intersection") / F.col("n_union")
        ).otherwise(F.lit(0.0)).alias("jaccard"),
    )
