"""Deterministic sampling, splitting, and sequence packing — the
selection ops a training-data pipeline runs after dedup/quality
filtering (SURVEY.md §2.3 family; the reference has no sampling surface
at all — pandas users reach for ``df.sample``, which is neither
reproducible across engines nor stable under repartitioning).

Everything here is **content-hash deterministic**: assignment depends
only on the row's id (plus an explicit seed), never on partitioning,
task order, or cluster size — so a 100 TB rerun, a local[32] test, and
the DuckDB oracle all agree bit-for-bit. The hash is the first 8 hex
chars of md5, parsed as an integer: md5 is available and identical in
every engine (Spark ``conv(substring(md5(x),1,8),16,10)`` ==
DuckDB ``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``).

Scale shapes:
- ``hash_split`` — pure projection, no shuffle: split assignment rides
  the scan.
- ``sample_per_group`` — one shuffle on the group key (ranking window).
- ``pack_sequences`` — one shuffle on the shard key; packing is a
  running-sum window *within* shards, so parallelism = shard count.
  (A global pack order would be a single-task total order — the same
  trap as global rolling; sharding is the documented contract.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_BUCKETS = 1_000_000


def md5_bucket(col: Column | str, buckets: int, seed: int = 42) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of (value, seed).

    First 8 hex chars → 32-bit int → pmod. Uniform to ~2^-32; identical
    in Spark and ANSI SQL engines (no xxhash64 dependency, which DuckDB
    lacks)."""
    key = F.concat(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"),
                   F.lit(f":{seed}"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split ('train'/'val'/'test'/...) by
    hash bucket, proportionally to ``weights`` (normalized). A pure
    projection — no shuffle, no sampling pass, stable under reruns and
    appends (a row's split never changes when other rows come and go,
    unlike ``randomSplit``).

    NULL ids get a NULL split, never a silent assignment: md5(NULL) is
    NULL, and before r4 the CASE fell through ``otherwise`` into the
    LAST split name — a dataset with 5% NULL ids silently skewed the
    test split by +5% (review finding). A NULL split is visible to (and
    excluded by) every downstream equality filter; validate/repair ids
    upstream if NULLs are possible."""
    total = sum(weights.values())
    b = md5_bucket(id_col, _HASH_BUCKETS, seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = int(round(acc * _HASH_BUCKETS))
        clause = F.when(b < cut, F.lit(name))
        expr = clause if expr is None else expr.when(b < cut, F.lit(name))
    last = F.when(F.col(id_col).isNotNull(), F.lit(names[-1]))
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
    position_col: str | None = None,
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle of a corpus into
    ``n_shards`` — the standard pre-training export step: training
    wants documents in pseudo-random order, decorrelated from crawl
    order, source, and time, and it wants the SAME order on a rerun.

    A row's shard is ``md5(id, seed) mod n_shards`` and its position
    within the shard is its ``md5(id, seed+1)`` hash order — both pure
    functions of the id, so reruns, appends, and cluster resizes
    reproduce the identical layout (unlike ``orderBy(rand())``, which
    is neither stable nor rerun-safe). The result is repartitioned ON
    the shard value (ONE hash shuffle, never a global sort — note
    Spark hash-partitions the shard VALUE, so a task may hold several
    shards) and sorted within partitions by (shard, position), so
    every shard's rows are contiguous and shuffle-ordered. Write with

        shuffle_shards(df, "doc_id", 1024).write
            .partitionBy("shard").parquet(path)

    — one DIRECTORY per shard, each file internally in the
    deterministic shuffle order. NULL ids raise rather than silently
    landing in one hot shard (md5(NULL) is NULL → pmod NULL — the
    hash_split NULL lesson applied eagerly).

    ``position_col`` (r12) additionally MATERIALIZES the in-shard rank
    (1-based) as a column — the order becomes data, so an exporter can
    persist it, a resume can seek by it, and an external SQL engine can
    replay it row-for-row. The ranking window partitions on the shard
    value and orders by the keys the sort already established, so it
    rides the SAME single shuffle — no extra exchange, no global
    sort."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥ 1, got {n_shards}")
    if position_col == shard_col:
        raise ValueError(
            f"position_col and shard_col are both {shard_col!r} — the "
            "position column would silently replace the shard column "
            "(review finding r12); name them distinctly"
        )
    for c in (shard_col, position_col):
        if c is not None and c in df.columns:
            raise ValueError(
                f"column {c!r} already exists — pass shard_col=/"
                "position_col= to rename the output columns"
            )
    shard = md5_bucket(id_col, n_shards, seed)
    out = df.withColumn(
        shard_col,
        F.when(F.col(id_col).isNull(), F.raise_error(
            F.lit(f"shuffle_shards: NULL {id_col} cannot be sharded "
                  "deterministically — repair ids upstream")
        )).otherwise(shard),
    )
    pos_key = md5_bucket(id_col, _HASH_BUCKETS, seed + 1)
    out = out.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        F.col(shard_col), pos_key, F.col(id_col),
    )
    if position_col is not None:
        w = Window.partitionBy(F.col(shard_col)).orderBy(
            pos_key, F.col(id_col)
        )
        out = out.withColumn(
            position_col, F.row_number().over(w).cast("bigint")
        )
    return out


def sample_per_group(
    df: DataFrame,
    keys: Sequence[str],
    n: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by
    (md5 bucket of id, id) and keep the first n. One shuffle on the
    group key; reproducible across cluster sizes (vs ``sampleBy``'s
    per-partition Bernoulli draws). NULL ids rank LAST (their md5
    bucket is NULL, which would otherwise sort first and always win the
    sample — review finding r4); they're chosen only when a group has
    fewer than n non-null rows."""
    w = Window.partitionBy(*keys).orderBy(
        md5_bucket(id_col, _HASH_BUCKETS, seed).asc_nulls_last(),
        F.col(id_col).asc_nulls_last(),
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    shard_by: Sequence[str],
    order_by: str,
    pack_col: str = "pack_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Contiguous greedy sequence packing: within each shard, walk rows
    in ``order_by`` order accumulating token counts; a row's pack is
    ``floor(exclusive_prefix_sum / capacity)`` — the deterministic
    streaming packer (documents may straddle a boundary; true bin
    packing is NP-hard and order-dependent, this is the standard
    LLM-pretraining compromise). One shuffle on the shard key; the
    running sum is a JVM window, no Python.

    Determinism requires a TOTAL order within each shard: when
    ``order_by`` can tie, pass ``tiebreak`` columns (e.g. the doc id) —
    tied rows otherwise take whatever relative order the partitioning
    produced, and their pack ids can differ between runs/cluster sizes
    (review finding r4; the module's bit-for-bit guarantee only holds
    for total orders)."""
    w = (
        Window.partitionBy(*shard_by)
        .orderBy(order_by, *[F.col(c) for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return df.withColumn(pack_col, F.floor(prefix / F.lit(capacity)).cast("bigint"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing primitive
    (up/down-weight sources/domains when composing a training mix).
    Keep each row iff its md5 bucket falls under its stratum's cut; a
    stratum absent from ``fractions`` uses ``default_fraction``.

    Pure filter over the scan — no shuffle, no sampling pass — and
    hash-deterministic like everything in this module: reruns, appends,
    and cluster-size changes never change a kept row's fate (unlike
    ``DataFrame.sampleBy``'s per-partition Bernoulli draws). Rows with
    NULL ids are dropped (their bucket is NULL → no cut comparison can
    admit them), consistent with ``hash_split``'s NULL policy.
    """
    b = md5_bucket(id_col, _HASH_BUCKETS, seed)
    cut = None
    for name, frac in fractions.items():
        c = F.lit(int(round(frac * _HASH_BUCKETS)))
        cut = F.when(F.col(strata_col) == name, c) if cut is None else cut.when(
            F.col(strata_col) == name, c
        )
    default_cut = F.lit(int(round(default_fraction * _HASH_BUCKETS)))
    cut = default_cut if cut is None else cut.otherwise(default_cut)
    return df.filter(b < cut)


def aes_key(id_col: Column | str, weight_col: Column | str, seed: int = 42) -> Column:
    """The Efraimidis–Spirakis A-ES sampling key in its log form:
    ``ln(u) / w`` with ``u`` a deterministic md5 uniform in (0, 1] —
    the top-k rows by this key (descending) are a weighted sample
    WITHOUT replacement with inclusion probabilities proportional to
    ``w`` (Efraimidis & Spirakis, IPL 2006: keys u^(1/w); ln/w is the
    same order, numerically safer). ``u = (h + 1) / 2^32`` with ``h``
    the first 8 md5 hex chars — a power-of-two denominator, so the
    double is EXACT and both Spark and any SQL engine feed ``ln``
    identical inputs; selection depends only on key comparisons, so it
    is engine-stable unless two keys collide within float error
    (~2^-50 per pair under md5 uniforms)."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    h = F.conv(
        F.substring(F.md5(F.concat(idc.cast("string"), F.lit(f":{seed}"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**32))
    return F.log(u) / w


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Weighted sample of ``k`` rows WITHOUT replacement, inclusion
    probability proportional to ``weight_col`` (A-ES, see ``aes_key``)
    — e.g. "take 100k documents favoring high quality scores". Like
    everything in this module it is content-hash deterministic: the
    same (id, weight, seed) draws the same sample on any cluster size,
    rerun, or engine.

    Rows with NULL ids or NULL/non-positive weights are excluded (a
    zero-weight row has inclusion probability zero by definition;
    NULL md5 keys would otherwise sort arbitrarily).

    Scale shape — global form: ``ORDER BY key LIMIT k`` plans as
    TakeOrderedAndProject (each task keeps its local top-k; only
    tasks×k rows reach the driver-side merge — never a total sort).
    Grouped form (``keys``): one shuffle on the group key, ranking
    window per group.
    """
    keys = [keys] if isinstance(keys, str) else (list(keys) if keys else None)
    key = aes_key(id_col, weight_col, seed)
    w = F.col(weight_col).cast("double")
    # ~isnan too: Spark evaluates NaN > 0 as TRUE, and a NaN sort key
    # ranks FIRST under desc() — NaN-weight rows (routine in parquet
    # quality-score columns) would otherwise hijack the sample
    # (review finding r8)
    src = df.filter(
        F.col(id_col).isNotNull() & w.isNotNull() & ~F.isnan(w) & (w > 0)
    )
    if keys:
        win = Window.partitionBy(*keys).orderBy(
            key.desc(), F.col(id_col).asc()
        )
        return (
            src.withColumn("__rn__", F.row_number().over(win))
            .filter(F.col("__rn__") <= k)
            .drop("__rn__")
        )
    return src.orderBy(key.desc(), F.col(id_col).asc()).limit(k)


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based source mixing — the standard multilingual /
    multi-source rebalancing rule (mT5 §3.2, XLM-R: sample source s
    with probability ∝ n_s^α): keep each row of source s with rate
    ``(n_s / n_min)^(α−1)``, normalized so the SMALLEST source keeps
    100% — for α < 1 that downweights head sources toward the tail
    (α=1 keeps everything; α→0 equalizes source volumes). The closed
    form needs no iterative water-filling because the normalizer pins
    the largest rate at exactly 1.

    Plan shape: one map-side-combined count per source (|sources|
    rows), broadcast back as the per-row keep rate, then the same
    deterministic md5-bucket cut as ``stratified_sample`` — content-
    hash stable under reruns, appends, and cluster size. NULL strata
    or ids are dropped (no silent assignment, as in ``hash_split``).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # counts run over the SAMPLEABLE population — NULL ids are dropped
    # from the output, so including them here would deflate realized
    # keep rates below the nominal (n_s/n_min)^(α−1) wherever NULL ids
    # concentrate, and a stratum of only-NULL ids could pin n_min while
    # contributing nothing (ADVICE r8)
    counts = (
        df.filter(F.col(strata_col).isNotNull() & F.col(id_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    n_min = counts.agg(F.min("__n__").alias("__nmin__"))
    rates = counts.join(F.broadcast(n_min)).select(
        strata_col,
        F.pow(
            F.col("__n__").cast("double") / F.col("__nmin__").cast("double"),
            F.lit(float(alpha) - 1.0),
        ).alias("__rate__"),
    )
    cut = F.round(F.col("__rate__") * _HASH_BUCKETS).cast("bigint")
    b = md5_bucket(id_col, _HASH_BUCKETS, seed)
    return (
        df.filter(F.col(id_col).isNotNull())
        .join(F.broadcast(rates), strata_col)
        .filter(b < cut)
        .drop("__rate__")
    )
