"""Bounded build-time memo helpers shared by operators.

Operators that run eager Spark jobs at plan-build time (halo-rolling
boundary extraction, ngram-Jaccard protection measurement, symbolic
window probes) memoize the results so rebuilding the same plan is free.
Two rules, both learned from review findings:

- ``memo_put``: one bounded-FIFO eviction policy, not per-module copies
  that could silently diverge.
- ``plan_data_key``: a memo key must identify the DATA, not just the
  plan. ``semanticHash`` alone hashes the logical plan (e.g. a parquet
  path), so overwriting that path with new data would hit the memo and
  serve stale build-time results. ``inputFiles()`` lists the concrete
  files backing the scan — Spark writers always create fresh UUID-named
  files, so overwrite/append changes the key. Inputs without a file
  identity get key ``None`` → caller must skip memoization entirely
  (an ``id()``-based fallback is unsound: CPython reuses addresses
  after GC, which could serve another frame's cached results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STRICT_LAZY_CONF = "spark.pandarallel_spark.strictLazy"


def eager_build_guard(spark, what: str, skip_hint: str) -> None:
    """Raise under strict-lazy mode instead of running a build-time job.

    Some operators run small, bounded, memoized Spark jobs while the
    plan is being BUILT (halo-rolling boundary context, ngram-Jaccard
    protection measurement, similarity dim inference, global as-of
    bucket boundaries). That is the right engineering for interactive
    use, but a pipeline that constructs plans against a busy or stopped
    session should be able to forbid surprise cluster work: set
    ``spark.conf.set("spark.pandarallel_spark.strictLazy", "true")``
    and every such site raises ``RuntimeError`` naming the job and the
    explicit argument that skips it. Memo HITS never trigger the guard
    (nothing runs); only a build that would actually launch a job does.
    """
    try:
        flag = spark.conf.get(STRICT_LAZY_CONF, "false")
    except Exception:  # noqa: BLE001 — unreadable conf: not strict
        return
    if str(flag).lower() == "true":
        raise RuntimeError(
            f"strictLazy is set and building this plan would run an eager "
            f"Spark job ({what}). {skip_hint}"
        )


RELIABLE_CHECKPOINT_CONF = "spark.pandarallel_spark.reliableCheckpoint"


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut a plan's lineage — ``localCheckpoint`` by default, RELIABLE
    ``checkpoint()`` when opted in (r9 verdict task 4).

    Iterative operators (connected-components rounds) and reused
    intermediates (the MinHash signature/candidate tables) must truncate
    lineage or the logical plan doubles per round. ``localCheckpoint``
    does that with zero I/O cost but pins blocks on EXECUTORS: executor
    loss or a dynamic-allocation scale-down discards them and the whole
    job must restart — acceptable for interactive work, not for a
    multi-hour 100 TB contraction. Setting
    ``spark.conf.set("spark.pandarallel_spark.reliableCheckpoint",
    "true")`` (with ``spark.sparkContext.setCheckpointDir(...)``
    pointing at durable storage — HDFS/S3 on a cluster) switches every
    such site to reliable ``checkpoint()``: rounds survive executor
    churn at the price of writing each round to the checkpoint dir.
    Spark only cleans reliable checkpoints at context shutdown when
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is set — point
    the dir at scratch storage or enable that conf."""
    spark = df.sparkSession
    try:
        flag = str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower()
    except Exception:  # noqa: BLE001 — unreadable conf: default path
        flag = "false"
    if flag != "true":
        return df.localCheckpoint(eager=eager)
    if not eager:
        # the reliable branch is unavoidably eager (persist + checkpoint
        # launch jobs NOW); a lazy call site under strictLazy must not
        # violate the no-surprise-jobs contract (ADVICE r10), so it
        # keeps the lazy localCheckpoint — the caller opted into strict
        # laziness first, and the fault-tolerance opt-in only governs
        # the sites that were already eager.
        try:
            strict = str(spark.conf.get(STRICT_LAZY_CONF, "false")).lower()
        except Exception:  # noqa: BLE001 — unreadable conf: not strict
            strict = "false"
        if strict == "true":
            return df.localCheckpoint(eager=False)
    if spark.sparkContext.getCheckpointDir() is None:
        raise RuntimeError(
            f"{RELIABLE_CHECKPOINT_CONF} is true but no checkpoint "
            "directory is set — call "
            "spark.sparkContext.setCheckpointDir('<durable path>') first"
        )
    # persist-before-checkpoint: a bare checkpoint() computes the
    # subtree once for the action and AGAIN for the checkpoint-write
    # job — doubling exactly the multi-hour jobs this opt-in targets.
    # Caching first lets the write job read the computed blocks; the
    # pin is released as soon as the files are durable. This forces
    # eagerness (an unpersist needs a known materialization point) —
    # acceptable: every lazy call site's intermediate is consumed
    # unconditionally, so the work is merely moved, not added.
    df = df.persist()
    try:
        return df.checkpoint(eager=True)
    finally:
        df.unpersist()


def constant_partition_key(col):
    """A constant-valued but NON-FOLDABLE window partition key for
    deliberately single-partition windows over PROVABLY TINY frames
    (top-k lists, per-bucket carry tables ≤ n_buckets rows).

    Why not an empty partition spec: WindowExec warns "No Partition
    Defined … serious performance degradation" on every such window,
    and these documented-bounded sites would bury a FUTURE genuine
    total-order regression in known-benign noise (r11 verdict). Why
    not ``partitionBy(F.lit(0))``: Spark 4's
    ``EliminateWindowPartitions`` optimizer rule strips foldable
    partition expressions, reintroducing the empty spec (a
    multiply-by-zero form is likewise simplified away — both verified
    empirically). This form — ``pmod(hash(col), 1)`` — evaluates to 0
    for every row of ANY type (``hash(NULL)`` is the seed, so NULLs
    land in the same partition), references a real column so no rule
    can fold it, and costs one hash per row on frames that are tiny by
    contract. Use it ONLY where the docstring of the call site states
    why the frame is bounded."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col if isinstance(col, Column) else F.col(col)
    return F.pmod(F.hash(c), F.lit(1))


def shuffle_partitions(spark, default: int = 200) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating platforms
    where the conf is non-numeric (e.g. ``"auto"`` on Databricks): an
    unparseable value is treated as multi-partition (the default), never
    a crash."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (ValueError, TypeError):
        return default


def coarse_group_count(spark, factor: int = 4, cap: int = 65536) -> int:
    """Scale-adaptive group count for Python verify stages keyed on a
    COARSE hash of their bucket key (r14): grouped ``applyInPandas``
    pays a fixed per-GROUP boundary cost (measured ~2 ms of wall clock
    per group at local[32] on Spark 4.1 — Arrow framing + pandas
    scaffolding per call — regardless of group size), so a stage whose
    natural bucket key yields thousands of tiny buckets hashes it into
    ``factor × shuffle partitions`` groups and verifies every real
    bucket inside one call. Grows with the cluster via the shuffle
    partition count; never tuned to one box."""
    return max(1, min(factor * shuffle_partitions(spark), cap))


def memo_put(memo: dict, key, val, cap: int = 16) -> None:
    """Insert with bounded-FIFO eviction (oldest insertion first)."""
    while len(memo) >= cap:
        memo.pop(next(iter(memo)))
    memo[key] = val


def plan_data_key(df: DataFrame, *extra) -> tuple | None:
    """Plan+data identity for build-time memos, or None (don't memoize)."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        return (df.semanticHash(), hash(tuple(sorted(files))), *extra)
    except Exception:  # noqa: BLE001 — unidentifiable input
        return None
