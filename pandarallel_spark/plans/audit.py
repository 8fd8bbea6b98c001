"""Plan auditing: measure, don't guess.

A 100 TB plan lives or dies on a handful of physical facts — how many
shuffles, whether Python appears in the hot path, whether small sides
broadcast, whether filters reached the scan. ``scale_audit`` extracts
exactly those facts from ``explain("formatted")`` output so code (tests,
CI gates, notebooks) can assert on them instead of eyeballing plan
dumps. The repo's own plan-regression tests are the primary consumer.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScaleAudit:
    """Physical-plan facts relevant at scale. Counts are node counts in
    the formatted plan tree (the tree section, not the detail section,
    so each physical operator counts once)."""

    exchanges: int = 0                # shuffles (hash/range); excludes broadcasts
    single_partition_exchanges: int = 0  # total-order sorts — the scale killer
    bounded_scalar_agg_exchanges: int = 0  # exempted: global scalar-agg merges
    broadcast_exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0        # cartesian-ish — should be rare and bounded
    python_arrow_stages: int = 0      # mapInPandas / applyInPandas / pandas_udf
    python_row_stages: int = 0        # row-at-a-time UDFs — the slow path
    in_memory_scans: int = 0          # persisted reuse
    pushed_filters: list[str] = field(default_factory=list)
    scans: int = 0

    @property
    def python_free(self) -> bool:
        return self.python_arrow_stages == 0 and self.python_row_stages == 0


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scale_audit(df: DataFrame) -> ScaleAudit:
    """Inspect ``df``'s physical plan and return :class:`ScaleAudit`.

    Notes on fidelity: the counts come from the plan TREE (the numbered
    node list before the per-node details), so operators that print
    again in the detail section aren't double-counted. AQE may collapse
    exchanges at runtime — this audits the compile-time plan, which is
    the conservative (upper-bound) view of what can shuffle. Whole-stage
    codegen spans are deliberately NOT reported: under AQE the
    compile-time tree carries no codegen markers, and reporting a
    guaranteed zero would be worse than silence.
    """
    text = _formatted_plan(df)
    tree = text.split("\n\n", 1)[0]  # node tree section
    a = ScaleAudit()
    for line in tree.splitlines():
        # node lines look like "+- Exchange hashpartitioning(k, 32) (7)"
        m = re.search(r"(?:[+:*]-|^)\s*\*?\(?\d*\)?\s*([A-Za-z]+[A-Za-z ]*)", line)
        if not m:
            continue
        node = line
        if "Exchange" in node:
            if "BroadcastExchange" in node:
                a.broadcast_exchanges += 1
            else:
                a.exchanges += 1
        if "BroadcastHashJoin" in node or "BroadcastNestedLoopJoin" in node:
            a.broadcast_joins += 1
        if "BroadcastNestedLoopJoin" in node or "CartesianProduct" in node:
            a.nested_loop_joins += 1
        if "SortMergeJoin" in node:
            a.sort_merge_joins += 1
        if (
            "MapInPandas" in node
            or "FlatMapGroupsInPandas" in node
            or "ArrowEvalPython" in node
            or "FlatMapGroupsInPandasWithState" in node
        ):
            a.python_arrow_stages += 1
        if "BatchEvalPython" in node:
            a.python_row_stages += 1
        if "InMemoryTableScan" in node:
            a.in_memory_scans += 1
        if re.search(r"Scan (parquet|orc|csv|json|binaryFile)", node):
            a.scans += 1
    # tree lines carry no arguments in formatted mode — exchange
    # partitioning (the SinglePartition scale-killer) lives in the
    # per-node detail blocks "(N) Exchange\nArguments: ...". One shape
    # is EXEMPT: an exchange whose child (the detail block printed
    # immediately before it — Exchange is unary) is a global partial
    # aggregate (``Keys: []``) of FIXED-SIZE partials. It carries one
    # bounded row per input partition — cluster-sized, never
    # data-sized — and Catalyst itself injects it for runtime bloom
    # join filters (``bloom_filter_agg``) and global scalar aggregates.
    # Variable-size partials (collect_list/collect_set) stay counted:
    # their per-partition row is data-sized.
    _BOUNDED_PARTIALS = (
        "partial_bloom_filter_agg", "partial_count", "partial_sum",
        "partial_min", "partial_max", "partial_avg", "partial_first",
        "partial_last",
        # DataSketches aggregates (r13): every partial is a k-bounded
        # sketch — kilobytes per partition regardless of data size, the
        # same cluster-sized-not-data-sized shape as the rest
        "partial_theta_sketch_agg", "partial_theta_union_agg",
        "partial_kll_sketch_agg_bigint", "partial_kll_sketch_agg_float",
        "partial_kll_sketch_agg_double", "partial_kll_merge_agg_bigint",
        "partial_kll_merge_agg_float", "partial_kll_merge_agg_double",
        "partial_hll_sketch_agg", "partial_hll_union_agg",
        "partial_approx_count_distinct",
    )
    blocks = re.split(r"\n\s*\n", text)
    for i, blk in enumerate(blocks):
        m = re.match(r"\s*\(\d+\) Exchange\b", blk)
        if not m:
            continue
        arg = re.search(r"Arguments: ([^\n]*)", blk)
        if not arg or "SinglePartition" not in arg.group(1):
            continue
        prev = blocks[i - 1] if i else ""
        child_is_bounded_scalar = False
        if (
            re.match(
                r"\s*\(\d+\) \*?\s*(ObjectHashAggregate|HashAggregate|"
                r"SortAggregate)\b",
                prev,
            )
            and re.search(r"Keys: \[\]", prev)
        ):
            fns = re.search(r"Functions \[\d+\]: \[([^\]]*)\]", prev)
            if fns:
                # every listed function must be a bounded partial
                names = re.findall(r"(partial_\w+)\(", fns.group(1))
                child_is_bounded_scalar = bool(names) and all(
                    n in _BOUNDED_PARTIALS for n in names
                )
        if child_is_bounded_scalar:
            a.bounded_scalar_agg_exchanges += 1
        else:
            a.single_partition_exchanges += 1
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        flt = m.group(1).strip()
        if flt:
            a.pushed_filters.extend(p.strip() for p in flt.split(","))
    return a


def scale_report(df: DataFrame) -> str:
    """Human-readable scale verdict for a plan — :func:`scale_audit`
    narrated, for notebooks and code review ("would this survive a
    100× scale-up?" as text instead of a dataclass). Returns a
    multi-line string: the counted facts first, then one advice line
    per smell, ``"no scale smells detected"`` when clean. Purely
    observational — building the report never executes the plan."""
    a = scale_audit(df)
    lines = [
        "plan scale audit:",
        f"  shuffles (exchanges):        {a.exchanges}",
        f"  single-partition exchanges:  {a.single_partition_exchanges}"
        f" (+{a.bounded_scalar_agg_exchanges} exempt global-agg merges)",
        f"  broadcast joins:             {a.broadcast_joins}",
        f"  sort-merge joins:            {a.sort_merge_joins}",
        f"  nested-loop/cartesian joins: {a.nested_loop_joins}",
        f"  Python stages:               {a.python_arrow_stages} Arrow, "
        f"{a.python_row_stages} row-at-a-time",
        f"  source scans:                {a.scans}"
        f" ({len(a.pushed_filters)} pushed filters)",
    ]
    advice = []
    if a.single_partition_exchanges:
        advice.append(
            "single-partition exchange(s): a total order puts ALL data "
            "through one task — replace global sorts/windows with keyed "
            "or bucketed forms (see operators/window.py's bucketed "
            "rolling), or orderBy+limit for top-k"
        )
    if a.python_row_stages:
        advice.append(
            "row-at-a-time Python UDF(s) in the plan — 10-100x slower "
            "than Arrow-batched pandas UDFs and built-in expressions; "
            "prefer pyspark.sql.functions or mapInPandas"
        )
    if a.nested_loop_joins:
        advice.append(
            "nested-loop/cartesian join(s): fine only when one side is "
            "provably tiny (a broadcast stats row, a bounded query set) "
            "— otherwise add an equi-join key, banding, or bucketing"
        )
    if a.scans and not a.pushed_filters:
        advice.append(
            "no filters reached a source scan — if this query is "
            "selective, check that predicates are expressed on scan "
            "columns (not through UDFs) so pushdown can engage"
        )
    if not advice:
        advice.append("no scale smells detected")
    return "\n".join(lines + [f"  ! {s}" for s in advice])
