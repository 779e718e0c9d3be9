"""Physical-plan audit helpers — plan SHAPE as a testable contract.

"The query returns the right rows" does not survive a 100× scale-up;
"the plan pushes its filters, broadcasts its dims, and shuffles only
per-group partials" does. This module turns those properties into
assertable facts so plan regressions (a lost pushdown, an Expand that
moved back onto the fact scan, a broadcast that silently became a
shuffle join) fail tests instead of shipping.

Works on the ANALYZED-optimized physical plan string (pre-execution;
AQE may improve it further at runtime, never worse for these checks).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanFacts:
    text: str
    n_exchanges: int          # shuffle exchanges (data movement stages)
    n_broadcasts: int         # broadcast exchanges
    n_wscg: int               # whole-stage-codegen spans
    pushed_filters: list[str]  # non-empty PushedFilters entries
    scans: list[str]          # FileScan lines
    has_expand_over_scan: bool  # Expand directly consuming a file scan
    operators: set[str]

    def scan_columns(self) -> list[list[str]]:
        """ReadSchema column lists per scan (column-pruning evidence)."""
        out = []
        for s in self.scans:
            m = re.search(r"ReadSchema: struct<([^>]*)>", s)
            if m:
                out.append([c.split(":")[0] for c in m.group(1).split(",") if c])
        return out


def global_window_violations(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input is NOT
    bounded by construction — the one confirmed scale-killer class
    (Spark executes such a window in ONE task and WindowGroupLimit never
    fires for it; see ntile_customer_quartiles' r7 anatomy: 19.1x growth
    on 10x data before its prefix-scan rewrite).

    Bounded-by-construction forms that remain legal:
      * order key is the prefix-scan's ``__pid`` — the per-partition
        totals relation has <= n_parts rows (operators/prefix.py);
      * a Limit somewhere below the window — the limit-then-rank
        pattern feeds the window only the already-cut k rows.

    Walks the OPTIMIZED logical plan (lazy localCheckpoints truncate
    lineage to a LogicalRDD, so only the live plan above checkpoints is
    inspected — exactly the part that re-executes at scale).
    Returns the offending nodes' simpleStrings (empty list == clean).
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []

    def kids(n):
        s = n.children()
        return [s.apply(i) for i in range(s.size())]

    def is_bounded(n) -> bool:
        """Output cardinality bounded by construction. A Limit bounds its
        subtree; multi-child nodes (joins, unions) are bounded only when
        EVERY child is — a limit on one join branch does NOT bound the
        other branch's corpus-scale rows flowing through the join."""
        if n.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit"):
            return True
        cs = kids(n)
        if not cs:
            return False
        return all(is_bounded(c) for c in cs)

    def visit(n) -> None:
        if n.getClass().getSimpleName() == "Window" and n.partitionSpec().size() == 0:
            order = n.orderSpec()
            keys = [order.apply(i).child().toString() for i in range(order.size())]
            pid_keyed = bool(keys) and all("__pid" in k for k in keys)
            if not pid_keyed and not all(is_bounded(c) for c in kids(n)):
                bad.append(n.simpleString(120))
        for c in kids(n):
            visit(c)

    visit(plan)
    return bad


def plan_facts(df: DataFrame) -> PlanFacts:
    # formatted mode: stable node list with PushedFilters/ReadSchema and
    # [codegen id : N] annotations even under the AQE (pre-final) root.
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    lines = plan.splitlines()
    scans = [ln for ln in lines if "Scan parquet" in ln or "FileScan" in ln]
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    pushed = [p for p in pushed if p.strip()]
    # In formatted mode the tree is in the header; an Expand fed by a
    # scan-side projection appears as Expand whose immediate child (the
    # next, deeper tree line) is a Scan/ColumnarToRow, not an aggregate.
    expand_over_scan = False
    for i, ln in enumerate(lines):
        if re.search(r"\bExpand\b", ln):
            below = "\n".join(lines[i + 1 : i + 4])
            if "Scan parquet" in below or "ColumnarToRow" in below:
                expand_over_scan = True
    ops = {m.group(1) for m in re.finditer(r"\b([A-Z][A-Za-z]+(?:Exec)?)\b", plan)}
    return PlanFacts(
        text=plan,
        n_exchanges=len([ln for ln in lines if re.match(r"\(\d+\) Exchange\b", ln.strip())]),
        n_broadcasts=len([ln for ln in lines if re.match(r"\(\d+\) BroadcastExchange\b", ln.strip())]),
        n_wscg=len(set(re.findall(r"codegen id : (\d+)", plan))),
        pushed_filters=pushed,
        scans=[ln for ln in lines if "ReadSchema" in ln] or scans,
        has_expand_over_scan=expand_over_scan,
        operators=ops,
    )
