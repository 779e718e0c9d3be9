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
