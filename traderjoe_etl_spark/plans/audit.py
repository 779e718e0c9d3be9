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

    def is_bounded(n) -> bool:
        """Output cardinality bounded by construction. A Limit bounds its
        subtree; multi-child nodes (joins, unions) are bounded only when
        EVERY child is — a limit on one join branch does NOT bound the
        other branch's corpus-scale rows flowing through the join."""
        if n.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit"):
            return True
        cs = _kids(n)
        if not cs:
            return False
        return all(is_bounded(c) for c in cs)

    def visit(n) -> None:
        if n.getClass().getSimpleName() == "Window" and n.partitionSpec().size() == 0:
            order = n.orderSpec()
            keys = [order.apply(i).child().toString() for i in range(order.size())]
            pid_keyed = bool(keys) and all("__pid" in k for k in keys)
            if not pid_keyed and not all(is_bounded(c) for c in _kids(n)):
                bad.append(n.simpleString(120))
        for c in _kids(n):
            visit(c)
        # windows inside subquery expressions — same blind spot as hints
        for sub in _subquery_plans(n):
            visit(sub)

    visit(plan)
    return bad


# Raw column names of the CORPUS-SCALED testdata tables (FIXTURES.md §B) —
# everything that grows with the data: customer / supplier / part / orders /
# lineitem / events / documents / embeddings. region and nation are the only
# fixed-cardinality dims. Leaf scans in the optimized plan emit these raw
# names (renames happen in Projects ABOVE the leaf), so attribute-set
# intersection identifies which table a scan reads without path plumbing.
_CORPUS_SCAN_COLS = frozenset(
    "c_custkey c_name c_nationkey c_acctbal c_mktsegment "
    "s_suppkey s_name s_nationkey s_acctbal "
    "p_partkey p_name p_brand p_type p_size p_retailprice "
    "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate o_orderpriority "
    "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
    "l_discount l_tax l_returnflag l_linestatus l_shipdate "
    "event_id ts user_id event_type value props "
    "doc_id text lang source n_chars "
    "vec_id embedding label".split()
)

# Nodes that REDUCE their input by construction: a broadcast hint above one
# of these wraps an aggregate / top-k cut, not the raw corpus. (Caveat: an
# Aggregate grouped on a near-unique corpus key still scales with the data —
# that residual class is caught by the at-scale audit's memory behavior, not
# this lint; every such site in the registry pre-aggregates to a vocab- or
# dim-sized relation.)
_REDUCING_NODES = frozenset({"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"})

# Leaf classes that read STORAGE (grow with the data): file scans, catalog /
# v2 tables (the bucketed spark-warehouse reads). LocalRelation / Range /
# OneRowRelation / LogicalRDD leaves are excluded — literals are fixed-size,
# and checkpoint boundaries expose no table identity (every checkpointed
# broadcast side in the registry is an aggregate).
_SCAN_LEAF_NODES = frozenset(
    {"LogicalRelation", "HiveTableRelation", "DataSourceV2Relation", "StreamingRelation"}
)

# Physical-plan twins of _SCAN_LEAF_NODES (sparkPlan walks).
_PHYSICAL_SCAN_LEAVES = frozenset(
    {
        "FileSourceScanExec",
        "RowDataSourceScanExec",
        "BatchScanExec",
        "InMemoryTableScanExec",
    }
)


# --- shared py4j walk helpers -------------------------------------------------
# One copy each (review finding r10 / VERDICT r10 item 4: three private copies
# of kids/is_broadcast/corpus-scan-reachability across the four lint functions
# were a drift bug waiting to desynchronize the lints).


def _kids(n) -> list:
    """Children of a Catalyst plan node (Scala Seq → Python list)."""
    s = n.children()
    return [s.apply(i) for i in range(s.size())]


def _is_broadcast_hint(opt) -> bool:
    """Option[HintInfo] → carries a broadcast strategy?"""
    try:
        if opt.isDefined():
            st = opt.get().strategy()
            return st.isDefined() and "broadcast" in st.get().toString().lower()
    except Exception:
        pass
    return False


def _corpus_scans(n, stop, leaf_classes=_SCAN_LEAF_NODES) -> list[str]:
    """Corpus-table STORAGE leaves reachable from ``n`` without crossing a
    node whose class name satisfies ``stop`` (a callable on the simple class
    name — each lint supplies its own barrier set: reducing nodes, Exchanges,
    explicit Repartitions, or nothing). Only ``leaf_classes`` count as
    storage: a LocalRelation / Range / OneRowRelation literal whose columns
    happen to reuse a generic corpus name (value, ts, label, ...) is
    fixed-size by construction and must not force a bogus whitelist entry.
    Returns one ``Cls(col,...)`` string per reachable corpus leaf (callers
    needing only reachability truth-test the list)."""
    cls = n.getClass().getSimpleName()
    if stop(cls):
        return []
    cs = _kids(n)
    if not cs:
        if cls not in leaf_classes:
            return []
        try:
            out = n.output()
            attrs = {out.apply(i).name() for i in range(out.size())}
        except Exception:
            return []
        hit = sorted(attrs & _CORPUS_SCAN_COLS)
        return [f"{cls}({','.join(hit[:4])})"] if hit else []
    found: list[str] = []
    for c in cs:
        found.extend(_corpus_scans(c, stop, leaf_classes))
    return found


def _stop_reducing(cls: str) -> bool:
    """forced_broadcast barrier: nodes that REDUCE their input bound it."""
    return cls in _REDUCING_NODES


def _stop_physical_exchange_or_agg(cls: str) -> bool:
    """partial_agg barrier (physical): an Exchange means the aggregate's
    first phase is NOT in the scan stage; a lower AggregateExec owns its
    own hazard (its output is the reduced relation the upper one sees)."""
    return "Exchange" in cls or "AggregateExec" in cls


def _stop_logical_repart_or_agg(cls: str) -> bool:
    """partial_agg barrier (logical subquery twin): pre-planner, the only
    exchanges that exist are explicit Repartition nodes."""
    return cls in (
        "RepartitionByExpression",
        "Repartition",
        "RebalancePartitions",
        "Aggregate",
        "Deduplicate",
    )


def _stop_never(cls: str) -> bool:
    return False


def forced_broadcast_violations(df: DataFrame) -> list[str]:
    """Broadcast HINTS whose build side is an unaggregated scan of a
    corpus-scaled table — the q18 class (VERDICT r8): ``F.broadcast(dim)``
    is correct-looking at bench scale (15k customers) and fatal at scale
    (15M+ customers: "Not enough memory to build and broadcast"). A hint
    overrides the engine's stats unconditionally, so it must never wrap a
    relation that grows with the corpus unless something between the hint
    and the scan bounds it (Aggregate / Limit / Deduplicate).

    The sanctioned patterns for corpus-scaled dims are (a) no hint — the
    planner's size estimate + AQE runtime stats decide (the q18 fix), or
    (b) ``operators.joins.gated_broadcast`` — the hint applies only while
    a ``table_bytes``-based size estimate stays under a cap (CBO-role
    stat), so the same query declines it at scale. Gated sites still show
    the hint at small SF and need a justified whitelist entry in
    tests/test_plan_shapes.py.

    Walks the OPTIMIZED logical plan: ``F.broadcast`` / ``hint("broadcast")``
    land in ``Join.hint`` (EliminateResolvedHint). ``LogicalRDD`` leaves
    (checkpoint boundaries) expose no table identity and are not flagged —
    every checkpointed broadcast side in the registry is an aggregate.
    Returns one entry per offending hinted side (empty == clean)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []

    def visit(n) -> None:
        name = n.getClass().getSimpleName()
        cs = _kids(n)
        if name == "Join":
            h = n.hint()
            for opt, side in ((h.leftHint(), 0), (h.rightHint(), 1)):
                if _is_broadcast_hint(opt):
                    # corpus leaves reachable WITHOUT crossing a reducing node
                    scans = _corpus_scans(cs[side], _stop_reducing)
                    if scans:
                        bad.append("broadcast-hint over " + "|".join(scans))
        elif name == "ResolvedHint":
            # defensive: a hint the optimizer has not (yet) folded into a Join
            try:
                st = n.hints().strategy()
                hinted = st.isDefined() and "broadcast" in st.get().toString().lower()
            except Exception:
                hinted = False
            if hinted:
                scans = _corpus_scans(cs[0], _stop_reducing)
                if scans:
                    bad.append("broadcast-hint over " + "|".join(scans))
        for c in cs:
            visit(c)
        # hints inside subquery EXPRESSIONS (scalar/IN/EXISTS plans) are
        # invisible to children() — descend explicitly (ADVICE r9)
        for sub in _subquery_plans(n):
            visit(sub)

    visit(plan)
    return bad


# Corpus-table keys whose DISTINCT COUNT scales ~linearly with the corpus —
# grouping on a key set that includes one of these (as a bare attribute; see
# _near_unique_hits) barely deduplicates over
# its home table (o_orderkey 1:1 on orders, l_orderkey ~4:1 on lineitem,
# doc_id 1:1 on documents, ...), which is the r7–r9 heap-OOM family: a
# map-side partial aggregate over such keys grows a near-input-share hash map
# in every concurrent scan task (q16 distinct, pagerank dropDuplicates, q21
# agg+window, constraint_check count_distinct phase 1). Shared between the
# hinted-aggregate warn lint below and tools/partial_agg_sweep.py.
# KNOWN LIMITATION (documented, accepted): the match is by RAW attribute
# name, so a grouping key RENAMED above the scan (e.g. pagerank's src/dst)
# escapes the heuristic — renamed-key sites are covered by the at-scale
# audit's memory behavior, and every fixed site keeps an Exchange below,
# which clears it here anyway.
NEAR_UNIQUE_CORPUS_KEYS = frozenset(
    {"o_orderkey", "l_orderkey", "c_custkey", "p_partkey", "event_id", "doc_id", "vec_id"}
)

# Bare Catalyst attribute: name#exprId, with the optional single-letter type
# suffix physical attribute strings carry (e.g. l_orderkey#45L for LongType).
_BARE_ATTR_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)#\d+[A-Za-z]?$")


def _near_unique_hits(expr_strings: list[str]) -> list[str]:
    """Near-unique corpus keys among the given GROUPING expression strings.
    Matches only BARE attributes (the whole expression string is
    ``name#exprId``): a grouping key that merely CONTAINS a listed key —
    ``pmod(hash(l_orderkey#1), 32)``, a date_trunc bucket, any other
    fixed-cardinality derivation — groups on the TRANSFORM's cardinality,
    not the key's, and must not force a bogus adjudication entry (ADVICE
    r10). KNOWN LIMITATION (documented, accepted — the mirror of the
    rename limitation above): a cardinality-PRESERVING transform of a
    listed key (cast, concat) now escapes the heuristic too; like renamed
    keys, such sites are covered by the at-scale audit's memory behavior."""
    hits: set[str] = set()
    for s in expr_strings:
        m = _BARE_ATTR_RE.match(s.strip())
        if m and m.group(1) in NEAR_UNIQUE_CORPUS_KEYS:
            hits.add(m.group(1))
    return sorted(hits)


def partial_agg_hazards(df: DataFrame) -> list[str]:
    """Physical-plan DIAGNOSTIC (not a lint): aggregate nodes that (a) group
    on a key set containing a near-unique corpus key and (b) reach a
    storage-backed corpus scan with NO Exchange in between — i.e. the
    aggregate's first phase runs map-side inside the scan stage, so each of
    the ~32 concurrent scan tasks builds a hash map whose size tracks its
    input share. When the grouping barely deduplicates that map is
    near-input-sized and the stage is the q16/pagerank/q21/constraint_check
    heap-OOM class; when it deduplicates well (doc_id over exploded tokens,
    ~60:1) the map-side combine is the designed WIN — which is exactly why
    this is a diagnostic requiring per-hit adjudication (dedup ratio is a
    property of the DATA, not the plan; see tools/partial_agg_sweep.py for
    the registry sweep + adjudication table). Walks the pre-AQE physical
    plan (sparkPlan): AQE can only coalesce partitions afterwards, never
    insert the missing exchange. Returns one string per hit (empty ==
    no map-side phase groups on a near-unique key)."""
    plan = df._jdf.queryExecution().sparkPlan()
    bad: list[str] = []

    def visit(n) -> None:
        cls = n.getClass().getSimpleName()
        if cls.endswith("AggregateExec"):
            try:
                ge = n.groupingExpressions()
                keys = [ge.apply(i).toString() for i in range(ge.size())]
            except Exception:
                keys = []
            hits = _near_unique_hits(keys)
            # storage-backed corpus scan reachable without crossing any
            # Exchange (shuffle or broadcast) or another aggregate (a lower
            # aggregate owns its own hazard; its OUTPUT is the reduced
            # relation the upper one consumes)
            if hits and any(
                _corpus_scans(c, _stop_physical_exchange_or_agg, _PHYSICAL_SCAN_LEAVES)
                for c in _kids(n)
            ):
                bad.append(
                    f"{cls} groups on near-unique key(s) {','.join(hits)} "
                    f"map-side over a corpus scan (no Exchange below): "
                    f"keys={[k[:40] for k in keys]}"
                )
        for c in _kids(n):
            visit(c)

    visit(plan)
    # Subquery expressions (scalar/IN/EXISTS) are invisible to the physical
    # walk: at sparkPlan stage they still hold LOGICAL plans (PlanSubqueries
    # only runs in executedPlan preparation). Check them with the logical
    # variant of the same hazard — pre-planner, the only exchanges that
    # exist in EITHER representation are explicit Repartition nodes, so
    # "no Repartition below" is the same signal the physical check reads.
    bad.extend(_logical_subquery_agg_hazards(df._jdf.queryExecution().optimizedPlan()))
    return bad


def _logical_subquery_agg_hazards(plan) -> list[str]:
    """Near-unique-keyed Aggregate/Deduplicate nodes inside SUBQUERY plans
    that reach a corpus scan with no explicit Repartition below — the
    logical-plan twin of ``partial_agg_hazards``'s physical check, applied
    to the plans ``children()`` walks can't see (review finding r10)."""
    bad: list[str] = []

    def check(n, in_subquery: bool) -> None:
        cls = n.getClass().getSimpleName()
        if in_subquery and cls in ("Aggregate", "Deduplicate"):
            try:
                ge = n.groupingExpressions() if cls == "Aggregate" else n.keys()
                keys = [ge.apply(i).toString() for i in range(ge.size())]
            except Exception:
                keys = []
            hits = _near_unique_hits(keys)
            # a lower Aggregate/Deduplicate owns its own hazard; explicit
            # Repartition nodes are the only pre-planner exchanges
            if hits and any(
                _corpus_scans(c, _stop_logical_repart_or_agg) for c in _kids(n)
            ):
                bad.append(
                    f"{cls} (inside a subquery plan) groups on near-unique "
                    f"key(s) {','.join(hits)} over a corpus scan with no "
                    f"Repartition below: keys={[k[:40] for k in keys]}"
                )
        for c in _kids(n):
            check(c, in_subquery)
        for sub in _subquery_plans(n):
            check(sub, True)

    check(plan, False)
    return bad


def hinted_aggregate_warnings(df: DataFrame) -> list[str]:
    """WARN-level companion to ``forced_broadcast_violations`` (ADVICE r9):
    that lint treats any Aggregate as reducing, so a broadcast hint over an
    aggregate GROUPED ON A NEAR-UNIQUE CORPUS KEY (exactly the q21 hazard
    class — such an "aggregate" scales with the corpus) is lint-clean yet
    scale-fatal. This walk flags broadcast-hinted join sides containing
    such an Aggregate that itself reaches a corpus scan. Warn, not fatal:
    a near-unique-keyed aggregate under a SIZE-GATED hint is legitimate
    while the gate holds — consumers surface these for adjudication
    (scale_audit emits them as ``broadcast_agg_warn``)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    warns: list[str] = []

    def scaling_aggs(n) -> list[str]:
        """Walk STOPS at the first reducing node on each path — the
        OUTERMOST reducer determines the hinted relation's size, so an
        inner near-unique aggregate under a vocab-keyed outer aggregate
        or a Limit is provably bounded and must not warn (it would force
        a bogus whitelist entry for a relation that cannot scale).
        Deduplicate is checked like Aggregate: dedup on a near-unique
        corpus key scales too (the pagerank class)."""
        cls = n.getClass().getSimpleName()
        if cls in ("GlobalLimit", "LocalLimit"):
            return []  # bounded — stop
        if cls in ("Aggregate", "Deduplicate"):
            try:
                ge = n.groupingExpressions() if cls == "Aggregate" else n.keys()
                keys = [ge.apply(i).toString() for i in range(ge.size())]
            except Exception:
                keys = []
            hits = _near_unique_hits(keys)
            if hits and any(_corpus_scans(c, _stop_never) for c in _kids(n)):
                return [f"{cls} grouped on near-unique {','.join(hits)}"]
            return []  # reducing node on safe keys bounds the subtree — stop
        found: list[str] = []
        for c in _kids(n):
            found.extend(scaling_aggs(c))
        return found

    def visit(n) -> None:
        name = n.getClass().getSimpleName()
        cs = _kids(n)
        if name == "Join":
            h = n.hint()
            for opt, side in ((h.leftHint(), 0), (h.rightHint(), 1)):
                if _is_broadcast_hint(opt):
                    for a in scaling_aggs(cs[side]):
                        warns.append(f"broadcast-hint over {a}")
        elif name == "ResolvedHint":
            # defensive parity with forced_broadcast_violations: a hint the
            # optimizer has not (yet) folded into a Join
            try:
                st = n.hints().strategy()
                hinted = st.isDefined() and "broadcast" in st.get().toString().lower()
            except Exception:
                hinted = False
            if hinted:
                for a in scaling_aggs(cs[0]):
                    warns.append(f"broadcast-hint over {a}")
        for c in cs:
            visit(c)
        for sub in _subquery_plans(n):
            visit(sub)

    visit(plan)
    return warns


def _subquery_plans(n) -> list:
    """Child plans hiding inside subquery EXPRESSIONS (scalar subquery /
    IN / EXISTS) — ``children()`` does not descend into them, so a lint
    that only walks children misses hints planted there (ADVICE r9).
    Catalyst's ``QueryPlan.subqueries`` returns exactly these plans."""
    try:
        s = n.subqueries()
        return [s.apply(i) for i in range(s.size())]
    except Exception:
        return []


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
