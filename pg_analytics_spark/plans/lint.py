"""Registry-wide physical-plan linter (r12 verdict "Next round" #2).

The r11 eval-row scale-killer (a corpus-wide global sort with 4-task
parallelism inside ``sim_eval_mrr``) lived invisibly for three rounds
because only wall clocks were watched — the WALLS were fine at sf0.1;
the PLAN was wrong at any scale.  This module encodes the judge's
manual plan audit as machine checks so the next one fails at
introduction time: every registry row's ``executedPlan`` is walked
node-by-node (py4j, piercing AdaptiveSparkPlanExec wrappers and plan
subqueries) and violations are returned as structured strings.

Rules (each with a per-row whitelist in tests/test_plan_lint.py):

- ``cartesian``   — a ``CartesianProductExec`` anywhere.  An O(n·m)
  join with no key is never the plan you want at 100 TB; a small-side
  cross join must broadcast (BroadcastNestedLoopJoin is allowed —
  Catalyst only picks it when one side fits the broadcast threshold
  or the join is genuinely keyless AND one side is small).
- ``global-window`` — a ``WindowExec`` (or ``WindowInPandasExec``)
  whose partitionSpec is EMPTY and whose plan has no
  ``WindowGroupLimitExec`` below it.  An empty partition spec means
  ONE partition: Spark plans a single-partition global sort and one
  task consumes the whole input — exactly the r11 killer shape.  A
  WindowGroupLimit rescues it (rank-limited top-k runs partially,
  map-side, below the exchange); otherwise the row must be rewritten
  (max_by / packed-ordering aggregate) or whitelisted with a reason
  (provably tiny input, e.g. an already-aggregated frame).
- ``sort-into-hash-agg`` — a ``SortExec`` feeding a hash aggregate
  directly.  Hash aggregation is order-insensitive; the sort is pure
  wasted work (a sort the OPTIMIZER needs — SortAggregate, SMJ,
  window — hangs under those nodes, not under HashAggregate).
- ``rowwise-python-udf`` — a ``BatchEvalPythonExec`` (row-at-a-time
  Python UDF, pickled per row).  The hot paths are built-in
  expressions or Arrow-batched pandas UDFs (``ArrowEvalPythonExec``,
  ``MapInPandasExec``, …); a per-row UDF is a 10-100× tax that only
  shows up in walls at real scale.
- ``hof-conjunct-order`` — a Filter or join condition where a cheap
  (HOF-free) conjunct evaluates AFTER a higher-order-function
  conjunct.  Codegen evaluates AND chains left-to-right with
  short-circuit and Catalyst NEVER cost-reorders conjuncts, so the
  interpreted per-row HOF fold (aggregate/zip_with/transform — no
  codegen, ~100× a comparison) runs on every row the cheap conjunct
  could have killed first.  This is the r13 split_leakage failure
  class: the output-filtered form merged the md5 crossing predicate
  AFTER the cosine fold and cost 141.6 s at 10× where the reordered
  form costs 10.9 s (SCALE.md §Round-13 second wave) — a cost-based
  SQL engine reorders this automatically; on Spark the ORDER in the
  condition is programmer-controlled, so the linter enforces it.

The companion source lint (no new ``.collect()`` outside the
sanctioned bounded fixture round-trip) lives in the test module —
it's a grep over the workload sources, not a plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: plan node classes that rescue an empty-partition window: a
#: WindowGroupLimit runs partial per-partition top-k below the
#: exchange; an empty-partition rank-limit can instead plan outright
#: as TakeOrderedAndProject (partial top-k per map task) — both mean
#: no task ever consumes the whole input
_GROUP_LIMITS = ("WindowGroupLimitExec", "TakeOrderedAndProjectExec")

_WINDOW_NODES = ("WindowExec", "WindowInPandasExec")

_HASH_AGGS = ("HashAggregateExec", "ObjectHashAggregateExec")


def _unwrap(node):
    """Pierce AQE / reused-exchange wrappers to the real subtree."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        try:
            return _unwrap(node.executedPlan())
        except Exception:
            return _unwrap(node.initialPlan())
    if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        try:
            return _unwrap(node.child())
        except Exception:
            return node
    return node


def _children(node):
    out = []
    ch = node.children()
    for i in range(ch.size()):
        out.append(_unwrap(ch.apply(i)))
    # plan-embedded subqueries (scalar/IN) run as separate subtrees
    try:
        sq = node.subqueries()
        for i in range(sq.size()):
            out.append(_unwrap(sq.apply(i)))
    except Exception:
        pass
    return out


def iter_plan_nodes(df: DataFrame):
    """Yield (node, simple_class_name, parent_simple_class_name) over
    the physical plan, depth-first, AQE-unwrapped."""
    root = _unwrap(df._jdf.queryExecution().executedPlan())
    stack = [(root, None)]
    while stack:
        node, parent_name = stack.pop()
        name = node.getClass().getSimpleName()
        yield node, name, parent_name
        for c in _children(node):
            stack.append((c, name))


#: substrings that mark an interpreted higher-order-function fold in
#: an expression's toString — the per-row costs codegen can't help
_HOF_MARKS = ("aggregate(", "zip_with(", "reduce(", "array_sort(")


def _flatten_and(expr) -> list:
    """Top-level And conjuncts in EVALUATION order (left-deep,
    left-first — the order generated code short-circuits in)."""
    if expr.getClass().getSimpleName() == "And":
        return _flatten_and(expr.left()) + _flatten_and(expr.right())
    return [expr]


def _conjunct_order_violation(cond) -> str | None:
    """None, or a description of a cheap conjunct trapped behind a
    HOF conjunct in ``cond``'s evaluation order."""
    conjs = _flatten_and(cond)
    if len(conjs) < 2:
        return None
    seen_hof = False
    for c in conjs:
        s = c.toString()
        is_hof = any(m in s for m in _HOF_MARKS)
        if is_hof:
            seen_hof = True
        elif seen_hof:
            return (
                "hof-conjunct-order: cheap conjunct "
                f"'{s[:80]}' evaluates after a HOF conjunct "
                "(reorder the filters so the comparison "
                "short-circuits the interpreted fold)"
            )
    return None


def _node_conditions(node, name: str) -> list:
    """The boolean conditions ``node`` evaluates per row, if any."""
    if name == "FilterExec":
        return [node.condition()]
    if "Join" in name:
        try:
            opt = node.condition()
            if opt.isDefined():
                return [opt.get()]
        except Exception:
            pass
    return []


def lint_plan(df: DataFrame) -> list[str]:
    """Violation strings for the rules above (empty list = clean)."""
    nodes = list(iter_plan_nodes(df))
    names = [n for _, n, _ in nodes]
    has_group_limit = any(n in _GROUP_LIMITS for n in names)
    out: list[str] = []
    for node, name, parent in nodes:
        if name == "CartesianProductExec":
            out.append("cartesian: CartesianProductExec in plan")
        elif name in _WINDOW_NODES and not has_group_limit:
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:
                empty = False
            if empty:
                out.append(
                    "global-window: empty partitionSpec Window with "
                    "no WindowGroupLimit (single-partition global "
                    "sort — the r11 killer shape)"
                )
        elif name == "SortExec" and parent in _HASH_AGGS:
            out.append(
                "sort-into-hash-agg: SortExec feeding "
                f"{parent} (hash agg is order-insensitive; "
                "the sort is wasted work)"
            )
        elif name == "BatchEvalPythonExec":
            out.append(
                "rowwise-python-udf: BatchEvalPythonExec (per-row "
                "pickled UDF — use built-ins or a pandas UDF)"
            )
        for cond in _node_conditions(node, name):
            try:
                v = _conjunct_order_violation(cond)
            except Exception:
                v = None
            if v is not None:
                out.append(v)
    return out
