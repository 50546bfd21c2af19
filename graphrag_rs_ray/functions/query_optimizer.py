"""Rule-based query optimizer — port of
``graphrag-core/src/query/optimizer.rs`` (cost estimation, selectivity,
join reordering, greedy multi-way join ordering, plan explain).

QueryOp trees are plain tuples:

    ("scan", entity_type)
    ("filter", property, value)
    ("join", left, right, jtype)     # jtype ∈ {"inner","leftouter","cross"}
    ("neighbors", source, rel_type_or_None, max_hops)
    ("union", left, right)
    ("limit", source, count)

Cost-model semantics pinned (all re-derived by the DuckDB oracle):

- scan: cardinality = per-type entity count; cost = card; selectivity =
  card / total_entities (``optimizer.rs:372-392``).
- filter: flat 10% selectivity, cardinality = trunc(total · 0.1), cost =
  total (must scan; ``:394-404``).
- join: inner card = trunc(sqrt(l·r)) (f64 → usize TRUNCATES), leftouter
  = l, cross = l·r; cost = cost_l + cost_r + l·r; sel = sel_l · sel_r
  (``:406-437``).
- neighbors: expansion = avg_degree^hops (powi = repeated multiply),
  card = trunc(min(src_card · expansion, total)), cost = src_cost +
  card, sel = card / total (``:439-459``).
- union: card = (l + r) · 9 / 10 in INTEGER arithmetic (Rust usize —
  multiply THEN floor-divide), cost = cost_l + cost_r, sel =
  min(sel_l + sel_r, 1) (``:461-473``).
- limit: card = min(count, src_card), cost = src_cost, sel =
  min(count / total, 1) (``:475-484``).
- rewrite (``:159-193``): binary joins put the SMALLER-cardinality
  operand first (strict >, children rewritten first).
- optimize_joins (``:232-278,309-368``): joins are flattened into their
  leaf operands (left subtree first); with > 2 operands a greedy loop
  repeatedly joins the pair with the strictly-minimum cardinality
  PRODUCT (ties keep the first (i, j) in enumeration order), pushing
  the joined node to the END of the operand list.  The greedy join does
  NOT re-apply the smaller-first swap.
- average_degree = total_relationships · 2 / total_entities
  (``:123-127``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class GraphStats:
    """``optimizer.rs:85-137`` GraphStatistics."""

    total_entities: int = 0
    entities_by_type: dict[str, int] = field(default_factory=dict)
    total_relationships: int = 0
    relationships_by_type: dict[str, int] = field(default_factory=dict)

    @property
    def average_degree(self) -> float:
        if self.total_entities > 0:
            return (self.total_relationships * 2.0) / self.total_entities
        return 0.0


def estimate_cost(op, stats: GraphStats) -> tuple[int, float, float]:
    """→ (cardinality, cost, selectivity), ``optimizer.rs:370-484``."""
    kind = op[0]
    total = stats.total_entities
    if kind == "scan":
        card = stats.entities_by_type.get(op[1], 0)
        sel = card / total if total > 0 else 0.0
        return card, float(card), sel
    if kind == "filter":
        sel = 0.1
        return int(total * sel), float(total), sel
    if kind == "join":
        lc, lcost, lsel = estimate_cost(op[1], stats)
        rc, rcost, rsel = estimate_cost(op[2], stats)
        if op[3] == "inner":
            card = int(math.sqrt(float(lc) * float(rc)))
        elif op[3] == "leftouter":
            card = lc
        else:                                    # cross
            card = lc * rc
        cost = lcost + rcost + (float(lc) * float(rc))
        return card, cost, lsel * rsel
    if kind == "neighbors":
        sc, scost, _ = estimate_cost(op[1], stats)
        exp = 1.0
        for _ in range(op[3]):                   # powi: repeated multiply
            exp *= stats.average_degree
        card = int(min(float(sc) * exp, float(total)))
        return card, scost + float(card), card / total if total else 0.0
    if kind == "union":
        lc, lcost, lsel = estimate_cost(op[1], stats)
        rc, rcost, rsel = estimate_cost(op[2], stats)
        card = (lc + rc) * 9 // 10               # usize arithmetic
        return card, lcost + rcost, min(lsel + rsel, 1.0)
    if kind == "limit":
        sc, scost, _ = estimate_cost(op[1], stats)
        return min(op[2], sc), scost, min(op[2] / total, 1.0) if total \
            else 0.0
    raise ValueError(f"unknown op {kind}")


def rewrite_query(op, stats: GraphStats):
    """Smaller-cardinality operand first in binary joins
    (``optimizer.rs:159-193``, strict >)."""
    kind = op[0]
    if kind == "join":
        left = rewrite_query(op[1], stats)
        right = rewrite_query(op[2], stats)
        lc, _, _ = estimate_cost(left, stats)
        rc, _, _ = estimate_cost(right, stats)
        if lc > rc:
            left, right = right, left
        return ("join", left, right, op[3])
    if kind == "neighbors":
        return ("neighbors", rewrite_query(op[1], stats), op[2], op[3])
    if kind == "union":
        return ("union", rewrite_query(op[1], stats),
                rewrite_query(op[2], stats))
    if kind == "limit":
        return ("limit", rewrite_query(op[1], stats), op[2])
    return op


def _collect_join_operands(op, out: list):
    if op[0] == "join":
        _collect_join_operands(op[1], out)
        _collect_join_operands(op[2], out)
    else:
        out.append(op)


def optimize_joins(op, stats: GraphStats):
    """Greedy multi-way join ordering (``optimizer.rs:232-368``)."""
    kind = op[0]
    if kind == "join":
        left = optimize_joins(op[1], stats)
        right = optimize_joins(op[2], stats)
        operands: list = []
        _collect_join_operands(left, operands)
        _collect_join_operands(right, operands)
        if len(operands) > 2:
            while len(operands) > 1:
                best, bi, bj = math.inf, 0, 1
                for i in range(len(operands)):
                    for j in range(i + 1, len(operands)):
                        ci, _, _ = estimate_cost(operands[i], stats)
                        cj, _, _ = estimate_cost(operands[j], stats)
                        jc = float(ci) * float(cj)
                        if jc < best:
                            best, bi, bj = jc, i, j
                lhs = operands.pop(bi)
                rhs = operands.pop(bj - 1 if bj > bi else bj)
                operands.append(("join", lhs, rhs, op[3]))
            return operands.pop()
        return ("join", left, right, op[3])
    if kind == "neighbors":
        return ("neighbors", optimize_joins(op[1], stats), op[2], op[3])
    if kind == "union":
        return ("union", optimize_joins(op[1], stats),
                optimize_joins(op[2], stats))
    if kind == "limit":
        return ("limit", optimize_joins(op[1], stats), op[2])
    return op


def optimize(op, stats: GraphStats):
    """``optimizer.rs:150-157``: rewrite, then join-order."""
    return optimize_joins(rewrite_query(op, stats), stats)


def plan_string(op) -> str:
    """Compact prefix serialization of a plan tree (the reference's
    ``explain`` emits the same structure with per-node cost annotations,
    ``optimizer.rs:487-566``; the numeric annotations are returned as
    separate columns instead — hash-stable)."""
    kind = op[0]
    if kind == "scan":
        return f"EntityScan({op[1]})"
    if kind == "filter":
        return f"Filter({op[1]}={op[2]})"
    if kind == "join":
        jt = {"inner": "Inner", "leftouter": "LeftOuter",
              "cross": "Cross"}[op[3]]
        return f"Join[{jt}]({plan_string(op[1])},{plan_string(op[2])})"
    if kind == "neighbors":
        rel = op[2] if op[2] is not None else "*"
        return f"Neighbors({rel},hops={op[3]})({plan_string(op[1])})"
    if kind == "union":
        return f"Union({plan_string(op[1])},{plan_string(op[2])})"
    if kind == "limit":
        return f"Limit({op[2]})({plan_string(op[1])})"
    raise ValueError(kind)


def explain(op, stats: GraphStats) -> str:
    """Human-readable plan with per-node annotations
    (``optimizer.rs:487-566``)."""
    lines: list[str] = []

    def rec(node, depth):
        card, cost, _ = estimate_cost(node, stats)
        pad = "  " * depth
        kind = node[0]
        if kind == "scan":
            lines.append(f"{pad}EntityScan({node[1]}) "
                         f"[cost={cost:.0f}, rows={card}]")
        elif kind == "filter":
            lines.append(f"{pad}Filter({node[1]}={node[2]}) "
                         f"[cost={cost:.0f}, rows={card}]")
        elif kind == "join":
            lines.append(f"{pad}Join({node[3]}) "
                         f"[cost={cost:.0f}, rows={card}]")
            rec(node[1], depth + 1)
            rec(node[2], depth + 1)
        elif kind == "neighbors":
            rel = node[2] if node[2] is not None else "*"
            lines.append(f"{pad}Neighbors({rel}, hops={node[3]}) "
                         f"[cost={cost:.0f}, rows={card}]")
            rec(node[1], depth + 1)
        elif kind == "union":
            lines.append(f"{pad}Union [cost={cost:.0f}, rows={card}]")
            rec(node[1], depth + 1)
            rec(node[2], depth + 1)
        elif kind == "limit":
            lines.append(f"{pad}Limit({node[2]}) "
                         f"[cost={cost:.0f}, rows={card}]")
            rec(node[1], depth + 1)

    rec(op, 0)
    card, cost, sel = estimate_cost(op, stats)
    lines.append(f"Estimated Cost: {cost:.2f}")
    lines.append(f"Estimated Cardinality: {card}")
    lines.append(f"Selectivity: {sel * 100.0:.2f}%")
    return "\n".join(lines)
