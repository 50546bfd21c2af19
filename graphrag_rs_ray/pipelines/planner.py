"""Query-plan optimization over KG statistics
(``query/optimizer.rs``): the statistics half is a distributed
aggregation over the entity / triple tables; the planner itself is a
pure kernel over plan trees (bytes of state — driver-side by design,
like the reference's in-process optimizer).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.query_optimizer import (
    GraphStats,
    estimate_cost,
    optimize,
    plan_string,
)
from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate


def entity_type_counts(ents_ds, num_buckets: int = 16):
    """(type, cnt) — the ``entities_by_type`` histogram
    (``optimizer.rs:104-112``), hash-bucketed (type cardinality is tiny,
    but the input isn't)."""
    return hash_grouped_aggregate(
        ents_ds.map_batches(
            lambda t: pa.table({"type": t.column("type")}),
            batch_format="pyarrow"),
        ["type"],
        grouped_arrow_agg(["type"], [("type", "count")],
                          rename=["type", "cnt"]),
        num_buckets=num_buckets)


def rel_type_counts(triples_ds, num_buckets: int = 16):
    """(pred, cnt) — ``relationships_by_type`` (``optimizer.rs:116-121``;
    only the total feeds the cost model, the histogram is part of the
    statistics artifact)."""
    return hash_grouped_aggregate(
        triples_ds.map_batches(
            lambda t: pa.table({"pred": t.column("pred")}),
            batch_format="pyarrow"),
        ["pred"],
        grouped_arrow_agg(["pred"], [("pred", "count")],
                          rename=["pred", "cnt"]),
        num_buckets=num_buckets)


def stats_from_counts(etype_rows: list[tuple[str, int]],
                      rtype_rows: list[tuple[str, int]]) -> GraphStats:
    """GraphStatistics from the two histograms (totals = sums: every
    entity/relationship carries a type, ``optimizer.rs:100-137``)."""
    ebt = dict(etype_rows)
    rbt = dict(rtype_rows)
    return GraphStats(total_entities=sum(ebt.values()),
                      entities_by_type=ebt,
                      total_relationships=sum(rbt.values()),
                      relationships_by_type=rbt)


def optimize_workload(specs: list[tuple[str, object]],
                      stats: GraphStats) -> pa.Table:
    """Run rewrite → join-order → cost estimation over a workload of
    plan trees; one row per query: (query_id, plan, cost, cardinality,
    selectivity), cost/selectivity rounded to 8 (f64 arithmetic mirrored
    by the oracle)."""
    qids, plans, costs, cards, sels = [], [], [], [], []
    for qid, tree in specs:
        opt = optimize(tree, stats)
        card, cost, sel = estimate_cost(opt, stats)
        qids.append(qid)
        plans.append(plan_string(opt))
        costs.append(round(cost, 8))
        cards.append(card)
        sels.append(round(sel, 8))
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "plan": pa.array(plans, pa.string()),
        "cost": pa.array(costs, pa.float64()),
        "cardinality": pa.array(cards, pa.int64()),
        "selectivity": pa.array(sels, pa.float64())})
