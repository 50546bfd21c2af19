"""Query optimizer kernels (``query/optimizer.rs``) — the reference's
own test cases (``optimizer.rs:571-679``) plus greedy multi-way and
usize-truncation gates."""

from graphrag_rs_ray.functions.query_optimizer import (
    GraphStats,
    estimate_cost,
    explain,
    optimize,
    optimize_joins,
    plan_string,
    rewrite_query,
)


def _stats() -> GraphStats:
    # optimizer.rs:574-593 create_test_stats
    return GraphStats(
        total_entities=180,
        entities_by_type={"PERSON": 100, "ORGANIZATION": 50,
                          "LOCATION": 30},
        total_relationships=140,
        relationships_by_type={"WORKS_FOR": 80, "LOCATED_IN": 60})


def test_cost_estimation_scan():
    # optimizer.rs:595-608
    card, cost, sel = estimate_cost(("scan", "PERSON"), _stats())
    assert card == 100 and cost == 100.0
    assert sel == 100 / 180
    # unknown type scans to zero
    assert estimate_cost(("scan", "NOPE"), _stats())[0] == 0


def test_cost_estimation_join_geometric_mean():
    # optimizer.rs:610-629: sqrt(100·50) ≈ 71
    q = ("join", ("scan", "PERSON"), ("scan", "ORGANIZATION"), "inner")
    card, cost, sel = estimate_cost(q, _stats())
    assert 60 < card < 80
    assert card == int((100 * 50) ** 0.5) == 70
    assert cost == 100.0 + 50.0 + 100.0 * 50.0
    assert sel == (100 / 180) * (50 / 180)


def test_join_reordering_smaller_first():
    # optimizer.rs:631-655
    q = ("join", ("scan", "PERSON"), ("scan", "LOCATION"), "inner")
    opt = optimize(q, _stats())
    assert opt[1] == ("scan", "LOCATION"), "smaller table first"
    # equal cardinalities → NO swap (strict >)
    same = ("join", ("scan", "PERSON"), ("scan", "PERSON"), "inner")
    assert rewrite_query(same, _stats())[1] == ("scan", "PERSON")


def test_neighbors_cost_expands():
    # optimizer.rs:657-671: avg_degree^2 expansion over 100 persons
    q = ("neighbors", ("scan", "PERSON"), "WORKS_FOR", 2)
    card, cost, _ = estimate_cost(q, _stats())
    assert card > 100
    deg = 140 * 2.0 / 180
    assert card == int(min(100.0 * (deg * deg), 180.0))
    assert cost == 100.0 + float(card)


def test_explain_plan():
    # optimizer.rs:673-679
    q = ("join", ("scan", "PERSON"), ("scan", "ORGANIZATION"), "inner")
    plan = explain(q, _stats())
    assert "Join" in plan and "EntityScan" in plan
    assert "Estimated Cost" in plan


def test_multiway_greedy_join_order():
    # 3 leaves: rewrite swaps (P,O)→(O,P) and hoists LOCATION before the
    # inner join (70 > 30), so the flattened operand list is [L, O, P];
    # greedy joins the minimum-product pair (L·O = 1500) IN LIST ORDER
    # and pushes the joined node to the END (optimizer.rs:358-364) —
    # the leftover PERSON leaf becomes the outer LEFT operand
    q = ("join",
         ("join", ("scan", "PERSON"), ("scan", "ORGANIZATION"), "inner"),
         ("scan", "LOCATION"), "inner")
    opt = optimize(q, _stats())
    assert plan_string(opt) == (
        "Join[Inner](EntityScan(PERSON),"
        "Join[Inner](EntityScan(LOCATION),EntityScan(ORGANIZATION)))")


def test_usize_truncation_and_union_int_arithmetic():
    st = _stats()
    # filter: trunc(180 · 0.1) = 18
    assert estimate_cost(("filter", "p", "v"), st)[0] == 18
    # union: (50 + 30) · 9 // 10 = 72 (integer arithmetic)
    card, cost, sel = estimate_cost(
        ("union", ("scan", "ORGANIZATION"), ("scan", "LOCATION")), st)
    assert card == 72 and cost == 80.0
    assert sel == min(50 / 180 + 30 / 180, 1.0)
    # limit clamps
    card, _, sel = estimate_cost(
        ("limit", ("scan", "LOCATION"), 10), st)
    assert card == 10 and sel == 10 / 180
    assert estimate_cost(("limit", ("scan", "LOCATION"), 999), st)[0] == 30
    # cross join multiplies
    assert estimate_cost(
        ("join", ("scan", "ORGANIZATION"), ("scan", "LOCATION"),
         "cross"), st)[0] == 1500
    # leftouter keeps the LEFT side's cardinality (after any swap)
    q = ("join", ("scan", "PERSON"), ("scan", "LOCATION"), "leftouter")
    assert estimate_cost(optimize(q, st), st)[0] == 30


def test_optimize_joins_preserves_binary():
    st = _stats()
    q = ("join", ("scan", "LOCATION"), ("scan", "PERSON"), "inner")
    assert optimize_joins(q, st) == q
