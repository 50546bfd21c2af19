"""Benchmark harness vs ``monitoring/benchmark.rs`` tests + quirks."""

import math

from graphrag_rs_ray.functions.benchmark import (
    BenchmarkConfig,
    BenchmarkRunner,
    calculate_f1_score,
)


def test_f1_score_calculation():
    # benchmark.rs:517-532
    assert abs(calculate_f1_score("hello world", "hello world")
               - 1.0) < 0.001
    partial = calculate_f1_score("hello world", "hello there")
    assert 0.0 < partial < 1.0
    assert calculate_f1_score("foo bar", "baz qux") == 0.0


def test_f1_duplicate_counting_quirk():
    # generated duplicates all count toward common
    f1 = calculate_f1_score("a a a", "a b")
    # common=3, precision=1.0, recall=3/2 → f1 = 2·1.5/2.5 = 1.2 (!)
    assert math.isclose(f1, 1.2)


def test_benchmark_summary():
    # :536-555
    runner = BenchmarkRunner()
    summary = runner.run_dataset({
        "name": "Test",
        "queries": [{"question": "What is 2+2?", "answer": "4"}]})
    assert summary["total_queries"] == 1
    assert summary["avg_latency_ms"] >= 0.0
    assert summary["total_input_tokens"] == 2000    # non-LightRAG
    assert summary["query_results"][0]["generated_answer"] == \
        "Generated answer for: What is 2+2?"


def test_lightrag_token_estimate_and_features():
    cfg = BenchmarkConfig(enable_lightrag=True, enable_leiden=True)
    runner = BenchmarkRunner(cfg)
    s = runner.run_dataset({"name": "t", "queries": [
        {"question": "q", "answer": "a"}]})
    assert s["total_input_tokens"] == 200
    assert s["features"] == ["LightRAG", "Leiden"]
    assert math.isclose(
        s["total_cost_usd"],
        200 / 1000 * 0.0001 + 100 / 1000 * 0.0003)


def test_compare_summaries():
    base = BenchmarkRunner().run_dataset({
        "name": "base", "queries": [{"question": "q", "answer": "a"}]})
    improved = BenchmarkRunner(BenchmarkConfig(
        enable_lightrag=True)).run_dataset({
            "name": "new", "queries": [{"question": "q",
                                        "answer": "a"}]})
    cmp = BenchmarkRunner().compare_summaries(base, improved)
    assert math.isclose(cmp["token_reduction_pct"],
                        (2000 - 200) / 2000 * 100)
    assert cmp["cost_savings_pct"] > 0


def test_custom_engine_quality():
    runner = BenchmarkRunner(engine=lambda q, c: {
        "answer": "4", "retrieval_ms": 5, "generation_ms": 7})
    s = runner.run_dataset({"name": "t", "queries": [
        {"question": "What is 2+2?", "answer": "4"}]})
    assert s["avg_exact_match"] == 1.0
    assert s["avg_latency_ms"] == 12.0
    assert s["avg_retrieval_ms"] == 5.0


def test_empty_dataset():
    s = BenchmarkRunner().run_dataset({"name": "e", "queries": []})
    assert s["total_queries"] == 0 and s["features"] == []
