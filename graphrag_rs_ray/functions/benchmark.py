"""Query benchmarking harness — port of
``graphrag-core/src/monitoring/benchmark.rs`` (per-query latency /
token / quality metrics, dataset runner, summary aggregation and
comparison).

Semantics pinned:

- ``benchmark_query`` (``:242-334``): the reference's retrieval /
  reranking / generation calls are TODO stubs — the default engine
  reproduces them (generated answer = ``"Generated answer for: {q}"``,
  token estimates 200 with LightRAG vs 2000 without, 100 output) with
  a pluggable engine hook so the repo's real pipelines can drive it;
  cost = in/1000·price_in + out/1000·price_out; feature list built in
  the fixed flag order.
- ``calculate_f1_score`` (``:346-374``): lowercased whitespace tokens,
  ``common`` counts GENERATED duplicates (every gen token found in the
  truth list counts — quirk), precision/recall over raw lengths,
  f32 → f64 port.
- Exact match = case-insensitive trimmed equality.
- ``compute_summary`` (``:377-442``): avg_reranking divides by the
  TOTAL query count, not by the count of reranked queries (quirk);
  features copied from the FIRST result; bleu/rouge hardwired 0.0
  (reference TODOs).
- ``compare_summaries`` (``:474-516``): improvement percentages
  returned as a dict instead of printed.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class BenchmarkConfig:
    """``benchmark.rs:122-162`` defaults."""
    enable_lightrag: bool = False
    enable_leiden: bool = False
    enable_cross_encoder: bool = False
    enable_hipporag: bool = False
    enable_semantic_chunking: bool = False
    top_k: int = 10
    input_token_price: float = 0.0001
    output_token_price: float = 0.0003


def calculate_f1_score(generated: str, ground_truth: str) -> float:
    """``:346-374`` — gen duplicates count toward ``common``."""
    gen_tokens = generated.lower().split()
    gt_tokens = ground_truth.lower().split()
    if not gen_tokens or not gt_tokens:
        return 0.0
    common = sum(1 for t in gen_tokens if t in gt_tokens)
    if common == 0:
        return 0.0
    precision = common / len(gen_tokens)
    recall = common / len(gt_tokens)
    return 2.0 * (precision * recall) / (precision + recall)


def calculate_quality_metrics(generated: str, ground_truth: str) -> dict:
    exact = 1.0 if generated.strip().lower() == \
        ground_truth.strip().lower() else 0.0
    return {"exact_match": exact,
            "f1_score": calculate_f1_score(generated, ground_truth),
            "bleu_score": None, "rouge_l": None,
            "semantic_similarity": None}


def _default_engine(question: str, config: BenchmarkConfig) -> dict:
    """The reference's simulated path (TODO stubs, ``:246-270``)."""
    return {"answer": f"Generated answer for: {question}",
            "retrieval_ms": 0, "reranking_ms": 0, "generation_ms": 0}


class BenchmarkRunner:
    """``benchmark.rs:208-516``."""

    def __init__(self, config: BenchmarkConfig | None = None,
                 engine=None):
        self.config = config if config is not None else BenchmarkConfig()
        self._engine = engine if engine is not None else _default_engine

    def _features(self) -> list[str]:
        out = []
        if self.config.enable_lightrag:
            out.append("LightRAG")
        if self.config.enable_leiden:
            out.append("Leiden")
        if self.config.enable_cross_encoder:
            out.append("Cross-Encoder")
        if self.config.enable_hipporag:
            out.append("HippoRAG PPR")
        if self.config.enable_semantic_chunking:
            out.append("Semantic Chunking")
        return out

    def benchmark_query(self, query: dict) -> dict:
        run = self._engine(query["question"], self.config)
        input_tokens = 200 if self.config.enable_lightrag else 2000
        output_tokens = 100
        reranking_ms = (run.get("reranking_ms", 0)
                        if self.config.enable_cross_encoder else None)
        cost = (input_tokens / 1000.0 * self.config.input_token_price
                + output_tokens / 1000.0 * self.config.output_token_price)
        return {
            "query": query["question"],
            "ground_truth": query["answer"],
            "generated_answer": run["answer"],
            "latency": {
                "total_ms": (run.get("retrieval_ms", 0)
                             + (reranking_ms or 0)
                             + run.get("generation_ms", 0)),
                "retrieval_ms": run.get("retrieval_ms", 0),
                "reranking_ms": reranking_ms,
                "generation_ms": run.get("generation_ms", 0),
                "other_ms": 0},
            "tokens": {"input_tokens": input_tokens,
                       "output_tokens": output_tokens,
                       "total_tokens": input_tokens + output_tokens,
                       "estimated_cost_usd": cost},
            "quality": calculate_quality_metrics(run["answer"],
                                                 query["answer"]),
            "features_enabled": self._features(),
        }

    def run_dataset(self, dataset: dict) -> dict:
        results = [self.benchmark_query(q) for q in dataset["queries"]]
        return self.compute_summary(dataset["name"], results)

    def compute_summary(self, config_name: str,
                        results: list[dict]) -> dict:
        total = len(results)
        if total == 0:
            return {"config_name": config_name, "total_queries": 0,
                    "avg_latency_ms": 0.0, "avg_retrieval_ms": 0.0,
                    "avg_reranking_ms": 0.0, "avg_generation_ms": 0.0,
                    "total_input_tokens": 0, "total_output_tokens": 0,
                    "total_cost_usd": 0.0, "avg_tokens_per_query": 0.0,
                    "avg_exact_match": 0.0, "avg_f1_score": 0.0,
                    "avg_bleu_score": 0.0, "avg_rouge_l": 0.0,
                    "features": [], "query_results": []}
        lat = [r["latency"] for r in results]
        tin = sum(r["tokens"]["input_tokens"] for r in results)
        tout = sum(r["tokens"]["output_tokens"] for r in results)
        return {
            "config_name": config_name,
            "total_queries": total,
            "avg_latency_ms": sum(x["total_ms"] for x in lat) / total,
            "avg_retrieval_ms": sum(x["retrieval_ms"]
                                    for x in lat) / total,
            # quirk: divided by TOTAL, not by the reranked count
            "avg_reranking_ms": sum(x["reranking_ms"] or 0
                                    for x in lat
                                    if x["reranking_ms"] is not None
                                    ) / total,
            "avg_generation_ms": sum(x["generation_ms"]
                                     for x in lat) / total,
            "total_input_tokens": tin,
            "total_output_tokens": tout,
            "total_cost_usd": sum(r["tokens"]["estimated_cost_usd"]
                                  for r in results),
            "avg_tokens_per_query": (tin + tout) / total,
            "avg_exact_match": sum(r["quality"]["exact_match"]
                                   for r in results) / total,
            "avg_f1_score": sum(r["quality"]["f1_score"]
                                for r in results) / total,
            "avg_bleu_score": 0.0,
            "avg_rouge_l": 0.0,
            "features": list(results[0]["features_enabled"]),
            "query_results": results,
        }

    def compare_summaries(self, baseline: dict, improved: dict) -> dict:
        """``:474-516`` improvement percentages."""
        return {
            "em_improvement_pct": (
                (improved["avg_exact_match"] - baseline["avg_exact_match"])
                / baseline["avg_exact_match"] * 100.0
                if baseline["avg_exact_match"] else 0.0),
            "f1_improvement_pct": (
                (improved["avg_f1_score"] - baseline["avg_f1_score"])
                / baseline["avg_f1_score"] * 100.0
                if baseline["avg_f1_score"] else 0.0),
            "token_reduction_pct": (
                (baseline["total_input_tokens"]
                 - improved["total_input_tokens"])
                / baseline["total_input_tokens"] * 100.0
                if baseline["total_input_tokens"] else 0.0),
            "cost_savings_pct": (
                (baseline["total_cost_usd"] - improved["total_cost_usd"])
                / baseline["total_cost_usd"] * 100.0
                if baseline["total_cost_usd"] else 0.0),
            "latency_change_pct": (
                (improved["avg_latency_ms"] - baseline["avg_latency_ms"])
                / baseline["avg_latency_ms"] * 100.0
                if baseline["avg_latency_ms"] else 0.0),
        }


__all__ = ["BenchmarkConfig", "calculate_f1_score",
           "calculate_quality_metrics", "BenchmarkRunner"]
