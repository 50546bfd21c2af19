"""ROGRAG quality-metrics kernels (pure Python, no Ray).

Port of the reference's quality tracking/analysis stack
(``rograg/quality_metrics.rs:60-1337``): per-response quality scoring
(accuracy / completeness / coherence / relevance / source credibility →
weighted overall), retrieval-strategy classification, threshold alerts,
performance aggregates, and the comparative analysis (aggregated means,
improvement percentages, the reference's heuristic significance test).

The engine-side reframing is BATCH scoring over a response-log table —
the mutable collector (`record_query` + ring-buffer history) becomes
per-row scoring plus corpus-level aggregation, which yields identical
numbers: the reference's running averages equal plain means over the
history, and its fallback rate is recomputed over the full history each
update (quality_metrics.rs:1131-1158).

f64 throughout (reference mixes f32/f64; parity is Ray↔DuckDB).
"""

from __future__ import annotations

import math
import re

TRANSITION_WORDS = ["however", "therefore", "furthermore", "additionally",
                    "meanwhile", "consequently", "moreover", "nevertheless",
                    "thus", "hence"]

# AlertThresholds defaults (quality_metrics.rs:480-505)
MIN_QUALITY_SCORE = 0.6
MAX_PROCESSING_TIME_MS = 10000

_SENT_SPLIT = re.compile(r"[.!?]")


def source_credibility(sources: list[str]) -> float:
    """quality_metrics.rs:1088-1103 — count/5 capped + first-5-CHAR
    prefix diversity, averaged; 0.0 with no sources."""
    if not sources:
        return 0.0
    count_score = min(len(sources) / 5.0, 1.0)
    prefixes = {s[:5] for s in sources}
    diversity = len(prefixes) / len(sources)
    return (count_score + diversity) / 2.0


def completeness_score(content: str, n_sources: int,
                       n_subquery_results: int) -> float:
    """quality_metrics.rs:1020-1031 — content length is BYTES
    (``String::len``), normalized to 500/3/5."""
    length_score = min(len(content.encode("utf-8")) / 500.0, 1.0)
    source_score = min(n_sources / 3.0, 1.0)
    coverage_score = min(n_subquery_results / 5.0, 1.0)
    return (length_score + source_score + coverage_score) / 3.0


def coherence_score(content: str) -> float:
    """quality_metrics.rs:1034-1063 — sentence split keeps empties
    (trailing '.' yields an empty final sentence, faithfully);
    transition fraction + unique/total word ratio, averaged."""
    sentences = _SENT_SPLIT.split(content)
    if len(sentences) <= 1:
        return 1.0
    tc = sum(1 for s in sentences
             if any(t in s.lower() for t in TRANSITION_WORDS))
    transition = min(tc / len(sentences), 1.0)
    words = content.split()
    repetition = len(set(words)) / len(words) if words else 1.0
    return (transition + repetition) / 2.0


def relevance_score(query: str, content: str) -> float:
    """quality_metrics.rs:1066-1086 — query words > 3 BYTES vs answer
    word set; empty query-word set → 1.0."""
    qwords = {w for w in query.lower().split()
              if len(w.encode("utf-8")) > 3}
    if not qwords:
        return 1.0
    awords = set(content.lower().split())
    return len(qwords & awords) / len(qwords)


def response_quality(query: str, content: str, sources: list[str],
                     n_subquery_results: int, confidence: float) -> dict:
    """quality_metrics.rs:986-1018 — the five components and the
    weighted overall (capped at 1.0)."""
    cred = source_credibility(sources)
    acc = (confidence + cred) / 2.0
    comp = completeness_score(content, len(sources), n_subquery_results)
    coh = coherence_score(content)
    rel = relevance_score(query, content)
    overall = min(acc * 0.3 + comp * 0.25 + coh * 0.2 + rel * 0.15
                  + cred * 0.1, 1.0)
    return {"accuracy_score": round(acc, 8),
            "completeness_score": round(comp, 8),
            "coherence_score": round(coh, 8),
            "relevance_score": round(rel, 8),
            "source_credibility": round(cred, 8),
            "overall_quality": round(overall, 8)}


def retrieval_strategy(n_logic: int, n_fuzzy: int, n_fallback: int) -> str:
    """quality_metrics.rs:1106-1128."""
    if n_fallback > 0:
        return "Fallback"
    if n_logic > 0 and n_fuzzy > 0:
        return "Hybrid"
    if n_logic > 0:
        return "LogicForm"
    return "FuzzyMatch"


def quality_alerts(overall_quality: float,
                   processing_time_ms: int) -> list[str]:
    """quality_metrics.rs:1191-1222 — threshold checks (default
    thresholds; the one-hour retention is a collector concern)."""
    alerts = []
    if overall_quality < MIN_QUALITY_SCORE:
        alerts.append("QualityDegradation")
    if processing_time_ms > MAX_PROCESSING_TIME_MS:
        alerts.append("PerformanceDegradation")
    return alerts


def aggregated_metrics(rows: list[dict]) -> dict:
    """quality_metrics.rs:1266-1300 — component means, success rate,
    POPULATION std-dev of overall quality."""
    n = len(rows)
    if n == 0:
        raise ValueError("No metrics provided")
    mean = lambda k: sum(r[k] for r in rows) / n   # noqa: E731
    mq = mean("overall_quality")
    var = sum((r["overall_quality"] - mq) ** 2 for r in rows) / n
    return {
        "mean_accuracy": mean("accuracy_score"),
        "mean_completeness": mean("completeness_score"),
        "mean_coherence": mean("coherence_score"),
        "mean_relevance": mean("relevance_score"),
        "mean_processing_time_ms": mean("processing_time_ms"),
        "success_rate": sum(1 for r in rows
                            if r["decomposition_success"]) / n,
        "std_dev_quality": math.sqrt(var),
    }


def improvement_percentage(rograg_value: float, baseline: float) -> float:
    """quality_metrics.rs:1302-1308."""
    if baseline == 0.0:
        return 100.0 if rograg_value > 0.0 else 0.0
    return (rograg_value - baseline) / baseline * 100.0


def statistical_significance(rograg: dict, baseline: dict) -> dict:
    """quality_metrics.rs:1310-1337 — the reference's heuristic test,
    faithfully (fixed p-value buckets)."""
    effect = ((rograg["mean_accuracy"] - baseline["mean_accuracy"])
              / ((rograg["std_dev_quality"] + baseline["std_dev_quality"])
                 / 2.0))
    p_acc = 0.01 if abs(effect) > 0.5 else 0.1
    p_comp = (0.05 if rograg["mean_completeness"]
              > baseline["mean_completeness"] else 0.1)
    p_coh = (0.05 if rograg["mean_coherence"]
             > baseline["mean_coherence"] else 0.1)
    p_overall = (p_acc + p_comp + p_coh) / 3.0
    return {"p_value_accuracy": p_acc, "p_value_completeness": p_comp,
            "p_value_coherence": p_coh, "p_value_overall": p_overall,
            "is_significant_95": p_overall < 0.05,
            "effect_size": effect}


def throughput_qps(timestamps: list[int]) -> float:
    """quality_metrics.rs:1161-1177 — last 10 history entries; span
    between newest and oldest of that window."""
    if len(timestamps) < 2:
        return 0.0
    recent = list(reversed(timestamps))[:10]
    span = recent[0] - recent[-1]
    if span > 0:
        return len(recent) / span
    return 0.0
