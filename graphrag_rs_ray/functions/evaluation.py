"""LLM-based query-result evaluation (``evaluation/mod.rs``).

Ports the reference's evaluation framework: prompt generation over an
EvaluableQueryResult (``mod.rs:164-227``), LLM-response JSON parsing
(``:259-263``), threshold / weakest-dimension / report helpers
(``:266-318``).  Real LLM calls are out of this sandbox (the repo-wide
mock-LLM policy, see ``functions/mock_llm.py``); the evaluator here is a
deterministic fake whose dimension scores are an arithmetic function of
the generated prompt length, so the full loop — generate → respond →
parse → report — is exercised and SQL-replayable.

Offsets/truncations use character counts (the reference slices bytes,
``mod.rs:217-218``; identical on ASCII, documented deviation otherwise,
matching the repo-wide convention).
"""

from __future__ import annotations

import json

DIMENSIONS = ("relevance", "faithfulness", "completeness", "coherence",
              "groundedness")

# Verbatim port of LLMEvaluationPrompt::default_template (mod.rs:84-160).
# The {{ }} in the JSON block are literal characters in the reference's
# raw string (placeholders are substituted via sequential .replace, never
# format!) — preserved as-is.
DEFAULT_TEMPLATE = """You are an expert evaluator for question-answering systems. Evaluate the following GraphRAG query result.

## Query
{query}

## Generated Answer
{answer}

## Retrieved Context
### Entities ({entities_count} total)
{entities}

### Relationships ({relationships_count} total)
{relationships}

### Text Chunks ({chunks_count} total)
{chunks}

## Evaluation Criteria
Please evaluate the answer on the following dimensions (score 1-5, where 5 is best):

1. **Relevance**: How well does the answer address the query?
   - 5: Perfectly addresses the query
   - 3: Partially addresses the query
   - 1: Not relevant to the query

2. **Faithfulness**: Is the answer grounded in the provided context?
   - 5: Fully supported by context, no hallucination
   - 3: Mostly supported, minor extrapolation
   - 1: Contains unsupported claims

3. **Completeness**: Does the answer cover all aspects of the query?
   - 5: Comprehensive, addresses all aspects
   - 3: Covers main points, misses some details
   - 1: Incomplete, misses key information

4. **Coherence**: Is the answer well-structured and clear?
   - 5: Excellent structure, very clear
   - 3: Adequate structure, somewhat clear
   - 1: Poor structure, confusing

5. **Groundedness**: Are entity names and relationships correctly mentioned?
   - 5: All entities/relationships accurate
   - 3: Minor inaccuracies
   - 1: Significant errors in entity/relationship mentions

## Output Format
Provide your evaluation in the following JSON format:

```json
{{
  "relevance": {{
    "score": <1-5>,
    "reasoning": "<brief explanation>"
  }},
  "faithfulness": {{
    "score": <1-5>,
    "reasoning": "<brief explanation>"
  }},
  "completeness": {{
    "score": <1-5>,
    "reasoning": "<brief explanation>"
  }},
  "coherence": {{
    "score": <1-5>,
    "reasoning": "<brief explanation>"
  }},
  "groundedness": {{
    "score": <1-5>,
    "reasoning": "<brief explanation>"
  }},
  "overall_score": <average of all scores>,
  "summary": "<overall assessment in 2-3 sentences>"
}}
```

Evaluate now:"""


def format_entities(entities: list[dict]) -> str:
    """``mod.rs:180-191``: top 10, ``- name (type: t, confidence: c.2)``."""
    if not entities:
        return "No entities retrieved."
    return "\n".join(
        f"- {e['name']} (type: {e['entity_type']}, "
        f"confidence: {e['confidence']:.2f})"
        for e in entities[:10])


def format_relationships(relationships: list[dict]) -> str:
    """``mod.rs:193-205``: top 10, ``- s --[type]--> t (confidence: c.2)``."""
    if not relationships:
        return "No relationships retrieved."
    return "\n".join(
        f"- {r['source']} --[{r['relation_type']}]--> {r['target']} "
        f"(confidence: {r['confidence']:.2f})"
        for r in relationships[:10])


def format_chunks(chunks: list[str]) -> str:
    """``mod.rs:207-226``: top 5, 200-char preview + ``...``, 1-based."""
    if not chunks:
        return "No context chunks retrieved."
    parts = []
    for i, chunk in enumerate(chunks[:5]):
        preview = chunk[:200] + "..." if len(chunk) > 200 else chunk
        parts.append(f"Chunk {i + 1}:\n{preview}\n")
    return "\n".join(parts)


def generate_prompt(result: dict, template: str = DEFAULT_TEMPLATE) -> str:
    """``mod.rs:164-178`` — sequential .replace in the reference's exact
    order (query, answer, counts, then the formatted lists)."""
    return (template
            .replace("{query}", result["query"])
            .replace("{answer}", result["answer"])
            .replace("{entities_count}",
                     str(result["metadata"]["entities_count"]))
            .replace("{relationships_count}",
                     str(result["metadata"]["relationships_count"]))
            .replace("{chunks_count}",
                     str(result["metadata"]["chunks_count"]))
            .replace("{entities}",
                     format_entities(result["retrieved_entities"]))
            .replace("{relationships}",
                     format_relationships(result["retrieved_relationships"]))
            .replace("{chunks}", format_chunks(result["context_chunks"])))


def build_result(query: str, answer: str, entities: list[dict] | None = None,
                 relationships: list[dict] | None = None,
                 chunks: list[str] | None = None,
                 retrieval_strategy: str = "unknown",
                 processing_time_ms: int = 0) -> dict:
    """EvaluableQueryResultBuilder (``mod.rs:333-421``): counts are
    derived from the full (pre-truncation) lists."""
    if not query:
        raise ValueError("Query is required")
    if not answer:
        raise ValueError("Answer is required")
    entities = entities or []
    relationships = relationships or []
    chunks = chunks or []
    return {
        "query": query, "answer": answer,
        "retrieved_entities": entities,
        "retrieved_relationships": relationships,
        "context_chunks": chunks,
        "metadata": {
            "entities_count": len(entities),
            "relationships_count": len(relationships),
            "chunks_count": len(chunks),
            "retrieval_strategy": retrieval_strategy,
            "processing_time_ms": processing_time_ms,
        },
    }


def deterministic_scores(prompt: str) -> list[int]:
    """Sandbox fake-LLM scoring rule: dimension ``d`` scores
    ``1 + ((len(prompt) * (d+3) + d*d) % 5)`` — a pure function of the
    fully assembled prompt, so prompt-generation parity is load-bearing
    for every downstream column."""
    plen = len(prompt)
    return [1 + ((plen * (d + 3) + d * d) % 5) for d in range(5)]


def fake_llm_evaluation_response(prompt: str, strategy: str) -> str:
    """Deterministic stand-in for the LLM call: emits JSON in exactly
    the output format the reference's prompt demands (``mod.rs:133-158``),
    scores from :func:`deterministic_scores`."""
    scores = deterministic_scores(prompt)
    body = {}
    for dim, s in zip(DIMENSIONS, scores):
        body[dim] = {"score": s,
                     "reasoning": f"deterministic {dim} assessment ({s}/5)"}
    body["overall_score"] = sum(scores) / 5.0
    body["summary"] = f"Automated sandbox evaluation via {strategy} retrieval."
    return json.dumps(body)


def parse_evaluation(json_str: str) -> dict:
    """LLMEvaluation::from_json (``mod.rs:259-263``): strict field set,
    integer scores — raises ValueError on malformed input (the serde
    error path)."""
    try:
        raw = json.loads(json_str)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"Failed to parse LLM evaluation JSON: {e}") from e
    out = {}
    try:
        for dim in DIMENSIONS:
            out[dim] = {"score": int(raw[dim]["score"]),
                        "reasoning": str(raw[dim]["reasoning"])}
        out["overall_score"] = float(raw["overall_score"])
        out["summary"] = str(raw["summary"])
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"Failed to parse LLM evaluation JSON: {e}") from e
    return out


def passes_threshold(evaluation: dict, min_score: float) -> bool:
    """``mod.rs:266-268``."""
    return evaluation["overall_score"] >= min_score


def weakest_dimension(evaluation: dict) -> tuple[str, dict]:
    """``mod.rs:271-285``: first minimum in canonical dimension order
    (Rust ``min_by_key`` keeps the first of equal minima)."""
    best_name, best = DIMENSIONS[0], evaluation[DIMENSIONS[0]]
    for dim in DIMENSIONS[1:]:
        if evaluation[dim]["score"] < best["score"]:
            best_name, best = dim, evaluation[dim]
    return best_name, best


def report(evaluation: dict) -> str:
    """``mod.rs:288-318`` — byte-exact format string port (spacing and
    the trailing newline preserved)."""
    wname, wscore = weakest_dimension(evaluation)
    e = evaluation
    return (
        "## LLM Evaluation Report\n\n"
        f"**Overall Score**: {e['overall_score']:.2f}/5.0\n\n"
        "### Dimension Scores\n"
        f"- Relevance:     {e['relevance']['score']}/5 - "
        f"{e['relevance']['reasoning']}\n"
        f"- Faithfulness:  {e['faithfulness']['score']}/5 - "
        f"{e['faithfulness']['reasoning']}\n"
        f"- Completeness:  {e['completeness']['score']}/5 - "
        f"{e['completeness']['reasoning']}\n"
        f"- Coherence:     {e['coherence']['score']}/5 - "
        f"{e['coherence']['reasoning']}\n"
        f"- Groundedness:  {e['groundedness']['score']}/5 - "
        f"{e['groundedness']['reasoning']}\n\n"
        "### Summary\n"
        f"{e['summary']}\n\n"
        "### Weakest Dimension\n"
        f"{wname}: {wscore['reasoning']} (score {wscore['score']}/5)\n"
    )
