"""Answer generation — port of ``graphrag-core/src/generation/mod.rs``
(MockLLM, PromptTemplate, AnswerContext assembly, AnswerGenerator with
extractive / abstractive / hybrid modes, citation formatting, quality
assessment).

Semantics pinned (context assembly, both template paths, the MockLLM
smart-answer scoring, confidence arithmetic and citation strings are
all re-derived by the DuckDB oracle from the staged query/result rows):

- ``PromptTemplate`` (``:414-480``): ``{var}`` extraction by char scan,
  ``fill`` = plain ``str.replace`` per provided key, then error if any
  extracted variable's placeholder survives.
- ``MockLLM.generate_response`` (``:325-360``): prompts containing
  (lowercased) "context:" AND "question:" are split at the FIRST
  case-sensitive ``"Context:"`` / ``"Question:"`` — so the template
  suffix after ``{question}`` ("\\n\\nRelevant information:" /
  "\\n\\nBased on the provided context, …") becomes PART of the scored
  question (quirk, pinned); question-word prompts fall to the canned
  ``generate_question_response``; else the default template with the
  first 200 chars of the prompt.
- Extractive scoring (``:66-151``): sentences = char-level ``[.!?]``
  split (``text/mod.rs:339-363``), query words = lowercased whitespace
  tokens with len > 2 ("the" passes!); +2.0 exact substring match,
  else for len > 4 words +1.0 if ANY sentence word w satisfies
  ``w ⊂ word or word ⊂ w`` (single-char sentence words make this fire
  — quirk, pinned); coverage bonus = matches/|words| · 0.5; STABLE
  sort desc; top-5 with score > 0.5 formatted
  ``"{sentence} (relevance: {:.1})"``; fallback top-2 > 0.0 as
  ``"(low confidence: {:.1})"``; else the "No directly relevant…"
  string.
- Smart fallback (``:153-208``): "No relevant"/"No directly" answers
  reroute to contextual pattern branches (who+friend → character-name
  list scan, what+adventure|happen → event list, where → location
  list — fixed keyword arrays scanned IN ORDER against the lowercased
  context), else "Based on the available context: " + a ≤3-sentence
  ≤150-char summary (space-joined, overflow breaks BEFORE counting the
  joining space — quirk).
- ``assemble_context`` (``:815-886``): entities collected from ALL
  results (incl. dropped < 0.3 ones) — HashSet order in the reference,
  SORTED here (documented deviation); primary = score ≥ 0.7 AND type ∈
  {chunk, entity}; else supporting if ≥ 0.3; stable sort desc,
  truncate max_sources/2 each; summaries top-3; confidence =
  min(avg_p·0.5 + avg_s·0.3 + avg_h·0.2, 1.0) — category averages are
  rounded to 12 decimals before combining ON BOTH SIDES (FP-order
  discipline; the reference computes in f32, this port in f64 —
  repo-wide documented deviation).
- ``generate_answer`` (``:771-813``): context confidence below
  min_confidence_threshold short-circuits to the "Insufficient
  information…" answer carrying the UNadjusted context confidence;
  hybrid = extractive unless it is < 50 chars or contains "No
  relevant" (``:954-966``).
- ``calculate_answer_confidence`` (``:968-997``): ×0.7 under 20 chars,
  ×0.5 if it contains "No relevant" or "insufficient" (case-sensitive),
  + min(0.1·|entity mentions in lowercased answer|, 0.2) when > 0,
  clamped to 1.0.
- ``format_with_citations`` (``:673-695``) and
  ``get_quality_assessment`` (``:697-718``): byte-exact strings with
  ``{:.2}`` confidences (``printf('%.2f')`` matches Python/Rust
  round-half-even on doubles, verified) and 100-char "..." snippets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ------------------------------------------------------ text helpers --

def extract_sentences(text: str) -> list[str]:
    """``text/mod.rs:339-363`` — char split on .!?, trimmed, non-empty,
    trailing remainder kept."""
    out = []
    for part in re.split(r"[.!?]", text):
        t = part.strip()
        if t:
            out.append(t)
    return out


_TP_STOP_WORDS = {
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i", "it",
    "for", "not", "on", "with", "he", "as", "you", "do", "at", "this",
    "but", "his", "by", "from", "they", "we", "say", "her", "she", "or",
    "an", "will", "my", "one", "all", "would", "there", "their", "what",
    "so", "up", "out", "if", "about", "who", "get", "which", "go", "me"}


def extract_keywords(text: str, max_keywords: int) -> list[str]:
    """``text/mod.rs:457-480`` — count-desc; the reference's ties are
    HashMap-order nondeterministic → first-occurrence order here
    (documented deviation)."""
    counts: dict[str, int] = {}
    for w in text.split():
        lw = w.lower()
        if len(lw) > 3 and lw not in _TP_STOP_WORDS:
            counts[lw] = counts.get(lw, 0) + 1
    ordered = sorted(counts, key=lambda w: -counts[w])  # stable
    return ordered[:max_keywords]


# ---------------------------------------------------- prompt template --

class PromptTemplate:
    def __init__(self, template: str):
        self.template = template
        self.variables: set[str] = set()
        i, n = 0, len(template)
        while i < n:
            if template[i] == "{":
                j = i + 1
                name = []
                while j < n and template[j] != "}":
                    name.append(template[j])
                    j += 1
                if name:
                    self.variables.add("".join(name))
                i = j + 1
            else:
                i += 1

    def fill(self, values: dict[str, str]) -> str:
        result = self.template
        for key, value in values.items():
            result = result.replace("{" + key + "}", value)
        for var in self.variables:
            if "{" + var + "}" in result:
                raise ValueError(
                    f"Template variable '{var}' not provided")
        return result

    def required_variables(self) -> set[str]:
        return self.variables


# -------------------------------------------------------- mock LLM --

_DEFAULT_TEMPLATES = {
    "default": "Based on the provided context, here is what I found: "
               "{context}",
    "not_found": "I could not find specific information about this in "
                 "the provided context.",
    "insufficient_context": "The available context is insufficient to "
                            "provide a complete answer.",
}

_CHARACTER_NAMES = ["entity", "second", "third", "fourth", "fifth",
                    "sixth", "guardian", "companion", "friend",
                    "character"]
_EVENT_KEYWORDS = ["activity", "discovery", "location", "place", "action",
                   "building", "structure", "area", "water"]
_LOCATIONS = ["settlement", "waterway", "river", "cavern", "landmass",
              "town", "building", "institution", "dwelling"]


class MockLLM:
    """``generation/mod.rs:24-410`` deterministic mock."""

    def __init__(self, templates: dict[str, str] | None = None):
        self.response_templates = dict(
            _DEFAULT_TEMPLATES if templates is None else templates)

    # -- extractive scoring (``:66-151``)
    def generate_extractive_answer(self, context: str, query: str) -> str:
        sentences = extract_sentences(context)
        if not sentences:
            return "No relevant context found."
        query_words = [w for w in query.lower().split() if len(w) > 2]
        if not query_words:
            return "Query too short or contains no meaningful words."
        scored: list[tuple[int, float]] = []
        for i, sentence in enumerate(sentences):
            sl = sentence.lower()
            total = 0.0
            matches = 0
            for word in query_words:
                if word in sl:
                    total += 2.0
                    matches += 1
                elif len(word) > 4:
                    for sw in sl.split():
                        if word in sw or sw in word:
                            total += 1.0
                            matches += 1
                            break
            coverage = (matches / len(query_words)) * 0.5
            scored.append((i, total + coverage))
        scored.sort(key=lambda t: -t[1])   # stable desc
        answer = [f"{sentences[i].strip()} (relevance: {s:.1f})"
                  for i, s in scored[:5] if s > 0.5]
        if not answer:
            answer = [f"{sentences[i].strip()} (low confidence: {s:.1f})"
                      for i, s in scored[:2] if s > 0.0]
        if not answer:
            return "No directly relevant information found in the context."
        return "\n\n".join(answer)

    def generate_smart_answer(self, context: str, question: str) -> str:
        extractive = self.generate_extractive_answer(context, question)
        if "No relevant" in extractive or "No directly" in extractive:
            return self.generate_contextual_response(context, question)
        return extractive

    def generate_contextual_response(self, context: str,
                                     question: str) -> str:
        ql = question.lower()
        cl = context.lower()
        if "who" in ql and "friend" in ql:
            names = [n for n in _CHARACTER_NAMES if n in cl]
            if names:
                return ("Based on the context, the main characters "
                        "mentioned include: " + ", ".join(names) +
                        ". These appear to be friends and companions in "
                        "the story.")
        if "what" in ql and ("adventure" in ql or "happen" in ql):
            events = [f"events involving {e}" for e in _EVENT_KEYWORDS
                      if e in cl]
            if events:
                return ("The context describes several events: " +
                        ", ".join(events))
        if "where" in ql:
            locations = [l for l in _LOCATIONS if l in cl]
            if locations:
                return ("The story takes place in locations such as: " +
                        ", ".join(locations))
        summary = self.generate_summary(context, 150)
        return f"Based on the available context: {summary}"

    def generate_question_response(self, question: str) -> str:
        ql = question.lower()
        if "entity" in ql and "friend" in ql:
            return ("Entity Name's main friends include Second Entity, "
                    "Friend Entity, and Companion Entity. These "
                    "characters share many relationships throughout the "
                    "story.")
        if "guardian" in ql:
            return ("Guardian Entity is Entity Name's guardian who "
                    "raised them. They are known for their caring but "
                    "strict nature.")
        if "activity" in ql and "main" in ql:
            return ("The main activity episode is one of the most famous "
                    "events, where they cleverly convince other "
                    "characters to participate in the main activity.")
        return ("I need more specific context to provide a detailed "
                "answer to this question.")

    # -- LLMInterface (``:325-410``)
    def generate_response(self, prompt: str) -> str:
        pl = prompt.lower()
        if "context:" in pl and "question:" in pl:
            cs = prompt.find("Context:")
            if cs != -1:
                section = prompt[cs + 8:]
                qs = section.find("Question:")
                if qs != -1:
                    context = section[:qs].strip()
                    question = section[qs + 9:].strip()
                    return self.generate_smart_answer(context, question)
        if ("who" in pl or "what" in pl or "where" in pl or "when" in pl
                or "how" in pl or "why" in pl):
            return self.generate_question_response(prompt)
        return self.response_templates.get(
            "default",
            "I cannot provide a response based on the given prompt."
        ).replace("{context}", prompt[:min(len(prompt), 200)])

    def generate_summary(self, content: str, max_length: int) -> str:
        sentences = extract_sentences(content)
        if not sentences:
            return ""
        summary = ""
        for sentence in sentences[:3]:
            if len(summary) + len(sentence) > max_length:
                break
            if summary:
                summary += " "
            summary += sentence
        return summary

    def extract_key_points(self, content: str,
                           num_points: int) -> list[str]:
        keywords = extract_keywords(content, num_points * 2)
        sentences = extract_sentences(content)
        points = []
        for kw in keywords[:num_points]:
            hit = next((s for s in sentences if kw in s.lower()), None)
            points.append(hit if hit is not None
                          else f"Key concept: {kw}")
        return points


# --------------------------------------------------- answer assembly --

@dataclass
class GenerationConfig:
    mode: str = "hybrid"                     # extractive|abstractive|hybrid
    max_answer_length: int = 500
    min_confidence_threshold: float = 0.3
    max_sources: int = 10
    include_citations: bool = True
    include_confidence_score: bool = True


@dataclass
class AnswerContext:
    primary_chunks: list = field(default_factory=list)
    supporting_chunks: list = field(default_factory=list)
    hierarchical_summaries: list = field(default_factory=list)
    entities: list = field(default_factory=list)
    confidence_score: float = 0.0
    source_count: int = 0

    def get_combined_content(self) -> str:
        parts = ([c["content"] for c in self.primary_chunks]
                 + [c["content"] for c in self.supporting_chunks]
                 + [s["summary"] for s in self.hierarchical_summaries])
        return "\n\n".join(p for p in parts)

    def get_sources(self) -> list[dict]:
        sources = []
        sid = 1
        for kind, rows, id_key, score_key, text_key in (
                ("chunk", self.primary_chunks, "id", "score", "content"),
                ("supporting_chunk", self.supporting_chunks, "id",
                 "score", "content"),
                ("summary", self.hierarchical_summaries, "node_id",
                 "score", "summary")):
            for r in rows:
                sources.append({
                    "id": sid, "content_type": kind,
                    "source_id": r[id_key],
                    "confidence": r[score_key],
                    "snippet": _truncate(r[text_key], 100)})
                sid += 1
        return sources


def _truncate(content: str, max_len: int) -> str:
    if len(content) <= max_len:
        return content
    return content[:max_len] + "..."


_QA_TEMPLATE = PromptTemplate(
    "Context:\n{context}\n\nQuestion: {question}\n\nBased on the "
    "provided context, please answer the question. If the context "
    "doesn't contain enough information, please say so.")
_SUMMARY_TEMPLATE = PromptTemplate(
    "Please provide a summary of the following content:\n\n{content}\n\n"
    "Summary:")
_EXTRACTIVE_TEMPLATE = PromptTemplate(
    "Extract the most relevant information from the following context "
    "to answer the question.\n\nContext: {context}\n\nQuestion: "
    "{question}\n\nRelevant information:")


class AnswerGenerator:
    """``generation/mod.rs:722-1018``."""

    def __init__(self, llm=None, config: GenerationConfig | None = None,
                 templates: dict[str, PromptTemplate] | None = None):
        self.llm = llm if llm is not None else MockLLM()
        self.config = config if config is not None else GenerationConfig()
        self.prompt_templates = templates if templates is not None else {
            "qa": _QA_TEMPLATE, "summary": _SUMMARY_TEMPLATE,
            "extractive": _EXTRACTIVE_TEMPLATE}

    # ``:815-886``
    def assemble_context(self, search_results: list[dict],
                         hierarchical_results: list[dict]) -> AnswerContext:
        primary, supporting = [], []
        all_entities: set[str] = set()
        for r in search_results:
            all_entities.update(r.get("entities", []))
            if r["score"] >= 0.7 and r["result_type"] in ("chunk",
                                                          "entity"):
                primary.append(r)
            elif r["score"] >= 0.3:
                supporting.append(r)
        primary.sort(key=lambda r: -r["score"])        # stable desc
        supporting.sort(key=lambda r: -r["score"])
        half = self.config.max_sources // 2
        primary = primary[:half]
        supporting = supporting[:half]
        summaries = sorted(hierarchical_results,
                           key=lambda r: -r["score"])[:3]

        def avg(rows):
            if not rows:
                return 0.0
            return round(sum(r["score"] for r in rows) / len(rows), 12)

        confidence = min(avg(primary) * 0.5 + avg(supporting) * 0.3
                         + avg(summaries) * 0.2, 1.0)
        ctx = AnswerContext(
            primary_chunks=primary, supporting_chunks=supporting,
            hierarchical_summaries=summaries,
            entities=sorted(all_entities),   # HashSet order → sorted
            confidence_score=confidence,
            source_count=len(primary) + len(supporting) + len(summaries))
        return ctx

    def _templated_answer(self, template_name: str, query: str,
                          context: AnswerContext) -> str:
        combined = context.get_combined_content()
        if not combined:
            return "No relevant content found."
        template = self.prompt_templates[template_name]
        prompt = template.fill({"context": combined, "question": query})
        response = self.llm.generate_response(prompt)
        if len(response) > self.config.max_answer_length:
            return response[:self.config.max_answer_length - 3] + "..."
        return response

    def generate_extractive_answer(self, query, context):
        return self._templated_answer("extractive", query, context)

    def generate_abstractive_answer(self, query, context):
        return self._templated_answer("qa", query, context)

    def generate_hybrid_answer(self, query, context):
        extractive = self.generate_extractive_answer(query, context)
        if len(extractive) < 50 or "No relevant" in extractive:
            return self.generate_abstractive_answer(query, context)
        return extractive

    # ``:968-997``
    def calculate_answer_confidence(self, answer: str,
                                    context: AnswerContext) -> float:
        confidence = context.confidence_score
        if len(answer) < 20:
            confidence *= 0.7
        if "No relevant" in answer or "insufficient" in answer:
            confidence *= 0.5
        al = answer.lower()
        mentions = sum(1 for e in context.entities if e.lower() in al)
        if mentions > 0:
            confidence += min(mentions * 0.1, 0.2)
        return min(confidence, 1.0)

    # ``:771-813``
    def generate_answer(self, query: str, search_results: list[dict],
                        hierarchical_results: list[dict]) -> dict:
        context = self.assemble_context(search_results,
                                        hierarchical_results)
        if context.confidence_score < self.config.min_confidence_threshold:
            return {
                "answer_text": "Insufficient information available to "
                               "answer this question.",
                "confidence_score": context.confidence_score,
                "sources": context.get_sources(),
                "entities_mentioned": list(context.entities),
                "mode_used": self.config.mode,
                "context_quality": context.confidence_score,
            }
        if self.config.mode == "extractive":
            answer = self.generate_extractive_answer(query, context)
        elif self.config.mode == "abstractive":
            answer = self.generate_abstractive_answer(query, context)
        else:
            answer = self.generate_hybrid_answer(query, context)
        final_confidence = self.calculate_answer_confidence(answer,
                                                            context)
        return {
            "answer_text": answer,
            "confidence_score": final_confidence,
            "sources": context.get_sources(),
            "entities_mentioned": list(context.entities),
            "mode_used": self.config.mode,
            "context_quality": context.confidence_score,
        }


def format_with_citations(answer: dict) -> str:
    """``:673-695``."""
    formatted = answer["answer_text"]
    if answer["sources"]:
        formatted += "\n\nSources:"
        for s in answer["sources"]:
            formatted += (f"\n[{s['id']}] {s['content_type']} "
                          f"(confidence: {s['confidence']:.2f}) - "
                          f"{s['snippet']}")
    if answer["confidence_score"] > 0.0:
        formatted += (f"\n\nOverall confidence: "
                      f"{answer['confidence_score']:.2f}")
    return formatted


def get_quality_assessment(answer: dict) -> str:
    """``:697-718``."""
    c = answer["confidence_score"]
    level = "High" if c >= 0.8 else ("Medium" if c >= 0.5 else "Low")
    n = len(answer["sources"])
    srcs = ("Well-sourced" if n >= 3
            else ("Moderately sourced" if n > 0 else "Poorly sourced"))
    return (f"Confidence: {level} | Sources: {srcs} | Context Quality: "
            f"{answer['context_quality']:.2f}")


__all__ = ["extract_sentences", "extract_keywords", "PromptTemplate",
           "MockLLM", "GenerationConfig", "AnswerContext",
           "AnswerGenerator", "format_with_citations",
           "get_quality_assessment"]
