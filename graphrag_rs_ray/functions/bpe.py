"""Byte-pair-encoding tokenizer kernels (pure Python, no Ray).

BPE subword learning per Sennrich, Haddow & Birch 2016 (ACL,
"Neural Machine Translation of Rare Words with Subword Units",
PAPERS.md): start from characters + an end-of-word marker, repeatedly
merge the most frequent adjacent symbol pair across the word-TYPE
frequency table.

Deterministic contract (pinned for the DuckDB oracle):

- Symbols of a word = its characters followed by the ``</w>`` marker
  (the marker cannot collide with a merged symbol: ``lm_tokenize``
  strips ``<``, ``/`` and ``>`` from every token).
- Pair counting weighs each adjacent position once (overlapping
  positions in runs count separately, as in subword-nmt).
- Merge choice per round: max count, ties broken by lexicographically
  smallest ``(left, right)`` pair (Python code-point order == DuckDB
  binary UTF-8 order; UTF-8 preserves code-point order).
- Merging a chosen pair into a word is a SINGLE left-to-right pass
  (``merge_pass``).  One pass is complete: a new symbol ``l+r`` can
  never start or finish another occurrence of the same pair (``l+r``
  equals neither ``l`` nor ``r``), and overlapping matches only arise
  when ``l == r``, where left-to-right scanning keeps even run
  offsets — exactly the run-parity rule the SQL window pass applies.
- APPLY (tokenization of any word) replays the merges in learned rank
  order, one ``merge_pass`` each — learn-consistent by construction.
  (This is the original subword-nmt semantics, not the Hugging-Face
  min-rank-loop variant; the two differ only on words whose merges
  create earlier-rank pairs, and the contract here is pinned so the
  oracle and the kernel can never disagree.)
"""
from __future__ import annotations

from collections import Counter

END = "</w>"


def word_symbols(word: str) -> list[str]:
    return list(word) + [END]


def merge_pass(syms: list[str], left: str, right: str) -> list[str]:
    """One left-to-right pass merging every non-overlapping (left, right)
    occurrence.  Complete for a single pair (see module docstring)."""
    out: list[str] = []
    i, n = 0, len(syms)
    lr = left + right
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(lr)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(freqs: list[tuple[str, int]], n_merges: int
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from (word, count) TYPE frequencies.
    Stops early if no adjacent pair remains (fully merged vocabulary)."""
    segs = {w: word_symbols(w) for w, _ in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cnt: Counter = Counter()
        for w, n in freqs:
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in segs:
            segs[w] = merge_pass(segs[w], best[0], best[1])
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word: replay the merges in rank order."""
    syms = word_symbols(word)
    for left, right in merges:
        if len(syms) == 1:
            break
        syms = merge_pass(syms, left, right)
    return syms
