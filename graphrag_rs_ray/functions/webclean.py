"""Web-corpus cleaning kernels (pure Python, no Ray): C4 line-level
filters (Raffel+ 2020 §2.2) and PII redaction.  Every rule is written so
a DuckDB oracle can re-derive it with ZERO staging: ASCII-explicit
whitespace classes (never Python's unicode ``\\s``/``str.strip``), RE2-safe
patterns (no lookaround, no capture groups), and replacement order pinned.

Reference scope note: graphrag-rs has no corpus-curation layer; these are
the training-data extensions the round brief asks for (C4: Raffel+ 2020;
PII redaction as in CCNet/BigScience ROOTS pipelines).
"""

from __future__ import annotations

import re

# ASCII whitespace (minus \n — these kernels operate per line); matches the
# oracle's RE2 class exactly.  Python's str.split()/strip() would also eat
# unicode spaces (\xa0 …) that RE2's \s does not.
_WS = re.compile(r"[ \t\r\v\f]+")
_STRIP = " \t\r"
_TERMINAL = (".", "!", "?", '"')


def c4_line_keep(line: str) -> bool:
    """C4 line filter: terminal punctuation, >= 5 words, no 'javascript'.
    ``line`` must already be stripped (``_STRIP`` charset)."""
    if not line.endswith(_TERMINAL):
        return False
    if "javascript" in line.lower():
        return False
    words = [w for w in _WS.split(line) if w]
    return len(words) >= 5


def c4_clean(text: str, min_kept_lines: int = 3) -> dict:
    """C4 document cleaning (Raffel+ 2020 §2.2): keep lines that end in
    terminal punctuation (., !, ?, \"), have >= 5 words, and don't mention
    'javascript'; drop the whole doc if it contains a curly brace or the
    phrase 'lorem ipsum', or if fewer than ``min_kept_lines`` lines
    survive (the paper's "fewer than 3 sentences" gate, applied at line
    granularity — documented simplification: our line filter already
    requires terminal punctuation, so a kept line is >= 1 sentence).

    Returns integer counters + the cleaned text (kept stripped lines
    joined with \\n) so the oracle needs no floats and no staging."""
    lines = [ln.strip(_STRIP) for ln in text.split("\n")]
    kept = [ln for ln in lines if c4_line_keep(ln)]
    has_brace = ("{" in text) or ("}" in text)
    has_lorem = "lorem ipsum" in text.lower()
    keep = (not has_brace) and (not has_lorem) and len(kept) >= min_kept_lines
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "has_brace": has_brace,
        "has_lorem": has_lorem,
        "keep": keep,
        "cleaned": "\n".join(kept),
    }


# PII patterns — RE2-safe (no lookaround, NO capture groups: counting uses
# non-overlapping match counts, which capture groups would distort in
# re.findall).  Replacement ORDER is part of the contract: email → ipv4 →
# phone (emails may contain digit runs; the ipv4 pattern carries no \b on
# purpose — Python's unicode \b and RE2's ASCII \b diverge on non-ASCII
# neighbours — so a >3-octet digit run redacts its first 4 octets; bounded,
# documented false positive).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"

_PII = [
    ("n_email", re.compile(PII_EMAIL), "<EMAIL>"),
    ("n_ip", re.compile(PII_IPV4), "<IP>"),
    ("n_phone", re.compile(PII_PHONE), "<PHONE>"),
]


def pii_redact(text: str) -> dict:
    """Redact emails / IPv4 addresses / phone numbers with typed
    placeholder tokens; returns per-type non-overlapping match counts and
    the redacted text.  Sequential passes in the pinned order above."""
    out = {}
    for key, pat, repl in _PII:
        text, n = pat.subn(repl, text)
        out[key] = n
    out["redacted"] = text
    return out
