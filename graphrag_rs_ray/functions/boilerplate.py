"""Link-density boilerplate removal (jusText / readability heuristic,
Pomikálek 2011): split a page into block elements, measure what fraction
of each block's text lives inside anchors, and drop link-heavy blocks
(navigation, link farms) before the text enters the corpus.

Documented subset (mirrored exactly by the SQL oracle):
- blocks are non-nested ``<p>`` / ``<li>`` / ``<h1>``-``<h6>`` elements
  (tag normalized to ``p`` / ``li`` / ``h``); content between the open
  tag and the FIRST following block close tag;
- block text = tag-stripped, whitespace-collapsed, trimmed; link chars
  = the same measure summed over ``<a ...>...</a>`` inners;
- keep iff the block has text AND
  ``1_000_000 * link_chars < max_link_density_micro * text_chars``
  (integer cross-multiplication — no float discipline anywhere).
"""

from __future__ import annotations

import re

_BLOCK_RE = re.compile(r"<(p|li|h[1-6])\b[^>]*>(.*?)</(?:p|li|h[1-6])>",
                       re.IGNORECASE | re.DOTALL)
_A_INNER_RE = re.compile(r"<a\s[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

DEFAULT_MAX_LINK_DENSITY_MICRO = 500_000   # drop blocks >= 50% link text


def _clean(raw: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub("", raw)).strip()


def block_rows(html: str, max_link_density_micro: int =
               DEFAULT_MAX_LINK_DENSITY_MICRO) -> list[dict]:
    """One dict per block element, in document order: tag, block_text,
    text_chars, link_chars, kept."""
    out = []
    for m in _BLOCK_RE.finditer(html):
        tag = m.group(1).lower()
        if tag.startswith("h"):
            tag = "h"
        raw = m.group(2)
        text = _clean(raw)
        link_chars = sum(len(_clean(a)) for a in _A_INNER_RE.findall(raw))
        kept = (len(text) > 0
                and 1_000_000 * link_chars
                < max_link_density_micro * len(text))
        out.append({"tag": tag, "block_text": text,
                    "text_chars": len(text), "link_chars": link_chars,
                    "kept": kept})
    return out


def strip_boilerplate(html: str, max_link_density_micro: int =
                      DEFAULT_MAX_LINK_DENSITY_MICRO) -> tuple[str, int, int]:
    """(cleaned_text, n_blocks, n_dropped): kept blocks' text joined
    with newlines, in document order."""
    rows = block_rows(html, max_link_density_micro)
    kept = [r["block_text"] for r in rows if r["kept"]]
    return "\n".join(kept), len(rows), sum(1 for r in rows if not r["kept"])
