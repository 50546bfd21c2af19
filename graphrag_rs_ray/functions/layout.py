"""Markdown / plaintext layout parsing + parser factory.

Ports:
- Markdown ``#``-heading parse — ``text/parsers/markdown.rs:84-110``
  (level = leading ``#`` count, requires space after hashes).
- Plaintext heuristics — ``text/parsers/plaintext.rs:86-120`` +
  ``text/analysis.rs``: underline detection (``===``→1, ``---``→2,
  ``___``→3, ``analysis.rs:282-299``), ALL-CAPS level by length
  (``analysis.rs:41-51``), markdown-style hashes.
- Factory by format — ``text/layout_parser.rs`` (html/htm → html parser,
  md/markdown → markdown, else plaintext).

Section/hierarchy assembly is shared with the HTML parser
(``functions/html.py``) — the reference triplicates it verbatim.
"""

from __future__ import annotations

from .html import Heading, Section, build_hierarchy, build_sections, parse_headings


def is_all_caps(text: str) -> bool:
    letters = [c for c in text if c.isalpha()]
    return bool(letters) and all(c.isupper() for c in letters)


def is_underline(line: str) -> int | None:
    t = line.strip()
    if len(t) < 3:
        return None
    if all(c == "=" for c in t):
        return 1
    if all(c == "-" for c in t):
        return 2
    if all(c == "_" for c in t):
        return 3
    return None


def detect_heading_level(line: str) -> int | None:
    """Markdown hashes or ALL-CAPS length heuristic (``analysis.rs:22-51``)."""
    t = line.strip()
    if not t:
        return None
    if t.startswith("#"):
        level = len(t) - len(t.lstrip("#"))
        if 0 < level <= 6 and len(t) > level and t[level] == " ":
            return level
    if len(t) >= 5 and is_all_caps(t):
        if len(t) < 20:
            return 1
        if len(t) < 40:
            return 2
        return 3
    return None


def parse_markdown_headings(content: str) -> list[Heading]:
    headings: list[Heading] = []
    offset = 0
    for line_num, line in enumerate(content.split("\n")):
        t = line.strip()
        if t.startswith("#"):
            level = len(t) - len(t.lstrip("#"))
            if 0 < level <= 6 and (len(t) == level or t[level] == " "):
                text = t[level:].strip()
                if text:
                    headings.append(Heading(level=level, text=text,
                                            start_offset=offset,
                                            end_offset=offset + len(line),
                                            line_number=line_num))
        offset += len(line) + 1
    return headings


def parse_plaintext_headings(content: str) -> list[Heading]:
    headings: list[Heading] = []
    lines = content.split("\n")
    offset = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        t = line.strip()
        if not t:
            offset += len(line) + 1
            i += 1
            continue
        level = None
        consumed_underline = False
        if i + 1 < len(lines):
            ul = is_underline(lines[i + 1])
            if ul is not None:
                level = ul
                consumed_underline = True
        if level is None:
            level = detect_heading_level(line)
        if level is not None:
            headings.append(Heading(level=level, text=t, start_offset=offset,
                                    end_offset=offset + len(line), line_number=i))
        offset += len(line) + 1
        if consumed_underline:
            offset += len(lines[i + 1]) + 1
            i += 2
        else:
            i += 1
    return headings


def parse_layout(content: str, fmt: str) -> tuple[list[Heading], list[Section], list[int]]:
    """Factory dispatch (``text/layout_parser.rs``) + shared section build."""
    fmt = (fmt or "").lower()
    if fmt in ("html", "htm"):
        headings = parse_headings(content)
    elif fmt in ("md", "markdown"):
        headings = parse_markdown_headings(content)
    else:
        headings = parse_plaintext_headings(content)
    sections = build_sections(headings, content)
    roots = build_hierarchy(sections)
    return headings, sections, roots


def find_section_containing_offset(sections: list[Section], offset: int) -> int | None:
    """Last section whose [heading.start, content_end) contains offset."""
    found = None
    for idx, s in enumerate(sections):
        if s.heading.start_offset <= offset < s.content_end:
            found = idx
    return found


def heading_path(sections: list[Section], idx: int) -> list[str]:
    path = []
    cur: int | None = idx
    while cur is not None:
        path.append(sections[cur].heading.text)
        cur = sections[cur].parent_section
    return list(reversed(path))


def section_depths(sections: list[Section]) -> list[int]:
    """Depth map (``text/document_structure.rs:120-146``): 0 = root,
    parent depth + 1 otherwise.  Parents always precede children in the
    stack-built section list, so one forward pass suffices."""
    depths: list[int] = []
    for s in sections:
        depths.append(0 if s.parent_section is None
                      else depths[s.parent_section] + 1)
    return depths


def structure_statistics(headings: list[Heading], sections: list[Section],
                         roots: list[int]) -> dict:
    """StructureStatistics (``text/document_structure.rs:237-276``):
    heading/section totals, max hierarchy depth (0 when empty), root
    count, and per-level heading counts (levels 1..6 pivoted to
    columns — the reference keeps a HashMap)."""
    depths = section_depths(sections)
    stats = {
        "total_headings": len(headings),
        "total_sections": len(sections),
        "max_depth": max(depths, default=0),
        "root_sections": len(roots),
    }
    for lvl in range(1, 7):
        stats[f"level_{lvl}"] = sum(1 for h in headings if h.level == lvl)
    return stats
