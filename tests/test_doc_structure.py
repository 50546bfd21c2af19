"""Document-structure kernels (text/document_structure.rs) — section
hierarchy, depth map, heading paths, statistics — over the shared layout
parsers.  Ports the reference's own unit expectations
(document_structure.rs:339-438)."""

from graphrag_rs_ray.functions.html import Heading, Section
from graphrag_rs_ray.functions.layout import (
    find_section_containing_offset,
    heading_path,
    parse_layout,
    section_depths,
    structure_statistics,
)

MD = """# Chapter 1
Intro text.
## Section 1.1
Body.
### Subsection 1.1.1
Deep body.
## Section 1.2
More body.
# Chapter 2
Closing."""


def test_markdown_structure_parents_and_depths():
    headings, sections, roots = parse_layout(MD, "markdown")
    assert [h.level for h in headings] == [1, 2, 3, 2, 1]
    assert [s.parent_section for s in sections] == [None, 0, 1, 0, None]
    assert roots == [0, 4]
    assert section_depths(sections) == [0, 1, 2, 1, 0]
    # content ranges: heading end -> next heading start / end of doc
    for i in range(len(sections) - 1):
        assert sections[i].content_start == headings[i].end_offset
        assert sections[i].content_end == headings[i + 1].start_offset
    assert sections[-1].content_end == len(MD)


def test_heading_path_root_to_leaf():
    # document_structure.rs:387-413 (test_heading_path)
    _, sections, _ = parse_layout(MD, "markdown")
    assert heading_path(sections, 2) == [
        "Chapter 1", "Section 1.1", "Subsection 1.1.1"]
    assert heading_path(sections, 4) == ["Chapter 2"]


def test_section_contains_offset():
    # document_structure.rs:352-360: [heading.start, content_end)
    h = Heading(level=1, text="Test", start_offset=0, end_offset=10)
    s = Section(heading=h, content_start=10, content_end=100)
    assert find_section_containing_offset([s], 0) == 0
    assert find_section_containing_offset([s], 50) == 0
    assert find_section_containing_offset([s], 100) is None
    assert find_section_containing_offset([s], 150) is None


def test_structure_statistics():
    # document_structure.rs:416-427 (level counts) + max_depth/roots
    headings, sections, roots = parse_layout(MD, "markdown")
    st = structure_statistics(headings, sections, roots)
    assert st["total_headings"] == 5
    assert st["total_sections"] == 5
    assert st["max_depth"] == 2
    assert st["root_sections"] == 2
    assert (st["level_1"], st["level_2"], st["level_3"]) == (2, 2, 1)
    assert st["level_4"] == 0


def test_empty_document_statistics():
    headings, sections, roots = parse_layout("no headings at all", "md")
    st = structure_statistics(headings, sections, roots)
    assert st["total_headings"] == 0
    assert st["max_depth"] == 0
    assert st["root_sections"] == 0


def test_invalid_markdown_heading_lines_dropped():
    # parsers/markdown.rs:90-101: needs 1..=6 hashes + space + text
    text = "####### seven\n##\n#nospace x\n## Real\nbody"
    headings, _, _ = parse_layout(text, "markdown")
    assert [h.text for h in headings] == ["Real"]
    assert headings[0].level == 2
