"""Code-aware chunking: split Rust source at top-level item boundaries.

Port of the reference's ``RustCodeChunkingStrategy``
(``text/chunking_strategies.rs:138-239``, feature-gated behind
``code-chunking`` there).  The reference parses with tree-sitter and
emits one chunk per top-level ``function_item | impl_item | struct_item
| enum_item | mod_item | trait_item`` node, keeps only chunks of at
least ``min_chunk_size``, and falls back to one whole-text chunk when
nothing matched (``chunking_strategies.rs:172-183``).

No tree-sitter exists in this sandbox, so the scanner below re-derives
the same spans with a hand-rolled lexer: it walks top-level statements,
skipping comments (line + NESTED block comments), string / raw-string /
char literals, and bracket groups, and recognises an item as an
optional modifier run (``pub``/``pub(...)``/``unsafe``/``async``/
``const``/``extern "..."``) followed by one of the six item keywords.
The span runs from the first modifier through the matching close brace
(or the terminating ``;`` for ``struct Foo;`` / ``mod x;`` forms) —
the same extent tree-sitter gives those nodes (attributes and doc
comments are sibling nodes in tree-sitter-rust, hence NOT part of the
item span; this scanner likewise leaves them outside the chunk).

Documented subset vs the reference: items nested inside non-item
constructs the reference would recurse into (``extern { }`` blocks,
macro bodies) are not extracted — a top-level-items-only scan; offsets
are Python str (character) offsets rather than byte offsets, with the
slicing invariant ``text[s:e] == content`` preserved.  Nested items
inside matched items are NOT extracted in either implementation (the
reference does not recurse into matched nodes).
"""

from __future__ import annotations

ITEM_KEYWORDS = {"fn", "impl", "struct", "enum", "mod", "trait"}
# modifier tokens that tree-sitter folds INTO the item node span
MODIFIERS = {"pub", "unsafe", "async", "const", "extern"}
_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")", "]", "}"}


def _skip_line_comment(text: str, i: int) -> int:
    j = text.find("\n", i)
    return len(text) if j < 0 else j + 1


def _skip_block_comment(text: str, i: int) -> int:
    """``/* ... */`` — Rust block comments nest."""
    depth, n = 1, len(text)
    i += 2
    while i < n and depth:
        if text.startswith("/*", i):
            depth += 1
            i += 2
        elif text.startswith("*/", i):
            depth -= 1
            i += 2
        else:
            i += 1
    return i


def _skip_string(text: str, i: int) -> int:
    n = len(text)
    i += 1
    while i < n:
        c = text[i]
        if c == "\\":
            i += 2
        elif c == '"':
            return i + 1
        else:
            i += 1
    return n


def _skip_raw_string(text: str, i: int) -> int:
    """``r"..."`` / ``r#"..."#`` / ``br##"..."##`` — i at the ``r``."""
    j = i + 1
    hashes = 0
    while j < len(text) and text[j] == "#":
        hashes += 1
        j += 1
    if j >= len(text) or text[j] != '"':
        return i + 1  # not a raw string after all (e.g. ident starting r)
    close = '"' + "#" * hashes
    k = text.find(close, j + 1)
    return len(text) if k < 0 else k + len(close)


def _skip_char_or_lifetime(text: str, i: int) -> int:
    """``'a'`` / ``'\\n'`` vs lifetime ``'a`` — i at the ``'``."""
    n = len(text)
    if i + 1 < n and text[i + 1] == "\\":
        j = text.find("'", i + 2)
        return n if j < 0 else j + 1
    if i + 2 < n and text[i + 2] == "'":
        return i + 3          # 'x'
    return i + 1              # lifetime: just consume the quote


def _is_word_char(c: str) -> bool:
    return c.isalnum() or c == "_"


class _Lexer:
    """Yields (kind, start, end): kind in {'word', 'punct'} with trivia
    (whitespace, comments, literals) skipped; literal tokens come back
    as 'lit' so depth tracking never sees their contents."""

    def __init__(self, text: str, i: int = 0):
        self.text = text
        self.i = i

    def next_token(self):
        text, n = self.text, len(self.text)
        i = self.i
        while i < n:
            c = text[i]
            if c.isspace():
                i += 1
            elif text.startswith("//", i):
                i = _skip_line_comment(text, i)
            elif text.startswith("/*", i):
                i = _skip_block_comment(text, i)
            elif c == '"':
                s = i
                i = _skip_string(text, i)
                self.i = i
                return ("lit", s, i)
            elif c in ("r", "b") and self._raw_ahead(i):
                s = i
                i = _skip_raw_string(text, i + 1 if c == "b" else i)
                self.i = i
                return ("lit", s, i)
            elif c == "'":
                s = i
                i = _skip_char_or_lifetime(text, i)
                self.i = i
                return ("lit", s, i)
            elif _is_word_char(c):
                s = i
                while i < n and _is_word_char(text[i]):
                    i += 1
                self.i = i
                return ("word", s, i)
            else:
                self.i = i + 1
                return ("punct", i, i + 1)
        self.i = n
        return None

    def _raw_ahead(self, i: int) -> bool:
        """True iff position i starts a raw (byte) string literal and is
        not just an identifier beginning with r/b."""
        text = self.text
        if i > 0 and _is_word_char(text[i - 1]):
            return False
        j = i + 1
        if text[i] == "b" and j < len(text) and text[j] == "r":
            j += 1
        elif text[i] == "b":
            return j < len(text) and text[j] == '"'
        while j < len(text) and text[j] == "#":
            j += 1
        return j < len(text) and text[j] == '"'


def _skip_balanced(lex: _Lexer, open_tok: str) -> int:
    """Consume through the token matching ``open_tok``; returns the end
    offset just past the close token."""
    depth = 1
    want_close = _OPEN[open_tok]
    end = lex.i
    while depth:
        t = lex.next_token()
        if t is None:
            return len(lex.text)
        kind, s, e = t
        end = e
        if kind != "punct":
            continue
        c = lex.text[s]
        if c in _OPEN:
            depth += 1
        elif c in _CLOSE:
            # any close of the right nesting level ends the group; Rust
            # source with mismatched brackets is out of subset
            if depth == 1 and c != want_close:
                continue
            depth -= 1
    return end


def _scan_item_end(lex: _Lexer) -> int:
    """After the item keyword: consume to the end of the item — the
    matching ``}`` of the first top-level ``{``, or a top-level ``;``
    (``struct Foo;``, ``mod x;``, ``struct T(u8);``)."""
    depth = 0
    end = lex.i
    while True:
        t = lex.next_token()
        if t is None:
            return len(lex.text)
        kind, s, e = t
        end = e
        if kind != "punct":
            continue
        c = lex.text[s]
        if c == "{" and depth == 0:
            return _skip_balanced(lex, "{")
        if c in _OPEN:
            depth += 1
        elif c in _CLOSE:
            depth = max(0, depth - 1)
        elif c == ";" and depth == 0:
            return end


def _skip_statement(lex: _Lexer) -> None:
    """Consume a non-item top-level statement: through a top-level ``;``
    or a brace group (``macro_rules! m { .. }``, ``extern { .. }``)."""
    depth = 0
    while True:
        t = lex.next_token()
        if t is None:
            return
        kind, s, e = t
        if kind != "punct":
            continue
        c = lex.text[s]
        if c == "{" and depth == 0:
            _skip_balanced(lex, "{")
            return
        if c in _OPEN:
            depth += 1
        elif c in _CLOSE:
            depth = max(0, depth - 1)
        elif c == ";" and depth == 0:
            return


def rust_item_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of top-level Rust items, in source order."""
    lex = _Lexer(text)
    spans: list[tuple[int, int]] = []
    mod_start: int | None = None   # start of the current modifier run
    while True:
        t = lex.next_token()
        if t is None:
            return spans
        kind, s, e = t
        if kind == "word":
            word = text[s:e]
            if word in ITEM_KEYWORDS:
                start = mod_start if mod_start is not None else s
                end = _scan_item_end(lex)
                spans.append((start, end))
                mod_start = None
            elif word in MODIFIERS:
                if mod_start is None:
                    mod_start = s
                if word == "extern":
                    # `extern "C" fn` — the ABI string is a modifier part
                    continue
            else:
                # a non-item statement (use/type/static/let/macro/...)
                _skip_statement(lex)
                mod_start = None
        elif kind == "punct" and text[s] == "(" and mod_start is not None:
            _skip_balanced(lex, "(")   # pub(crate) / pub(in ..)
        elif kind == "punct" and text[s] == "{":
            # bare top-level brace group: `extern "C" { .. }` foreign
            # block (after the extern-modifier + ABI-string path) or a
            # stray block.  Consume the WHOLE group — foreign signatures
            # inside are function_signature_item in tree-sitter, never
            # matched as items, and the item following the block must
            # not be swallowed.
            _skip_balanced(lex, "{")
            mod_start = None
        elif kind == "punct" and text[s] == "#":
            # attribute: #[...] or #![...] — sibling of the item in
            # tree-sitter, so NOT part of the span; skip its group
            nxt = lex.next_token()
            if nxt and nxt[0] == "punct" and text[nxt[1]] == "!":
                nxt = lex.next_token()
            if nxt and nxt[0] == "punct" and text[nxt[1]] == "[":
                _skip_balanced(lex, "[")
            mod_start = None
        elif kind == "lit":
            continue  # ABI string after `extern`, stray literal otherwise
        elif kind == "punct" and text[s] == ";":
            mod_start = None   # empty statement / trailing semicolon
        else:
            _skip_statement(lex)
            mod_start = None


def chunk_rust_code(text: str,
                    min_chunk_size: int) -> list[tuple[str, int, int]]:
    """(content, start, end) chunks per the reference's semantics:
    per-item spans filtered to ``len >= min_chunk_size``
    (``chunking_strategies.rs:205``), whole-text fallback when no item
    survives and the text is non-blank (``:172-183``)."""
    spans = [(s, e) for s, e in rust_item_spans(text)
             if e - s >= min_chunk_size]
    if not spans:
        return [(text, 0, len(text))] if text.strip() else []
    return [(text[s:e], s, e) for s, e in spans]
