"""Gates for the Rust code chunker (chunking_strategies.rs:138-239 port):
the reference's own test fixture, span-slicing invariants, lexer hazards
(strings/comments/nesting), min-size filter and whole-text fallback."""

import pyarrow as pa

from graphrag_rs_ray.functions.code_chunking import (
    chunk_rust_code,
    rust_item_spans,
)

REFERENCE_FIXTURE = '''
fn main() {
    println!("Hello, world!");
}

struct Point {
    x: f64,
    y: f64,
}

impl Point {
    fn new(x: f64, y: f64) -> Self {
        Point { x, y }
    }
}
'''


def test_reference_fixture():
    # chunking_strategies.rs:282-313: >= 2 chunks, non-empty, s < e
    chunks = chunk_rust_code(REFERENCE_FIXTURE, 10)
    assert len(chunks) == 3
    assert [c[0].split()[0] for c in chunks] == ["fn", "struct", "impl"]
    for content, s, e in chunks:
        assert content and s < e
        assert REFERENCE_FIXTURE[s:e] == content
    # nested fn (Point::new) stays inside the impl chunk, not its own
    assert chunks[2][0].startswith("impl Point")
    assert "fn new" in chunks[2][0]


def test_modifiers_fold_into_span():
    src = 'pub(crate) async unsafe fn f() { g(); }\npub struct S;'
    spans = rust_item_spans(src)
    assert [src[s:e] for s, e in spans] == [
        'pub(crate) async unsafe fn f() { g(); }', 'pub struct S;']


def test_attributes_and_doc_comments_excluded():
    src = '#[derive(Debug)]\n/// doc\npub enum E { A, B }'
    (s, e), = rust_item_spans(src)
    assert src[s:e] == 'pub enum E { A, B }'


def test_lexer_hazards():
    # braces inside strings / chars / comments / nested block comments
    src = ('fn a() { let s = "}{"; let c = \'{\'; /* { /* { */ } */ '
           'let r = r#"}"#; }\n'
           'mod m;\n'
           'fn b() { // }\n}')
    spans = rust_item_spans(src)
    got = [src[s:e] for s, e in spans]
    assert len(got) == 3
    assert got[1] == 'mod m;'
    assert got[0].endswith('r#"}"#; }')
    assert got[2].endswith('}')


def test_non_items_skipped_including_fn_pointer_type():
    # `type F = fn(i32);` contains the word fn inside a non-item
    # statement — must not misfire (tree-sitter sees a type_item)
    src = ('use std::fmt;\ntype F = fn(i32) -> i32;\n'
           'static X: [u8; 3] = [1, 2, 3];\n'
           'macro_rules! m { ($x:expr) => { fn not_an_item() {} }; }\n'
           'const Y: u32 = 5;\n'
           'fn real() { m!(1); }')
    spans = rust_item_spans(src)
    assert [src[s:e] for s, e in spans] == ['fn real() { m!(1); }']


def test_tuple_and_unit_structs_end_at_semicolon():
    src = 'struct T(u8, [u8; 2]);\nstruct U;\ntrait Tr { fn f(&self); }'
    spans = rust_item_spans(src)
    assert [src[s:e] for s, e in spans] == [
        'struct T(u8, [u8; 2]);', 'struct U;',
        'trait Tr { fn f(&self); }']


def test_extern_block_consumed_whole():
    # `extern "C" { .. }` is a foreign_mod in tree-sitter: its contents
    # are function_signature_item (never matched as items) and the item
    # FOLLOWING the block must still be chunked.
    src = ('extern "C" { fn foo(); fn bar(); }\n'
           'fn real_item() { let x = 1; }\n'
           'pub struct S { a: u8 }')
    spans = rust_item_spans(src)
    assert [src[s:e] for s, e in spans] == [
        'fn real_item() { let x = 1; }', 'pub struct S { a: u8 }']
    # unsafe extern (Rust 2024 form) and a bare stray block
    src2 = ('unsafe extern "C" { fn f(); }\n{ let y = 2; }\n'
            'fn after() {}')
    assert [src2[s:e] for s, e in rust_item_spans(src2)] == ['fn after() {}']


def test_min_size_filter_and_fallback():
    src = 'fn a() {}\n\nfn bbbbbbbbbbbbbbbbbb() { work(); }'
    chunks = chunk_rust_code(src, 20)
    assert len(chunks) == 1 and chunks[0][0].startswith("fn bbbb")
    # nothing survives the filter -> whole-text fallback (:172-183)
    chunks = chunk_rust_code('fn a() {}', 100)
    assert chunks == [('fn a() {}', 0, 9)]
    # blank text -> no chunks at all
    assert chunk_rust_code('   \n  ', 10) == []
    # expressions only (no items) -> single whole-text chunk
    src = 'let x = 1 + 2;'
    assert chunk_rust_code(src, 1) == [(src, 0, len(src))]


def test_chunk_stage_rust_code_path(ray_session):
    import ray.data as rd

    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.stages.chunk import ChunkStage

    ds = rd.from_arrow(pa.table({
        "doc_id": ["d1"], "text": [REFERENCE_FIXTURE], "lang": ["en"]}))
    out = ds.map_batches(ChunkStage(KGConfig(chunker="rust_code",
                                             min_chunk_size=10)),
                         batch_format="pyarrow").to_pandas()
    assert list(out["chunk_id"]) == ["d1_0", "d1_1", "d1_2"]
    for _, r in out.iterrows():
        assert REFERENCE_FIXTURE[r["start"]:r["end"]] == r["text"]


# --------------------------------------------------- property gates --

from hypothesis import given, settings, strategies as st

_RUST_TOKENS = st.sampled_from([
    "fn", "impl", "struct", "enum", "mod", "trait", "pub", "unsafe",
    "async", "const", "extern", "use", "type", "static", "let", "x",
    "Foo", "{", "}", "(", ")", "[", "]", ";", ":", ",", "->", "=",
    '"str"', "'c'", "// line\n", "/* block */", 'r#"raw"#', "#[attr]",
    "1.5", "&mut", "<T>",
])


@settings(max_examples=60, deadline=None)
@given(st.lists(_RUST_TOKENS, max_size=40).map(" ".join))
def test_spans_always_slice_correct(src):
    spans = rust_item_spans(src)
    prev_end = 0
    for s, e in spans:
        assert 0 <= s < e <= len(src)
        assert s >= prev_end          # non-overlapping, in order
        prev_end = e
    for content, s, e in chunk_rust_code(src, 1):
        assert src[s:e] == content


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=200))
def test_never_crashes_on_arbitrary_text(src):
    # arbitrary (non-Rust) input: must terminate without error and obey
    # the whole-text fallback contract
    chunks = chunk_rust_code(src, 10)
    if src.strip() and not chunks:
        raise AssertionError("non-blank text must yield >= 1 chunk")
    for content, s, e in chunks:
        assert src[s:e] == content
