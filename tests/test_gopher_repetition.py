"""Gates for the Gopher repetition filters (Rae+ 2021 §A1.1.1): counting
semantics of each counter family, threshold cross-multiplication, and the
pipeline over injected docs."""

import pyarrow as pa

from graphrag_rs_ray.functions.textstats import (
    gopher_repetition_keep,
    gopher_repetition_stats,
)


def test_line_and_para_counters():
    s = gopher_repetition_stats("aa\naa\n\nbb\naa\n\nbb")
    # non-empty lines: aa,aa,bb,aa,bb -> dups beyond first: 2x'aa' + 1x'bb'
    assert s["n_lines"] == 5 and s["dup_lines"] == 3
    assert s["line_chars"] == 10 and s["dup_line_chars"] == 6
    # paragraphs (split \n\n): 'aa\naa', 'bb\naa', 'bb' -> no dup
    assert s["n_paras"] == 3 and s["dup_paras"] == 0
    assert s["para_chars"] == 5 + 5 + 2 and s["dup_para_chars"] == 0


def test_ngram_counters():
    s = gopher_repetition_stats("x y x y x y z")
    # bigrams: 'x y'x3, 'y x'x2, 'y z'x1 -> top2 = 3 * 2 chars
    assert s["top2_chars"] == 3 * 2
    # trigrams: 'x y x'x2, 'y x y'x2, 'x y z' -> mc=2, max len 3
    assert s["top3_chars"] == 2 * 3
    assert s["word_chars"] == 7
    # 5-grams: 'x y x y x' and 'y x y x y' once each + 'x y x y z' -> no dup
    assert s["dup5_chars"] == 0
    t = gopher_repetition_stats("a b c d e a b c d e a b c d e")
    # overlapping 5-grams: 'a b c d e' x3 and the 4 rotations x2 each
    # -> dup chars = (3-1)*5 + 4*(2-1)*5 = 30
    assert t["dup5_chars"] == 30
    assert t["top4_chars"] == 3 * 4  # 'a b c d' x3 (0,5,10)


def test_keep_thresholds():
    # clean varied text passes (every word unique -> no repeated n-grams)
    clean = "\n".join(f"alpha{i} beta{i} gamma{i} delta{i}"
                      for i in range(10))
    assert gopher_repetition_keep(gopher_repetition_stats(clean))
    # >30% duplicate lines fails
    spam = "\n".join(["same line"] * 5 + [f"unique {i}" for i in range(5)])
    assert not gopher_repetition_keep(gopher_repetition_stats(spam))
    # dominant bigram fails (top2 > 20% of word chars)
    loop = "ha ha " * 50
    assert not gopher_repetition_keep(gopher_repetition_stats(loop))
    # empty doc: every fraction is 0/0 -> keep
    assert gopher_repetition_keep(gopher_repetition_stats(""))


def test_pipeline_schema(ray_session):
    import ray.data as rd
    from graphrag_rs_ray.pipelines import training_data as td

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["ha ha " * 50,
                          "\n".join(f"fine{i} line{i} here{i}"
                                    for i in range(40))],
                         pa.string())}))
    out = td.gopher_repetition("/unused", docs_ds=ds).to_pandas()
    out = out.set_index("doc_id")
    assert not bool(out.loc[1].keep) and bool(out.loc[2].keep)
    assert len(out.columns) == 19  # 18 counters + keep
