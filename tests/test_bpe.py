"""Gates for the BPE tokenizer family (Sennrich+ 2016): merge-pass
semantics (runs / overlap parity), learning on the paper's toy corpus,
learn/apply consistency, and a DuckDB replay of the REAL generated
oracle SQL over an in-memory ``documents`` table of adversarial texts
(symbol runs, unicode, tie-breaks) — branches the sf corpus may not
exercise."""

import duckdb
import pandas as pd
import pytest

from graphrag_rs_ray.functions.bpe import (
    END,
    apply_bpe,
    learn_bpe,
    merge_pass,
    word_symbols,
)


# ------------------------------------------------------------- kernels --

def test_merge_pass_basic_and_runs():
    assert merge_pass(["l", "o", "w", END], "l", "o") == ["lo", "w", END]
    # overlapping runs: left-to-right keeps even offsets
    assert merge_pass(["a", "a", "a", END], "a", "a") == ["aa", "a", END]
    assert merge_pass(["a"] * 4 + [END], "a", "a") == ["aa", "aa", END]
    assert merge_pass(["a"] * 5 + [END], "a", "a") == ["aa", "aa", "a", END]
    # no match / marker participation
    assert merge_pass(["x", "y", END], "a", "b") == ["x", "y", END]
    assert merge_pass(["t", END], "t", END) == ["t" + END]


def test_merge_pass_single_pass_is_complete():
    # a merged symbol can never seed another occurrence of the same pair
    out = merge_pass(["a", "b", "b", END], "a", "b")
    assert out == ["ab", "b", END]
    assert merge_pass(out, "a", "b") == out


def test_learn_bpe_toy_corpus():
    # the classic corpus from the paper (frequencies as word TYPES)
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(freqs, 4)
    # (e,s) count 9 wins round 1; then (es,t) 9; then (est,</w>) 9;
    # then (l,o) 7
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_learn_tie_breaks_lexicographic():
    # both pairs appear twice; ('a','b') < ('b','c')
    merges = learn_bpe([("abc", 1), ("abd", 1), ("xbc", 1)], 1)
    assert merges[0] == ("a", "b")


def test_apply_matches_learning_segmentation():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("aaaa", 4), ("aab", 2)]
    merges = learn_bpe(freqs, 8)
    # replaying merges in rank order must reproduce the learn-time segs
    segs = {w: word_symbols(w) for w, _ in freqs}
    for left, right in merges:
        for w in segs:
            segs[w] = merge_pass(segs[w], left, right)
    for w, _ in freqs:
        assert apply_bpe(w, merges) == segs[w]


def test_apply_oov_word():
    merges = learn_bpe([("low", 5), ("lower", 2)], 4)
    pieces = apply_bpe("lowest", merges)
    assert "".join(pieces) == "lowest" + END
    assert pieces[0].startswith("low") or pieces[0] == "l"


# ------------------------------------------- oracle replay (planted) --

PLANTED = [
    (1, "aaaa aaaa aab low low lower"),        # run-parity + ties
    (2, "newest widest newest café café!"),    # unicode + punct strip
    (3, "low, LOW? Low. zzz"),                 # case fold + strip
    (4, ""),                                   # empty doc
]


def _planted_con():
    con = duckdb.connect()
    df = pd.DataFrame(PLANTED, columns=["doc_id", "text"])
    con.register("df", df)
    con.execute("CREATE TABLE documents AS SELECT * FROM df")
    return con


def _tokenize_all():
    from graphrag_rs_ray.functions.textstats import lm_tokenize
    from collections import Counter
    c = Counter()
    per_doc = {}
    for did, t in PLANTED:
        toks = lm_tokenize(t)
        per_doc[did] = toks
        c.update(toks)
    return c, per_doc


@pytest.mark.parametrize("n_merges,max_types", [(6, 4), (10, 100)])
def test_oracle_sql_replay_planted(n_merges, max_types):
    import __ray_entry__ as e
    from graphrag_rs_ray.functions.bpe import apply_bpe, learn_bpe

    c, per_doc = _tokenize_all()
    freqs = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:max_types]
    merges = learn_bpe(freqs, n_merges)

    con = _planted_con()
    got = con.execute(e._bpe_merges_sql(n_merges, max_types)).fetchall()
    assert [(l, r) for _, l, r in got] == merges

    seg = dict(con.execute(
        "SELECT word, pieces FROM (" + e._bpe_segments_sql(
            n_merges, max_types) + ")").fetchall())
    assert set(seg) == set(c)
    for w in c:
        assert seg[w] == " ".join(apply_bpe(w, merges))

    stats = {d: (nw, np_) for d, nw, np_ in con.execute(
        e._bpe_token_stats_sql(n_merges, max_types)).fetchall()}
    for did, toks in per_doc.items():
        exp_np = sum(len(apply_bpe(w, merges)) for w in toks)
        assert stats[did] == (len(toks), exp_np)
    con.close()
