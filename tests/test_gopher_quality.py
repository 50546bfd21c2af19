"""Gates for the Gopher quality filter (Rae+ 2021 §A1.1.2): one planted
violation per rule, a clean passing doc, and integer-count semantics
(symbol counting, bullet/ellipsis line detection, distinct stopwords)."""

import pyarrow as pa
import pytest

from graphrag_rs_ray.functions.textstats import gopher_keep, gopher_stats

# 60 words, mean len ~4.6, >80% alphabetic, has the/of/and/to stopwords
GOOD = ("the quick brown fox jumps over of lazy dog and then runs to the "
        "river bank where trees grow tall and birds sing songs of morning "
        "light while the sun rises over distant hills and children walk to "
        "school along quiet roads that wind through fields of golden wheat "
        "swaying gently in the warm summer breeze today")


def _k(text, **kw):
    return gopher_keep(gopher_stats(text), **kw)


def test_good_doc_passes():
    assert _k(GOOD)


def test_each_rule_rejects():
    assert not _k("too short with the and of stopwords here")  # < 50 words
    assert not _k(GOOD, max_words=55)                          # > max
    # mean word length > 10 (replace half the words with long tokens)
    assert not _k(" ".join(["supercalifragilistic"] * 60) + " the of")
    # mean word length < 3
    assert not _k(" ".join(["a"] * 58) + " the of")
    # symbol ratio >= 0.1: 8 '#' among 68 words (10*8 >= 68)
    assert not _k(GOOD + " # # # # # # # #")
    # bullet lines >= 90%: 10 lines, 9 bullets + GOOD on one line
    assert not _k("\n".join(["- b"] * 9 + [GOOD]))
    # ellipsis lines >= 30%
    assert not _k("\n".join([GOOD, "so...", "more...", "less…", "x"]))
    # < 80% words alphabetic (numbers)
    nums = " ".join(str(i) for i in range(20))
    assert not _k(GOOD + " " + nums)
    # < 2 distinct stopwords
    assert not _k(" ".join(["orbit", "comet", "nebula"] * 20))


def test_stats_counting_semantics():
    s = gopher_stats("ab #cd...ef....\n- one\n* two\n• three\nfour...\nfive…")
    assert s["n_sym"] == 1 + 3  # '#'; '...' in cd...ef, ....(once), four...
    assert s["n_lines"] == 6
    assert s["n_bullet_lines"] == 3
    assert s["n_ellipsis_lines"] == 3  # 'ef....', 'four...' and 'five…'
    t = gopher_stats("The THE the! of of to")
    assert t["n_stop_distinct"] == 3       # the/of/to, case-folded, distinct
    assert gopher_stats("")["n_words"] == 0
    assert gopher_stats("")["n_lines"] == 1


def test_pipeline_schema_and_keep(ray_session):
    import ray.data as rd
    from graphrag_rs_ray.pipelines import training_data as td

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([GOOD, "tiny doc"], pa.string())}))
    out = td.gopher_quality("/unused", docs_ds=ds).to_pandas()
    out = out.set_index("doc_id")
    assert bool(out.loc[1].keep) and not bool(out.loc[2].keep)
    assert out.loc[1].n_words == len(GOOD.split())
