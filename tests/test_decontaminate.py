"""Gates for eval-set decontamination: deterministic eval split, shingle
overlap detection, distinct counting, short-doc edge."""

import pyarrow as pa

EVAL_TEXT = ("the standardized benchmark question asks which river flows "
             "through the capital city of the ancient empire region")
QUOTE = ("intro words then the standardized benchmark question asks which "
         "river flows through unrelated tail content here")  # 8-token quote
CLEAN = ("completely different content about cooking recipes with garlic "
         "butter and fresh rosemary over charcoal flame tonight")


def _ds(texts: dict[int, str]):
    import ray.data as rd
    ids = sorted(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))


def test_overlap_flags(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    texts = {107: EVAL_TEXT, 1: QUOTE, 2: CLEAN, 3: "short doc"}
    out = (td.decontaminate("/unused", docs_ds=_ds(texts))
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[107].is_eval) and bool(out.loc[107].contaminated)
    assert not bool(out.loc[1].is_eval) and bool(out.loc[1].contaminated)
    assert out.loc[1].n_overlap >= 1
    assert not bool(out.loc[2].contaminated)
    assert out.loc[3].n_shingles == 0 and not bool(out.loc[3].contaminated)
    # distinct-shingle counting: n_overlap never exceeds n_shingles
    assert (out.n_overlap <= out.n_shingles).all()


def test_no_eval_docs(ray_session):
    """Empty eval split => nothing is contaminated."""
    from graphrag_rs_ray.pipelines import training_data as td

    texts = {1: EVAL_TEXT, 2: QUOTE}  # neither id % 100 == 7
    out = td.decontaminate("/unused", docs_ds=_ds(texts)).to_pandas()
    assert not out.contaminated.any()
    assert not out.is_eval.any()
