"""Gates for the hashing-trick quality classifier: kernel determinism,
the trained-weights override path (the production shape), and planted
keep/drop branches via a DuckDB replay of the real oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from graphrag_rs_ray.functions.quality_clf import (
    N_BUCKETS,
    default_weight,
    doc_logit,
    token_bucket,
)


def test_kernel_determinism_and_range():
    assert token_bucket("hello") == token_bucket("hello")
    assert 0 <= token_bucket("hello") < N_BUCKETS
    for b in (0, 1, 65535):
        assert -1000 <= default_weight(b) <= 1000
    n, s = doc_logit(["hello", "world", "hello"])
    assert n == 3
    assert s == 2 * default_weight(token_bucket("hello")) + \
        default_weight(token_bucket("world"))


def test_trained_weights_override():
    w = np.zeros(N_BUCKETS, dtype=np.int64)
    w[token_bucket("good")] = 5
    w[token_bucket("bad")] = -3
    assert doc_logit(["good", "good", "bad"], weights=w) == (3, 7)
    assert doc_logit([], weights=w) == (0, 0)


def test_oracle_replay_planted():
    import __ray_entry__ as e

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Hello, WORLD! hello", "", "zzz qqq zzz"],
    })
    con = duckdb.connect()
    con.register("df", docs)
    con.execute("CREATE TABLE documents AS SELECT * FROM df")
    got = {r[0]: r[1:] for r in con.execute(
        e._quality_classifier_sql()).fetchall()}
    con.close()

    from graphrag_rs_ray.functions.textstats import lm_tokenize
    for did, text in zip(docs["doc_id"], docs["text"]):
        n, s = doc_logit(lm_tokenize(text))
        assert got[did] == (n, s, s > 0)
