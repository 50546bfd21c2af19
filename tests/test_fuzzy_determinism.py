"""Fuzzy-tier determinism: the blocked greedy clustering must produce
IDENTICAL links regardless of run, batch sizing, or input order — the
property SURVEY §2.6 demands ("deterministic under partitioning")."""

import pyarrow as pa


def _entities_ds(rows, batch_size):
    import ray.data as rd
    t = pa.table({
        "entity_id": pa.array([r[0] for r in rows], pa.string()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "type": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float32()),
        "mention_count": pa.array([1] * len(rows), pa.int64()),
    })
    return rd.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow",
                                        batch_size=batch_size)


ROWS = [
    ("PERSON_johnsmith", "John Smith", "PERSON", 0.9),
    ("PERSON_jonsmith", "Jon Smith", "PERSON", 0.7),
    ("PERSON_jhonsmith", "Jhon Smith", "PERSON", 0.6),
    ("PERSON_maryjones", "Mary Jones", "PERSON", 0.8),
    ("PERSON_marijones", "Mari Jones", "PERSON", 0.5),
    ("ORGANIZATION_acmeinc", "Acme Inc", "ORGANIZATION", 0.9),
    ("ORGANIZATION_acmeincx", "Acme Incx", "ORGANIZATION", 0.6),
    ("LOCATION_newyork", "New York", "LOCATION", 0.9),
    ("LOCATION_newyorkcity", "New York City", "LOCATION", 0.8),
]


def test_links_invariant_to_batching_and_order(ray_session):
    from graphrag_rs_ray.stages.linking import compute_links

    results = []
    for batch_size in (1, 3, 100):
        for rows in (ROWS, list(reversed(ROWS))):
            links = compute_links(_entities_ds(rows, batch_size))
            results.append(tuple(sorted(links.items())))
    assert len(set(results)) == 1, f"links varied: {set(results)}"
    links = dict(results[0])
    # typo variants collapse to the highest-confidence member
    assert links["PERSON_jonsmith"] == "PERSON_johnsmith"
    assert links["PERSON_jhonsmith"] == "PERSON_johnsmith"
    assert links["PERSON_marijones"] == "PERSON_maryjones"
    # no cross-type links ever
    for src, dst in links.items():
        assert src.split("_")[0] == dst.split("_")[0]


def test_embedding_scored_linking(ray_session):
    """Batched embedding refinement: links that share tokens survive
    (cosine of mean-pooled word vectors high); phonetic-only matches with
    disjoint tokens are rejected."""
    from graphrag_rs_ray.functions.similarity import LinkingConfig
    from graphrag_rs_ray.stages.linking import compute_links

    rows = ROWS + [
        ("PERSON_smith", "Smith", "PERSON", 0.9),
        ("PERSON_smyth", "Smyth", "PERSON", 0.6),   # phonetic match, no shared token
    ]
    cfg = LinkingConfig(use_phonetic=True)
    plain = compute_links(_entities_ds(rows, 50), cfg)
    refined = compute_links(_entities_ds(rows, 50), cfg, embedding_threshold=0.4)
    # string/phonetic tier links Smyth→Smith; embedding tier rejects it
    assert "PERSON_smyth" in plain
    assert "PERSON_smyth" not in refined
    # token-sharing typo variants survive refinement
    assert refined.get("PERSON_jonsmith") == "PERSON_johnsmith"
    assert refined == compute_links(_entities_ds(rows, 3), cfg, embedding_threshold=0.4)


def test_full_fuzzy_pipeline_deterministic(ray_session):
    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.pipelines.kg import build_kg
    from graphrag_rs_ray.sources.pages import pages_dataset

    outs = []
    for _ in range(2):
        res = build_kg(pages_dataset(80, seed=21), KGConfig(fuzzy_linking=True))
        ents = res.entities.to_pandas().sort_values("entity_id").reset_index(drop=True)
        tris = (res.triples.to_pandas()[["subj", "pred", "obj"]]
                .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
        outs.append((ents, tris, dict(res.links)))
    assert outs[0][0].equals(outs[1][0])
    assert outs[0][1].equals(outs[1][1])
    assert outs[0][2] == outs[1][2]


def test_fuzzy_broadcast_and_bucketed_paths_equal(ray_session):
    """link_broadcast_limit=0 forces the Dataset/bucketed-join remap
    (the web-scale path); entities and triples must match the broadcast
    path exactly."""
    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.pipelines.kg import build_kg
    from graphrag_rs_ray.sources.pages import pages_dataset

    def run(limit):
        res = build_kg(pages_dataset(80, seed=21),
                       KGConfig(fuzzy_linking=True,
                                link_broadcast_limit=limit))
        ents = (res.entities.to_pandas().sort_values("entity_id")
                .reset_index(drop=True))
        tris = (res.triples.to_pandas()
                .sort_values(["subj", "pred", "obj"])
                .reset_index(drop=True))
        return res, ents, tris

    fast_res, fast_e, fast_t = run(2_000_000)
    slow_res, slow_e, slow_t = run(0)
    assert fast_res.n_links > 0          # fixture must exercise linking
    assert slow_res.n_links == fast_res.n_links
    assert slow_res.links == {}          # scale path never collects
    assert fast_e.equals(slow_e)
    assert fast_t.equals(slow_t)
