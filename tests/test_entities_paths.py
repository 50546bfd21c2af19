"""Lazy entities path ≡ build_kg entities; reference-schema adapter."""


def test_entities_dataset_matches_build_kg(ray_session):
    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.pipelines.kg import build_kg, entities_dataset
    from graphrag_rs_ray.sources.pages import pages_dataset

    cfg = KGConfig()
    lazy = (entities_dataset(pages_dataset(60, seed=13), cfg).to_pandas()
            .sort_values("entity_id").reset_index(drop=True))
    full = (build_kg(pages_dataset(60, seed=13), cfg).entities.to_pandas()
            .sort_values("entity_id").reset_index(drop=True))
    assert lazy.equals(full)


def test_reference_entity_schema_adapter(ray_session):
    from graphrag_rs_ray.config import KGConfig
    from graphrag_rs_ray.pipelines.kg import entities_dataset, to_reference_entity_schema
    from graphrag_rs_ray.sources.pages import pages_dataset

    ents = entities_dataset(pages_dataset(30, seed=13), KGConfig())
    ref = to_reference_entity_schema(ents).to_pandas()
    # persistence/parquet.rs:218-229 column names
    assert {"id", "name", "entity_type", "confidence", "mention_count"} <= set(ref.columns)
    assert len(ref) > 0
