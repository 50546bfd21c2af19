"""Driver-style parity gate: run every queries() entry at sf0.001 and,
where an oracle exists, compare against DuckDB (sorted columns, sorted
rows, exact values with float tolerance 0 — the driver hashes values, so
anything failing here would fail there)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(result):
    import ray.data as rd
    import pyarrow as pa
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = [
    "exact_dedup", "doc_fingerprints", "token_stats", "language_id",
    "quality_scores", "bm25_df", "bm25_corpus_stats", "knn_bruteforce",
    "cosine_dup_pairs", "windowed_event_counts", "tfidf_topk",
    "bm25_scores", "sentence_stats", "orders_by_segment", "top_parts_by_size",
    "temporal_edges", "text_clean", "session_windows",
    "sliding_window_counts", "order_priority_revenue", "purchases_asof_click",
    "shipped_within_window", "customers_with_orders", "bm25_topk",
    # staged-input oracles (query fn stages its procedural input; the
    # oracle SQL reads the staged Parquet — paths baked for the driver's
    # sf0.01 run, rewritten here for the sf0.001 test corpus)
    "kg_triples", "kg_entities", "entity_to_chunks", "chunk_to_entities",
    "co_occurring_entities", "concept_table", "concept_edges",
    "incremental_update", "semantic_edges",
    # LSH-blocked near-dup at effectively-exact recall settings
    "cosine_dup_pairs_bucketed",
    # graph ops over staged triples
    "k_hop", "degree_stats",
    # staged band rows / ranking lists
    "minhash_lsh_candidates", "hybrid_search",
    # temporal validity-interval snapshot (plain view oracle)
    "temporal_snapshot",
    # fuzzy remap+merge over staged exact entities + links
    "kg_entities_fuzzy",
    # fixed-iteration PageRank (generated per-iteration SQL) + CC closure
    "pagerank", "connected_components",
    # staged-input near-dup/ANN oracles: plane matrix → sign-packing,
    # vocab hashes → vote/pack, candidate pairs → trigram Jaccard,
    # inverted lists + probes → within-lists cosine top-k
    "lsh_buckets", "simhash_signatures", "ngram_dedup_pairs", "ivf_topk",
    # transitive near-dup clustering (verified pairs → recursive-CTE
    # closure → min-member representative + sizes + keep flag)
    "dedup_clusters",
    # simhash banding → candidates → bit_count(xor) Hamming verify
    "simhash_dup_pairs",
    # end-to-end webtext curation (quality gates → exact dedup →
    # LSH near-dedup with the drop-larger-id rule); bands staged
    "corpus_curation",
    # per-shard HNSW pools → exact within-candidates rerank
    "hnsw_topk",
    # ConsistencyReport counts over staged (corrupted) entities + triples
    "consistency_report",
    # RAPTOR tree structure re-derived arithmetically from staged leaf ids
    "doc_tree",
    # triangle enumeration (3-way self-join) + one-row graph statistics
    "triangle_counts", "graph_statistics",
    # all-pairs-distance centrality on the bounded 2-hop subgraph
    "centrality",
    # weighted Dijkstra SSSP (generated Bellman-Ford rounds) + bounded
    # simple-path enumeration (recursive CTE w/ visited check)
    "shortest_paths", "all_paths",
    # video frame-sampling explosion structure (staged media rows)
    "frame_samples",
    # cross-encoder rerank (pure-SQL relevance arithmetic over documents)
    "rerank_topk",
    # HippoRAG PPR retrieval (staged facts/pairs/scores/edges → replayed
    # weight + personalized-PageRank recurrence)
    "hipporag_retrieval",
    # four-phase pipeline validation report over staged corrupted tables
    "pipeline_validation",
    # ROGRAG batch query processing (oracle SQL generated from the same
    # pattern specs as the Python kernels)
    "query_intents", "query_decomposition", "logic_forms",
    "query_validation", "fuzzy_matches",
    # adaptive complexity routing + query rewriting (query/ module)
    "query_routing", "query_rewrite",
    # LightRAG dual-level keywords (fallback path) + retrieval merges
    "dual_keywords", "dual_retrieval",
    # batch agent-tool execution (search/expand/context/validation)
    "tool_graph_search", "tool_entity_expand", "tool_entity_context",
    "tool_validation",
    # ROGRAG quality metrics (per-response scoring + corpus report)
    "response_quality", "quality_report",
    # logic-form execution against the KG (bindings + answer)
    "logic_bindings",
    # traversal slice (ego / multi-source BFS / query-focused subgraph)
    "ego_network", "multi_source_bfs", "query_focused_subgraph",
    # real RDF/Turtle/GraphML import (SQL re-parses the same staged raw
    # lines; the turtle oracle re-derives the prefix expansion too)
    "rdf_import", "turtle_import", "graphml_import",
    # fast-GraphRAG PageRank retrieval (vector sim → PPR → expansion)
    "pagerank_retrieval",
    # rule-based query optimizer (cost model + join reordering)
    "query_plans",
    # hybrid retrieval: 4 fusion methods over sem+kw shortlists
    "hybrid_fusion",
    # enriched metadata-aware retrieval (boost stack over chunk metadata)
    "enriched_search",
    # adaptive strategy selection (type-weighted cross-strategy fusion)
    "adaptive_fusion",
    # semantic entity merging (pair sims; group decisions + merged rows)
    "semantic_merge_pairs", "semantic_merge_groups",
    # cross-document entity linking (hybrid clusters + stats)
    "entity_clusters", "entity_linking_stats",
    # string-similarity linker (pair metrics incl. recursive-CTE Jaro
    # replay; greedy links re-verified + canonical re-derived)
    "string_sim_pairs", "string_links",
    # answer generation (full MockLLM + generator replay incl. citation
    # md5)
    "generated_answers",
    # LazyGraphRAG pipeline (chunker arithmetic; end-to-end stats)
    "lazy_chunks", "lazy_pipeline_stats",
    # function-calling agent planner + query analyzer
    "agent_plans", "query_analysis",
    # ROGRAG response synthesis/templates (full string replay)
    "rograg_responses",
    # concept extraction replayed in SQL from staged chunk texts
    "concept_mentions",
    # rule-engine NER replayed in SQL (dictionary/regex positions via
    # split-cumsum, contextual windows, recursive-CTE greedy overlaps)
    "ner_mentions",
    # DocumentTree::query relevance scoring over staged tree nodes
    "doc_tree_search",
    # text analysis (TextStats; section-number extraction + roman eval)
    "text_statistics", "section_numbers",
    # community summary strings re-assembled from staged (node, community,
    # entity-metadata) rows
    "community_summaries",
    # RAPTOR trees incl. summaries: structure arithmetic + node content
    # re-joined from staged leaf texts + the FULL extractive-summarizer
    # replay (_summarizer_sql: scoring + recursive-CTE greedy selection)
    "doc_tree_summaries",
    # chunk enrichment: section walk + degenerate TF-IDF keywords +
    # summarizer replay + position arithmetic
    "enriched_chunks",
    # HTML tag-strip automaton as two regex passes over staged sanitized
    # pages
    "kg_extract_text",
    # the FULL hierarchical chunker as a recursive CTE over start
    # positions (separator-priority rfinds, quarter gate, overlap
    # back-off, min-size trim gate)
    "kg_chunks",
    # fake-codec decode arithmetic re-derived from staged blake2b digests
    "multimodal_features",
    # semantic chunker: staged sentences+distances; percentile threshold,
    # breakpoint flags and segment assembly replayed in SQL
    "semantic_chunks",
    # gleaning: staged per-round parse stream; sequential entity-merge
    # fold, first-wins rel dedup, name->id resolution replayed in SQL
    "gleaning_triples",
    # the ENTIRE 4-phase pattern extractor: greedy person phases as
    # recursive CTEs over word indices, org/location scans, dedup +
    # mention counts
    "kg_mentions",
    # the WHOLE infer_relationships tool: 3-phase resolution (fuzzy
    # quirks incl. byte-maxlen levenshtein), word-distance proximity,
    # 44 pattern weights with context windows, family damper,
    # normalization + threshold + top-10 (round-8 confidence device)
    "tool_infer",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e
    ray_df = _normalize(_to_pandas(e.queries()[name](SF_DIR)))
    con = _duck()
    sql = e.oracle_sql()[name].replace("/sf0.01/", "/sf0.001/")
    oracle_df = _normalize(con.execute(sql).df())
    con.close()
    assert list(ray_df.columns) == list(oracle_df.columns), \
        f"{name}: columns {list(ray_df.columns)} != {list(oracle_df.columns)}"
    assert len(ray_df) == len(oracle_df), \
        f"{name}: rows {len(ray_df)} != {len(oracle_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c], oracle_df[c]
        if np.issubdtype(a.dtype, np.floating):
            assert np.allclose(a.to_numpy().astype(float), b.to_numpy().astype(float),
                               atol=0, rtol=0), \
                f"{name}.{c}: float mismatch (driver hashes exact values)"
        else:
            # NaN/NaT-aware exact compare (nulls on both sides are equal)
            assert a.reset_index(drop=True).equals(
                b.astype(a.dtype).reset_index(drop=True)), \
                f"{name}.{c}: value mismatch"


ROWS_ONLY = ["agent_sessions",
             "chunk_embeddings",
             "communities"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    import __ray_entry__ as e
    df = _to_pandas(e.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
    if name == "chunk_embeddings":
        assert len(df) > 0, f"{name} unexpectedly empty"


def test_entry_runs(ray_session):
    import __ray_entry__ as e
    ds = e.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert {"subj", "pred", "obj", "conf"} <= set(df.columns)
