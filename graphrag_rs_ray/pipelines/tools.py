"""Batch agent-tool execution over the knowledge graph.

The reference executes one tool call at a time inside an agent loop
(``function_calling/agent.rs``); the engine-side reframing is a TABLE of
tool invocations flowing through ``map_batches`` with the knowledge
graph broadcast once (``ray.put``) — the shape an agent fleet's tool
traffic takes at scale.  Call tables are synthesized deterministically
from the graph's own entities (exact/partial/fuzzy/unknown names,
valid/invalid argument ranges) so every code path executes.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.toolcalls import (
    InferenceConfig,
    infer_relationships,
    tool_entity_expand,
    tool_get_entity_context,
    tool_graph_search,
    tool_relationship_traverse,
    validate_tool_args,
)


def build_tool_graph(entities_tbl: pa.Table, triples_tbl: pa.Table,
                     mentions_tbl: pa.Table,
                     chunks_tbl: pa.Table) -> dict:
    """Assemble the broadcast-side graph views with PINNED orders:
    entities (name, id) asc; relationships (source, type, target) asc
    with name→id endpoint resolution; chunks chunk_id asc with sorted
    entity-id lists; per-entity mention rows chunk_id asc."""
    entities = sorted(
        ({"entity_id": e, "name": n, "type": t, "conf": float(c),
          "mention_count": int(m)}
         for e, n, t, c, m in zip(
             entities_tbl.column("entity_id").to_pylist(),
             entities_tbl.column("name").to_pylist(),
             entities_tbl.column("type").to_pylist(),
             entities_tbl.column("conf").to_pylist(),
             entities_tbl.column("mention_count").to_pylist())),
        key=lambda e: (e["name"], e["entity_id"]))
    by_id = {e["entity_id"]: e for e in entities}

    # triple endpoints ARE entity ids (content-derived TYPE_name form,
    # stages/kg_extract.py) — filter to ids present in the entity table
    rels = sorted(
        ({"source": s, "target": o, "type": p, "conf": float(c)}
         for s, p, o, c in zip(triples_tbl.column("subj").to_pylist(),
                               triples_tbl.column("pred").to_pylist(),
                               triples_tbl.column("obj").to_pylist(),
                               triples_tbl.column("conf").to_pylist())
         if s in by_id and o in by_id),
        key=lambda r: (r["source"], r["type"], r["target"]))

    ents_by_chunk: dict[str, list] = {}
    mentions_by_entity: dict[str, list] = {}
    for ch, e, c in zip(mentions_tbl.column("chunk_id").to_pylist(),
                        mentions_tbl.column("entity_id").to_pylist(),
                        mentions_tbl.column("conf").to_pylist()):
        ents_by_chunk.setdefault(ch, []).append(e)
        mentions_by_entity.setdefault(e, []).append(
            {"chunk_id": ch, "conf": float(c)})
    for e in mentions_by_entity:
        mentions_by_entity[e].sort(key=lambda m: m["chunk_id"])

    chunks = sorted(
        ({"chunk_id": ch, "doc_id": d, "text": t,
          "entity_ids": sorted(ents_by_chunk.get(ch, [])),
          "entity_set": set(ents_by_chunk.get(ch, []))}
         for ch, d, t in zip(chunks_tbl.column("chunk_id").to_pylist(),
                             chunks_tbl.column("doc_id").to_pylist(),
                             chunks_tbl.column("text").to_pylist())),
        key=lambda c: c["chunk_id"])

    return {"entities": entities, "by_id": by_id, "rels": rels,
            "chunks": chunks, "mentions_by_entity": mentions_by_entity}


# ------------------------------------------------------- call tables --


def synthesize_search_calls(graph: dict) -> pa.Table:
    names = [e["name"] for e in graph["entities"][:6]]
    calls: list[tuple[str, int]] = []
    for n in names:
        calls.append((n, 10))                       # exact
        calls.append((n.split()[0], 3))             # partial/fuzzy, low limit
        calls.append((n.lower(), 10))               # exact via lowercase
    calls.append(("zzz qqq xx", 10))                # no match
    calls.append(("", 10))                          # empty name
    return pa.table({
        "call_id": pa.array(range(len(calls)), pa.int64()),
        "entity_name": pa.array([c[0] for c in calls], pa.string()),
        "limit_arg": pa.array([c[1] for c in calls], pa.int64()),
    })


def synthesize_expand_calls(graph: dict) -> pa.Table:
    ids = [e["entity_id"] for e in graph["entities"][:8]]
    ids.append("UNKNOWN_nope")
    return pa.table({
        "call_id": pa.array(range(len(ids)), pa.int64()),
        "entity_id": pa.array(ids, pa.string()),
        "limit_arg": pa.array([5] * (len(ids) - 1) + [5], pa.int64()),
    })


def synthesize_context_calls(graph: dict) -> pa.Table:
    ids = [e["entity_id"] for e in graph["entities"][:8]]
    ids.append("UNKNOWN_nope")
    return pa.table({
        "call_id": pa.array(range(len(ids)), pa.int64()),
        "entity_id": pa.array(ids, pa.string()),
        "limit_arg": pa.array([3] * len(ids), pa.int64()),
    })


def synthesize_validation_calls() -> pa.Table:
    rows = [
        ("graph_search", "Alice", "", "", "", 10, -1, -1, False),
        ("graph_search", "", "", "", "", 10, -1, -1, False),
        ("graph_search", "Alice", "", "", "", 0, -1, -1, False),
        ("graph_search", "Alice", "", "", "", 200, -1, -1, False),
        ("entity_expand", "", "PERSON_x", "", "", 20, 1, -1, False),
        ("entity_expand", "", "", "", "", 20, 1, -1, False),
        ("entity_expand", "", "PERSON_x", "", "", 20, 0, -1, False),
        ("entity_expand", "", "PERSON_x", "", "", 101, 2, -1, False),
        ("relationship_traverse", "", "", "A", "B", -1, -1, 3, False),
        ("relationship_traverse", "", "", "", "B", -1, -1, 3, False),
        ("relationship_traverse", "", "", "A", "", -1, -1, 3, False),
        ("relationship_traverse", "", "", "A", "B", -1, -1, 0, False),
        ("relationship_traverse", "", "", "A", "B", -1, -1, 3, True),
        ("get_entity_context", "", "PERSON_x", "", "", 5, -1, -1, False),
        ("get_entity_context", "", "", "", "", 5, -1, -1, False),
        ("get_entity_context", "", "PERSON_x", "", "", 51, -1, -1, False),
        ("infer_relationships", "Alice", "", "", "", -1, -1, -1, False),
        ("infer_relationships", "", "", "", "", -1, -1, -1, False),
    ]
    cols = list(zip(*rows))
    return pa.table({
        "call_id": pa.array(range(len(rows)), pa.int64()),
        "function": pa.array(cols[0], pa.string()),
        "entity_name": pa.array(cols[1], pa.string()),
        "entity_id": pa.array(cols[2], pa.string()),
        "source_entity": pa.array(cols[3], pa.string()),
        "target_entity": pa.array(cols[4], pa.string()),
        "limit_arg": pa.array(cols[5], pa.int64()),
        "depth": pa.array(cols[6], pa.int64()),
        "max_hops": pa.array(cols[7], pa.int64()),
        "bad_param": pa.array(cols[8], pa.bool_()),
    })


def synthesize_traverse_calls(graph: dict) -> pa.Table:
    ents = graph["entities"]
    pairs = []
    for i in range(min(6, len(ents) - 1)):
        pairs.append((ents[i]["name"], ents[i + 1]["name"], 3))
    if ents:
        pairs.append((ents[0]["name"], ents[0]["name"], 3))   # same node
        pairs.append((ents[0]["entity_id"], ents[-1]["name"], 2))  # by id
    pairs.append(("zzz qqq xx", "yyy www", 3))                 # not found
    return pa.table({
        "call_id": pa.array(range(len(pairs)), pa.int64()),
        "source_entity": pa.array([p[0] for p in pairs], pa.string()),
        "target_entity": pa.array([p[1] for p in pairs], pa.string()),
        "max_hops": pa.array([p[2] for p in pairs], pa.int64()),
    })


# ------------------------------------------------------------ stages --


def _broadcast(graph: dict):
    import ray
    return ray.put(graph)


def graph_search_stage(calls_ds, graph: dict):
    ref = _broadcast(graph)

    def run(t: pa.Table) -> pa.Table:
        import ray
        g = ray.get(ref)
        out = {k: [] for k in ("call_id", "rank", "id", "name", "type",
                               "confidence", "relevance_score",
                               "mentions_count")}
        for cid, name, lim in zip(t.column("call_id").to_pylist(),
                                  t.column("entity_name").to_pylist(),
                                  t.column("limit_arg").to_pylist()):
            rows = tool_graph_search(
                {"entity_name": name, "limit": int(lim)}, g)
            for rank, r in enumerate(rows, 1):
                out["call_id"].append(cid)
                out["rank"].append(rank)
                for k in ("id", "name", "type", "confidence",
                          "relevance_score", "mentions_count"):
                    out[k].append(r[k])
        return pa.table({
            "call_id": pa.array(out["call_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "id": pa.array(out["id"], pa.string()),
            "name": pa.array(out["name"], pa.string()),
            "type": pa.array(out["type"], pa.string()),
            "confidence": pa.array(
                [round(float(c), 6) for c in out["confidence"]],
                pa.float64()),
            "relevance_score": pa.array(out["relevance_score"],
                                        pa.float64()),
            "mentions_count": pa.array(out["mentions_count"], pa.int64()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")


def entity_expand_stage(calls_ds, graph: dict):
    ref = _broadcast(graph)

    def run(t: pa.Table) -> pa.Table:
        import ray
        g = ray.get(ref)
        out = {k: [] for k in ("call_id", "idx", "relationship_type",
                               "direction", "related_id", "related_name",
                               "related_type", "confidence", "error")}
        for cid, eid, lim in zip(t.column("call_id").to_pylist(),
                                 t.column("entity_id").to_pylist(),
                                 t.column("limit_arg").to_pylist()):
            res = tool_entity_expand({"entity_id": eid, "limit": int(lim)},
                                     g)
            if isinstance(res, str):
                out["call_id"].append(cid)
                out["idx"].append(-1)
                for k in ("relationship_type", "direction", "related_id",
                          "related_name", "related_type"):
                    out[k].append("")
                out["confidence"].append(0.0)
                out["error"].append(res)
                continue
            for i, r in enumerate(res):
                out["call_id"].append(cid)
                out["idx"].append(i)
                out["relationship_type"].append(r["relationship_type"])
                out["direction"].append(r["direction"])
                out["related_id"].append(r["related_id"])
                out["related_name"].append(r["related_name"])
                out["related_type"].append(r["related_type"])
                out["confidence"].append(round(float(r["confidence"]), 6))
                out["error"].append("")
        return pa.table({
            "call_id": pa.array(out["call_id"], pa.int64()),
            "idx": pa.array(out["idx"], pa.int64()),
            "relationship_type": pa.array(out["relationship_type"],
                                          pa.string()),
            "direction": pa.array(out["direction"], pa.string()),
            "related_id": pa.array(out["related_id"], pa.string()),
            "related_name": pa.array(out["related_name"], pa.string()),
            "related_type": pa.array(out["related_type"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
            "error": pa.array(out["error"], pa.string()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")


def entity_context_stage(calls_ds, graph: dict):
    ref = _broadcast(graph)

    def run(t: pa.Table) -> pa.Table:
        import ray
        g = ray.get(ref)
        out = {k: [] for k in ("call_id", "kind", "idx", "chunk_id",
                               "doc_id", "n_entities", "conf", "error")}

        def emit(cid, kind, idx, chunk_id="", doc_id="", n_entities=0,
                 conf=0.0, error=""):
            out["call_id"].append(cid)
            out["kind"].append(kind)
            out["idx"].append(idx)
            out["chunk_id"].append(chunk_id)
            out["doc_id"].append(doc_id)
            out["n_entities"].append(n_entities)
            out["conf"].append(conf)
            out["error"].append(error)

        for cid, eid, lim in zip(t.column("call_id").to_pylist(),
                                 t.column("entity_id").to_pylist(),
                                 t.column("limit_arg").to_pylist()):
            res = tool_get_entity_context(
                {"entity_id": eid, "limit": int(lim)}, g)
            if isinstance(res, str):
                emit(cid, "error", -1, error=res)
                continue
            for i, c in enumerate(res["chunks"]):
                emit(cid, "chunk", i, chunk_id=c["chunk_id"],
                     doc_id=c["doc_id"], n_entities=c["n_entities"])
            for i, m in enumerate(res["mentions"]):
                emit(cid, "mention", i, chunk_id=m["chunk_id"],
                     conf=round(float(m["conf"]), 6))
        return pa.table({
            "call_id": pa.array(out["call_id"], pa.int64()),
            "kind": pa.array(out["kind"], pa.string()),
            "idx": pa.array(out["idx"], pa.int64()),
            "chunk_id": pa.array(out["chunk_id"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "n_entities": pa.array(out["n_entities"], pa.int64()),
            "conf": pa.array(out["conf"], pa.float64()),
            "error": pa.array(out["error"], pa.string()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")


def validation_calls_stage(calls_ds):
    def run(t: pa.Table) -> pa.Table:
        errors = []
        for row in t.to_pylist():
            args: dict = {}
            if row["entity_name"]:
                args["entity_name"] = row["entity_name"]
            if row["entity_id"]:
                args["entity_id"] = row["entity_id"]
            if row["source_entity"]:
                args["source_entity"] = row["source_entity"]
            if row["target_entity"]:
                args["target_entity"] = row["target_entity"]
            if row["limit_arg"] >= 0:
                args["limit"] = row["limit_arg"]
            if row["depth"] >= 0:
                args["depth"] = row["depth"]
            if row["max_hops"] >= 0:
                args["max_hops"] = row["max_hops"]
            if row["bad_param"]:
                args["entity_id_1"] = "x"
            errors.append(validate_tool_args(row["function"], args))
        return pa.table({
            "call_id": t.column("call_id"),
            "function": t.column("function"),
            "error": pa.array(errors, pa.string()),
            "is_valid": pa.array([e == "" for e in errors], pa.bool_()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")


def traverse_stage(calls_ds, graph: dict):
    ref = _broadcast(graph)

    def run(t: pa.Table) -> pa.Table:
        import ray
        g = ray.get(ref)
        out = {k: [] for k in ("call_id", "path_idx", "path", "length",
                               "rel_types", "error")}
        for cid, s, d, mh in zip(t.column("call_id").to_pylist(),
                                 t.column("source_entity").to_pylist(),
                                 t.column("target_entity").to_pylist(),
                                 t.column("max_hops").to_pylist()):
            res = tool_relationship_traverse(
                {"source_entity": s, "target_entity": d,
                 "max_hops": int(mh)}, g)
            if isinstance(res, str):
                out["call_id"].append(cid)
                out["path_idx"].append(-1)
                out["path"].append("")
                out["length"].append(-1)
                out["rel_types"].append("")
                out["error"].append(res)
                continue
            if not res:
                out["call_id"].append(cid)
                out["path_idx"].append(-1)
                out["path"].append("")
                out["length"].append(0)
                out["rel_types"].append("")
                out["error"].append("no_path")
                continue
            for i, p in enumerate(res):
                out["call_id"].append(cid)
                out["path_idx"].append(i)
                out["path"].append("->".join(p["path"]))
                out["length"].append(p["length"])
                out["rel_types"].append(";".join(p["rel_types"]))
                out["error"].append("")
        return pa.table({
            "call_id": pa.array(out["call_id"], pa.int64()),
            "path_idx": pa.array(out["path_idx"], pa.int64()),
            "path": pa.array(out["path"], pa.string()),
            "length": pa.array(out["length"], pa.int64()),
            "rel_types": pa.array(out["rel_types"], pa.string()),
            "error": pa.array(out["error"], pa.string()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")


def infer_stage(calls_ds, graph: dict,
                cfg: InferenceConfig | None = None):
    from ..functions.toolcalls import resolver_find
    import ray

    cfg = cfg or InferenceConfig()
    ref = _broadcast(graph)

    def run(t: pa.Table) -> pa.Table:
        g = ray.get(ref)
        out = {k: [] for k in ("call_id", "rank", "target", "target_name",
                               "confidence", "evidence_count", "error")}
        for cid, name, rtype in zip(t.column("call_id").to_pylist(),
                                    t.column("entity_name").to_pylist(),
                                    t.column("relation_type").to_pylist()):
            ent = resolver_find(g["entities"], name)
            if ent is None:
                out["call_id"].append(cid)
                out["rank"].append(-1)
                out["target"].append("")
                out["target_name"].append("")
                out["confidence"].append(0.0)
                out["evidence_count"].append(0)
                out["error"].append(f"Entity '{name}' not found")
                continue
            for rank, r in enumerate(
                    infer_relationships(ent["entity_id"], rtype, g, cfg), 1):
                out["call_id"].append(cid)
                out["rank"].append(rank)
                out["target"].append(r["target"])
                out["target_name"].append(r["target_name"])
                out["confidence"].append(r["confidence"])
                out["evidence_count"].append(r["evidence_count"])
                out["error"].append("")
        return pa.table({
            "call_id": pa.array(out["call_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "target": pa.array(out["target"], pa.string()),
            "target_name": pa.array(out["target_name"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
            "evidence_count": pa.array(out["evidence_count"], pa.int64()),
            "error": pa.array(out["error"], pa.string()),
        })

    return calls_ds.map_batches(run, batch_format="pyarrow")
