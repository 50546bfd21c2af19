"""Caching subsystem vs reference semantics
(``caching/{cache_key,cache_config,stats,persistent,distributed,client,
warming}.rs``) — deterministic fake clocks throughout."""

import math

import pytest

from graphrag_rs_ray.state.cache import (
    CacheConfig,
    CacheKeyGenerator,
    CacheStatistics,
    CacheWarmer,
    CachedLLMClient,
    DistributedCache,
    EmbeddingCache,
    L1Cache,
    PersistentCache,
    WarmingConfig,
    _L2KV,
    _PREDEFINED_WARMING_QUERIES,
    cost_savings,
    efficiency_score,
    evaluate_health,
    memory_usage_human,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class EchoLLM:
    def __init__(self):
        self.calls = 0

    def generate_response(self, prompt: str) -> str:
        self.calls += 1
        return f"resp::{prompt}"


# ----------------------------------------------------------- keys --

def test_key_strategies_distinct_normalization():
    simple = CacheKeyGenerator("simple")
    content = CacheKeyGenerator("content_based")
    # whitespace normalization applies to all strategies
    assert simple.generate_key("a  b").key_hash == \
        simple.generate_key("a b").key_hash
    # content-based ignores punctuation + stop words
    k1 = content.generate_key("What is the cache?")
    k2 = content.generate_key("What is cache")
    assert k1.key_hash == k2.key_hash
    # but simple does not
    assert simple.generate_key("What is the cache?").key_hash != \
        simple.generate_key("What is cache").key_hash


def test_key_content_all_stopwords_keeps_original():
    content = CacheKeyGenerator("content_based")
    # every word is a stop word → filtered list empty → keep original
    k1 = content.generate_key("the and of")
    k2 = content.generate_key("the and of")
    assert k1.key_hash == k2.key_hash


def test_key_params_and_display():
    gen = CacheKeyGenerator("with_parameters")
    p1 = {"max_tokens": 100, "temperature": 0.7}
    p2 = {"max_tokens": 200, "temperature": 0.7}
    assert gen.generate_key("hi", p1).key_hash != \
        gen.generate_key("hi", p2).key_hash
    key = CacheKeyGenerator().generate_key("x" * 60, p1, "m1")
    assert key.display_key == "x" * 47 + "... | T:0.7 | M:m1"
    assert key.metadata["model"] == "m1"
    assert key.metadata["prompt_length"] == "60"


def test_key_model_name_only_in_content_based():
    cb = CacheKeyGenerator("content_based")
    assert cb.generate_key("q", None, "m1").key_hash != \
        cb.generate_key("q", None, "m2").key_hash
    simple = CacheKeyGenerator("simple")
    assert simple.generate_key("q", None, "m1").key_hash == \
        simple.generate_key("q", None, "m2").key_hash


# ---------------------------------------------------------- config --

def test_config_validation():
    CacheConfig().validate()
    with pytest.raises(ValueError, match="max_capacity"):
        CacheConfig(max_capacity=0).validate()
    with pytest.raises(ValueError, match="ttl_seconds"):
        CacheConfig(ttl_seconds=0).validate()
    with pytest.raises(ValueError, match="compression_threshold"):
        CacheConfig(enable_compression=True,
                    compression_threshold=0).validate()
    from graphrag_rs_ray.state.cache import PersistenceConfig
    with pytest.raises(ValueError, match="persistence directory"):
        CacheConfig(persistence=PersistenceConfig(
            enabled=True)).validate()


def test_config_presets():
    p = CacheConfig.production()
    assert p.max_capacity == 100_000 and p.ttl_seconds == 7200
    assert p.eviction_policy == "adaptive" and p.persistence.enabled
    d = CacheConfig.development()
    assert d.max_capacity == 1_000 and d.eviction_policy == "lru"
    h = CacheConfig.high_performance()
    assert h.eviction_policy == "lfu" and not h.enable_statistics


# ----------------------------------------------------------- stats --

def test_statistics_and_metrics():
    clock = FakeClock()
    s = CacheStatistics(clock=clock)
    s.record_miss()
    s.record_insertion(2048)
    s.record_hit(0.5)
    s.record_hit(1.5)
    m = s.snapshot()
    assert m["total_requests"] == 3
    assert m["hit_rate"] == 2 / 3
    assert m["avg_time_saved_per_hit"] == 1.0
    assert m["memory_usage_human"] == "2.0 KB"
    assert cost_savings(m, 0.01) == 0.02
    # efficiency: hit 2/3 · 0.4 + mem 1/(1+2)·0.3 + err 1·0.3
    assert math.isclose(efficiency_score(m),
                        (2 / 3) * 0.4 + (1 / 3) * 0.3 + 0.3)


def test_memory_human_units():
    assert memory_usage_human(512) == "512.0 B"
    assert memory_usage_human(1536) == "1.5 KB"
    assert memory_usage_human(3 * 1024 * 1024) == "3.0 MB"


def test_health_evaluate_rules():
    base = {"total_requests": 100, "cache_hits": 10, "cache_misses": 90,
            "hit_rate": 0.1, "errors": 0, "current_size": 10,
            "evictions": 0, "memory_usage_bytes": 0}
    h = evaluate_health(base, 1000)
    assert h["status"] == "critical"          # hit_rate < 0.2
    assert h["alerts"][0]["metric"] == "hit_rate"
    good = {"total_requests": 100, "cache_hits": 90, "cache_misses": 10,
            "hit_rate": 0.9, "errors": 0, "current_size": 10,
            "evictions": 0, "memory_usage_bytes": 0}
    h2 = evaluate_health(good, 1000)
    assert h2["status"] == "healthy"
    assert any("performing well" in r for r in h2["recommendations"])
    # high utilization → warning
    util = dict(good, current_size=920)
    assert evaluate_health(util, 1000)["status"] == "warning"
    # eviction rate > 0.3 → warning
    ev = dict(good, evictions=40)
    assert evaluate_health(ev, 1000)["status"] == "warning"


# ------------------------------------------------ persistent cache --

def test_persistent_cache_roundtrip(tmp_path):
    clock = FakeClock()
    c = PersistentCache(str(tmp_path / "c"), default_ttl=10.0,
                        clock=clock)
    assert c.get("k") is None
    c.put("k", {"v": 1})
    assert c.get("k") == {"v": 1}
    st = c.stats()
    assert st["hit_count"] == 1 and st["miss_count"] == 1
    # TTL expiry
    clock.t = 11.0
    assert c.get("k") is None
    assert c.stats()["entry_count"] == 0


def test_persistent_cache_overwrite_quirk(tmp_path):
    # the reference adds size + bumps entry_count on overwrite
    c = PersistentCache(str(tmp_path / "c"), clock=FakeClock())
    c.put("k", "aaaa")
    size1 = c.stats()["total_size"]
    c.put("k", "aaaa")
    assert c.stats()["entry_count"] == 2
    assert c.stats()["total_size"] == 2 * size1


def test_persistent_cache_lru_eviction(tmp_path):
    clock = FakeClock()
    c = PersistentCache(str(tmp_path / "c"), max_size_bytes=30,
                        eviction_policy="lru", clock=clock)
    c.put("a", "0123456789")          # 12 bytes json
    clock.t = 1.0
    c.put("b", "0123456789")
    clock.t = 2.0
    assert c.get("a") == "0123456789"  # refresh a's recency
    clock.t = 3.0
    c.put("c", "0123456789")           # evicts b (older last_accessed)
    assert c.get("b") is None
    assert c.get("a") == "0123456789"


def test_persistent_cache_compression_and_persistence(tmp_path):
    clock = FakeClock()
    d = str(tmp_path / "c")
    c = PersistentCache(d, enable_compression=True, clock=clock)
    c.put("k", "x" * 1000)
    assert c.get("k") == "x" * 1000
    # metadata survives re-open
    c2 = PersistentCache(d, enable_compression=True, clock=clock)
    assert c2.get("k") == "x" * 1000


def test_embedding_cache(tmp_path):
    e = EmbeddingCache(str(tmp_path / "emb"), clock=FakeClock())
    assert e.get_embedding("t") is None
    e.put_embedding("t", [0.1, 0.2])
    assert e.get_embedding("t") == [0.1, 0.2]


# ----------------------------------------------- distributed cache --

def test_l1_capacity_eviction():
    clock = FakeClock()
    l1 = L1Cache(2, clock=clock)
    l1.put("a", 1)
    clock.t = 1.0
    l1.put("b", 2)
    clock.t = 2.0
    assert l1.get("a") == 1            # a becomes most recent
    clock.t = 3.0
    l1.put("c", 3)                     # evicts b
    assert l1.get("b") is None
    assert l1.get("a") == 1 and l1.get("c") == 3
    # existing key overwrite does not evict
    l1.put("a", 10)
    assert l1.size() == 2


def test_l1_ttl_expiry():
    clock = FakeClock()
    l1 = L1Cache(10, default_ttl=5.0, clock=clock)
    l1.put("a", 1)
    clock.t = 6.0
    assert l1.get("a") is None


def test_distributed_l1_l2_flow():
    clock = FakeClock()
    dc = DistributedCache(2, l2=_L2KV(), clock=clock)
    dc.put("k", {"x": 1})
    assert dc.get("k") == {"x": 1}
    assert dc.stats()["l1_hits"] == 1
    # evict from L1, still served from L2 with backfill
    dc.l1.clear()
    assert dc.get("k") == {"x": 1}
    s = dc.stats()
    assert s["l2_hits"] == 1 and s["l1_misses"] == 1
    assert dc.l1.get("k") == {"x": 1}  # backfilled
    dc.invalidate("k")
    assert dc.get("k") is None
    assert dc.stats()["l2_misses"] == 1


def test_distributed_l2_actor(ray_session):
    from graphrag_rs_ray.state.cache import _ActorL2, make_l2_actor
    dc = DistributedCache(1, l2=_ActorL2(make_l2_actor()),
                          clock=FakeClock())
    dc.put("a", [1, 2])
    dc.put("b", [3])                   # evicts a from the 1-slot L1
    assert dc.get("a") == [1, 2]       # recovered from the actor tier
    assert dc.stats()["l2_hits"] == 1


# -------------------------------------------------------- client --

def test_cached_client_hit_miss_stats():
    clock = FakeClock()
    llm = EchoLLM()
    client = CachedLLMClient(llm, clock=clock)
    r1 = client.complete("hello world")
    r2 = client.complete("hello   world")   # ws-normalized → same key
    assert r1 == r2 == "resp::hello world"
    assert llm.calls == 1
    m = client.cache_statistics()
    assert m["cache_hits"] == 1 and m["cache_misses"] == 1
    assert m["insertions"] == 1
    assert client.is_cached("hello world")
    client.invalidate("hello world")
    assert not client.is_cached("hello world")


def test_cached_client_size_limit_error():
    client = CachedLLMClient(EchoLLM(),
                             CacheConfig(max_entry_size=5),
                             clock=FakeClock())
    with pytest.raises(ValueError, match="exceeds maximum"):
        client.complete("long prompt")
    assert client.cache_statistics()["errors"] == 1


def test_cached_client_ttl_expiry():
    clock = FakeClock()
    client = CachedLLMClient(
        EchoLLM(), CacheConfig(ttl_seconds=10,
                               cleanup_interval_seconds=100),
        clock=clock)
    client.complete("q")
    clock.t = 11.0
    client.complete("q")               # expired → miss
    assert client.cache_statistics()["cache_misses"] == 2


# -------------------------------------------------------- warming --

def test_warming_config_defaults_and_validation():
    # warming.rs:121-139
    cfg = WarmingConfig()
    assert cfg.strategy == "predefined" and cfg.max_queries == 50
    with pytest.raises(ValueError, match="max_queries"):
        WarmingConfig(max_queries=0).validate()
    with pytest.raises(ValueError, match="custom_queries"):
        WarmingConfig(strategy="custom").validate()


def test_warming_strategies():
    assert len(_PREDEFINED_WARMING_QUERIES) == 50
    w = CacheWarmer(WarmingConfig(strategy="synthetic", max_queries=12))
    qs = w.generate_warming_queries()
    assert len(qs) == 12 and qs[0] == "What is artificial intelligence?"
    f = CacheWarmer(WarmingConfig(strategy="frequency", max_queries=50))
    assert len(f.generate_warming_queries()) == 20   # min(max, 20)
    c = CacheWarmer(WarmingConfig(strategy="custom",
                                  custom_queries=["q1"]))
    assert c.generate_warming_queries() == ["q1"]


def test_warm_cache_flow():
    clock = FakeClock()
    client = CachedLLMClient(EchoLLM(), clock=clock)
    client.complete("What is artificial intelligence?")  # pre-cache one
    w = CacheWarmer(WarmingConfig(max_queries=5,
                                  delay_between_requests=0.0))
    results = w.warm_cache(client)
    assert results["successful_queries"] == 5
    assert results["cache_hits"] == 1 and results["cache_misses"] == 4
    assert results["cache_hit_rate"] == 0.2


def test_warm_cache_error_budget():
    class FailLLM:
        def generate_response(self, prompt):
            raise RuntimeError("boom")

    client = CachedLLMClient(FailLLM(), clock=FakeClock())
    w = CacheWarmer(WarmingConfig(max_queries=10, max_errors=3,
                                  delay_between_requests=0.0))
    with pytest.raises(RuntimeError, match="Too many errors"):
        w.warm_cache(client)
