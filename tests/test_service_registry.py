"""Service registry vs ``core/registry.rs`` tests (:359-413)."""

import pytest

from graphrag_rs_ray.state.service_registry import (
    RegistryBuilder,
    ServiceRegistry,
)


class TestService:
    def __init__(self, value):
        self.value = value


class OtherService:
    pass


def test_registry_basic_operations():
    # :359-376
    r = ServiceRegistry()
    assert r.is_empty()
    r.register(TestService("test"))
    assert r.has(TestService)
    assert len(r) == 1
    assert r.get(TestService).value == "test"
    removed = r.remove(TestService)
    assert removed.value == "test"
    assert not r.has(TestService)
    assert r.is_empty()


def test_registry_missing_service_errors():
    r = ServiceRegistry()
    with pytest.raises(KeyError, match="Service not found: TestService"):
        r.get(TestService)
    assert r.remove(TestService) is None


def test_registry_one_instance_per_type():
    r = ServiceRegistry()
    r.register(TestService("a"))
    r.register(TestService("b"))      # TypeId key → replaces
    assert len(r) == 1
    assert r.get(TestService).value == "b"
    r.register(OtherService())
    assert len(r) == 2
    r.clear()
    assert r.is_empty()


def test_registry_builder():
    # :378-390 — named slots are with_service sugar
    reg = (RegistryBuilder()
           .with_service(TestService("builder"))
           .with_embedder(OtherService())
           .build())
    assert reg.has(TestService)
    assert reg.get(TestService).value == "builder"
    assert reg.has(OtherService)


def test_test_defaults_seed_storage():
    from graphrag_rs_ray.state.workspace import WorkspaceManager
    reg = RegistryBuilder.with_test_defaults().build()
    assert reg.has(WorkspaceManager)
