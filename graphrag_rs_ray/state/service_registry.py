"""Type-keyed dependency-injection registry — port of
``graphrag-core/src/core/registry.rs`` (``ServiceRegistry`` storing one
service instance per TYPE, ``RegistryBuilder`` with the named slots).

The reference keys the map by ``TypeId`` — this port keys by the
service's ``type`` object; ``get`` on a missing type raises with the
reference's message shape.  The named builder slots
(storage/embedder/vector_store/entity_extractor/retriever/
language_model/graph_store/function_registry/metrics_collector/
serializer) are all sugar over ``with_service`` in the reference —
same here.  ``with_test_defaults`` seeds the repo's in-memory
workspace equivalent."""

from __future__ import annotations


class ServiceRegistry:
    """``core/registry.rs:16-93``."""

    def __init__(self):
        self._services: dict[type, object] = {}

    def register(self, service: object):
        self._services[type(service)] = service

    def get(self, service_type: type):
        svc = self._services.get(service_type)
        if svc is None:
            raise KeyError(
                f"Service not found: {service_type.__name__}")
        return svc

    def has(self, service_type: type) -> bool:
        return service_type in self._services

    def remove(self, service_type: type):
        return self._services.pop(service_type, None)

    def __len__(self) -> int:
        return len(self._services)

    def is_empty(self) -> bool:
        return not self._services

    def clear(self):
        self._services.clear()


class RegistryBuilder:
    """``core/registry.rs:97-258`` — every named slot delegates to
    ``with_service``."""

    def __init__(self):
        self.registry = ServiceRegistry()

    def with_service(self, service: object) -> "RegistryBuilder":
        self.registry.register(service)
        return self

    # named slots (sugar in the reference too)
    with_storage = with_service
    with_embedder = with_service
    with_vector_store = with_service
    with_entity_extractor = with_service
    with_retriever = with_service
    with_language_model = with_service
    with_graph_store = with_service
    with_function_registry = with_service
    with_metrics_collector = with_service
    with_serializer = with_service

    def build(self) -> ServiceRegistry:
        return self.registry

    @staticmethod
    def with_test_defaults() -> "RegistryBuilder":
        """``:249-255`` — memory storage seed; the repo's in-memory
        equivalent is the Workspace."""
        from .workspace import WorkspaceManager
        return RegistryBuilder().with_storage(
            WorkspaceManager("/tmp/graft_registry_ws"))


__all__ = ["ServiceRegistry", "RegistryBuilder"]
