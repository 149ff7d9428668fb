from . import ensemble, entity_resolution, evaluate  # noqa: F401

__all__ = ["ensemble", "entity_resolution", "evaluate"]
