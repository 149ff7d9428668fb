from . import dedup  # noqa: F401

__all__ = ["dedup"]
