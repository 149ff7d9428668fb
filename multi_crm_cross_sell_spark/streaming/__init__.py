from . import sinks, windows  # noqa: F401

__all__ = ["sinks", "windows"]
