from . import joins, sinks, windows  # noqa: F401

__all__ = ["joins", "sinks", "windows"]
