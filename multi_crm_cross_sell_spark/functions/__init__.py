from . import features, hashing, similarity, text  # noqa: F401

__all__ = ["features", "hashing", "similarity", "text"]
