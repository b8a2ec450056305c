from . import cpu  # noqa: F401

__all__ = ["cpu"]
