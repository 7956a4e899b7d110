from . import registry

__all__ = ["registry"]
