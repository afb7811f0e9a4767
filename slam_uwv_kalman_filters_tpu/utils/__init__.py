from . import config, validation

__all__ = ["config", "validation"]
