from . import bank, checkpoint, sharding

__all__ = ["bank", "checkpoint", "sharding"]
