from . import bank, checkpoint, failover, sharding

__all__ = ["bank", "checkpoint", "failover", "sharding"]
