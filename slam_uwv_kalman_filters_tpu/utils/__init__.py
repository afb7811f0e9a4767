from . import config, delayed_states, metrics, validation

__all__ = ["config", "delayed_states", "metrics", "validation"]
