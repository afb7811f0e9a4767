from . import config, delayed_states, metrics, tracing, validation

__all__ = ["config", "delayed_states", "metrics", "tracing", "validation"]
