"""Profiling / tracing hooks — the observability layer the reference lacks
(SURVEY.md §5: "jax.profiler traces + per-phase named scopes; steps/sec/chip
counters").

``ops.ukf`` annotates its phases with ``jax.named_scope`` so device traces
show sigma-point generation, propagation, mean/covariance reconstruction and
the update solve as separate rows. :func:`trace` wraps ``jax.profiler.trace``
for one-line capture; :class:`Throughput` is the steps/sec counter used by
``bench.py``-style harnesses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "Throughput", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int | None = None) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace of the enclosed block:

        with tracing.trace("/tmp/tb"):
            bank_step(state).block_until_ready()

    ``host_tracer_level`` (0-3) sets host-side trace verbosity via
    ``jax.profiler.ProfileOptions``; ``None`` keeps the profiler default.
    """
    kwargs = {}
    if host_tracer_level is not None:
        opts_cls = getattr(jax.profiler, "ProfileOptions", None)
        if opts_cls is None:  # pragma: no cover — older jax
            import warnings

            warnings.warn(
                "host_tracer_level ignored: this jax has no "
                "jax.profiler.ProfileOptions",
                RuntimeWarning,
                stacklevel=3,
            )
        else:
            opts = opts_cls()
            opts.host_tracer_level = host_tracer_level
            kwargs["profiler_options"] = opts
    with jax.profiler.trace(log_dir, **kwargs):
        yield


annotate = jax.named_scope  # re-export: with tracing.annotate("predict"): ...


class Throughput:
    """Steps/sec/chip counter with explicit device-sync boundaries."""

    def __init__(self):
        self._t0 = None
        self._steps = 0

    def start(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, n: int):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if self._t0 is None:
            raise RuntimeError("Throughput.rate() called before start()")
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")
