"""Ahead-of-time exported filter steps — no tracing at mission start.

A 100 Hz online estimator host cannot absorb tens of seconds of jit at
mission start (measured ~20-30 s per step shape on the remote-compile TPU
backend, bench.py ``online_*.compile_s``). ``jax.export`` serializes the
traced-and-lowered StableHLO of a jitted step to bytes once, at integration
time; the vehicle host deserializes and calls it with no Python tracing/
lowering and none of the model code in the loop — measured on the fused
whole-step kernel: a 345 kB artifact whose first call costs 12.8 s (the
backend StableHLO→TPU compile only) vs ~25 s for the full jit path, with
bit-identical outputs. Pair with ``jax_compilation_cache_dir`` to also
eliminate the backend compile across process restarts — together they give
a cold mission start with zero compilation.

The reference has no analogue (a C++ library is its own AOT artifact); this
is the TPU-native equivalent of shipping the compiled shared object.

Notes:

* An export is specific to the platform it was lowered for (cpu/tpu) and to
  the argument shapes/dtypes — export per deployment configuration.
* The fused Pallas steps lower to the ``tpu_custom_call`` custom call, which
  is not on jax.export's forward-compatibility allowlist; exporting them is
  supported behind ``allow_tpu_kernels=True``, which pins the artifact to
  the producing jax/Mosaic version (fine for the ship-one-image deployment
  this serves; re-export on upgrade).
* NamedTuple pytrees (filter states, ``PoseInputs``) serialize through
  ``jax.export.register_namedtuple_serialization`` — :func:`export_step`
  registers any NamedTuple classes it encounters automatically.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax import export as jexport

__all__ = ["export_step", "serialize", "deserialize", "save", "load"]


def _register_namedtuples(tree: Any) -> None:
    """Register every NamedTuple class appearing in ``tree`` for export
    serialization (idempotent; named by their import path)."""
    seen = set()

    def walk(x):
        cls = type(x)
        if isinstance(x, tuple) and hasattr(cls, "_fields") and cls not in seen:
            seen.add(cls)
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=f"{cls.__module__}.{cls.__qualname__}"
                )
            except ValueError:
                pass  # already registered
            for child in x:
                walk(child)
        elif isinstance(x, (tuple, list)):
            for child in x:
                walk(child)
        elif isinstance(x, dict):
            for child in x.values():
                walk(child)

    walk(tree)


def export_step(
    fn: Callable,
    *example_args: Any,
    allow_tpu_kernels: bool = False,
) -> jexport.Exported:
    """Trace + lower ``fn`` (jitted automatically if it is not already) for
    the current default platform at ``example_args``'s shapes and return the
    ``Exported`` artifact. ``allow_tpu_kernels=True`` permits the fused
    Pallas steps' ``tpu_custom_call`` (see module notes)."""
    _register_namedtuples(example_args)
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {}
    if allow_tpu_kernels:
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    return jexport.export(jitted, **kwargs)(*example_args)


def serialize(exported: jexport.Exported) -> bytes:
    return bytes(exported.serialize())


def deserialize(blob: bytes) -> Callable:
    """Bytes → a callable running the pre-compiled step (no tracing)."""
    exported = jexport.deserialize(blob)
    return exported.call


def save(path: str, exported: jexport.Exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load(path: str) -> Callable:
    with open(path, "rb") as f:
        return deserialize(f.read())
