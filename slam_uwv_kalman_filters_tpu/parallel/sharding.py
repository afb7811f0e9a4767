"""Multi-host sharding of filter banks over TPU meshes.

SURVEY.md §2.4: the bank axis is embarrassingly parallel, so the natural
mapping is a 1-D ``bank`` mesh axis spanning the pod slice — per-instance
steps run with zero communication, and XLA inserts collectives (psum over ICI
within a slice, DCN across slices) only at the ensemble-statistics reduction
points exposed here. This is the TPU-native replacement for the comm backend
the reference never had (it ran one filter per process).

Design notes (jax-ml.github.io/scaling-book recipe): pick a mesh, annotate
shardings on the inputs, let XLA propagate and insert collectives, profile.
There is no model/tensor axis worth sharding for 53-DOF filters — one
instance's 107×53 sigma work is far below a chip's MXU granularity, so
intra-filter parallelism stays *within* a chip (batched matmuls) and
cross-chip scaling is pure DP over the bank. A second mesh axis would only
add latency.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_multihost",
    "make_mesh",
    "bank_sharding",
    "shard_bank",
    "replicated",
    "ensemble_mean",
    "ensemble_moments",
    "acceptance_rate",
    "with_bank_constraint",
    "bank_shard_map",
]

BANK_AXIS = "bank"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-host process group — the TPU-native comm-backend
    bootstrap (the NCCL/MPI-init analogue the reference never had, SURVEY.md
    §2.4). On Cloud TPU pod slices all arguments are auto-detected from the
    environment; on other clusters pass them explicitly. After this,
    ``jax.devices()`` spans every chip in the slice, ``make_mesh()`` builds
    the global 1-D bank mesh, and the per-host shard of a bank is addressed
    with ``jax.process_index()``. Returns the process index. Idempotent."""
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return jax.process_index()
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        # a failed bootstrap on a REAL pod must fail LOUDLY: silently
        # continuing leaves each host computing an independent full bank with
        # locally-correct-looking results (all reporting process_index 0, so
        # sharded checkpoints on shared storage overwrite each other)
        if explicit or _env_is_multihost():
            raise
        # nothing requested and the environment shows a single worker — a
        # 1-host "pod"; single-process jax needs no process group
        import warnings

        warnings.warn(
            "jax.distributed.initialize failed and no multi-host environment "
            "was detected; continuing single-process. Pass coordinator_address/"
            "num_processes/process_id explicitly if this IS a multi-host job.",
            RuntimeWarning,
            stacklevel=2,
        )
    return jax.process_index()


def _env_is_multihost() -> bool:
    """Cloud TPU environment markers of a >1-worker slice (what jax's cluster
    auto-detection keys on) — if any says multiple workers, a bootstrap
    failure is a real error, never a benign single-host case."""
    import os

    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    for var in ("MEGASCALE_NUM_SLICES", "NUM_TPU_SLICES"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = BANK_AXIS) -> Mesh:
    """1-D device mesh over all (or given) devices; works identically for one
    chip, one host, or a multi-host pod slice (jax.distributed process mesh)."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def bank_sharding(mesh: Mesh, axis: str = BANK_AXIS) -> NamedSharding:
    """Shard the leading (bank) dimension, replicate everything else."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_bank(tree: Any, mesh: Mesh, axis: str = BANK_AXIS) -> Any:
    """Place a bank pytree with its leading axis sharded over the mesh."""
    sh = bank_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def with_bank_constraint(tree: Any, mesh: Mesh, axis: str = BANK_AXIS) -> Any:
    """In-jit sharding constraint pinning the bank layout (keeps XLA from
    resharding between predict/update phases)."""
    sh = bank_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.lax.with_sharding_constraint(a, sh), tree)


# ---------------------------------------------------------------------------
# ensemble-statistics reduction points (the only cross-chip communication)
# ---------------------------------------------------------------------------


def bank_shard_map(fn, mesh: Mesh, axis: str = BANK_AXIS):
    """Run a bank→bank step function per-device on its local bank shard.

    The Pallas fast paths (``models.pose_fused`` / ``pose_update_fused``) are
    custom calls that GSPMD cannot partition automatically — under plain
    ``jit`` on a sharded bank XLA would gather the bank to one device first.
    Wrapping the step in ``shard_map`` keeps every device running the fused
    kernels on its local shard with zero communication (the bank axis is
    embarrassingly parallel, SURVEY.md §2.4).

    ``fn``'s inputs and outputs must all carry the bank as their leading
    axis (ensemble reductions belong outside the wrapped step)."""
    import inspect

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    # replication checking was renamed check_rep → check_vma in jax 0.8; it
    # must be off because steps close over replicated parameter pytrees
    check_kw = (
        {"check_vma": False}
        if "check_vma" in inspect.signature(shard_map).parameters
        else {"check_rep": False}
    )

    def wrapped(*bank_args):
        in_specs = jax.tree_util.tree_map(lambda _: P(axis), bank_args)
        out_specs = jax.tree_util.tree_map(
            lambda _: P(axis), jax.eval_shape(fn, *bank_args)
        )
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **check_kw
        )(*bank_args)

    return wrapped


def ensemble_mean(tree: Any) -> Any:
    """Mean over the bank axis — under jit on sharded inputs this lowers to a
    psum over ICI (the one collective of the steady-state loop)."""
    return jax.tree_util.tree_map(lambda a: a.mean(axis=0), tree)


def ensemble_moments(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(mean, covariance) of a (N, d) bank statistic across instances."""
    mean = x.mean(axis=0)
    centered = x - mean[None]
    cov = centered.T @ centered / x.shape[0]
    return mean, cov


def acceptance_rate(accepted: jax.Array) -> jax.Array:
    """Fraction of bank instances whose last χ²-gated update was applied —
    the gate-rejection observability the reference lacked (SURVEY.md §5)."""
    return accepted.astype(jax.numpy.float32).mean()
