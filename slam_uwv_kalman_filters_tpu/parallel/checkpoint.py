"""Checkpoint / resume for filter banks.

The reference's only "resume" is its second constructor from an explicit
state+covariance (``/root/reference/src/PoseUKF.cpp:374-391``). Here the whole
filter-bank state is a pytree, so checkpointing is a byte-serialization of the
tree (flax msgpack — dependency-free and host-portable) and resume is exactly
the reference's construct-from-state path (``models.pose_ukf.init_from_state``).

For multi-host pod jobs each process saves its addressable shard
(``save_sharded``); restore re-places shards onto the local mesh. Orbax is
used when available for async/atomic semantics, with the msgpack path as the
always-available fallback.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

__all__ = ["save", "restore", "save_sharded", "restore_sharded"]


def save(path: str | os.PathLike, tree: Any, *, backend: str = "msgpack") -> None:
    """Serialize a pytree (filter state, params, or both).

    ``backend="msgpack"`` (default) writes ONE file, atomically published —
    dependency-free and host-portable. ``backend="orbax"`` writes an Orbax
    StandardCheckpointer directory (TensorStore chunked storage — the pick
    for very large banks or cloud-storage paths)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        host_tree = jax.tree_util.tree_map(np.asarray, tree)
        ckptr = ocp.StandardCheckpointer()  # async: returns before finalize
        ckptr.save(path.resolve(), host_tree, force=True)
        ckptr.wait_until_finished()  # atomic publish (tmp dir → path)
        return
    if backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.to_bytes(host_tree))
    os.replace(tmp, path)  # atomic publish


def restore(path: str | os.PathLike, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree with the
    right shapes/dtypes — e.g. a freshly-initialized filter state). The
    backend is auto-detected: an Orbax checkpoint is a directory, the
    msgpack checkpoint a single file."""
    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        host_target = jax.tree_util.tree_map(np.asarray, target)
        restored = ocp.StandardCheckpointer().restore(path.resolve(), host_target)
        # match the msgpack path's contract: plain host arrays in the
        # target's pytree structure (callers device-put as needed)
        return jax.tree_util.tree_map(np.asarray, restored)
    data = path.read_bytes()
    return serialization.from_bytes(target, data)


def _shard_path(path: Path, process_index: int) -> Path:
    return path.with_name(f"{path.name}.shard{process_index}")


def _local_host_view(a) -> np.ndarray:
    """This process's view of an array: the unique addressable shards
    concatenated along axis 0. Replicated leaves (params saved alongside the
    bank) have one identical shard per local device — deduplicating by shard
    index keeps them single-copy instead of k× duplicated. Rank-0 leaves
    (ring-buffer heads, counters) are necessarily replicated → full value."""
    if hasattr(a, "addressable_shards") and getattr(a, "ndim", 0) > 0:
        by_offset = {}
        for s in a.addressable_shards:
            # slice objects are unhashable (py<3.12): key on the start offsets
            key = tuple(sl.start or 0 for sl in s.index)
            by_offset.setdefault(key, s)
        shards = [by_offset[k] for k in sorted(by_offset)]
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(a)


def save_sharded(path: str | os.PathLike, tree: Any) -> None:
    """Each process saves the locally-addressable part of a sharded bank."""
    path = Path(path)
    save(_shard_path(path, jax.process_index()), jax.tree_util.tree_map(_local_host_view, tree))


def restore_sharded(path: str | os.PathLike, target: Any, *, place: bool = False) -> Any:
    """Restore this process's shard (single-host: shard 0).

    ``target`` is a template with this process's layout — e.g. the freshly
    initialized, already-sharded bank. Restored leaf shapes are validated
    against the template's host-local view (what ``save_sharded`` wrote), so
    a template of the wrong bank size fails loudly instead of silently
    carrying mismatched shards. With ``place=True`` each leaf is re-assembled
    onto the template's sharding (``jax.make_array_from_process_local_data``)
    — the multi-host resume path; the default returns host numpy arrays."""
    host_target = jax.tree_util.tree_map(_local_host_view, target)
    restored = restore(_shard_path(Path(path), jax.process_index()), host_target)

    def _check(r, t):
        if np.shape(r) != np.shape(t):
            raise ValueError(
                f"checkpoint shard shape {np.shape(r)} does not match the "
                f"template's local shape {np.shape(t)} — pass a target with "
                "this process's bank layout (same global size and sharding "
                "as at save time)"
            )
        return r

    restored = jax.tree_util.tree_map(_check, restored, host_target)
    if not place:
        return restored

    def _place(r, t):
        if hasattr(t, "sharding") and hasattr(t, "addressable_shards"):
            return jax.make_array_from_process_local_data(t.sharding, np.asarray(r))
        return r

    return jax.tree_util.tree_map(_place, restored, target)
