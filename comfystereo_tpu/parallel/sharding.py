"""Device-mesh sharding for the stereo pipeline.

The reference is single-process/single-device; its only parallelism is numba
row-parallelism and torch batching (SURVEY.md §2.7). Here frames are sharded
over the ICI mesh with `jax.sharding` (pure data parallelism — each frame is
independent), and rows can additionally be sharded over a second mesh axis
("seq") because every kernel in the pipeline is row-independent apart from
small vertical convolution halos, which XLA turns into neighbor exchanges.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, ...] arrays sharded over frames (batch axis)."""
    return NamedSharding(mesh, P("data"))


def frame_row_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, ...] arrays sharded over frames and rows (needs a 2-axis mesh)."""
    return NamedSharding(mesh, P("data", "seq"))


def shard_batch(image, depth, mesh: Mesh, rows: bool = False):
    """Place a frame batch onto the mesh (DP over frames; optionally rows)."""
    sh = frame_row_sharding(mesh) if rows else frame_sharding(mesh)
    return jax.device_put(image, sh), jax.device_put(depth, sh)
