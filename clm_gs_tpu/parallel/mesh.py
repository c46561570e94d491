"""Device-mesh construction and sharding helpers.

New capability relative to the reference (which is strictly single-GPU,
SURVEY.md §0): Gaussians and cameras are sharded over a 2-D
(`data` x `gauss`) ``jax.sharding.Mesh``:

  - `gauss` axis: the (C, ...) Gaussian buffers (params, Adam moments, stats)
    are sharded along capacity — per-chip HBM scales down as 1/n_gauss, the
    TPU analogue of "removing the memory barrier" across chips,
  - `data` axis: the bsz camera microbatches are data-parallel.

Capacity bucketing (utils.general.next_capacity) keeps C divisible by the
granule, which is itself a multiple of any realistic mesh axis size, so shards
stay equal-sized without padding logic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: str = "", devices: Optional[Sequence] = None) -> Mesh:
    """shape: "" = all devices on the data axis; "4" = 4-way data; "2x4" =
    2-way data x 4-way gauss."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        dims = (len(devices), 1)
    elif "x" in shape:
        a, b = shape.split("x")
        dims = (int(a), int(b))
    else:
        dims = (int(shape), 1)
    assert dims[0] * dims[1] <= len(devices), (dims, len(devices))
    devices = devices[: dims[0] * dims[1]]
    return Mesh(np.array(devices).reshape(dims), ("data", "gauss"))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """(C, ...) arrays sharded along capacity."""
    return NamedSharding(mesh, P("gauss"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) camera-batch arrays sharded along the batch."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place a GaussianState's (C, ...) arrays on the gauss axis."""
    return shard_capacity_tree(state, mesh, state.capacity)


def shard_capacity_tree(tree, mesh: Mesh, capacity: int):
    """Place every (capacity, ...) leaf of a pytree on the gauss axis and
    everything else replicated. Used both for initial placement and to
    restore layouts after host-side capacity growth / densification
    (jnp.pad and gather outputs otherwise land wherever XLA put them).
    Multi-process meshes route through put_global (device_put cannot build
    arrays spanning non-addressable devices)."""
    from clm_gs_tpu.parallel.multihost import put_global

    gs = gauss_sharding(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            return put_global(x, gs)
        return put_global(x, replicated(mesh))

    return jax.tree.map(place, tree)
