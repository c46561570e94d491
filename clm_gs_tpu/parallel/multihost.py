"""Multi-host (multi-process) execution skeleton.

The reference is strictly single-GPU (SURVEY.md §0); multi-host scaling is the
TPU north-star extension (BASELINE.json: >= 0.8 scaling efficiency from 1 to N
hosts on a v5p slice). This module provides:

  - process bootstrap (`maybe_initialize`) wrapping jax.distributed — on a
    real TPU pod slice all arguments are auto-detected, on CPU CI the
    coordinator/process flags come from the config (tpu.dist_*),
  - `put_global`: place per-process-identical host data onto a global
    (cross-process) sharding. Every process constructs the same logical batch
    (the dataset order is deterministic per seed), and each process donates
    only its addressable shards — `jax.device_put` alone cannot build arrays
    spanning non-addressable devices.

The sharded train step (parallel/shard.py) is process-count-agnostic: under
jit, GSPMD emits the same collectives whether mesh devices live in one
process or many — validated by tests/test_multihost.py, which runs the same
tiny scene as one 8-device process and as 2 processes x 4 devices (Gloo CPU
collectives) and compares losses.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def maybe_initialize(cfg) -> bool:
    """Initialize jax.distributed when the config asks for multi-process
    execution. Must run before any other jax API touches the backend.
    Returns True when the distributed runtime was initialized."""
    t = cfg.tpu
    if t.dist_num_processes <= 1 and not t.dist_coordinator:
        return False
    jax.distributed.initialize(
        coordinator_address=t.dist_coordinator or None,
        num_processes=t.dist_num_processes or None,
        process_id=t.dist_process_id if t.dist_process_id >= 0 else None,
    )
    return True


def put_global(x, sharding):
    """Place host data (identical on every process) onto a possibly
    cross-process sharding. Falls back to plain device_put in the
    single-process case (same semantics, fewer host copies). Global jax
    arrays with non-addressable shards (e.g. capacity-growth outputs during
    multi-process densification) cannot round-trip through numpy — reshard
    them with a jitted identity instead (GSPMD emits the collective)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return jax.jit(lambda a: a, out_shardings=sharding)(x)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fully_replicated_host_value(x):
    """Host value of a fully-replicated global array (e.g. psum'd losses):
    every process holds a complete copy in its addressable shards."""
    if jax.process_count() == 1 or not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    return np.asarray(x.addressable_shards[0].data)
