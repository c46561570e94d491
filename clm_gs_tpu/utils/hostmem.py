"""XLA host-memory-space ("pinned_host") transport for the clm SH stream.

The reference's send_shs2gpu_stream is a CUDA kernel gathering rows of a
pinned host buffer by a device-resident index list — zero-copy DMA reads of
host memory from the chip (clm_offload/engine.py:499-505). The XLA analogue
keeps the (C, 48) SH table in the `pinned_host` memory space of the device
and compiles the per-camera row gather as a host-space program whose output
is placed back in device memory — the compiler emits the host DMA, no numpy
staging copy on the critical path.

Not every backend accepts memory-space-annotated programs (the CPU backend
rejects the placement custom call outright, and some compiler services
reject host-space programs), so the transport is probed once at runtime and
`enabled()` gates the clm strategy's fetch path; the numpy + device_put
fallback stays the default (`--pinned_host` opts in, bench.py reports the
probe result either way).

Both directions are covered:

  - H2D fetch (`PinnedShTable.fetch`) — send_shs2gpu_stream analogue.
  - D2H gradient offload (`PinnedGradBuffer.offload`) — the
    send_shs2cpu_grad_buffer_stream analogue (engine.py:789-825): the
    per-camera compact grad rows scatter-ADD directly into a host-space
    (C, 48) buffer by a jitted `t.at[i].add(g)` program with the table
    donated, so the compiler emits the chip->pinned-host DMA and the
    accumulate runs where the buffer lives — no device staging array, no
    numpy scatter on the drain path. Status: implemented and unit-tested
    (tests/test_hostmem.py), NOT yet integrated into clm_offload's drain,
    which always uses `native.scatter_add_rows` — integration requires the
    eager host Adam to consume (and version-3-zero) rows of the jax-owned
    host-space buffer mid-batch, i.e. external mutation of a donated array;
    safe only on a backend where `to_numpy()` is a zero-copy view of the
    pinned pages (the reference mutates raw pinned memory the same way,
    cpu_adam's batched_sparse_step). Until such a backend is available to
    validate that aliasing contract, the drain stays on the numpy path.

This sandbox's backend rejects host-space programs entirely (probe() is
False), so both directions stay inert here and the numpy scatter fallback
(`native.scatter_add_rows`) remains the default; the programs are validated
with kind="device" in tests/test_hostmem.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import SingleDeviceSharding

_PROBE: Optional[bool] = None


def _shardings(device=None):
    d = device if device is not None else jax.devices()[0]
    return (
        SingleDeviceSharding(d, memory_kind="pinned_host"),
        SingleDeviceSharding(d, memory_kind="device"),
    )


def probe() -> bool:
    """Whether this backend compiles + runs a host-space gather whose result
    lands in device memory. Cached; safe to call repeatedly."""
    global _PROBE
    if _PROBE is None:
        try:
            host_sh, dev_sh = _shardings()
            t = jax.device_put(np.arange(8.0, np.float32).reshape(4, 2), host_sh)
            i = jax.device_put(np.array([1, 3], np.int32), host_sh)
            f = jax.jit(
                lambda t, i: t[i], in_shardings=(host_sh, host_sh),
                out_shardings=dev_sh,
            )
            out = np.asarray(f(t, i))
            _PROBE = bool(
                np.array_equal(out, np.asarray([[2.0, 3.0], [6.0, 7.0]]))
            )
        except Exception:
            _PROBE = False
    return _PROBE


class PinnedShTable:
    """Device-visible pinned-host mirror of the (C, 48) SH table with a jitted
    row-gather into device memory.

    The numpy buffer stays canonical (densification replay and the host Adam
    mutate it in place); `refresh()` re-mirrors it. memory_kind is
    parameterized so the identical code path is testable on backends without
    host-space support (kind="device" exercises the same jit program with the
    annotations dropped)."""

    def __init__(self, np_buf: np.ndarray, kind: str = "pinned_host"):
        self.kind = kind
        self.host_sh, self.dev_sh = _shardings()
        if kind != "pinned_host":
            self.host_sh = self.dev_sh
        self.np_buf = np_buf
        self.table = jax.device_put(np_buf, self.host_sh)
        self._fetch = jax.jit(
            lambda t, i: t[i],
            in_shardings=(self.host_sh, self.host_sh),
            out_shardings=self.dev_sh,
        )
        self._update = make_row_updater(self)

    def refresh(self, np_buf: Optional[np.ndarray] = None):
        """Re-mirror after host-side mutation (densify replay / Adam steps).
        Whole-table host->host copy: off the per-camera critical path."""
        if np_buf is not None:
            self.np_buf = np_buf
        self.table = jax.device_put(self.np_buf, self.host_sh)

    def fetch(self, idx: np.ndarray):
        """Gather rows by index -> device-memory array (send_shs2gpu_stream
        analogue). idx must be pre-clamped to valid rows."""
        i = jax.device_put(np.ascontiguousarray(idx, np.int32), self.host_sh)
        return self._fetch(self.table, i)

    def update_rows(self, idx: np.ndarray, values: np.ndarray):
        """Scatter updated rows into the mirror (host Adam wrote them in the
        canonical numpy buffer). Host->host, donated: no device traffic."""
        if len(idx) == 0:
            return
        i = jax.device_put(np.ascontiguousarray(idx, np.int32), self.host_sh)
        v = jax.device_put(
            np.ascontiguousarray(values, np.float32), self.host_sh
        )
        self.table = self._update(self.table, i, v)


class PinnedGradBuffer:
    """Host-space (C, 48) SH-gradient accumulator fed by device-side compact
    grad rows: the D2H direction of the pinned transport (symmetric to
    PinnedShTable's H2D fetch).

    offload(g_dev, idx) accumulates g_dev[:len(idx)] into rows `idx` without
    materializing g_dev on the host first: the jitted scatter-add takes the
    device array as input, the donated host-space table as accumulator, and
    the compiler schedules the transfer. reset_rows zeroes rows the host
    Adam consumed (version-3 grad zeroing, cpu_adam.cpp contract)."""

    def __init__(self, shape, kind: str = "pinned_host"):
        self.kind = kind
        self.host_sh, self.dev_sh = _shardings()
        if kind != "pinned_host":
            self.host_sh = self.dev_sh
        self.table = jax.device_put(
            np.zeros(shape, np.float32), self.host_sh
        )
        self._add = jax.jit(
            lambda t, i, g: t.at[i].add(g),
            in_shardings=(self.host_sh, self.host_sh, self.dev_sh),
            out_shardings=self.host_sh,
            donate_argnums=(0,),
        )
        self._reset = jax.jit(
            lambda t, i: t.at[i].set(0.0),
            in_shardings=(self.host_sh, self.host_sh),
            out_shardings=self.host_sh,
            donate_argnums=(0,),
        )

    def offload(self, g_dev, idx: np.ndarray):
        """Scatter-add device grad rows into the host buffer. idx rows must
        be valid (pre-clamped); g_dev rows beyond len(idx) are ignored by
        passing only the prefix."""
        if len(idx) == 0:
            return
        i = jax.device_put(np.ascontiguousarray(idx, np.int32), self.host_sh)
        self.table = self._add(self.table, i, g_dev[: len(idx)])

    def reset_rows(self, idx: np.ndarray):
        if len(idx) == 0:
            return
        i = jax.device_put(np.ascontiguousarray(idx, np.int32), self.host_sh)
        self.table = self._reset(self.table, i)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.table)


def make_row_updater(table_like: "PinnedShTable"):
    """Donated host-space row scatter: refresh mirror rows the host Adam
    touched without re-mirroring the whole table."""
    return jax.jit(
        lambda t, i, v: t.at[i].set(v),
        in_shardings=(table_like.host_sh,) * 3,
        out_shardings=table_like.host_sh,
        donate_argnums=(0,),
    )
