"""ctypes bindings for the native C++ components (csrc/), with pure-Python
fallbacks so the framework runs without a toolchain.

  - fast_tsp: camera-order TSP (replaces the fast-tsp submodule,
    clm_offload/engine.py:179)
  - cpu_adam: SIMD host Adam + gather/scatter over the pinned SH buffer
    (replaces cpu-adam and the host half of clm_kernels' DMA gathers)

Shared objects are built on demand with `make -C csrc` (g++ is baked into the
image); set CLM_GS_NO_NATIVE=1 to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")


def _load(name: str) -> Optional[ctypes.CDLL]:
    if os.environ.get("CLM_GS_NO_NATIVE"):
        return None
    so = os.path.join(_CSRC, f"lib{name}.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _CSRC, f"lib{name}.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None


_tsp = _load("fast_tsp")
if _tsp is not None:
    _tsp.find_tour.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]

_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)

_i16p = ctypes.POINTER(ctypes.c_int16)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)

# bumped together with csrc/cpu_adam.cpp's native_abi_version() on every
# entry-point signature change — a stale .so with same-named symbols but a
# different ABI would corrupt memory silently
_ADAM_ABI = 3


def _bind_adam(lib) -> bool:
    """Set argtypes on all entry points; False if the library is missing any
    symbol or carries a different ABI version."""
    try:
        lib.native_abi_version.restype = ctypes.c_int64
        if lib.native_abi_version() != _ADAM_ABI:
            return False
        lib.adam_sparse_step.argtypes = [
            _f32p, _f32p, _f32p, _f32p, _i32p, ctypes.c_int64, ctypes.c_int,
            _f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int64,
        ]
        lib.adam_sparse_step_mt.argtypes = (
            lib.adam_sparse_step.argtypes + [ctypes.c_int]
        )
        lib.adam_dense_step.argtypes = [
            _f32p, _f32p, _f32p, _f32p, ctypes.c_int64, ctypes.c_int, _f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int64,
        ]
        lib.scatter_add_rows.argtypes = [
            _f32p, _f32p, _i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        lib.scatter_add_rows_mt.argtypes = (
            lib.scatter_add_rows.argtypes + [ctypes.c_int]
        )
        lib.gather_rows.argtypes = [
            _f32p, _f32p, _i32p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gather_rows_mt.argtypes = (
            lib.gather_rows.argtypes + [ctypes.c_int]
        )
        lib.stamp_rows_i16.argtypes = [
            _i16p, _i32p, ctypes.c_int64, ctypes.c_int16, ctypes.c_int,
        ]
        lib.counting_sort_perm_counts_i16.argtypes = [
            _i16p, ctypes.c_int64, ctypes.c_int, _i32p, _i64p, ctypes.c_int,
        ]
        lib.nonzero_stamp_i16.restype = ctypes.c_int64
        lib.nonzero_stamp_i16.argtypes = [
            _i16p, _u8p, ctypes.c_int64, ctypes.c_int, _i32p, ctypes.c_int,
        ]
        lib.classify_sorted.argtypes = [
            _i32p, ctypes.c_int64, _i32p, ctypes.c_int64,
            _i32p, _i32p, _i32p, _i32p, _i64p,
        ]
        return True
    except AttributeError:
        return False


_adam = _load("cpu_adam")
if _adam is not None and not _bind_adam(_adam):
    # stale .so from an old working tree: force-rebuild, then load through a
    # unique temp COPY — dlopen dedups by pathname/inode, so re-CDLL'ing the
    # same path returns the already-mapped stale library (verified)
    try:
        import shutil
        import tempfile

        subprocess.run(
            ["make", "-B", "-C", _CSRC, "libcpu_adam.so"],
            check=True, capture_output=True, timeout=120,
        )
        tmp = tempfile.NamedTemporaryFile(
            prefix="libcpu_adam_", suffix=".so", delete=False
        )
        tmp.close()
        shutil.copy2(os.path.join(_CSRC, "libcpu_adam.so"), tmp.name)
        _adam = ctypes.CDLL(tmp.name)
        # the mapping survives the unlink (POSIX); without it every
        # stale-ABI load leaks one .so copy in /tmp
        import atexit

        atexit.register(lambda p=tmp.name: os.path.exists(p) and os.unlink(p))
        if not _bind_adam(_adam):
            _adam = None
    except Exception:
        _adam = None


def host_threads() -> int:
    """Worker threads for the native host ops. The streaming Adam/gather/
    scatter are DRAM-bound; ~3x at 4 threads on this box. Capped below the
    core count so the dispatch thread keeps a core during overlap
    (CLMGS_HOST_THREADS overrides)."""
    env = os.environ.get("CLMGS_HOST_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(4, (os.cpu_count() or 2) - 1))


def have_native_tsp() -> bool:
    return _tsp is not None


def have_native_adam() -> bool:
    return _adam is not None


def _ptr(a: np.ndarray, ty):
    return a.ctypes.data_as(ty)


def find_tour(dist: np.ndarray, time_budget_s: float = 1e-3) -> np.ndarray:
    """dist: (n, n) int32 symmetric distances. Returns (n,) permutation
    minimizing the open-path cost."""
    n = dist.shape[0]
    dist = np.ascontiguousarray(dist, np.int32)
    if _tsp is not None:
        out = np.empty(n, np.int32)
        _tsp.find_tour(
            _ptr(dist, ctypes.POINTER(ctypes.c_int32)), n, time_budget_s,
            _ptr(out, ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    # fallback: greedy nearest neighbor from each start + single 2-opt sweep
    best, best_cost = None, np.inf
    for s in range(n):
        used = np.zeros(n, bool)
        tour = [s]
        used[s] = True
        for _ in range(n - 1):
            d = np.where(used, np.iinfo(np.int32).max, dist[tour[-1]])
            nxt = int(np.argmin(d))
            tour.append(nxt)
            used[nxt] = True
        cost = sum(dist[tour[i], tour[i + 1]] for i in range(n - 1))
        if cost < best_cost:
            best, best_cost = tour, cost
    tour = list(best)
    improved = True
    while improved:
        improved = False
        for i in range(n - 1):
            for j in range(i + 1, n):
                delta = 0
                if i > 0:
                    delta += dist[tour[i - 1], tour[j]] - dist[tour[i - 1], tour[i]]
                if j < n - 1:
                    delta += dist[tour[i], tour[j + 1]] - dist[tour[j], tour[j + 1]]
                if delta < 0:
                    tour[i : j + 1] = tour[i : j + 1][::-1]
                    improved = True
    return np.asarray(tour, np.int32)


class HostAdam:
    """Host-side Adam over a pinned (N, cols) numpy buffer (FusedCPUAdam
    analogue). Buffers are owned by the caller; this object holds moments."""

    def __init__(self, n: int, cols: int, lr_cols: np.ndarray,
                 betas=(0.9, 0.999), eps: float = 1e-15):
        self.exp_avg = np.zeros((n, cols), np.float32)
        self.exp_avg_sq = np.zeros((n, cols), np.float32)
        self.lr_cols = np.ascontiguousarray(lr_cols, np.float32)
        self.betas = betas
        self.eps = eps
        self.step_count = 0
        self.cols = cols

    def grow(self, new_n: int):
        for name in ("exp_avg", "exp_avg_sq"):
            old = getattr(self, name)
            new = np.zeros((new_n, self.cols), np.float32)
            new[: len(old)] = old
            setattr(self, name, new)

    def sparse_step(self, params, grads, indices, grad_scale=1.0, step=None):
        """Update rows `indices`; zeroes those grad rows in place (version=3
        semantics, clm_offload/engine.py:320-327)."""
        step = self.step_count if step is None else step
        indices = np.ascontiguousarray(indices, np.int32)
        if _adam is not None:
            # The native kernel indexes raw row-major buffers. np.asarray of a
            # 2-D device array can be an F-ordered VIEW on the axon TPU client
            # (strides transposed, zero-copy) — feeding its raw pointer here
            # silently garbles every multi-column group (found as a 10.7 dB
            # naive_offload quality collapse; CPU backends always hand back
            # C-order, which is why tests passed). ascontiguousarray is a
            # no-op for the owned host buffers and copies only the offending
            # views; grad zeroing is replayed on the original if copied.
            assert params.flags["C_CONTIGUOUS"], "params must be the owned host buffer"
            g = np.ascontiguousarray(grads, np.float32)
            _adam.adam_sparse_step_mt(
                _ptr(params, _f32p), _ptr(g, _f32p),
                _ptr(self.exp_avg, _f32p), _ptr(self.exp_avg_sq, _f32p),
                _ptr(indices, _i32p), len(indices), self.cols,
                _ptr(self.lr_cols, _f32p), self.betas[0], self.betas[1],
                self.eps, grad_scale, step, host_threads(),
            )
            if (
                g is not grads
                and isinstance(grads, np.ndarray)
                and grads.flags.writeable
            ):
                grads[indices] = 0.0  # preserve version=3 zeroing semantics
            return
        b1, b2 = self.betas
        bc1 = 1 - b1**step
        bc2 = 1 - b2**step
        g = grads[indices] * grad_scale
        m = b1 * self.exp_avg[indices] + (1 - b1) * g
        v = b2 * self.exp_avg_sq[indices] + (1 - b2) * g * g
        self.exp_avg[indices] = m
        self.exp_avg_sq[indices] = v
        params[indices] -= self.lr_cols * (m / bc1) / (np.sqrt(v / bc2) + self.eps)
        grads[indices] = 0.0

    def dense_step(self, params, grads, n, grad_scale=1.0, step=None):
        self.sparse_step(params, grads, np.arange(n, dtype=np.int32), grad_scale, step)


def gather_rows(buf: np.ndarray, indices: np.ndarray) -> np.ndarray:
    indices = np.ascontiguousarray(indices, np.int32)
    if _adam is not None:
        assert buf.flags["C_CONTIGUOUS"], "gather_rows: buf must be C-order"
        out = np.empty((len(indices), buf.shape[1]), np.float32)
        _adam.gather_rows_mt(
            _ptr(buf, _f32p), _ptr(out, _f32p), _ptr(indices, _i32p),
            len(indices), buf.shape[1], host_threads(),
        )
        return out
    return buf[indices]


def stamp_rows(last_use: np.ndarray, ids: np.ndarray, pos: int) -> bool:
    """last_use[ids] = pos with MT chunking (ids unique per call). Returns
    False when the native lib is unavailable. ids are int32 like the rest of
    the id ABI (capacities < 2^31; the pipeline's visible-id lists are
    int32 already, so no conversion copies on the hot path)."""
    if _adam is None:
        return False
    assert last_use.dtype == np.int16 and last_use.flags["C_CONTIGUOUS"]
    ids = np.ascontiguousarray(ids, np.int32)
    _adam.stamp_rows_i16(
        _ptr(last_use, _i16p), _ptr(ids, _i32p), len(ids), pos,
        host_threads(),
    )
    return True


def counting_sort_perm(keys: np.ndarray, n_buckets: int):
    """Stable argsort for int16 keys in [0, n_buckets) via MT counting sort.
    Returns (int32 permutation, int64 bucket counts), or None when the native
    lib is unavailable (callers fall back to np.argsort + np.bincount)."""
    if _adam is None:
        return None
    keys = np.ascontiguousarray(keys, np.int16)
    assert len(keys) == 0 or (0 <= keys.min() and keys.max() < n_buckets), \
        "counting_sort_perm: key out of range (unchecked in the C fast path)"
    perm = np.empty(len(keys), np.int32)
    counts = np.zeros(n_buckets, np.int64)
    _adam.counting_sort_perm_counts_i16(
        _ptr(keys, _i16p), len(keys), n_buckets,
        _ptr(perm, _i32p), _ptr(counts, _i64p), host_threads(),
    )
    return perm, counts


def nonzero_stamp(last_use: np.ndarray, alive: Optional[np.ndarray],
                  mode: int):
    """MT nonzero over the int16 stamp array. mode 0: last_use >= 0 (visible
    union); mode 1: last_use == -1 and alive (never-visible). Returns the
    ascending int32 index array, or None when unavailable."""
    if _adam is None:
        return None
    assert last_use.dtype == np.int16 and last_use.flags["C_CONTIGUOUS"]
    n = len(last_use)
    if mode == 1:
        alive = np.ascontiguousarray(alive, np.uint8)
        ap = _ptr(alive, _u8p)
    else:
        ap = _u8p()
    out = np.empty(n, np.int32)
    cnt = _adam.nonzero_stamp_i16(
        _ptr(last_use, _i16p), ap, n, mode, _ptr(out, _i32p), host_threads(),
    )
    return out[:cnt]


def classify_sorted(a: np.ndarray, b: np.ndarray):
    """Single-pass H/D/G merge of two sorted-unique int32 id lists (the
    pipeline's visible-id lists are int32 — jnp.nonzero output — so the hot
    path never copies). Returns (pd, pn, gp, hn) position arrays (see
    csrc/cpu_adam.cpp), or None when the native lib is unavailable (callers
    fall back to searchsorted)."""
    if _adam is None:
        return None
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    na, nb = len(a), len(b)
    pd = np.empty(min(na, nb), np.int32)
    pn = np.empty(min(na, nb), np.int32)
    gp = np.empty(na, np.int32)
    hn = np.empty(nb, np.int32)
    counts = np.zeros(4, np.int64)
    _adam.classify_sorted(
        _ptr(a, _i32p), na, _ptr(b, _i32p), nb,
        _ptr(pd, _i32p), _ptr(pn, _i32p), _ptr(gp, _i32p), _ptr(hn, _i32p),
        _ptr(counts, _i64p),
    )
    nd, ng, nh = int(counts[0]), int(counts[2]), int(counts[3])
    return pd[:nd], pn[:nd], gp[:ng], hn[:nh]


def scatter_add_rows(buf, rows, indices, accumulate=True):
    indices = np.ascontiguousarray(indices, np.int32)
    rows = np.ascontiguousarray(rows, np.float32)
    if _adam is not None:
        assert buf.flags["C_CONTIGUOUS"], "scatter_add_rows: buf must be C-order"
        # indices are unique within every call (visible-set / delta rows),
        # so row-sharded threads never write the same destination
        _adam.scatter_add_rows_mt(
            _ptr(buf, _f32p), _ptr(rows, _f32p), _ptr(indices, _i32p),
            len(indices), buf.shape[1], int(accumulate), host_threads(),
        )
        return
    if accumulate:
        np.add.at(buf, indices, rows)
    else:
        buf[indices] = rows
