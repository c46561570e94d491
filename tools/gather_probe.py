"""Microbench: the packed attribute row-gather (rasterize's biggest glue op,
51 ms/camera at bench scale) under different column packings.

Hypothesis from PARITY's round-1 rule ("random row gathers cost ~0.7-1.6 ms
per M-COL"): XLA:TPU gather cost scales with column count, so packing two f32
columns into one complex64 element (lossless: complex(a,b).real == a bitwise)
should nearly halve the 9-column gather. Also probes a (N,16)-padded layout
and an int32-pair bf16 packing (lossy, for reference).

Usage: timeout 1200 python tools/gather_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
M = 6_815_744  # ~bench-scale slot count (cap_round + align*num_tiles)


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    first = out[0] if isinstance(out, tuple) else out
    float(np.asarray(first).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(N, 9).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, N, M).astype(np.int32))

    @jax.jit
    def g9(table, ids):
        return table[ids]

    timeit("gather (N,9) f32", g9, table, ids)

    table16 = jnp.pad(table, ((0, 0), (0, 7)))

    @jax.jit
    def g16(t, ids):
        return t[ids]

    timeit("gather (N,16) f32 (padded)", g16, table16, ids)

    @jax.jit
    def pack_c64(t):
        return jnp.stack(
            [jax.lax.complex(t[:, 2 * j], t[:, 2 * j + 1]) for j in range(4)],
            axis=1,
        )

    tc = jax.block_until_ready(pack_c64(table))
    t9 = table[:, 8]

    @jax.jit
    def g5c(tc, t9, ids):
        rc = tc[ids]  # (M, 4) complex64
        r9 = t9[ids]
        cols = []
        for j in range(4):
            cols += [jnp.real(rc[:, j]), jnp.imag(rc[:, j])]
        cols.append(r9)
        return jnp.stack(cols, axis=1)

    timeit("gather 4xc64 + 1xf32 (lossless)", g5c, tc, t9, ids)


    # id-ordering sensitivity: the real binning emits ids grouped by tile
    # with in-tile depth order — test fully-sorted as the other extreme
    ids_sorted = jnp.sort(ids)
    timeit("gather (N,9) f32 SORTED ids", g9, table, ids_sorted)
    timeit("gather (N,16) f32 SORTED ids", g16, table16, ids_sorted)

    # single-column scaling: per-column cost model check
    t1 = table[:, 0]

    @jax.jit
    def g1(t, ids):
        return t[ids]

    timeit("gather (N,) f32 single col", g1, t1, ids)

    @jax.jit
    def g2(t, ids):
        return t[:, 0:2][ids]

    timeit("gather (N,2) f32", g2, table, ids)

    # correctness of the c64 packing
    a = np.asarray(jax.jit(g9)(table, ids[:1024]))
    b = np.asarray(g5c(tc, t9, ids[:1024]))
    assert np.array_equal(a, b), "complex64 packing is not lossless!"
    print("c64 pack lossless: OK")


if __name__ == "__main__":
    main()
