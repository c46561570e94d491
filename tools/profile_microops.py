"""Micro-op cost measurements on the real chip: the sort/gather/scatter/fill
primitives the rasterizer glue is built from, at bench-scene sizes. Drives
data-movement design decisions (see PARITY.md measured-costs table).

Usage: timeout 2400 python tools/profile_microops.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.ops.tiles import _forward_fill
from clm_gs_tpu.utils.bench_scene import drain_scalar

NSLOT = 2_883_584  # bench isect_cap
NTOT = 3_932_160  # + align*num_tiles
NG = 1_048_576  # gaussian capacity
NTILES = 4056
VCAP = 524_288  # ~50% visible


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    drain_scalar(leaves[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    drain_scalar(leaves[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    tile_ids = jnp.asarray(rng.randint(0, NTILES, NTOT).astype(np.int32))
    fvals = jnp.asarray(rng.rand(NTOT).astype(np.float32))
    fmat9 = jnp.asarray(rng.rand(NTOT, 9).astype(np.float32))

    # 1. histogram scatter-add (the aligned-binning per-tile counts)
    hist = jax.jit(
        lambda t: jnp.zeros(NTILES + 1, jnp.int32).at[t].add(1, mode="drop")
    )
    timeit("hist scatter-add 3.9M -> 4k bins", hist, tile_ids)

    # 1b. histogram via sort + searchsorted
    def hist_sort(t):
        ts = jax.lax.sort((t,), num_keys=1)[0]
        off = jnp.searchsorted(ts, jnp.arange(NTILES + 1, dtype=jnp.int32))
        return jnp.diff(off)

    timeit("hist sort+searchsorted 3.9M", jax.jit(hist_sort), tile_ids)

    # 2. compaction scatter-add: sorted-unique (v_cap,4) -> (C,4)
    idxs = jnp.asarray(
        np.sort(rng.choice(NG, VCAP, replace=False)).astype(np.int32)
    )
    g4 = jnp.asarray(rng.rand(VCAP, 4).astype(np.float32))

    sc_plain = jax.jit(lambda i, g: jnp.zeros((NG, 4)).at[i].add(g))
    timeit("scatter-add 512k->1M x4 plain", sc_plain, idxs, g4)
    sc_hint = jax.jit(
        lambda i, g: jnp.zeros((NG, 4)).at[i].add(
            g, unique_indices=True, indices_are_sorted=True
        )
    )
    timeit("scatter-add 512k->1M x4 sorted+unique", sc_hint, idxs, g4)

    g48 = jnp.asarray(rng.rand(VCAP, 48).astype(np.float32))
    sc48 = jax.jit(
        lambda i, g: jnp.zeros((NG, 48)).at[i].add(
            g, unique_indices=True, indices_are_sorted=True
        )
    )
    timeit("scatter-add 512k->1M x48 sorted+unique", sc48, idxs, g48)

    # 2b. the gather-based alternative: rank = cumsum(vis); full = cmp[rank]*vis
    vis = jnp.zeros(NG, bool).at[idxs].set(True, unique_indices=True)

    def expand(v, g):
        rank = jnp.cumsum(v.astype(jnp.int32)) - 1
        return jnp.where(v[:, None], g[jnp.clip(rank, 0, VCAP - 1)], 0.0)

    timeit("expand gather 1M rows x4 (cumsum+take)", jax.jit(expand), vis, g4)

    # 3. compaction gather: (C rows) -> (v_cap,16) by sorted indices
    tbl16 = jnp.asarray(rng.rand(NG, 16).astype(np.float32))
    timeit("gather 512k sorted rows x16", jax.jit(lambda t, i: t[i]), tbl16, idxs)

    # 4. the attr row-gather at instance scale (aligned ids, tile-local-ish)
    ids_rand = jnp.asarray(rng.randint(0, NG, NTOT).astype(np.int32))
    timeit("gather 3.9M random rows x16", jax.jit(lambda t, i: t[i]), tbl16, ids_rand)
    tbl16_b = tbl16.astype(jnp.bfloat16)
    timeit("gather 3.9M random rows x16 bf16",
           jax.jit(lambda t, i: t[i]), tbl16_b, ids_rand)
    tbl8 = jnp.asarray(rng.rand(NG, 8).astype(np.float32))
    timeit("gather 3.9M random rows x8", jax.jit(lambda t, i: t[i]), tbl8, ids_rand)

    # 5. sorts: tile sort variants
    src = jnp.arange(NTOT, dtype=jnp.int32)
    s3 = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1, is_stable=True))
    timeit("sort 3.9M x3 ops (tile sort)", s3, tile_ids, ids_rand, src)
    s1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    timeit("sort 3.9M x1 op", s1, tile_ids)

    # 9 f32 payloads vs 5 packed-bf16 payloads (gather-bwd un-permutation)
    ops9 = (src,) + tuple(fmat9[:, j] for j in range(9))
    s10 = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True))
    timeit("sort 3.9M x(1+9f32) (gather-bwd)", s10, *ops9)

    def pack2(a, b):
        ab = jnp.stack([a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)], -1)
        return jax.lax.bitcast_convert_type(ab, jnp.float32).reshape(a.shape)

    packed = [pack2(fmat9[:, 2 * j], fmat9[:, 2 * j + 1]) for j in range(4)]
    packed.append(fmat9[:, 8])
    ops5 = (src,) + tuple(packed)
    timeit("sort 3.9M x(1+4packed+1) bf16-packed", s10, *ops5)

    # 6. forward fill at slot scale
    ff = jax.jit(lambda a, b, c: _forward_fill((a, b, c), block=512))
    a0 = jnp.zeros(NSLOT, jnp.int32).at[::7].set(3)
    timeit("forward_fill 2.9M x3ch", ff, a0, a0, a0)

    # 7. cumsums
    timeit("cumsum 2.9M x1", jax.jit(lambda x: jnp.cumsum(x)), fvals[:NSLOT])
    timeit("cumsum 3.9M x9 axis0", jax.jit(lambda x: jnp.cumsum(x, 0)), fmat9)

    # 8. take_along fence gather (N,9) from cumsum
    fence_i = jnp.asarray(np.sort(rng.randint(0, NTOT, NG)).astype(np.int32))
    timeit("fence gather 1M rows x9",
           jax.jit(lambda c, i: c[i]), fmat9, fence_i)


if __name__ == "__main__":
    main()
