"""Micro-benchmarks for the rasterizer glue redesign (round 2).

Variants measured on the real chip at bench-scene sizes (N=1M gaussians,
cap_round=2.36M real slots, cap_total=3.4M aligned slots):

  A. fence gather: (N,9) row gather from a (cap,9) cumsum — layout variants
  B. grouping sort: key + 9 f32 payloads vs key + 5 u32 (f16-pair packed)
  C. tile sort: 3-op (current, carries src_of) vs 2-op (scheme B)
  D. fwd attr gather: 9 f32 cols vs 2 f32 + 4 u32 packed

Usage: nohup timeout 1500 python -u tools/microbench_glue.py > /tmp/mb.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
CAP = 2359296
CAPT = 3397632


def timeit(name, fn, *args, iters=8):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    # force a real drain (block_until_ready alone lies through the tunnel)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    _ = float(jnp.max(jnp.abs(leaves[0].reshape(-1)[:1])))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    csi9 = jnp.asarray(rng.standard_normal((CAP, 9), dtype=np.float32))
    csi16 = jnp.pad(csi9, ((0, 0), (0, 7)))
    # sorted fence positions (monotone, avg stride CAP/N)
    en = np.sort(rng.integers(1, CAP, size=N)).astype(np.int32)
    en_j = jnp.asarray(en)

    print("== A. fence gather variants ==", flush=True)

    @jax.jit
    def g_rows9(c, i):
        return c[i]

    @jax.jit
    def g_rows16(c, i):
        return c[i]

    @jax.jit
    def g_cols9(c, i):
        # 9 separate 1-D gathers fused
        return jnp.stack([c[:, j][i] for j in range(9)], axis=1)

    @jax.jit
    def g_transposed(cT, i):
        return cT[:, i]  # (9, N)

    timeit("rows (CAP,9)[i] (current)", g_rows9, csi9, en_j)
    timeit("rows (CAP,16)[i]", g_rows16, csi16, en_j)
    timeit("9x 1-D col gathers", g_cols9, csi9, en_j)
    csiT = jnp.asarray(np.ascontiguousarray(np.asarray(csi9).T))
    timeit("transposed (9,CAP)[:,i]", g_transposed, csiT, en_j)

    print("== B. grouping sort variants (cap_total) ==", flush=True)
    ids = jnp.asarray(rng.integers(0, N, size=CAPT).astype(np.int32))
    v9 = tuple(
        jnp.asarray(rng.standard_normal(CAPT, dtype=np.float32)) for _ in range(9)
    )
    v5 = tuple(
        jnp.asarray(rng.integers(0, 1 << 31, size=CAPT).astype(np.int32))
        for _ in range(5)
    )

    @jax.jit
    def sort10(k, vs):
        return jax.lax.sort((k,) + vs, num_keys=1, is_stable=True)

    @jax.jit
    def sort6(k, vs):
        return jax.lax.sort((k,) + vs, num_keys=1, is_stable=True)

    @jax.jit
    def sort2(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=True)

    timeit("key + 9 f32 payloads", sort10, ids, v9)
    timeit("key + 5 u32 (f16-packed)", sort6, ids, v5)
    timeit("key + 1 payload (tile sort B)", sort2, ids, v9[0])

    print("== C. pack/unpack overhead ==", flush=True)

    @jax.jit
    def pack(cols):
        # 9 f32 -> f16 pairs in s32 (5 words, last half-empty)
        h = [c.astype(jnp.float16) for c in cols] + [jnp.zeros(CAPT, jnp.float16)]
        out = []
        for j in range(0, 10, 2):
            lo = jax.lax.bitcast_convert_type(h[j], jnp.uint16).astype(jnp.uint32)
            hi = jax.lax.bitcast_convert_type(h[j + 1], jnp.uint16).astype(jnp.uint32)
            out.append((lo | (hi << 16)).astype(jnp.int32))
        return tuple(out)

    @jax.jit
    def unpack(words):
        cols = []
        for w in words:
            uw = w.astype(jnp.uint32)
            lo = jax.lax.bitcast_convert_type(
                (uw & 0xFFFF).astype(jnp.uint16), jnp.float16
            )
            hi = jax.lax.bitcast_convert_type(
                (uw >> 16).astype(jnp.uint16), jnp.float16
            )
            cols.extend([lo.astype(jnp.float32), hi.astype(jnp.float32)])
        return tuple(cols[:9])

    packed = timeit("pack 9xf32 -> 5 words", pack, v9)
    words = pack(v9)
    timeit("unpack 5 words -> 9xf32", unpack, words)

    print("== D. cumsum variants ==", flush=True)

    @jax.jit
    def cums(x):
        return jnp.cumsum(x, axis=0)

    timeit("cumsum (CAP,9)", cums, csi9)
    timeit("cumsum (CAP,16)", cums, csi16)

    print("== E. fwd attr gather (CAPT rows from (N,c)) ==", flush=True)
    tbl9 = jnp.asarray(rng.standard_normal((N, 9), dtype=np.float32))
    tbl6 = jnp.asarray(rng.standard_normal((N, 6), dtype=np.float32))
    gi = jnp.asarray(rng.integers(0, N, size=CAPT).astype(np.int32))
    timeit("gather (CAPT,9)", g_rows9, tbl9, gi)
    timeit("gather (CAPT,6)", g_rows9, tbl6, gi)


if __name__ == "__main__":
    main()
