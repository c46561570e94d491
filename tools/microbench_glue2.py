"""Round 2 of glue micro-benchmarks: validate the redesigned backward
grad-reduction chain end-to-end (scheme B) before wiring it in.

Scheme B: sort per-slot grads by ORIGINAL gaussian id (padding first),
payloads bitcast f32->s32 (s32 payload sorts measured ~6x faster than f32),
static slice of the last cap_round rows, pad to 16 cols, cumsum, fence gather
at positions from the pre-sort per-gaussian counts (no unsort needed).

Usage: nohup timeout 1500 python -u tools/microbench_glue2.py > /tmp/mb2.log 2>&1 &
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
    out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    _ = float(jnp.max(jnp.abs(leaves[0].reshape(-1)[:1])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    _ = float(jnp.max(jnp.abs(leaves[0].reshape(-1)[:1])))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    v9 = jnp.asarray(rng.standard_normal((CAPT, 9), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=CAPT).astype(np.int32))
    cnt = jnp.asarray(
        rng.multinomial(CAP - 1, np.ones(N) / N).astype(np.int32)
    )
    n_isects = jnp.asarray(np.int32(CAP - 1))

    print("== sorts ==", flush=True)

    @jax.jit
    def sort_9s32(k, v):
        ops = (k,) + tuple(
            jax.lax.bitcast_convert_type(v[:, j], jnp.int32) for j in range(9)
        )
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return out[1]

    @jax.jit
    def sort_9f32(k, v):
        ops = (k,) + tuple(v[:, j] for j in range(9))
        return jax.lax.sort(ops, num_keys=1, is_stable=True)[1]

    timeit("group sort key + 9 s32(bitcast)", sort_9s32, ids, v9)
    timeit("group sort key + 9 f32 (current)", sort_9f32, ids, v9)

    d = jnp.asarray(
        (rng.random(N, dtype=np.float32) * 100 + 0.01).astype(np.float32)
    )
    geo = jnp.asarray(rng.integers(0, 1 << 27, size=N).astype(np.int32))

    @jax.jit
    def depth_sort_f32(dk, g, c):
        return jax.lax.sort(
            (dk, jnp.arange(N, dtype=jnp.int32), g, c), num_keys=1, is_stable=True
        )

    @jax.jit
    def depth_sort_bitcast(dk, g, c):
        # positive floats: IEEE bits order-preserving as s32
        kb = jax.lax.bitcast_convert_type(dk, jnp.int32)
        return jax.lax.sort(
            (kb, jnp.arange(N, dtype=jnp.int32), g, c), num_keys=1, is_stable=True
        )

    timeit("depth sort f32 key (current)", depth_sort_f32, d, geo, cnt)
    timeit("depth sort s32 bitcast key", depth_sort_bitcast, d, geo, cnt)

    print("== full scheme B chain ==", flush=True)

    @jax.jit
    def scheme_b(ids_, v, cnt_, ni):
        # padding-first key: real ids ascending after all padding
        key = jnp.where(ids_ >= 0, ids_, -1)
        ops = (key,) + tuple(
            jax.lax.bitcast_convert_type(v[:, j], jnp.int32) for j in range(9)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
        cols = [
            jax.lax.bitcast_convert_type(c, jnp.float32)[CAPT - CAP :]
            for c in sorted_ops[1:]
        ]
        slot_v = jnp.stack(cols + [jnp.zeros(CAP, jnp.float32)] * 7, axis=1)
        csi = jnp.cumsum(slot_v, axis=0)
        en = jnp.cumsum(cnt_) + (CAP - ni)
        ic = jnp.clip(en, 0, CAP)
        fence = jnp.where((ic > 0)[:, None], csi[jnp.maximum(ic - 1, 0)], 0.0)
        seg = fence - jnp.concatenate(
            [jnp.zeros((1, 16), jnp.float32), fence[:-1]], axis=0
        )
        return seg[:, :9]

    timeit("scheme B end-to-end", scheme_b, ids, v9, cnt, n_isects)

    @jax.jit
    def chain_pieces(ids_, v, cnt_, ni):
        key = jnp.where(ids_ >= 0, ids_, -1)
        ops = (key,) + tuple(
            jax.lax.bitcast_convert_type(v[:, j], jnp.int32) for j in range(9)
        )
        return jax.lax.sort(ops, num_keys=1, is_stable=True)[1]

    timeit("scheme B sort only", chain_pieces, ids, v9, cnt, n_isects)

    print("== cumsum/stack layout ==", flush=True)
    nine = tuple(
        jnp.asarray(rng.standard_normal(CAP, dtype=np.float32)) for _ in range(9)
    )

    @jax.jit
    def stack_pad_cumsum(cols):
        x = jnp.stack(list(cols) + [jnp.zeros(CAP, jnp.float32)] * 7, axis=1)
        return jnp.cumsum(x, axis=0)

    @jax.jit
    def stack9_cumsum(cols):
        x = jnp.stack(cols, axis=1)
        return jnp.cumsum(x, axis=0)

    c16 = timeit("stack->(CAP,16)->cumsum", stack_pad_cumsum, nine)
    c9 = timeit("stack->(CAP,9)->cumsum", stack9_cumsum, nine)

    print("== fwd attr gather: aligned vs real-only rows ==", flush=True)
    tbl = jnp.asarray(rng.standard_normal((N, 9), dtype=np.float32))
    gi_t = jnp.asarray(rng.integers(0, N, size=CAPT).astype(np.int32))
    gi_r = gi_t[:CAP]

    @jax.jit
    def gat(t, i):
        return t[i]

    timeit("gather (CAPT=3.4M,9)", gat, tbl, gi_t)
    timeit("gather (CAP=2.36M,9)", gat, tbl, gi_r)


if __name__ == "__main__":
    main()
