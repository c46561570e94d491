"""Measure XLA:TPU HBM layout bloat for (N, k) arrays with small minor dims.

Hypothesis (from sh_probe's 3 ms "read floor" on a 192 MB (1M,48) table =
~2.7x over bandwidth): f32 arrays tile as (8,128), padding the minor dim to
128 — so (N,3) xyz reads 42x its logical bytes, (N,48) SH reads 2.7x.
If true, storing the model pytree transposed ((k, N): minor dim N, no pad)
is a large, global win: projection, SH, Adam, extents, and the gather-table
build all read these arrays every camera.

Usage: nohup timeout 2400 python -u tools/layout_probe.py > /tmp/lp.log 2>&1 &

RESULT (chip, 2026-08-19): hypothesis NOT confirmed — every variant from
(N,3)/12 MB to (N,128)/512 MB times ~4.5-4.7 ms: a fixed ~4.5 ms floor per
jitted execution through the axon tunnel dominates, so (a) HBM layout padding
is unmeasurable this way and cannot be the claimed multi-ms cost, and (b) ALL
standalone per-stage timings (profile_stages, the micro probes) carry ~4.5 ms
of overhead each — only in-situ xplane traces or whole-step deltas are
trustworthy for stages under ~10 ms.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000


def drain(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.asarray(leaf).reshape(-1)[-1])


def timeit(name, fn, *args, iters=10):
    drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    for k in (3, 4, 16, 48, 128):
        a_nk = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
        a_kn = jnp.asarray(rng.normal(size=(k, N)).astype(np.float32))
        a_flat = jnp.asarray(rng.normal(size=(N * k,)).astype(np.float32))
        red_nk = jax.jit(lambda x: jnp.sum(x, axis=1))
        red_kn = jax.jit(lambda x: jnp.sum(x, axis=0))
        red_flat = jax.jit(lambda x: jnp.sum(x.reshape(N, k), axis=1))
        mb = N * k * 4 / 1e6
        t1 = timeit(f"(N,{k}) row-sum [{mb:.0f} MB]", red_nk, a_nk)
        t2 = timeit(f"({k},N) col-sum", red_kn, a_kn)
        t3 = timeit(f"flat (N*{k},) reshape row-sum", red_flat, a_flat)

    # elementwise chain like the Adam update: p - lr * m / (sqrt(v) + eps)
    for k, name in ((3, "xyz-like"), (48, "sh-like")):
        p = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
        m = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
        v = jnp.asarray(rng.random(size=(N, k)).astype(np.float32))
        pT, mT, vT = (jnp.asarray(np.asarray(x).T.copy()) for x in (p, m, v))

        @jax.jit
        def adam_nk(p, m, v):
            return p - 0.01 * m / (jnp.sqrt(v) + 1e-15)

        timeit(f"adam-like (N,{k}) [{name}]", adam_nk, p, m, v)
        timeit(f"adam-like ({k},N) [{name}]", adam_nk, pT, mT, vT)


if __name__ == "__main__":
    main()
