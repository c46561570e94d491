"""Isolate the Pallas compositing kernels' cost structure at bench scale.

Questions:
  1. What does a SKIPPED chunk cost? (high-opacity variant terminates every
     tile within ~8 instances, so chunks 2+ of every tile hit the alldone
     skip — the delta vs the low-opacity variant isolates skip overhead.)
  2. fwd vs bwd kernel split, gather, binning — fresh per-stage numbers
     after the round-2 glue rewrite.

Usage: nohup timeout 2400 python -u tools/kernel_probe.py > /tmp/kp.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from clm_gs_tpu.ops import rasterize as R
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.utils.bench_scene import H, ISECT_CAP, W, make_scene


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    _ = float(leaves[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    _ = float(leaves[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    p = state.params
    scales = jnp.exp(p.log_scale)
    proj = fully_fused_projection(
        p.xyz, p.quat, scales, cb.viewmats[:1], cb.Ks[:1], W, H,
        alive=state.alive,
    )
    radii = proj.radii[0]
    means2d = proj.means2d[0]
    depths = proj.depths[0]
    conics = proj.conics[0]
    colors = jnp.abs(jnp.tanh(p.xyz))  # arbitrary (N,3) in [0,1]

    def fwd(op):
        img, alpha, n = R.rasterize(
            means2d, conics, colors, op, depths, radii, W, H, bg, ISECT_CAP
        )
        return img

    op_normal = jax.nn.sigmoid(p.opacity)
    op_hi = jnp.full_like(p.opacity, 0.999)  # terminate in ~8 instances
    op_lo = jnp.full_like(p.opacity, 0.02)  # never terminate: full compute

    f = jax.jit(fwd)
    t_norm = timeit("fwd rasterize (bench opacities)", f, op_normal)
    t_hi = timeit("fwd rasterize (op=0.999, max skip)", f, op_hi)
    t_lo = timeit("fwd rasterize (op=0.02, no skip)", f, op_lo)
    print(f"-> skip-bound floor {t_hi:.1f} ms vs full-compute {t_lo:.1f} ms",
          flush=True)

    def fwd_bwd(op):
        def loss(o):
            img, _, _ = R.rasterize(
                means2d, conics, colors, o, depths, radii, W, H, bg, ISECT_CAP
            )
            return jnp.sum(img * img)

        return jax.grad(loss)(op)

    g = jax.jit(fwd_bwd)
    timeit("fwd+bwd rasterize (bench opacities)", g, op_normal)
    timeit("fwd+bwd rasterize (op=0.999)", g, op_hi)


if __name__ == "__main__":
    main()
