"""Measure instance count + fwd/bwd rasterize time under the current tile
shape at bench scale (adapts ISECT_CAP via the trainer's bucket rule)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from clm_gs_tpu.ops import rasterize as R
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.utils.bench_scene import H, W, make_scene, drain_scalar


def main():
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    p = state.params
    scales = jnp.exp(p.log_scale)
    proj = fully_fused_projection(
        p.xyz, p.quat, scales, cb.viewmats[:1], cb.Ks[:1], W, H,
        alive=state.alive,
    )
    means2d, depths, conics, radii = (
        proj.means2d[0], proj.depths[0], proj.conics[0], proj.radii[0]
    )
    colors = jnp.abs(jnp.tanh(p.xyz))
    opac = jax.nn.sigmoid(p.opacity)

    # count instances with a tiny cap first (n_isects is exact regardless)
    _, _, n = jax.jit(R.rasterize, static_argnames=("width", "height", "isect_cap"))(
        means2d, conics, colors, opac, depths, radii, W, H, bg, 262144
    )
    n = int(n)
    cap = -(-int(n * 1.15) // (1 << 17)) * (1 << 17)
    print(f"tile {R.TILE_W}x{R.TILE_H} K={R.K}: n_isects {n} -> cap {cap}",
          flush=True)

    def fwd(op):
        img, alpha, _ = R.rasterize(
            means2d, conics, colors, op, depths, radii, W, H, bg, cap
        )
        return img

    def fwd_bwd(op):
        def loss(o):
            img, _, _ = R.rasterize(
                means2d, conics, colors, o, depths, radii, W, H, bg, cap
            )
            return jnp.sum(img * img)

        return jax.grad(loss)(op)

    for name, fn in (("fwd", jax.jit(fwd)), ("fwd+bwd", jax.jit(fwd_bwd))):
        out = fn(opac)
        drain_scalar(out)
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            out = fn(opac)
        drain_scalar(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
