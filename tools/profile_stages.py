"""Per-stage timing of the rasterization pipeline on the real chip.

Times each stage of the no_offload training step standalone at bench scale
(the reference brackets these with NVTX + Timer, utils/timer.py:6-84; here the
stages live inside one jit so they are profiled as standalone jits on the
benchmark scene). Most important measurements run first — remote-compile
latency is variable, so a timeout still yields the top numbers.

Usage: timeout 1800 python tools/profile_stages.py [--quick]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.utils.bench_scene import (
    BSZ, H, ISECT_CAP, W, drain_scalar, make_scene,
)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    first = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    drain_scalar(first[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain_scalar(first[0] if not hasattr(out, "ndim") else out)
    # re-fetch leaves of the LAST call
    last = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    drain_scalar(last[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    global W, H, ISECT_CAP
    quick = "--quick" in sys.argv
    if "--cpu-smoke" in sys.argv:  # tiny-scale correctness pass on CPU
        jax.config.update("jax_platforms", "cpu")
        W, H, ISECT_CAP = 128, 96, 65536
        state, opt, cb, gts, lrs, adam_cfg, bg = make_scene(
            n=2000, cap=4096, w=W, h=H
        )
    else:
        state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    p = state.params
    alive = state.alive
    vm, K, c2w, gt = cb.viewmats[0], cb.Ks[0], cb.camtoworlds[0], gts[0]
    campos = c2w[:3, 3]

    from clm_gs_tpu.models.gaussians import activated, sh_coeffs
    from clm_gs_tpu.ops import rasterize as R
    from clm_gs_tpu.ops import tiles as T
    from clm_gs_tpu.ops.projection import fully_fused_projection
    from clm_gs_tpu.ops.sh import degree_mask, sh_basis
    from clm_gs_tpu.ops.ssim import combined_loss
    from clm_gs_tpu.strategies import no_offload
    from clm_gs_tpu.strategies.base import photometric_loss, render_one_cam

    # ---- 1. headline: full step (4 cameras) ----
    def step(s, o):
        return no_offload.train_step(
            s, o, cb, gts, 3, lrs, adam_cfg, bg, W, H, ISECT_CAP,
            accumulate_stats=False,
        )

    (s2, o2, out), dt_step = timeit("full_step(4 cams)", step, state, opt, n=2)
    print(f"  -> {BSZ * W * H / dt_step / 1e6:.2f} Mpix/s", flush=True)

    # ---- 2. one-camera fwd+bwd (loss grad) ----
    @jax.jit
    def fwd_bwd(p, probe):
        def loss_fn(p, probe):
            outr = render_one_cam(
                p, alive, vm, K, campos, 3, W, H, bg, ISECT_CAP, probe=probe
            )
            return photometric_loss(outr.image, gt)

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(p, probe)

    probe0 = jnp.zeros((p.capacity, 2), jnp.float32)
    timeit("fwd_bwd(1 cam)", fwd_bwd, p, probe0)

    # ---- 3. fwd only ----
    @jax.jit
    def fwd(p):
        return render_one_cam(p, alive, vm, K, campos, 3, W, H, bg, ISECT_CAP)

    (outr, _) = timeit("fwd(1 cam)", fwd, p)
    print(f"  n_isects={int(outr.n_isects)} "
          f"n_visible={int(jnp.sum(outr.radii > 0))}", flush=True)

    # ---- stage inputs ----
    opac, scales = activated(p)
    proj = fully_fused_projection(p.xyz, p.quat, scales, vm[None], K[None], W, H,
                                  alive=alive)
    means2d, depths, radii, conics = (
        proj.means2d[0], proj.depths[0], proj.radii[0], proj.conics[0],
    )
    tw, th = -(-W // 16), -(-H // 16)
    cap_round = -(-ISECT_CAP // R.K) * R.K

    # ---- 4. binning ----
    def binning(m, r, d):
        return T.isect_tiles_aligned(m, r, d, 16, tw, th, cap_round, R.ALIGN)

    (aligned, _) = timeit("binning(aligned)", binning, means2d, radii, depths)

    # ---- 5. gather fwd / fwd+bwd ----
    table = jnp.concatenate(
        [means2d, conics, opac[:, None],
         jnp.zeros((p.capacity, 3), jnp.float32),
         jnp.zeros((p.capacity, R.ATTR_ROWS - 9), jnp.float32)], axis=1)

    gath = jax.jit(lambda t, a: R._gather_attrs(t, a, cap_round))
    (attrs_rows, _) = timeit("gather_fwd", gath, table, aligned)

    gath_g = jax.jit(
        jax.grad(lambda t, a: jnp.sum(R._gather_attrs(t, a, cap_round)))
    )
    timeit("gather_fwd+bwd", gath_g, table, aligned)

    # ---- 6. chunk plan + raster kernels ----
    num_tiles = tw * th
    chunk_cap = cap_round // R.K + num_tiles + 1
    plan_fn = jax.jit(
        lambda c, s: R._chunk_plan(c, s, num_tiles, chunk_cap,
                                   (cap_round + R.ALIGN * num_tiles) // R.K + 1)
    )
    (plan, _) = timeit("chunk_plan", plan_fn, aligned.counts, aligned.starts)

    meta = (tw, th, chunk_cap)
    rast = jax.jit(lambda a, pl: R._rasterize_sorted(a, pl, meta, bg))
    timeit("raster_fwd_kernel", rast, attrs_rows, plan)

    rast_g = jax.jit(
        jax.grad(lambda a, pl: jnp.sum(R._rasterize_sorted(a, pl, meta, bg)))
    )
    timeit("raster_fwd+bwd_kernel", rast_g, attrs_rows, plan)

    if quick:
        return

    # ---- 7. projection / SH / SSIM / adam ----
    projj = jax.jit(
        lambda xyz, quat, sc: fully_fused_projection(
            xyz, quat, sc, vm[None], K[None], W, H, alive=alive)
    )
    timeit("projection_fwd", projj, p.xyz, p.quat, scales)

    proj_g = jax.jit(jax.grad(
        lambda xyz, quat, sc: jnp.sum(
            fully_fused_projection(xyz, quat, sc, vm[None], K[None], W, H,
                                   alive=alive).means2d)
    , argnums=(0, 1, 2)))
    timeit("projection_fwd+bwd", proj_g, p.xyz, p.quat, scales)

    @jax.jit
    def sh_fwd(xyz, sh):
        dirs = xyz - campos[None, :]
        basis = sh_basis(dirs) * degree_mask(3)
        return jnp.maximum(
            jnp.einsum("nk,nkc->nc", basis, sh.reshape(-1, 16, 3)) + 0.5, 0.0)

    timeit("sh_fwd", sh_fwd, p.xyz, p.sh)
    sh_g = jax.jit(jax.grad(lambda xyz, sh: jnp.sum(sh_fwd(xyz, sh)),
                            argnums=(0, 1)))
    timeit("sh_fwd+bwd", sh_g, p.xyz, p.sh)

    img = jnp.zeros((3, H, W), jnp.float32)
    ssim_g = jax.jit(jax.grad(lambda a, b: combined_loss(a, b, 0.2)))
    timeit("loss_fwd+bwd", ssim_g, img, gt)

    from clm_gs_tpu.optim import adam_step
    ad = jax.jit(lambda p, g, o: adam_step(p, g, o, lrs, adam_cfg, alive))
    grads = jax.tree.map(jnp.zeros_like, p)
    timeit("adam_step", ad, p, grads, opt)

    # ---- 8. instance-count headroom: circle vs ellipse-tight rect bbox ----
    det = conics[:, 0] * conics[:, 2] - conics[:, 1] ** 2
    det = jnp.maximum(det, 1e-12)
    sxx, syy = conics[:, 2] / det, conics[:, 0] / det
    rx = 3.0 * jnp.sqrt(jnp.maximum(sxx, 0.0))
    ry = 3.0 * jnp.sqrt(jnp.maximum(syy, 0.0))

    def cnt(rx_, ry_):
        x0 = jnp.clip(jnp.floor((means2d[:, 0] - rx_) / 16), 0, tw)
        x1 = jnp.clip(jnp.ceil((means2d[:, 0] + rx_) / 16), 0, tw)
        y0 = jnp.clip(jnp.floor((means2d[:, 1] - ry_) / 16), 0, th)
        y1 = jnp.clip(jnp.ceil((means2d[:, 1] + ry_) / 16), 0, th)
        return jnp.sum(jnp.where(radii > 0, (x1 - x0) * (y1 - y0), 0.0))

    n_circle = float(cnt(radii, radii))
    n_rect = float(cnt(jnp.minimum(rx, radii), jnp.minimum(ry, radii)))
    print(f"isects circle={n_circle:.0f} rect={n_rect:.0f} "
          f"ratio={n_rect / max(n_circle, 1):.3f}", flush=True)
    # opacity-aware radius: alpha < 1/255 cannot contribute
    lim = 2.0 * jnp.log(jnp.maximum(opac, 1e-8) * 255.0)
    shrink = jnp.sqrt(jnp.clip(lim, 0.0, 9.0) / 9.0)
    n_op = float(cnt(jnp.minimum(rx, radii) * shrink,
                     jnp.minimum(ry, radii) * shrink))
    print(f"isects rect+opacity={n_op:.0f} ratio={n_op / max(n_circle, 1):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
