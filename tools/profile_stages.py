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


def timeit(name, fn, *args, n=10):
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
    tw, th = -(-W // R.TILE_W), -(-H // R.TILE_H)
    cap_round = -(-ISECT_CAP // R.K) * R.K

    # ---- 4. binning ----
    ext_fn = jax.jit(T.tight_extents)
    (ext, _) = timeit("tight_extents", ext_fn, conics, opac, radii)

    def binning(m, r, d, rx, ry):
        return T.isect_tiles_aligned(m, r, d, (R.TILE_W, R.TILE_H), tw, th,
                                     cap_round, R.ALIGN, extents=(rx, ry))

    (aligned, _) = timeit("binning(aligned)", jax.jit(binning), means2d, radii,
                          depths, ext[0], ext[1])
    print(f"  n_isects(tight)={int(aligned.n_isects)}", flush=True)

    # ---- 5. gather fwd / fwd+bwd ----
    table = jnp.concatenate(
        [means2d, conics, opac[:, None],
         jnp.zeros((p.capacity, 3), jnp.float32)], axis=1)

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

    # ---- 8. binning sub-stages (where do the ~70 ms go?) ----
    from clm_gs_tpu.ops.tiles import _forward_fill, tile_bbox

    n = p.capacity
    num_t = tw * th

    @jax.jit
    def depth_sort(m, r, d, rx, ry):
        x0, x1, y0, y1 = tile_bbox(m, rx, ry, (R.TILE_W, R.TILE_H), tw, th)
        geo_pre = (x0 << 18) | (y0 << 9) | (x1 - x0)
        valid_g = (r > 0) & (rx > 0) & (ry > 0)
        cnt_pre = jnp.where(valid_g, (x1 - x0) * (y1 - y0), 0)
        d_key = jnp.where(valid_g, d, jnp.inf)
        return jax.lax.sort(
            (d_key, jnp.arange(n, dtype=jnp.int32), geo_pre, cnt_pre),
            num_keys=1, is_stable=True,
        )

    (ds, _) = timeit("bin:depth_sort", depth_sort, means2d, radii, depths,
                     ext[0], ext[1])
    _, order_, geo_, cnt_ = ds

    @jax.jit
    def expand(order_, geo_, cnt_):
        cum = jnp.cumsum(cnt_)
        starts_g = cum - cnt_
        dst = jnp.where(cnt_ > 0, starts_g, cap_round)

        def scat(src):
            return jnp.zeros(cap_round, jnp.int32).at[dst].set(src, mode="drop")

        return _forward_fill((scat(geo_), scat(starts_g), scat(order_)))

    (ff, _) = timeit("bin:scatter+fill", expand, order_, geo_, cnt_)

    @jax.jit
    def mk_tile(geo_f, starts_f, cnt_):
        n_is = jnp.sum(cnt_)
        slots = jnp.arange(cap_round, dtype=jnp.int32)
        local = slots - starts_f
        w_ = jnp.maximum(geo_f & 0x1FF, 1)
        ty_ = ((geo_f >> 9) & 0x1FF) + local // w_
        tx_ = (geo_f >> 18) + local % w_
        return jnp.where(slots < n_is, ty_ * tw + tx_, num_t)

    tile_arr = mk_tile(ff[0], ff[1], cnt_)
    hist = jax.jit(
        lambda t: jnp.zeros(num_t + 1, jnp.int32).at[t].add(1, mode="drop")
    )
    timeit("bin:histogram_scatter", hist, tile_arr)

    @jax.jit
    def hist_corners(m, rx, ry, r):
        # alternative: per-gaussian 4-corner +-1 scatter + 2D cumsum
        x0, x1, y0, y1 = tile_bbox(m, rx, ry, (R.TILE_W, R.TILE_H), tw, th)
        valid = (r > 0) & (rx > 0) & (ry > 0)
        one = jnp.where(valid, 1, 0)
        g = jnp.zeros((th + 1) * (tw + 1), jnp.int32)
        g = g.at[y0 * (tw + 1) + x0].add(one, mode="drop")
        g = g.at[y0 * (tw + 1) + x1].add(-one, mode="drop")
        g = g.at[y1 * (tw + 1) + x0].add(-one, mode="drop")
        g = g.at[y1 * (tw + 1) + x1].add(one, mode="drop")
        g = g.reshape(th + 1, tw + 1)
        return jnp.cumsum(jnp.cumsum(g, axis=0), axis=1)[:th, :tw]

    timeit("bin:hist_corners(alt)", hist_corners, means2d, ext[0], ext[1], radii)

    dcap = R.ALIGN * num_t
    keys = jnp.concatenate([tile_arr, jnp.full(dcap, num_t, jnp.int32)])
    pay = jnp.concatenate(
        [jnp.arange(cap_round, dtype=jnp.int32), jnp.full(dcap, -1, jnp.int32)]
    )
    src = jnp.arange(cap_round + dcap, dtype=jnp.int32)
    fsort = jax.jit(
        lambda k, p1, p2: jax.lax.sort((k, p1, p2), num_keys=1, is_stable=True)
    )
    timeit("bin:final_sort3", fsort, keys, pay, src)


if __name__ == "__main__":
    main()
