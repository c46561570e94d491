"""Standalone per-stage timings of the rasterize pipeline at bench scale.

Times each stage as its own jit (binning, gather, plan, fwd kernel, bwd
kernel, grad reduction) so the sum can be compared against the fused
end-to-end rasterize fwd/bwd numbers — any large gap is dispatch/async or
mis-attributed fusion cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from clm_gs_tpu.ops import rasterize as R
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.tiles import isect_tiles_aligned, tight_extents
from clm_gs_tpu.utils.bench_scene import H, W, make_scene, drain_scalar

CAP = 2097152


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    drain_scalar(leaves[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")]
    drain_scalar(leaves[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    p = state.params
    proj = fully_fused_projection(
        p.xyz, p.quat, jnp.exp(p.log_scale), cb.viewmats[:1], cb.Ks[:1], W, H,
        alive=state.alive,
    )
    means2d, depths, conics, radii = (
        proj.means2d[0], proj.depths[0], proj.conics[0], proj.radii[0]
    )
    colors = jnp.abs(jnp.tanh(p.xyz))
    opac = jax.nn.sigmoid(p.opacity)

    tw, th = -(-W // R.TILE_W), -(-H // R.TILE_H)
    num_tiles = tw * th
    cap_round = -(-CAP // R.K) * R.K
    cap_padded = cap_round + R.ALIGN * num_tiles
    chunk_cap = cap_round // R.K + num_tiles + 1
    n_blocks = cap_padded // R.K + 1

    # 1. binning (depth sort + expansion + counts + dummy sort)
    def binning(m, r, d, c, o):
        ext = tight_extents(c, o, r)
        return isect_tiles_aligned(
            m, r, d, (R.TILE_W, R.TILE_H), tw, th, cap_round, R.ALIGN,
            extents=ext,
        )
    aligned, t_bin = timeit("binning (isect_tiles_aligned)", jax.jit(binning),
                            means2d, radii, depths, conics, opac)

    # 2. attr gather
    def gather(m, c, o, col):
        table = jnp.concatenate([m, c, o[:, None], col], axis=1)
        return R._gather_attrs(table, aligned, cap_round)
    attrs_rows, t_gath = timeit("attr gather (cap_padded, 9)", jax.jit(gather),
                                means2d, conics, opac, colors)

    # 3. chunk plan
    plan, t_plan = timeit(
        "chunk plan", jax.jit(
            lambda c, s: R._chunk_plan(c, s, num_tiles, chunk_cap, n_blocks)
        ), aligned.counts, aligned.starts,
    )

    # 4. fwd kernel (incl. block build)
    meta = (tw, th, chunk_cap)
    fwd = jax.jit(lambda a, pl_: R._rasterize_sorted_fwd(a, pl_, meta, bg)[0][0])
    out, t_fwd = timeit("fwd pallas (+block build)", fwd, attrs_rows, plan)
    lc = jax.jit(lambda a, pl_: R._rasterize_sorted_fwd(a, pl_, meta, bg)[1][4])(
        attrs_rows, plan)

    # 5. bwd kernel alone (prebuilt residual)
    attrs_b = jax.jit(R._attrs_blocks)(attrs_rows)
    v_out = out * 2.0

    def bwd(ab, o, v):
        return R._rasterize_sorted_bwd(meta, (ab, plan, bg, o, lc), v)
    _, t_bwd = timeit("bwd pallas (+v_bg)", jax.jit(bwd), attrs_b, out, v_out)

    # 6. grad reduction (sort + segment reduce) on fake per-slot grads
    v_rows = attrs_rows * 1.5

    def gred(v):
        return R._gather_attrs_bwd(cap_round, (aligned, means2d.shape[0]), v)[0]
    _, t_gred = timeit("grad reduce (sort+segreduce)", jax.jit(gred), v_rows)

    total = t_bin + t_gath + t_plan + t_fwd + t_bwd + t_gred
    print(f"{'sum of stages':34s} {total:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
