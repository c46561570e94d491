"""How many binning instances would EXACT per-tile ellipse coverage remove,
vs the tight-extents bbox the pipeline bins today? (VERDICT r5 lever #2
scoping probe — decides whether a coverage-exact expansion is worth building.)

Runs fully on the CPU backend: projection of the bench scene + a numpy
replica of ops/tiles._tile_min_sigma evaluated over every bbox tile.

Usage: python tools/coverage_probe.py [n_gaussians]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from clm_gs_tpu.ops.projection import fully_fused_projection  # noqa: E402
from clm_gs_tpu.ops.rasterize import TILE_H, TILE_W  # noqa: E402
from clm_gs_tpu.ops.tiles import _CULL_MARGIN, tight_extents, tile_bbox  # noqa: E402
from clm_gs_tpu.utils import bench_scene as bs  # noqa: E402


def tile_min_sigma_np(lx0, lx1, ly0, ly1, ca, cb, cc):
    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    ca_s = np.where(np.abs(ca) > 1e-12, ca, 1e-12)
    cc_s = np.where(np.abs(cc) > 1e-12, cc, 1e-12)
    s = q(lx0, np.clip(-cb * lx0 / cc_s, ly0, ly1))
    s = np.minimum(s, q(lx1, np.clip(-cb * lx1 / cc_s, ly0, ly1)))
    s = np.minimum(s, q(np.clip(-cb * ly0 / ca_s, lx0, lx1), ly0))
    s = np.minimum(s, q(np.clip(-cb * ly1 / ca_s, lx0, lx1), ly1))
    s = np.minimum(s, np.minimum(q(lx0, ly0), q(lx0, ly1)))
    s = np.minimum(s, np.minimum(q(lx1, ly0), q(lx1, ly1)))
    inside = (lx0 <= 0) & (lx1 >= 0) & (ly0 <= 0) & (ly1 >= 0)
    return np.where(inside, np.minimum(0.0, s), s)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else bs.N
    state, _opt, cb, _gts, _lrs, _ac, _bg = bs.make_scene(n=n, cap=n)
    p = state.params
    W, H = bs.W, bs.H
    tw, th = -(-W // TILE_W), -(-H // TILE_H)

    import jax.numpy as jnp

    proj = fully_fused_projection(
        p.xyz, p.quat, jnp.exp(p.log_scale), cb.viewmats, cb.Ks, W, H,
        alive=state.alive,
    )
    tot_bbox = tot_kept = 0
    bbox_le32 = bbox_all = 0
    for cam in range(cb.viewmats.shape[0]):
        means2d = np.asarray(proj.means2d[cam])
        conics = np.asarray(proj.conics[cam])
        radii = np.asarray(proj.radii[cam])
        op = np.asarray(jax.nn.sigmoid(p.opacity))
        rx, ry = (np.asarray(x) for x in tight_extents(
            jnp.asarray(conics), jnp.asarray(op), jnp.asarray(radii)))
        x0, x1, y0, y1 = (np.asarray(v) for v in tile_bbox(
            jnp.asarray(means2d), jnp.asarray(rx), jnp.asarray(ry),
            (TILE_W, TILE_H), tw, th))
        valid = (radii > 0) & (rx > 0) & (ry > 0)
        w = np.where(valid, x1 - x0, 0)
        h = np.where(valid, y1 - y0, 0)
        cnt = w * h
        n_bbox = int(cnt.sum())

        t_sup = np.log(255.0 * np.maximum(op, 1e-12))
        inv_t = 1.0 / np.maximum(t_sup, 1e-6)
        ca = conics[:, 0] * inv_t
        cbc = conics[:, 1] * inv_t
        cc = conics[:, 2] * inv_t
        mx, my = means2d[:, 0], means2d[:, 1]

        max_w, max_h = int(w.max()), int(h.max())
        kept = np.zeros_like(cnt)
        for j in range(max_w):
            for i in range(max_h):
                m = valid & (j < w) & (i < h)
                if not m.any():
                    continue
                tx = x0 + j
                ty = y0 + i
                lx0 = tx.astype(np.float64) * TILE_W + 0.5 - mx
                ly0 = ty.astype(np.float64) * TILE_H + 0.5 - my
                smin = tile_min_sigma_np(
                    lx0, lx0 + (TILE_W - 1), ly0, ly0 + (TILE_H - 1),
                    ca, cbc, cc,
                )
                kept += (m & (smin <= 1.0 + _CULL_MARGIN)).astype(np.int64)
        n_kept = int(kept.sum())
        tot_bbox += n_bbox
        tot_kept += n_kept
        bbox_le32 += int(((cnt <= 32) & valid).sum())
        bbox_all += int(valid.sum())
        print(
            f"cam {cam}: bbox instances {n_bbox}, exact-coverage kept "
            f"{n_kept} ({100*(1-n_kept/max(n_bbox,1)):.1f}% cullable), "
            f"max bbox {max_w}x{max_h}"
        )
    print(
        f"TOTAL: bbox {tot_bbox}, kept {tot_kept} "
        f"({100*(1-tot_kept/max(tot_bbox,1)):.1f}% cullable at "
        f"{TILE_W}x{TILE_H} tiles); "
        f"bbox<=32 tiles: {100*bbox_le32/max(bbox_all,1):.1f}% of visible"
    )


if __name__ == "__main__":
    main()
