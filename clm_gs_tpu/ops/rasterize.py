"""Pallas TPU rasterizer: per-tile front-to-back alpha compositing, fwd + bwd.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site strategies/base_engine.py:192-203). Design:

  - The binning stage (ops/tiles.py) yields a flat instance list grouped by
    tile and depth-ordered within each tile. Per-tile ranges are re-laid so
    each starts at a K-aligned slot (align_tile_ranges), i.e. every tile owns
    an integral number of K-instance *chunks*.
  - Per-instance attributes are pre-gathered (one row-gather of a packed
    (N, 16) table — random-access count, not payload bytes, dominates TPU
    gather cost) and reshaped into (num_blocks, 16, K) chunk blocks.
  - The kernels run a 1-D grid over *chunks* (not tiles): a precomputed chunk
    list maps each grid step to (tile, attr block, #valid rows, first/last
    flags) via scalar prefetch, and Mosaic's BlockSpec pipeline streams the
    chunk blocks HBM->VMEM automatically (double-buffered, no manual DMA or
    semaphores). Consecutive chunks of one tile revisit the same output
    block, which therefore stays resident in VMEM and acts as the
    accumulator; transmittance/termination carries live in scratch and reset
    at each tile's first chunk. This replaces the earlier tile-grid design
    whose manual DMA + while-loop cost ~15 us of overhead per chunk.
  - Compute per chunk: one small (16, K) -> (K, 16) transpose, VPU-vectorized
    alpha evaluation over the (K, P) matrix, and a Hillis-Steele cumulative
    product along the instance (sublane) axis for per-instance transmittance.

Sequential-termination semantics (exactly gsplat's): alpha = min(0.999,
opac*exp(-sigma)); alpha < 1/255 skipped; a pixel stops *before* compositing
the instance that would bring T <= 1e-4. The CUDA loop break is re-expressed
in closed form: with T_k the exclusive cumulative product of (1 - alpha) and
viol_k = (alpha_k > 0 & T_k (1-alpha_k) <= 1e-4), instance k contributes iff no
viol at j <= k. This agrees with the sequential semantics because both
evolutions coincide up to the first violation.

The backward is hand-derived and runs front-to-back as well (the CUDA versions
walk back-to-front): with w_k = alpha_k T_k the compositing weight and
ctilde = [rgb, 1] the 4-channel color,

    d out / d alpha_k = T_k ctilde_k - A_k / (1 - alpha_k),
    A_k = Total4 - prefix_incl_k   (Total4 = fwd output, so the background
                                    term T_fin*bg folds in for free),

and the contraction of A_k with the incoming cotangent collapses to a single
cumulative sum of w * (ctilde @ v) — no per-channel prefix arrays needed.
Each chunk writes its gradients to its own output block; per-Gaussian
gradients come from the autodiff transpose of the attribute gather
(segment-sum; atomics-free by construction, SURVEY.md §7.2 hard-part #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clm_gs_tpu.ops.tiles import (_forward_fill, isect_tiles_aligned,
                                  isect_tiles_aligned_batch, pack_bf16_pair,
                                  tight_extents, unpack_bf16_pair)

import os

TILE_W = int(os.environ.get("CLMGS_TILE_W", "64"))
TILE_H = int(os.environ.get("CLMGS_TILE_H", "32"))
P = TILE_W * TILE_H  # 2048 pixels per tile. Bigger tiles cut per-splat tile
# coverage — instance count is what every post-scatter stage scales with
# (fill, tile sort, gather, kernel grid steps, grad-regroup sort). Chip A/B
# at bench scale (2026-08-19), (tile, K) -> Mpix/s (instances):
#   32x16/256: 5.95 (5.77M)   32x24/256: 6.90   64x16/256: 7.54
#   32x32/256: 8.26 (3.67M)   32x32/128: 7.96   48x32/128: 9.09
#   64x32/128: 9.64 (2.62M)   64x32/256 and P>=2560 at K=128: VMEM OOM in
# the backward kernel (16 MB scoped limit). The compositing kernels'
# per-grid-step cost is fetch/sequencing-bound (an all-terminated pass runs
# at 95% of full compute; bf16 blocks and K=512 both measured neutral-to-
# negative at 32x16), so more pixels per step are nearly free while step
# count drops with instances. Output is reassociation-identical (~1 ulp)
# across tile shapes: per-pixel candidate sets and compositing order are
# unchanged by the tile partition.
K = int(os.environ.get("CLMGS_CHUNK_K", "128"))


def _slab_p() -> int:
    """Pixel-slab width (read at trace time): per-pixel temporaries inside
    the kernels are (K, PS), so VMEM pressure is bounded by the slab, not
    the tile — tiles with P > PS (e.g. 64x64 = 4096 px, whose instance
    demand is another ~27% below 64x32's) process their pixels in P // PS
    sequential slabs per chunk step. At the default P <= PS this is one
    slab and the generated kernel is unchanged. Forward output is bitwise
    slab-invariant (per-pixel math); backward per-instance sums
    reassociate across slabs (~1 ulp)."""
    ps = min(P, int(os.environ.get("CLMGS_SLAB_P", "2048")))
    assert P % ps == 0, (P, ps)
    return ps


ALIGN = K  # per-tile ranges own whole chunks

# --- packed chunk plan -------------------------------------------------------
# The kernels' per-chunk metadata is scalar-prefetched into the 1 MB SMEM, so
# its footprint bounds the renderable resolution: the round-3 five-s32 layout
# (20 B/chunk) overflowed at isect_cap ~6.5M (BigCity 640x400 / any 4K). Two
# structural facts shrink it:
#   * the aligned slot layout is DENSE in K-chunks (align_tile_ranges:
#     starts = cumsum(ceil(counts/K)*K)), so a chunk's attr/grad block index
#     EQUALS its grid index — no cslot array needed in the forward at all;
#   * the kernels only need (tile, n_valid, is_first, is_last), which packs
#     into ONE s32: ct << S_CT | cnv << 2 | first << 1 | last.
# Forward SMEM is therefore 4 B/chunk always (172k chunks at 4K = 688 KB).
# The backward's dead-chunk compaction permutes chunks, breaking the
# block==grid-index identity, so it carries an explicit cslot (8 B/chunk) —
# kept only while 2 words fit comfortably (chunk_cap <= COMPACT_MAX_CHUNKS);
# above that the backward skips compaction (identity blocks, zero-filled
# dead chunks) and stays at 4 B/chunk.
CNV_BITS = max(K.bit_length(), 8)
S_CT = 2 + CNV_BITS
CNV_MASK = (1 << CNV_BITS) - 1
COMPACT_MAX_CHUNKS = 96 * 1024


def _pack_plan_word(ct, cnv, first, clast):
    return (
        (ct << S_CT) | (cnv << 2) | (first.astype(jnp.int32) << 1) | clast
    ).astype(jnp.int32)
ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.999

# attrs column layout in the packed table; NGC live columns, zero-padded to
# ATTR_ROWS rows in the (ATTR_ROWS, K) kernel blocks
_MX, _MY, _CA, _CB, _CC, _OP, _R, _G, _B = range(9)
NGC = 9
ATTR_ROWS = 16
# fwd out block rows: 0-3 rgba accumulator, 4 live-chunk count, 5-7 pad
# (8 sublanes = Mosaic's f32 tile height; one 8-row stream is cheaper than
# the previous 4-row image stream + separate (8,128) live-count stream)
OUT_ROWS = 8


def _interpret_mode():
    """Compiled Mosaic on TPU; Pallas interpreter elsewhere (tests, CPU-mesh
    dry runs). The basic interpreter, not the TPU-semantics one: the latter's
    blocking semaphore emulation deadlocks when more virtual devices than host
    cores execute kernels concurrently inside shard_map."""
    return jax.default_backend() != "tpu"


def _shift_down(x, s, fill):
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-s, :]], axis=0)


def _block_scan():
    return os.environ.get("CLMGS_BLOCK_SCAN") == "1"  # read at trace time


def _cum_incl(x, op, identity):
    """Inclusive cumulative `op` along axis 0 (Hillis-Steele doubling).

    CLMGS_BLOCK_SCAN=1 runs it two-level over 32-row blocks: 5 doubling steps
    within blocks + a tiny cross-block carry scan + 1 broadcast combine =
    ~6 full (K, P) ops instead of log2(K) (8 at K=256) — the scan chains are
    the largest remaining VPU block once CLMGS_MXU_GEOM moves sigma to the
    MXU. Different op association => ~1 ulp shifts; off by default pending a
    chip A/B (Mosaic may or may not relayout the (B, 32, P) reshape)."""
    n = x.shape[0]
    blk = 32
    if _block_scan() and n % blk == 0 and n > blk:
        nb = n // blk
        p = x.shape[1]
        x3 = x.reshape(nb, blk, p)
        s = 1
        while s < blk:
            pad = jnp.full((nb, s, p), identity, x.dtype)
            x3 = op(x3, jnp.concatenate([pad, x3[:, :-s, :]], axis=1))
            s *= 2
        # keepdims slice + reshape: integer indexing on the middle dim of a
        # 3-D array lowers to dynamic_slice, which Mosaic does not implement
        c = x3[:, -1:, :].reshape(nb, p)  # (nb, p) block totals
        s = 1
        while s < nb:
            c = op(c, _shift_down(c, s, identity))
            s *= 2
        carries = _shift_down(c, 1, identity)  # exclusive block prefix
        return op(x3, carries[:, None, :]).reshape(n, p)
    s = 1
    while s < n:
        x = op(x, _shift_down(x, s, identity))
        s *= 2
    return x


def _pixel_coords(t, tile_width, slab: int = 0, ps: int = None):
    """Global pixel centers (pxf, pyf) plus tile-local centers and the tile
    origin for one PS-pixel slab of the tile — the MXU-geometry path works in
    tile-local coordinates to keep the expanded bilinear form's terms small
    (see _chunk_geometry)."""
    ty = t // tile_width
    tx = jax.lax.rem(t, tile_width)
    ps = P if ps is None else ps
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1) + slab * ps
    pxl = jax.lax.rem(idx, TILE_W).astype(jnp.float32) + 0.5
    pyl = (idx // TILE_W).astype(jnp.float32) + 0.5
    ox = (tx * TILE_W).astype(jnp.float32)
    oy = (ty * TILE_H).astype(jnp.float32)
    return pxl + ox, pyl + oy, pxl, pyl, ox, oy


def _mxu_geom():
    return os.environ.get("CLMGS_MXU_GEOM") == "1"  # read at trace time


# MXU-geometry path: f32 cancellation in the expanded bilinear form can round
# a true ~0 sigma to a small NEGATIVE value right at a splat's peak pixels,
# which the ok-mask's `sigma >= 0` guard would then zero (alpha 0 at the
# brightest pixel). Snap negatives above this tolerance back to 0 — a PSD
# conic's true sigma is >= 0 — while genuinely negative values (indefinite
# conics) still fail the guard like the exact path. Bound: terms are
# ~ ca * mxc^2 <= ~2 * 33^2 when the mean is near the tile (the only place
# true sigma ~ 0), so the rounding error is <~1e-3; 5e-3 covers it with
# margin while perturbing alpha by at most 0.5% where it fires.
_MXU_SIGMA_SNAP = 5e-3


def _pixel_monomials(pxl, pyl):
    """(8, PS) tile-local pixel monomial rows [1, x, y, x^2, xy, y^2, 0, 0] —
    the shared basis of the fwd bilinear form (U @ V) and the bwd moment
    contraction (v_sigma @ V^T); column order and padding must match the
    moment arithmetic in _bwd_kernel."""
    n = pxl.shape[1]
    return jnp.concatenate(
        [jnp.ones((1, n), jnp.float32), pxl, pyl, pxl * pxl, pxl * pyl,
         pyl * pyl, jnp.zeros((2, n), jnp.float32)],
        axis=0,
    )


def _chunk_geometry(coords, buf_t, n):
    """Shared fwd/bwd per-chunk alpha math.

    coords: _pixel_coords output. buf_t: (K, ATTR_ROWS) chunk attributes
    (already transposed). n: number of valid rows. Returns dict of
    (K, P) / (K, 1) arrays.

    CLMGS_MXU_GEOM=1 rides the MXU: sigma(p) is a rank-6 bilinear form
    sigma = U(K,8) @ V(8,P) with V the pixel monomials [1, x, y, x^2, xy,
    y^2] in TILE-LOCAL coordinates (tile-local x,y and tile-centered means
    keep the expanded form's terms small, so the f32 cancellation error is
    <~1e-3 absolute; near-zero negatives are snapped, see _MXU_SIGMA_SNAP) —
    replacing ~10 (K,P) VPU ops with one matmul. Not bit-exact vs the direct
    dx/dy form (different fp association); off by default pending a chip A/B.
    """
    pxf, pyf, pxl, pyl, ox, oy = coords
    mx = buf_t[:, _MX : _MX + 1]
    my = buf_t[:, _MY : _MY + 1]
    ca = buf_t[:, _CA : _CA + 1]
    cb = buf_t[:, _CB : _CB + 1]
    cc = buf_t[:, _CC : _CC + 1]
    op = buf_t[:, _OP : _OP + 1]
    if _mxu_geom():
        mxc = mx - ox  # tile-local mean (K, 1)
        myc = my - oy
        q0 = 0.5 * (ca * mxc * mxc + cc * myc * myc) + cb * mxc * myc
        U = jnp.concatenate(
            [q0, -(ca * mxc + cb * myc), -(cc * myc + cb * mxc),
             0.5 * ca, cb, 0.5 * cc, jnp.zeros((K, 2), jnp.float32)],
            axis=1,
        )  # (K, 8)
        sigma = jax.lax.dot_general(
            U, _pixel_monomials(pxl, pyl), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sigma = jnp.where(
            sigma > -_MXU_SIGMA_SNAP, jnp.maximum(sigma, 0.0), sigma
        )
        dx = dy = None  # bwd MXU branch uses moment contractions instead
        mx, my = mxc, myc  # bwd moment contractions use local coords
    else:
        dx = pxf - mx  # (K, P)
        dy = pyf - my
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = jnp.exp(-sigma)
    ga = op * vis
    alpha = jnp.minimum(MAX_ALPHA, ga)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    ok = (row < n) & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
    a = jnp.where(ok, alpha, 0.0)
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, vis=vis, ga=ga, a=a, ok=ok,
        mx=mx, my=my,
        ctilde=jnp.concatenate(
            [buf_t[:, _R : _B + 1], jnp.ones((K, 1), jnp.float32)], axis=1
        ),
    )


def _chunk_compositing(g, T, done):
    """Compositing weights for one chunk given carries (T, done)."""
    a = g["a"]
    om = 1.0 - a
    cp_incl = _cum_incl(om, jnp.multiply, 1.0)
    T_excl = T * _shift_down(cp_incl, 1, 1.0)  # (K, P)
    viol = (a > 0) & (T_excl * om <= T_EPS)
    # dead_k = any viol at j <= k == (k >= first violating row): a single
    # min-reduction instead of a second log2(K)-round cumulative scan
    row = jax.lax.broadcasted_iota(jnp.int32, viol.shape, 0)
    first_viol = jnp.min(jnp.where(viol, row, K), axis=0, keepdims=True)
    dead = row >= first_viol
    keep = jnp.logical_not(dead) & jnp.logical_not(done)
    w = jnp.where(keep, a * T_excl, 0.0)
    # Product over the kept prefix: cp_incl is non-increasing in k (om <= 1),
    # and `keep` is a per-pixel prefix mask, so the product over kept rows
    # equals the minimum of cp_incl over them (Mosaic has no reduce_prod, and
    # this also avoids a log1p+exp per element).
    T_new = T * jnp.min(jnp.where(keep, cp_incl, 1.0), axis=0, keepdims=True)
    done_new = done | jnp.any(viol, axis=0, keepdims=True)
    return w, T_excl, keep, T_new, done_new


def _fwd_kernel(wp, attrs_ref, out_ref,
                t_ref, done_ref, *, tile_width, num_tiles, tiles_per_cam):
    i = pl.program_id(0)
    wi = wp[i]
    tile = wi >> S_CT
    nv = (wi >> 2) & CNV_MASK
    first = ((wi >> 1) & 1) == 1
    alive = tile < num_tiles
    # multi-camera batches: the tile is the GLOBAL tile (b*T + t); pixel
    # coords use the camera-local tile (identity when B == 1)
    tloc = jax.lax.rem(tile, tiles_per_cam)

    @pl.when(alive & first)
    def _():
        t_ref[:] = jnp.ones((1, P), jnp.float32)
        done_ref[:] = jnp.zeros((1, P), jnp.float32)
        out_ref[0] = jnp.zeros((OUT_ROWS, P), jnp.float32)

    alldone = jnp.min(done_ref[:]) > 0.5

    @pl.when(alive & jnp.logical_not(alldone))
    def _():
        buf_t = jnp.transpose(attrs_ref[0], (1, 0)).astype(jnp.float32)
        # pixels processed in sequential (K, PS) slabs so VMEM holds one
        # slab's temporaries regardless of tile size (per-pixel math:
        # bitwise slab-invariant)
        ps = _slab_p()
        for s in range(P // ps):
            sl = slice(s * ps, (s + 1) * ps)
            coords = _pixel_coords(tloc, tile_width, s, ps)
            g = _chunk_geometry(coords, buf_t, nv)
            done = done_ref[:, sl] > 0.5
            w, _, _, T_new, done_new = _chunk_compositing(g, t_ref[:, sl], done)
            contrib = jax.lax.dot_general(
                g["ctilde"], w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4, PS)
            out_ref[0, 0:4, sl] += contrib
            t_ref[:, sl] = T_new
            done_ref[:, sl] = done_new.astype(jnp.float32)
        # row 4 counts how many chunks this tile actually composited (one
        # increment per composited chunk — composited chunks are a prefix,
        # so the final value equals the old absolute cloc+1 write): the
        # backward compacts its grid to these live prefixes. Folding it into
        # the revisited out block instead of a separate per-tile output
        # removes one whole block stream from the pipeline (~0.4 us per
        # grid step per stream). The background fold happens outside the
        # kernel in XLA (rows 0:3 + T_fin*bg).
        out_ref[0, 4:5, :] += jnp.ones((1, P), jnp.float32)


def _bwd_kernel(wp, attrs_ref, v_ref, grads_ref,
                t_ref, done_ref, e_ref, *, tile_width, num_tiles,
                tiles_per_cam):
    i = pl.program_id(0)
    wi = wp[i]
    tile = wi >> S_CT
    nv = (wi >> 2) & CNV_MASK
    first = ((wi >> 1) & 1) == 1
    alive = tile < num_tiles
    tloc = jax.lax.rem(tile, tiles_per_cam)

    @pl.when(alive & first)
    def _():
        t_ref[:] = jnp.ones((1, P), jnp.float32)
        done_ref[:] = jnp.zeros((1, P), jnp.float32)
        e_ref[:] = jnp.zeros((1, P), jnp.float32)

    alldone = jnp.min(done_ref[:]) > 0.5
    run = alive & jnp.logical_not(alldone)

    # every visited grad block must be written: zeros when skipping
    @pl.when(jnp.logical_not(run))
    def _():
        grads_ref[0] = jnp.zeros((ATTR_ROWS, K), jnp.float32)

    @pl.when(run)
    def _():
        buf_t = jnp.transpose(attrs_ref[0], (1, 0)).astype(jnp.float32)
        z1 = jnp.zeros((K, 1), jnp.float32)
        acc = dict(
            v_color=jnp.zeros((K, 3), jnp.float32), v_opac=z1, v_ca=z1,
            v_cb=z1, v_cc=z1, v_mx=z1, v_my=z1,
            S=jnp.zeros((K, 8), jnp.float32),
        )
        g = None
        # pixel slabs as in the forward; per-instance sums accumulate
        # across slabs (reassociation ~1 ulp with more than one slab)
        ps = _slab_p()
        for s in range(P // ps):
            sl = slice(s * ps, (s + 1) * ps)
            coords = _pixel_coords(tloc, tile_width, s, ps)
            # (5, P) block: rows 0-3 the output cotangent, row 4 the
            # precomputed <v4, fwd_total> contraction (folding it into one
            # block stream saves a whole per-grid-step input pipeline vs a
            # separate residual block)
            v4 = v_ref[0, 0:4, sl]
            d_tot = v_ref[0, 4:5, sl]  # (1, ps)
            T, done, E = t_ref[:, sl], done_ref[:, sl] > 0.5, e_ref[:, sl]
            g = _chunk_geometry(coords, buf_t, nv)
            w, T_excl, keep, T_new, done_new = _chunk_compositing(g, T, done)

            # dot1[k,p] = sum_c ctilde[k,c] v4[c,p]
            dot1 = jax.lax.dot_general(
                g["ctilde"], v4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, PS)
            cum_wd = _cum_incl(w * dot1, jnp.add, 0.0)
            term_a = d_tot - E - cum_wd  # (K, PS) via broadcast
            a = g["a"]
            om = 1.0 - a
            # gsplat guard: no gradient through the 0.999 clamp
            grad_ok = keep & g["ok"] & (g["ga"] <= MAX_ALPHA)
            v_a = jnp.where(grad_ok, T_excl * dot1 - term_a / om, 0.0)
            v_sigma = -g["ga"] * v_a  # (K, PS)

            acc["v_color"] += jax.lax.dot_general(
                w, v4[0:3, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, 3)
            acc["v_opac"] += jnp.sum(g["vis"] * v_a, axis=1, keepdims=True)
            if _mxu_geom():
                # conic/mean grads via pixel-monomial moments: one MXU
                # matmul per slab; the column arithmetic happens once after
                # the loop (mx/my are slab-invariant)
                _, _, pxl, pyl, _, _ = coords
                acc["S"] += jax.lax.dot_general(
                    v_sigma, _pixel_monomials(pxl, pyl),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (K, 8): [s0, sx, sy, sxx, sxy, syy, 0, 0]
            else:
                dx, dy = g["dx"], g["dy"]
                acc["v_ca"] += jnp.sum(
                    0.5 * dx * dx * v_sigma, axis=1, keepdims=True
                )
                acc["v_cb"] += jnp.sum(dx * dy * v_sigma, axis=1, keepdims=True)
                acc["v_cc"] += jnp.sum(
                    0.5 * dy * dy * v_sigma, axis=1, keepdims=True
                )
                acc["v_mx"] += -jnp.sum(
                    (g["ca"] * dx + g["cb"] * dy) * v_sigma, axis=1,
                    keepdims=True,
                )
                acc["v_my"] += -jnp.sum(
                    (g["cc"] * dy + g["cb"] * dx) * v_sigma, axis=1,
                    keepdims=True,
                )

            t_ref[:, sl] = T_new
            done_ref[:, sl] = done_new.astype(jnp.float32)
            e_ref[:, sl] = E + cum_wd[K - 1 : K, :]

        if _mxu_geom():
            # dx = x - mx with tile-local x and mx, so e.g.
            # sum dx^2 vs = S[x^2] - 2 mx S[x] + mx^2 S[1]
            S = acc["S"]
            mx, my = g["mx"], g["my"]
            s0 = S[:, 0:1]
            sx = S[:, 1:2] - mx * s0   # sum dx * vs
            sy = S[:, 2:3] - my * s0   # sum dy * vs
            sxx = S[:, 3:4] - 2.0 * mx * S[:, 1:2] + mx * mx * s0
            sxy = S[:, 4:5] - mx * S[:, 2:3] - my * S[:, 1:2] + mx * my * s0
            syy = S[:, 5:6] - 2.0 * my * S[:, 2:3] + my * my * s0
            v_ca = 0.5 * sxx
            v_cb = sxy
            v_cc = 0.5 * syy
            v_mx = -(g["ca"] * sx + g["cb"] * sy)
            v_my = -(g["cc"] * sy + g["cb"] * sx)
        else:
            v_ca, v_cb, v_cc = acc["v_ca"], acc["v_cb"], acc["v_cc"]
            v_mx, v_my = acc["v_mx"], acc["v_my"]

        gbuf = jnp.concatenate(
            [v_mx, v_my, v_ca, v_cb, v_cc, acc["v_opac"], acc["v_color"],
             jnp.zeros((K, ATTR_ROWS - 9), jnp.float32)],
            axis=1,
        )  # (K, 16)
        grads_ref[0] = jnp.transpose(gbuf, (1, 0))  # (16, K)


def _chunk_plan_batch(counts, starts, B: int, T: int, pcc: int,
                      n_blocks_per_cam: int, cap_padded: int):
    """Batched chunk plan: ONE set of fill/cumsum/gather ops builds all B
    cameras' chunk lists, laid out at fixed offsets — camera b's list occupies
    [b*pcc, (b+1)*pcc) with LOCAL tile ids and LOCAL block slots, i.e. each
    static slice is exactly a single-camera _chunk_plan output. (The kernels
    then launch once per camera: per-chunk scalar-prefetch arrays live in the
    1 MB SMEM, so one global launch would overflow it at chunk_cap * B
    entries — 1.6 MB at bench scale B=4 — while the glue, where the fixed
    costs actually are, stays batched.)

    counts/starts: (B*T,) flat with b*cap_padded baked into starts."""
    # tile ids packed into the plan word are camera-LOCAL today; a future
    # global-tile caller (b*T + t) must re-check against the packed width
    assert T < (1 << (31 - S_CT)), (T, S_CT)
    nch = (-(-counts // K)).reshape(B, T)
    ccum = jnp.cumsum(nch, axis=1)
    ctotal = ccum[:, -1]
    cstarts = ccum - nch
    boff = (jnp.arange(B, dtype=jnp.int32) * pcc)[:, None]
    dst = jnp.where(nch > 0, cstarts + boff, B * pcc).reshape(-1)
    tvals = jnp.broadcast_to(
        jnp.arange(1, T + 1, dtype=jnp.int32)[None], (B, T)
    ).reshape(-1)
    tile_fill, cstart_fill = _forward_fill(
        (
            jnp.zeros(B * pcc, jnp.int32).at[dst].set(tvals, mode="drop"),
            jnp.zeros(B * pcc, jnp.int32).at[dst].set(
                cstarts.reshape(-1), mode="drop"
            ),
        ),
        block=512,
    )
    slots_local = jnp.broadcast_to(
        jnp.arange(pcc, dtype=jnp.int32)[None], (B, pcc)
    )
    valid = (slots_local < ctotal[:, None]).reshape(-1) & (tile_fill > 0)
    tile = tile_fill - 1  # local tile id
    local = slots_local.reshape(-1) - cstart_fill
    tile_c = jnp.clip(tile, 0, T - 1)
    gidx = (
        jnp.broadcast_to(
            (jnp.arange(B, dtype=jnp.int32) * T)[:, None], (B, pcc)
        ).reshape(-1)
        + tile_c
    )
    cpb = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) * cap_padded)[:, None], (B, pcc)
    ).reshape(-1)
    ct = jnp.where(valid, tile, T).astype(jnp.int32)
    cloc = jnp.where(valid, local, 0).astype(jnp.int32)
    cnv = jnp.where(
        valid, jnp.clip(counts[gidx] - local * K, 0, K), 0
    ).astype(jnp.int32)
    clast = (valid & (local == nch.reshape(-1)[gidx] - 1)).astype(jnp.int32)
    w = _pack_plan_word(ct, cnv, valid & (local == 0), clast)
    if pcc <= COMPACT_MAX_CHUNKS:
        cslot = jnp.where(
            valid, (starts[gidx] - cpb) // K + local, n_blocks_per_cam - 1
        ).astype(jnp.int32)
    else:
        cslot = cloc = None
    return w, cslot, cloc


def _chunk_plan(counts, starts, num_tiles: int, chunk_cap: int, n_blocks: int):
    """Chunk list (in-XLA, cheap): one entry per K-instance chunk, tile-major.
    Unused entries point at the trash tile/block. Returns
    (packed_word, cslot_or_None, cloc_or_None, tile_counts) — see the packed
    chunk plan note at the top of this file."""
    assert num_tiles < (1 << (31 - S_CT)), (num_tiles, S_CT)
    nchunks = -(-counts // K)  # (T,)
    ccum = jnp.cumsum(nchunks)
    ctotal = ccum[-1]
    cstarts = ccum - nchunks
    dst = jnp.where(nchunks > 0, cstarts, chunk_cap)
    tile_fill, cstart_fill = _forward_fill(
        (
            jnp.zeros(chunk_cap, jnp.int32).at[dst].set(
                jnp.arange(1, num_tiles + 1, dtype=jnp.int32), mode="drop"
            ),
            jnp.zeros(chunk_cap, jnp.int32).at[dst].set(cstarts, mode="drop"),
        ),
        block=512,
    )
    slots = jnp.arange(chunk_cap, dtype=jnp.int32)
    valid = (slots < ctotal) & (tile_fill > 0)
    tile = tile_fill - 1
    local = slots - cstart_fill
    tile_c = jnp.clip(tile, 0, num_tiles - 1)
    ct = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    cloc = jnp.where(valid, local, 0).astype(jnp.int32)
    cnv = jnp.where(valid, jnp.clip(counts[tile_c] - local * K, 0, K), 0).astype(
        jnp.int32
    )
    clast = (valid & (local == nchunks[tile_c] - 1)).astype(jnp.int32)
    w = _pack_plan_word(ct, cnv, valid & (local == 0), clast)
    if chunk_cap <= COMPACT_MAX_CHUNKS:
        cslot = jnp.where(
            valid, starts[tile_c] // K + local, n_blocks - 1
        ).astype(jnp.int32)
    else:
        cslot = cloc = None
    return (w, cslot, cloc, counts.astype(jnp.int32))




@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_attrs(table, aligned, slot_cap):
    """attrs_rows = table[ids] with padding zeroed; table has the NGC=9 live
    columns only (zero-padding to the 16-row kernel block happens at block
    build — keeping dead columns off the multi-million-row gather). The custom
    backward avoids XLA's scatter-add (~550 ms at 5M rows on v5e — TPU
    scatters are effectively serial): instances of one gaussian are contiguous
    in pre-sort slot order, so per-gaussian gradient sums are an
    inverse-permutation row gather + one cumulative sum + segment-boundary
    differences — all sort/gather/cumsum ops TPUs run at bandwidth.

    CLMGS_GATHER_PACK (A/B gates; tools/gather_probe.py measured the 9-col
    random-id gather 10-18x slower than 16-col / complex64-packed layouts):
      "pad16" — gather from a zero-padded (N, 16) table,
      "c64"   — pack f32 column pairs into complex64 (LOSSLESS: complex(a,b)
                .real == a bitwise), gather (N, 4) c64 + (N,) f32, unpack."""
    ids = aligned.ids
    valid = (ids >= 0)[:, None]
    idc = jnp.maximum(ids, 0)
    mode = os.environ.get("CLMGS_GATHER_PACK", "")
    if mode == "pad16":
        rows16 = jnp.pad(table, ((0, 0), (0, 16 - NGC)))[idc]
        return jnp.where(valid, rows16[:, :NGC], 0.0)
    if mode == "c64":
        tc = jnp.stack(
            [
                jax.lax.complex(table[:, 2 * j], table[:, 2 * j + 1])
                for j in range(4)
            ],
            axis=1,
        )
        rc = tc[idc]  # (cap, 4) complex64
        r8 = table[:, 8][idc]
        cols = []
        for j in range(4):
            cols += [jnp.real(rc[:, j]), jnp.imag(rc[:, j])]
        cols.append(r8)
        return jnp.where(valid, jnp.stack(cols, axis=1), 0.0)
    return jnp.where(valid, table[idc], 0.0)


def _gather_attrs_fwd(table, aligned, slot_cap):
    return _gather_attrs(table, aligned, slot_cap), (aligned, table.shape[0])


def _gather_attrs_bwd(slot_cap, res, v_rows):
    from clm_gs_tpu.ops.segreduce import segment_reduce_sorted

    aligned, n = res
    # Group per-instance grad rows by ORIGINAL gaussian id with one payload
    # sort (padding rows get a huge key and sort last, carrying their zero
    # values), then reduce each id's contiguous run with the Pallas MXU
    # segment-reduce — no cumsum + fence gather (XLA lays the cumsum output
    # column-major, which made the (N, 16) fence row-gather cost ~40-50 ms at
    # 1M gaussians / 2.4M instances; the streaming one-hot-matmul reduction
    # is ~6-10 ms) and no unsort (output lands in id order directly).
    ngc = NGC
    key = jnp.where(aligned.ids >= 0, aligned.ids, jnp.int32(1 << 30))
    if os.environ.get("CLMGS_PACK_GRADS", "1") == "1":
        # Default on (chip A/B: 5.42 vs 4.81 Mpix/s, +12.6% — the grad-regroup
        # sort is the most expensive sort in the step; set CLMGS_PACK_GRADS=0
        # for the bit-exact oracle path). Rides the sort with 8 of the 9 grad
        # columns packed as bf16 pairs (6 sorted operands instead of 10).
        # Per-instance grads round to ~3 significant digits BEFORE the
        # per-gaussian f32 reduction — a ~0.4% relative perturbation of
        # individual gradient terms, far below SGD batch noise, but NOT
        # bit-exact vs the oracle (training A/B: see PARITY.md round-2 table).
        cols = [v_rows[:, j] for j in range(ngc)]
        packed = tuple(
            pack_bf16_pair(cols[j], cols[j + 1]) for j in range(0, 8, 2)
        )
        sorted_ops = jax.lax.sort(
            (key,) + packed + (cols[8],), num_keys=1, is_stable=False
        )
        vals = []
        for w in sorted_ops[1:5]:
            hi, lo = unpack_bf16_pair(w)
            vals += [hi, lo]
        vals.append(sorted_ops[5])
        v_table = segment_reduce_sorted(
            sorted_ops[0], tuple(vals), aligned.counts_orig, n
        )[:, :ngc]
        f0 = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), aligned
        )
        return v_table, f0
    ops = (key,) + tuple(v_rows[:, j] for j in range(ngc))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False)
    v_table = segment_reduce_sorted(
        sorted_ops[0], sorted_ops[1:], aligned.counts_orig, n
    )[:, :ngc]
    f0 = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), aligned
    )
    return v_table, f0


_gather_attrs.defvjp(_gather_attrs_fwd, _gather_attrs_bwd)

def _attrs_blocks(attrs_rows):
    """(cap_t, NGC) gathered rows -> (n_blocks+1, ATTR_ROWS, K) kernel blocks
    (zero-pads the dead rows and appends the trash block).

    CLMGS_ATTR_BF16=1 is a TIMING DIAGNOSTIC ONLY (not quality-safe: bf16
    means2d is ~0.5 px of positional noise): streams the kernel blocks as
    bf16 to split the per-grid-step cost into byte-bound vs
    sequencing-bound components."""
    cap_t = attrs_rows.shape[0]
    blocks = jnp.transpose(attrs_rows.reshape(cap_t // K, K, NGC), (0, 2, 1))
    blocks = jnp.pad(blocks, ((0, 1), (0, ATTR_ROWS - NGC), (0, 0)))
    if os.environ.get("CLMGS_ATTR_BF16") == "1":
        blocks = blocks.astype(jnp.bfloat16)
    return blocks


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rasterize_sorted(attrs_rows, plan, meta, background):
    out, _ = _rasterize_sorted_fwd(attrs_rows, plan, meta, background)
    return out


def _rasterize_sorted_fwd(attrs_rows, plan, meta, background):
    tw, th, chunk_cap, n_cams = meta
    tiles_per_cam = tw * th
    num_tiles = n_cams * tiles_per_cam
    wp, cslot, cloc, counts = plan
    attrs_b = _attrs_blocks(attrs_rows)
    # attr block == grid index (dense K-aligned layout); only the packed
    # plan word is scalar-prefetched — 4 B/chunk of SMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk_cap,),
        in_specs=[
            pl.BlockSpec(
                (1, ATTR_ROWS, K),
                lambda i, w: (i, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_ROWS, P), lambda i, w: (w[i] >> S_CT, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )

    def kern(w_r, attrs_ref, out_ref, t_ref, done_ref):
        _fwd_kernel(w_r, attrs_ref, out_ref,
                    t_ref, done_ref, tile_width=tw, num_tiles=num_tiles,
                    tiles_per_cam=tiles_per_cam)

    raw = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, OUT_ROWS, P), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret_mode(),
    )(wp, attrs_b)
    # background fold in XLA (was a clast-gated branch per grid step): rows
    # 0:3 += T_fin * bg with T_fin = 1 - alpha; never-visited tiles hold
    # garbage but are masked by the callers (counts == 0 / lc_t gating)
    t_fin = 1.0 - raw[:, 3:4, :]
    out = jnp.concatenate(
        [raw[:, 0:3, :] + t_fin * background[None, :, None], raw[:, 3:4, :]],
        axis=1,
    )
    lc = raw[:num_tiles, 4, 0]
    # residual keeps the BLOCK layout so the backward reuses it directly
    # (rebuilding it from attrs_rows doubled the live 3.4M-row buffers)
    return out, (attrs_b, plan, background, out, lc)


def _rasterize_sorted_bwd(meta, res, v_out):
    attrs_b, plan, background, out, lc = res
    tw, th, chunk_cap, n_cams = meta
    tiles_per_cam = tw * th
    num_tiles = n_cams * tiles_per_cam
    wp, cslot, cloc, counts = plan
    n_blocks = attrs_b.shape[0]
    cap_t = (n_blocks - 1) * K

    if cslot is not None:
        # Dead-chunk compaction (chunk_cap <= COMPACT_MAX_CHUNKS): the
        # forward recorded each tile's composited-chunk count
        # (post-termination chunks contribute exactly zero gradient). Stable
        # sort live chunks to the front; the dead tail collapses onto the
        # constant trash tile/block, so Mosaic's pipeline skips their block
        # fetches and each dead grid step costs only the bare sequencing
        # overhead (~0.4 us) instead of a full stream step. Live relative
        # order is preserved, so per-tile carry chains replay unchanged.
        # The packed word rides the sort; only cslot needs a second operand.
        ct = wp >> S_CT
        lc_t = jnp.where(counts > 0, lc.astype(jnp.int32), 0)
        tc = jnp.minimum(ct, num_tiles - 1)
        live = (ct < num_tiles) & (cloc < lc_t[tc])
        dead_key = jnp.logical_not(live).astype(jnp.int32)
        trash_w = jnp.int32(num_tiles << S_CT)
        _, wp, cslot_live = jax.lax.sort(
            (
                dead_key,
                jnp.where(live, wp, trash_w),
                jnp.where(live, cslot, n_blocks - 1),
            ),
            num_keys=1,
            is_stable=True,
        )
        # grads blocks of dead chunks are never visited by the kernel
        block_ran = (
            jnp.zeros((n_blocks,), jnp.bool_)
            .at[cslot_live]
            .set(True, mode="drop")
        )
        block_ran = block_ran.at[n_blocks - 1].set(False)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk_cap,),
            in_specs=[
                pl.BlockSpec(
                    (1, ATTR_ROWS, K), lambda i, w, cs: (cs[i], 0, 0)
                ),
                pl.BlockSpec(
                    (1, 5, P), lambda i, w, cs: (w[i] >> S_CT, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, ATTR_ROWS, K), lambda i, w, cs: (cs[i], 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((1, P), jnp.float32),
                pltpu.VMEM((1, P), jnp.float32),
                pltpu.VMEM((1, P), jnp.float32),
            ],
        )

        def kern(w_r, cs_r, attrs_ref, v_ref, grads_ref,
                 t_ref, done_ref, e_ref):
            _bwd_kernel(w_r, attrs_ref, v_ref,
                        grads_ref, t_ref, done_ref, e_ref, tile_width=tw,
                        num_tiles=num_tiles, tiles_per_cam=tiles_per_cam)

        prefetch_args = (wp, cslot_live)
    else:
        # Large-cap mode (4K-class chunk counts): a second scalar-prefetch
        # word per chunk would overflow the 1 MB SMEM, so skip compaction —
        # blocks follow the grid index exactly as in the forward, and every
        # grid step writes its grads block (zeros when skipped), so no
        # visited-mask is needed beyond guarding the trash block.
        block_ran = jnp.ones((n_blocks,), jnp.bool_).at[n_blocks - 1].set(
            False
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(chunk_cap,),
            in_specs=[
                pl.BlockSpec((1, ATTR_ROWS, K), lambda i, w: (i, 0, 0)),
                pl.BlockSpec((1, 5, P), lambda i, w: (w[i] >> S_CT, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, ATTR_ROWS, K), lambda i, w: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((1, P), jnp.float32),
                pltpu.VMEM((1, P), jnp.float32),
                pltpu.VMEM((1, P), jnp.float32),
            ],
        )

        def kern(w_r, attrs_ref, v_ref, grads_ref, t_ref, done_ref, e_ref):
            _bwd_kernel(w_r, attrs_ref, v_ref,
                        grads_ref, t_ref, done_ref, e_ref, tile_width=tw,
                        num_tiles=num_tiles, tiles_per_cam=tiles_per_cam)

        prefetch_args = (wp,)

    # fold the <v, total> per-pixel contraction into a 5th cotangent row so
    # the kernel streams ONE (5, P) block per tile instead of two 4-row blocks
    vplus = jnp.concatenate(
        [v_out, jnp.sum(v_out * out, axis=1, keepdims=True)], axis=1
    )
    grads_b = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_blocks, ATTR_ROWS, K), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret_mode(),
    )(*prefetch_args, attrs_b, vplus)
    # zero the never-visited (dead/padding) grad blocks — their contents are
    # undefined; jnp.where (not multiply) so NaN garbage cannot leak through
    grads_b = jnp.where(block_ran[:, None, None], grads_b, 0.0)
    v_attrs = jnp.transpose(grads_b[:-1, :NGC], (0, 2, 1)).reshape(cap_t, NGC)
    # background cotangent: sum_p T_final[p] * v_rgb[:, p]; mask empty tiles
    # (their fwd rows were never written and may hold garbage/NaN)
    nonempty = (counts > 0)[:, None]
    t_final = jnp.where(nonempty, 1.0 - out[:num_tiles, 3, :], 0.0)
    v_bg = jnp.einsum("tp,tcp->c", t_final, v_out[:num_tiles, 0:3, :])
    f0 = jax.tree.map(lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), plan)
    return v_attrs, f0, v_bg


_rasterize_sorted.defvjp(_rasterize_sorted_fwd, _rasterize_sorted_bwd)


@partial(
    jax.jit, static_argnames=("width", "height", "isect_cap", "update_cap")
)
def rasterize(
    means2d,
    conics,
    colors,
    opacities,
    depths,
    radii,
    width: int,
    height: int,
    background,
    isect_cap: int,
    update_cap: int = 0,
):
    """Render one camera from projected Gaussians.

    Args:
      means2d (N,2), conics (N,3), colors (N,3), opacities (N,), depths (N,),
      radii (N,) with 0 = culled. background (3,).
      isect_cap: static (bucketed) instance capacity.
      update_cap: static budget for the binning expansion's scatter updates
        (0 = full capacity). Callers size it to the visible-gaussian count
        (scatter cost is linear in updates); a batch whose instance-producing
        count exceeds it drops its deepest gaussians like an isect_cap
        overflow batch.

    Returns: (image (3, H, W), alpha (H, W), n_isects ()).
    Differentiable wrt means2d, conics, colors, opacities, background.
    """
    tw = -(-width // TILE_W)
    th = -(-height // TILE_H)
    num_tiles = tw * th
    # aligned layout capacity: every tile may waste up to ALIGN-1 slots
    cap_round = -(-isect_cap // K) * K
    cap_padded = cap_round + ALIGN * num_tiles
    chunk_cap = cap_round // K + num_tiles + 1
    # opacity-aware tight per-axis bboxes: ~20% fewer instances than the
    # circle bbox with bit-identical output (see tight_extents)
    ext = tight_extents(
        jax.lax.stop_gradient(conics),
        jax.lax.stop_gradient(opacities),
        jax.lax.stop_gradient(radii),
    )
    # exact per-tile ellipse culling (A/B gate): instances whose in-tile max
    # alpha can't reach the kernel's 1/255 threshold become dummies — output
    # identical to ~1 ulp, fewer compositing chunk steps (see isect_tiles_aligned)
    cull = None
    if os.environ.get("CLMGS_TILE_CULL") == "1":
        cull = (
            jax.lax.stop_gradient(conics),
            jax.lax.stop_gradient(opacities),
        )
    aligned = isect_tiles_aligned(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(radii),
        jax.lax.stop_gradient(depths),
        (TILE_W, TILE_H), tw, th, cap_round, ALIGN,
        extents=ext,
        cull=cull,
        update_cap=update_cap,
    )
    starts, counts, n_isects = aligned.starts, aligned.counts, aligned.n_isects

    # ONE row-gather of a packed (N, 9) attribute table instead of 9 scalar
    # gathers — random-access count, not payload bytes, dominates TPU gather
    # cost. Its custom VJP reduces per-gaussian grads without XLA scatters.
    table = jnp.concatenate(
        [means2d, conics, opacities[:, None], colors], axis=1
    )  # (N, NGC)
    attrs_rows = _gather_attrs(table, aligned, cap_round)  # (cap_padded, 16)

    plan = _chunk_plan(counts, starts, num_tiles, chunk_cap, cap_padded // K + 1)
    out = _rasterize_sorted(attrs_rows, plan, (tw, th, chunk_cap, 1), background)
    # empty tiles were never visited by the kernel: plain background
    empty = (counts == 0)[:, None, None]
    bg4 = jnp.concatenate([background, jnp.zeros((1,), jnp.float32)])
    img_tiles = jnp.where(empty, bg4[None, :, None], out[:num_tiles])
    # (num_tiles, 4, P) -> (4, th*TILE_H, tw*TILE_W) -> crop
    img = img_tiles.reshape(th, tw, 4, TILE_H, TILE_W)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(
        4, th * TILE_H, tw * TILE_W
    )
    img = img[:, :height, :width]
    return img[0:3], img[3], n_isects


@partial(
    jax.jit, static_argnames=("width", "height", "isect_cap", "update_cap")
)
def rasterize_batch(
    means2d,  # (B, N, 2)
    conics,  # (B, N, 3)
    colors,  # (B, N, 3)
    opacities,  # (B, N)
    depths,  # (B, N)
    radii,  # (B, N)
    width: int,
    height: int,
    background,  # (3,) shared across cameras
    isect_cap: int,  # per camera
    update_cap: int = 0,  # per camera
):
    """Render B cameras in ONE dispatch: one batched binning, one attribute
    gather, one fwd/bwd kernel launch over all cameras' chunks, one
    grad-regroup sort in the VJP — the per-camera fixed costs of every glue
    stage amortize across the batch (VERDICT r3 lever #1; the reference
    launches its CUDA pipeline once per camera, no_offload/engine.py:132,
    because kernel launches are cheap there — on TPU the sorts/scatters have
    multi-ms fixed costs, so batching is the idiomatic shape).

    Returns: (images (B, 3, H, W), alphas (B, H, W), n_isects (B,)).
    Per-camera output matches `rasterize` up to reduction reassociation.
    """
    B, N = radii.shape
    tw = -(-width // TILE_W)
    th = -(-height // TILE_H)
    T = tw * th
    cap_round = -(-isect_cap // K) * K
    cap_padded = cap_round + ALIGN * T
    pcc = cap_round // K + T + 1  # per-camera chunk capacity

    sg = jax.lax.stop_gradient
    rx, ry = tight_extents(
        sg(conics).reshape(B * N, 3),
        sg(opacities).reshape(B * N),
        sg(radii).reshape(B * N),
    )
    aligned = isect_tiles_aligned_batch(
        sg(means2d), sg(radii), sg(depths),
        (TILE_W, TILE_H), tw, th, cap_round, ALIGN,
        extents=(rx.reshape(B, N), ry.reshape(B, N)),
        update_cap=update_cap,
    )

    table = jnp.concatenate(
        [
            means2d.reshape(B * N, 2),
            conics.reshape(B * N, 3),
            opacities.reshape(B * N, 1),
            colors.reshape(B * N, 3),
        ],
        axis=1,
    )  # (B*N, NGC); aligned.ids are global b*N+g, so one gather serves all
    attrs_rows = _gather_attrs(table, aligned, cap_round)

    plan_all = _chunk_plan_batch(
        aligned.counts, aligned.starts, B, T, pcc, cap_padded // K + 1,
        cap_padded,
    )
    # one compositing launch per camera (see _chunk_plan_batch: per-chunk
    # scalar prefetch must fit 1 MB SMEM) over that camera's static slice of
    # the batched layout; everything before this line ran once for the batch
    outs = []
    for b in range(B):
        plan_b = tuple(
            a[b * pcc : (b + 1) * pcc] if a is not None else None
            for a in plan_all
        ) + (aligned.counts[b * T : (b + 1) * T],)
        outs.append(
            _rasterize_sorted(
                attrs_rows[b * cap_padded : (b + 1) * cap_padded],
                plan_b, (tw, th, pcc, 1), background,
            )
        )
    # drop each camera's trash tile, then unfold tiles to images
    out = jnp.stack(outs, axis=0)[:, :T].reshape(B * T, 4, P)
    empty = (aligned.counts == 0)[:, None, None]
    bg4 = jnp.concatenate([background, jnp.zeros((1,), jnp.float32)])
    img_tiles = jnp.where(empty, bg4[None, :, None], out)
    img = img_tiles.reshape(B, th, tw, 4, TILE_H, TILE_W)
    img = jnp.transpose(img, (0, 3, 1, 4, 2, 5)).reshape(
        B, 4, th * TILE_H, tw * TILE_W
    )
    img = img[:, :, :height, :width]
    return img[:, 0:3], img[:, 3], aligned.n_isects
