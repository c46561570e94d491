"""Pallas TPU rasterizer: per-tile front-to-back alpha compositing, fwd + bwd.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site strategies/base_engine.py:192-203). Design:

  - The binning stage (ops/tiles.py) yields a flat instance list grouped by
    tile and depth-ordered within each tile. Per-tile ranges are re-laid so
    each starts at a 128-aligned slot (align_tile_ranges) — TPU DMA slices
    along the instance axis must be lane-aligned.
  - Per-instance attributes are pre-gathered (9 XLA gathers) into a single
    *transposed* (16, cap) f32 array — attribute rows, instance lanes. That
    layout has zero HBM padding waste under the (8, 128) f32 tiling, and the
    kernel only ever issues contiguous, aligned dynamic-slice DMAs; no
    in-kernel gathers, which TPUs do not do well.
  - The kernel runs a 1-D grid over tiles. Each program composites its
    TILE x TILE (=P) pixels by looping over K-instance chunks: one small
    (16, K) -> (K, 16) transpose, then VPU-vectorized alpha evaluation over
    the (K, P) matrix and a Hillis-Steele cumulative product along the
    instance (sublane) axis for per-instance transmittance.

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
Per-instance gradients are written back to a flat (16, cap) buffer and
scattered to per-Gaussian gradients by the autodiff transpose of the gathers
(segment-sum; atomics-free by construction, SURVEY.md §7.2 hard-part #1).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clm_gs_tpu.ops.tiles import align_tile_ranges, isect_tiles

TILE = 16
P = TILE * TILE  # 256 pixels per tile
K = 256  # instances per chunk
ALIGN = 128  # per-tile range alignment (f32 lane width)
ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.999

# attrs row layout (transposed: (ATTR_ROWS, cap))
_MX, _MY, _CA, _CB, _CC, _OP, _R, _G, _B = range(9)
ATTR_ROWS = 16


def _interpret_mode():
    """Compiled Mosaic on TPU; Pallas interpreter elsewhere (tests, CPU-mesh
    dry runs). The basic interpreter, not the TPU-semantics one: the latter's
    blocking semaphore emulation deadlocks when more virtual devices than host
    cores execute kernels concurrently inside shard_map."""
    return jax.default_backend() != "tpu"


def _shift_down(x, s, fill):
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-s, :]], axis=0)


def _cum_incl(x, op, identity):
    """Inclusive cumulative `op` along axis 0 (Hillis-Steele doubling)."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = op(x, _shift_down(x, s, identity))
        s *= 2
    return x


def _pixel_coords(t, tile_width):
    ty = t // tile_width
    tx = jax.lax.rem(t, tile_width)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxf = (tx * TILE).astype(jnp.float32) + (
        jax.lax.rem(idx, TILE).astype(jnp.float32) + 0.5
    )
    pyf = (ty * TILE).astype(jnp.float32) + ((idx // TILE).astype(jnp.float32) + 0.5)
    return pxf, pyf


def _chunk_geometry(buf_t, pxf, pyf, cbase, n):
    """Shared fwd/bwd per-chunk alpha math.

    buf_t: (K, ATTR_ROWS) chunk attributes (already transposed).
    Returns dict of (K, P) / (K, 1) arrays.
    """
    mx = buf_t[:, _MX : _MX + 1]
    my = buf_t[:, _MY : _MY + 1]
    ca = buf_t[:, _CA : _CA + 1]
    cb = buf_t[:, _CB : _CB + 1]
    cc = buf_t[:, _CC : _CC + 1]
    op = buf_t[:, _OP : _OP + 1]
    dx = pxf - mx  # (K, P)
    dy = pyf - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = jnp.exp(-sigma)
    ga = op * vis
    alpha = jnp.minimum(MAX_ALPHA, ga)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) + cbase
    ok = (row < n) & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
    a = jnp.where(ok, alpha, 0.0)
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, vis=vis, ga=ga, a=a, ok=ok,
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
    dead = _cum_incl(viol.astype(jnp.float32), jnp.add, 0.0) > 0
    keep = jnp.logical_not(dead) & jnp.logical_not(done)
    w = jnp.where(keep, a * T_excl, 0.0)
    # Product over the kept prefix: cp_incl is non-increasing in k (om <= 1),
    # and `keep` is a per-pixel prefix mask, so the product over kept rows
    # equals the minimum of cp_incl over them (Mosaic has no reduce_prod, and
    # this also avoids a log1p+exp per element).
    T_new = T * jnp.min(jnp.where(keep, cp_incl, 1.0), axis=0, keepdims=True)
    done_new = done | jnp.any(viol, axis=0, keepdims=True)
    return w, T_excl, keep, T_new, done_new


def _fwd_kernel(
    starts_ref, counts_ref, bg_ref, attrs_ref, out_ref,
    buf_ref, t_ref, done_ref, acc_ref, sem_ref, *, tile_width,
):
    # Mosaic cannot carry small vectors through scf.while; all vector state
    # (T, done, acc) lives in VMEM scratch and the loop carries scalars only.
    t = pl.program_id(0)
    start = starts_ref[t]
    n = counts_ref[t]
    nchunks = (n + K - 1) // K
    pxf, pyf = _pixel_coords(t, tile_width)

    t_ref[:] = jnp.ones((1, P), jnp.float32)
    done_ref[:] = jnp.zeros((1, P), jnp.float32)
    acc_ref[:] = jnp.zeros((4, P), jnp.float32)

    def chunk_dma(c):
        s0 = pl.multiple_of(start + c * K, ALIGN)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(s0, K)], buf_ref.at[c % 2], sem_ref.at[c % 2]
        )

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0).start()

    def cond(carry):
        c, alldone = carry
        return (c < nchunks) & (alldone == 0)

    def body(carry):
        c, _ = carry
        # double buffering: next chunk's DMA flies while this one computes
        @pl.when(c + 1 < nchunks)
        def _():
            chunk_dma(c + 1).start()

        chunk_dma(c).wait()
        g = _chunk_geometry(
            jnp.transpose(buf_ref[c % 2], (1, 0)), pxf, pyf, c * K, n
        )
        done = done_ref[:] > 0.5
        w, _, _, T_new, done_new = _chunk_compositing(g, t_ref[:], done)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            g["ctilde"], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4, P)
        t_ref[:] = T_new
        done_ref[:] = done_new.astype(jnp.float32)
        alldone = (jnp.min(done_new.astype(jnp.float32)) > 0.5).astype(jnp.int32)
        return c + 1, alldone

    c_end, _ = jax.lax.while_loop(cond, body, (0, 0))

    # early exit leaves the prefetch for chunk c_end in flight; drain it so
    # the next grid step's semaphore state is clean
    @pl.when(c_end < nchunks)
    def _():
        chunk_dma(c_end).wait()

    T = t_ref[:]
    acc = acc_ref[:]
    out_ref[0] = jnp.concatenate(
        [
            acc[0:1, :] + T * bg_ref[0],
            acc[1:2, :] + T * bg_ref[1],
            acc[2:3, :] + T * bg_ref[2],
            acc[3:4, :],
        ],
        axis=0,
    )


def _bwd_kernel(
    starts_ref, counts_ref, attrs_ref, res_ref, v_ref, grads_ref,
    buf_ref, gbuf_ref, t_ref, done_ref, e_ref, sem_ref, wsem_ref, *, tile_width,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    n = counts_ref[t]
    nchunks = (n + K - 1) // K
    pxf, pyf = _pixel_coords(t, tile_width)

    v4 = v_ref[0]  # (4, P) cotangent of this tile's output block
    total4 = res_ref[0]  # (4, P) fwd output
    d_tot = jnp.sum(v4 * total4, axis=0, keepdims=True)  # (1, P)

    t_ref[:] = jnp.ones((1, P), jnp.float32)
    done_ref[:] = jnp.zeros((1, P), jnp.float32)
    e_ref[:] = jnp.zeros((1, P), jnp.float32)

    def chunk_dma(c):
        s0 = pl.multiple_of(start + c * K, ALIGN)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(s0, K)], buf_ref.at[c % 2], sem_ref.at[c % 2]
        )

    def write_dma(c):
        s0 = pl.multiple_of(start + c * K, ALIGN)
        return pltpu.make_async_copy(
            gbuf_ref.at[c % 2], grads_ref.at[:, pl.ds(s0, K)], wsem_ref.at[c % 2]
        )

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0).start()

    def body(c, alldone):
        @pl.when(c + 1 < nchunks)
        def _():
            chunk_dma(c + 1).start()

        chunk_dma(c).wait()

        # wait for the write issued two chunks ago before reusing its slot
        @pl.when(c >= 2)
        def _():
            write_dma(c - 2).wait()

        # once every pixel has terminated, remaining instances get zero grads:
        # skip the VPU work, still write (zeros) so the output rows are defined
        @pl.when(alldone != 0)
        def _():
            gbuf_ref[c % 2] = jnp.zeros((ATTR_ROWS, K), jnp.float32)

        @pl.when(alldone == 0)
        def _():
            T, done, E = t_ref[:], done_ref[:] > 0.5, e_ref[:]
            g = _chunk_geometry(
                jnp.transpose(buf_ref[c % 2], (1, 0)), pxf, pyf, c * K, n
            )
            w, T_excl, keep, T_new, done_new = _chunk_compositing(g, T, done)

            # dot1[k,p] = sum_c ctilde[k,c] v4[c,p]
            dot1 = jax.lax.dot_general(
                g["ctilde"], v4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, P)
            cum_wd = _cum_incl(w * dot1, jnp.add, 0.0)
            term_a = d_tot - E - cum_wd  # (K, P) via broadcast
            a = g["a"]
            om = 1.0 - a
            # gsplat guard: no gradient through the 0.999 clamp
            grad_ok = keep & g["ok"] & (g["ga"] <= MAX_ALPHA)
            v_a = jnp.where(grad_ok, T_excl * dot1 - term_a / om, 0.0)
            v_sigma = -g["ga"] * v_a  # (K, P)

            dx, dy = g["dx"], g["dy"]
            v_color = jax.lax.dot_general(
                w, v4[0:3, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, 3)
            v_opac = jnp.sum(g["vis"] * v_a, axis=1, keepdims=True)
            v_ca = jnp.sum(0.5 * dx * dx * v_sigma, axis=1, keepdims=True)
            v_cb = jnp.sum(dx * dy * v_sigma, axis=1, keepdims=True)
            v_cc = jnp.sum(0.5 * dy * dy * v_sigma, axis=1, keepdims=True)
            v_mx = -jnp.sum(
                (g["ca"] * dx + g["cb"] * dy) * v_sigma, axis=1, keepdims=True
            )
            v_my = -jnp.sum(
                (g["cc"] * dy + g["cb"] * dx) * v_sigma, axis=1, keepdims=True
            )

            gbuf = jnp.concatenate(
                [v_mx, v_my, v_ca, v_cb, v_cc, v_opac, v_color,
                 jnp.zeros((K, ATTR_ROWS - 9), jnp.float32)],
                axis=1,
            )  # (K, 16)
            gbuf_ref[c % 2] = jnp.transpose(gbuf, (1, 0))  # (16, K)

            t_ref[:] = T_new
            done_ref[:] = done_new.astype(jnp.float32)
            e_ref[:] = E + cum_wd[K - 1 : K, :]

        write_dma(c).start()
        return (jnp.min(done_ref[:]) > 0.5).astype(jnp.int32)

    jax.lax.fori_loop(0, nchunks, body, 0)

    # drain the last (up to two) outstanding writes
    @pl.when(nchunks >= 2)
    def _():
        write_dma(nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        write_dma(nchunks - 1).wait()


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rasterize_sorted(attrs_t, starts, counts, background, num_tiles_w_h):
    out, _ = _rasterize_sorted_fwd(attrs_t, starts, counts, background, num_tiles_w_h)
    return out


def _rasterize_sorted_fwd(attrs_t, starts, counts, background, num_tiles_w_h):
    tw, th = num_tiles_w_h
    num_tiles = tw * th
    bg4 = jnp.concatenate([background, jnp.zeros((1,), jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, K), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((4, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_width=tw),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, P), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret_mode(),
    )(starts, counts, bg4, attrs_t)
    return out, (attrs_t, starts, counts, background, out)


def _rasterize_sorted_bwd(num_tiles_w_h, res, v_out):
    attrs_t, starts, counts, background, out = res
    tw, th = num_tiles_w_h
    num_tiles = tw * th
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, K), jnp.float32),
            pltpu.VMEM((2, ATTR_ROWS, K), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    v_attrs_t = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_width=tw),
        out_shape=jax.ShapeDtypeStruct(attrs_t.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret_mode(),
    )(starts, counts, attrs_t, out, v_out)
    # background cotangent: sum_p T_final[p] * v_rgb[:, p]
    t_final = 1.0 - out[:, 3, :]  # (num_tiles, P)
    v_bg = jnp.einsum("tp,tcp->c", t_final, v_out[:, 0:3, :])
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return v_attrs_t, f0(starts), f0(counts), v_bg


_rasterize_sorted.defvjp(_rasterize_sorted_fwd, _rasterize_sorted_bwd)


@partial(jax.jit, static_argnames=("width", "height", "isect_cap"))
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
):
    """Render one camera from projected Gaussians.

    Args:
      means2d (N,2), conics (N,3), colors (N,3), opacities (N,), depths (N,),
      radii (N,) with 0 = culled. background (3,).
      isect_cap: static (bucketed) instance capacity.

    Returns: (image (3, H, W), alpha (H, W), n_isects ()).
    Differentiable wrt means2d, conics, colors, opacities, background.
    """
    tw = -(-width // TILE)
    th = -(-height // TILE)
    num_tiles = tw * th
    # aligned layout capacity: every tile may waste up to ALIGN-1 slots, plus
    # K slack for the final tile's chunk overrun.
    cap_padded = isect_cap + ALIGN * num_tiles + K
    isect = isect_tiles(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(radii),
        jax.lax.stop_gradient(depths),
        TILE, tw, th, isect_cap,
    )
    ids, starts, counts = align_tile_ranges(isect, num_tiles, ALIGN, cap_padded)
    valid = (ids >= 0)[:, None]
    idc = jnp.maximum(ids, 0)

    # ONE row-gather of a packed (N, 16) attribute table instead of 9 scalar
    # gathers — random-access count, not payload bytes, dominates TPU gather
    # cost. `where` (not multiply): its VJP *selects*, so garbage/NaN rows of
    # the backward kernel's unwritten padding slots are dropped rather than
    # turned into NaN * 0 before the scatter-add back to per-Gaussian grads.
    table = jnp.concatenate(
        [
            means2d, conics, opacities[:, None], colors,
            jnp.zeros((means2d.shape[0], ATTR_ROWS - 9), jnp.float32),
        ],
        axis=1,
    )  # (N, 16)
    attrs_t = jnp.where(valid, table[idc], 0.0).T  # (16, cap_padded)
    out = _rasterize_sorted(attrs_t, starts, counts, background, (tw, th))
    # (num_tiles, 4, P) -> (4, th*TILE, tw*TILE) -> crop
    img = out.reshape(th, tw, 4, TILE, TILE)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(4, th * TILE, tw * TILE)
    img = img[:, :height, :width]
    return img[0:3], img[3], isect.n_isects
