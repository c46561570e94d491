"""Pallas TPU rasterizer: per-tile front-to-back alpha compositing, fwd + bwd.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site strategies/base_engine.py:192-203). Design:

  - The binning stage (ops/tiles.py) yields a flat instance list grouped by
    tile and depth-ordered within each tile, plus per-tile [start, end) offsets.
  - Per-instance attributes are pre-gathered (one XLA gather) into a single
    (cap + K, 16) f32 array so the kernel only ever issues *contiguous* dynamic
    -slice DMAs — no in-kernel gathers, which TPUs do not do well.
  - The kernel runs a 1-D grid over tiles. Each program composites its
    TILE x TILE (=P) pixels by looping over K-instance chunks: VPU-vectorized
    alpha evaluation over the (K, P) matrix, then a Hillis-Steele cumulative
    product along the instance axis to get per-instance transmittance.

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
Per-instance gradients are written back to a flat (cap + K, 16) buffer and
scattered to per-Gaussian gradients by the autodiff transpose of the gather
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

from clm_gs_tpu.ops.tiles import isect_tiles

TILE = 16
P = TILE * TILE  # 256 pixels per tile
K = 256  # instances per chunk
ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.999

# attrs column layout
_MX, _MY, _CA, _CB, _CC, _OP, _R, _G, _B = range(9)
ATTR_COLS = 16


def _interpret_mode():
    """Compiled Mosaic on TPU; TPU-semantics interpreter elsewhere (tests)."""
    if jax.default_backend() == "tpu":
        return False
    try:
        return pltpu.InterpretParams()
    except Exception:
        return True


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


def _chunk_geometry(buf, pxf, pyf, cbase, n):
    """Shared fwd/bwd per-chunk alpha math. Returns dict of (K,P)/(K,1) arrays."""
    mx = buf[:, _MX : _MX + 1]
    my = buf[:, _MY : _MY + 1]
    ca = buf[:, _CA : _CA + 1]
    cb = buf[:, _CB : _CB + 1]
    cc = buf[:, _CC : _CC + 1]
    op = buf[:, _OP : _OP + 1]
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
            [buf[:, _R : _B + 1], jnp.ones((K, 1), jnp.float32)], axis=1
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
    T_new = T * jnp.prod(jnp.where(keep, om, 1.0), axis=0, keepdims=True)
    done_new = done | jnp.any(viol, axis=0, keepdims=True)
    return w, T_excl, keep, T_new, done_new


def _fwd_kernel(off_ref, bg_ref, attrs_ref, out_ref, buf_ref, sem_ref, *, tile_width):
    t = pl.program_id(0)
    start = off_ref[t]
    n = off_ref[t + 1] - start
    nchunks = (n + K - 1) // K
    pxf, pyf = _pixel_coords(t, tile_width)

    def cond(carry):
        c, T, done, acc = carry
        return (c < nchunks) & jnp.logical_not(jnp.all(done))

    def body(carry):
        c, T, done, acc = carry
        dma = pltpu.make_async_copy(
            attrs_ref.at[pl.ds(start + c * K, K), :], buf_ref, sem_ref
        )
        dma.start()
        dma.wait()
        g = _chunk_geometry(buf_ref[:], pxf, pyf, c * K, n)
        w, _, _, T, done = _chunk_compositing(g, T, done)
        acc = acc + jax.lax.dot_general(
            g["ctilde"], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4, P)
        return c + 1, T, done, acc

    T0 = jnp.ones((1, P), jnp.float32)
    done0 = jnp.zeros((1, P), jnp.bool_)
    acc0 = jnp.zeros((4, P), jnp.float32)
    _, T, _, acc = jax.lax.while_loop(cond, body, (0, T0, done0, acc0))

    out = jnp.concatenate(
        [
            acc[0:1, :] + T * bg_ref[0],
            acc[1:2, :] + T * bg_ref[1],
            acc[2:3, :] + T * bg_ref[2],
            acc[3:4, :],
        ],
        axis=0,
    )
    out_ref[0] = out


def _bwd_kernel(
    off_ref, attrs_ref, res_ref, v_ref, grads_ref, buf_ref, gbuf_ref, sem_ref, wsem_ref,
    *, tile_width,
):
    t = pl.program_id(0)
    start = off_ref[t]
    n = off_ref[t + 1] - start
    nchunks = (n + K - 1) // K
    pxf, pyf = _pixel_coords(t, tile_width)

    v4 = v_ref[0]  # (4, P) cotangent of this tile's output block
    total4 = res_ref[0]  # (4, P) fwd output
    d_tot = jnp.sum(v4 * total4, axis=0, keepdims=True)  # (1, P)

    def body(c, carry):
        T, done, E = carry
        dma = pltpu.make_async_copy(
            attrs_ref.at[pl.ds(start + c * K, K), :], buf_ref, sem_ref
        )
        dma.start()
        dma.wait()
        g = _chunk_geometry(buf_ref[:], pxf, pyf, c * K, n)
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
        v_mx = -jnp.sum((g["ca"] * dx + g["cb"] * dy) * v_sigma, axis=1, keepdims=True)
        v_my = -jnp.sum((g["cc"] * dy + g["cb"] * dx) * v_sigma, axis=1, keepdims=True)

        gbuf_ref[:] = jnp.concatenate(
            [v_mx, v_my, v_ca, v_cb, v_cc, v_opac, v_color,
             jnp.zeros((K, ATTR_COLS - 9), jnp.float32)],
            axis=1,
        )
        wdma = pltpu.make_async_copy(
            gbuf_ref, grads_ref.at[pl.ds(start + c * K, K), :], wsem_ref
        )
        wdma.start()
        wdma.wait()

        E = E + cum_wd[K - 1 : K, :]
        return T_new, done_new, E

    T0 = jnp.ones((1, P), jnp.float32)
    done0 = jnp.zeros((1, P), jnp.bool_)
    E0 = jnp.zeros((1, P), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (T0, done0, E0))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rasterize_sorted(attrs, tile_offsets, background, num_tiles_w_h):
    out, _ = _rasterize_sorted_fwd(attrs, tile_offsets, background, num_tiles_w_h)
    return out


def _rasterize_sorted_fwd(attrs, tile_offsets, background, num_tiles_w_h):
    tw, th = num_tiles_w_h
    num_tiles = tw * th
    bg4 = jnp.concatenate([background, jnp.zeros((1,), jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, ATTR_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
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
    )(tile_offsets, bg4, attrs)
    return out, (attrs, tile_offsets, background, out)


def _rasterize_sorted_bwd(num_tiles_w_h, res, v_out):
    attrs, tile_offsets, background, out = res
    tw, th = num_tiles_w_h
    num_tiles = tw * th
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((K, ATTR_COLS), jnp.float32),
            pltpu.VMEM((K, ATTR_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    v_attrs = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_width=tw),
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret_mode(),
    )(tile_offsets, attrs, out, v_out)
    # background cotangent: sum_p T_final[p] * v_rgb[:, p]
    t_final = 1.0 - out[:, 3, :]  # (num_tiles, P)
    v_bg = jnp.einsum("tp,tcp->c", t_final, v_out[:, 0:3, :])
    v_offsets = np.zeros(tile_offsets.shape, dtype=jax.dtypes.float0)
    return v_attrs, v_offsets, v_bg


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
    isect = isect_tiles(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(radii),
        jax.lax.stop_gradient(depths),
        TILE, tw, th, isect_cap,
    )
    ids = isect.gauss_ids
    # `where` (not multiply): its VJP *selects*, so garbage/NaN rows of the
    # backward kernel's unwritten padding slots are dropped rather than turned
    # into NaN * 0 before the scatter-add back to per-Gaussian grads.
    valid = (isect.tile_ids < tw * th)[:, None]
    attrs = jnp.where(
        valid,
        jnp.concatenate(
            [
                means2d[ids],
                conics[ids],
                opacities[ids, None],
                colors[ids],
                jnp.zeros((isect_cap, ATTR_COLS - 9), jnp.float32),
            ],
            axis=1,
        ),
        0.0,
    )
    attrs = jnp.pad(attrs, ((0, K), (0, 0)))
    out = _rasterize_sorted(attrs, isect.tile_offsets, background, (tw, th))
    # (num_tiles, 4, P) -> (4, th*TILE, tw*TILE) -> crop
    img = out.reshape(th, tw, 4, TILE, TILE)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(4, th * TILE, tw * TILE)
    img = img[:, :height, :width]
    return img[0:3], img[3], isect.n_isects
