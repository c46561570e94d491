"""Shared machinery for the host-offload strategies.

TPU analogue of the reference's filter computation (base_engine.py:18-76) and
the filtered per-camera forward (naive_offload/engine.py:159-275,
clm_offload/engine.py:484-841): per camera, visible Gaussians are compacted
into a fixed-capacity (v_cap) index set; the differentiable micro-step runs
projection/SH/rasterization over the compact set only, and the gather's
autodiff transpose scatter-adds attribute gradients back to the full buffers.

Dynamic visible-set sizes are handled the TPU way (SURVEY.md §7.2):
``jnp.nonzero(size=v_cap, fill_value=C)`` into padded index lists + counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.models.gaussians import GaussianParams
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.rasterize import rasterize
from clm_gs_tpu.ops.sh import degree_mask, sh_basis
from clm_gs_tpu.strategies.base import photometric_loss


class Filters(NamedTuple):
    vis: object  # None (dropped: a (B, C) bool matrix is 1.6 GB at BigCity scale)
    idx: jnp.ndarray  # (B, v_cap) int32, fill = C
    counts: jnp.ndarray  # (B,) int32
    sample: jnp.ndarray  # (B, ceil(C/stride)) bool — TSP distance sample


@partial(
    jax.jit,
    static_argnames=("width", "height", "v_cap", "sample_stride"),
)
def calculate_filters(
    xyz, quat, log_scale, alive, viewmats, Ks,
    width: int, height: int, radius_clip, v_cap: int, sample_stride: int = 32,
) -> Filters:
    """Per-camera visibility via projection-only culling (calculate_filters,
    base_engine.py:18-76). Runs on the selection-critical GPU attributes only —
    no SH needed, so the clm strategy computes it without touching host data.

    Sequential lax.map over cameras: the all-camera projection intermediates
    are (B, C) x ~7 floats — ~45 GB at BigCity scale (64 cams x 25M) — while
    one camera's worth is ~700 MB; only the compact (idx, counts, sample)
    outputs persist across iterations."""
    scales = jnp.exp(log_scale)

    def one(args):
        vm, K = args
        proj = fully_fused_projection(
            xyz, quat, scales, vm[None], K[None], width, height,
            radius_clip=radius_clip, alive=alive,
        )
        vis = proj.radii[0] > 0  # (C,)
        counts = jnp.sum(vis).astype(jnp.int32)
        (i,) = jnp.nonzero(vis, size=v_cap, fill_value=vis.shape[0])
        # 1/stride downsample for the TSP Hamming distances
        # (clm_offload/engine.py:158-176)
        return i.astype(jnp.int32), counts, vis[::sample_stride]

    idx, counts, sample = jax.lax.map(one, (viewmats, Ks))
    return Filters(None, idx, counts, sample)


class MicroOut(NamedTuple):
    loss: jnp.ndarray
    gpu_grads: dict  # {"xyz","opacity","log_scale","quat"} full (C, ...) grads
    sh_grad_compact: jnp.ndarray  # (v_cap, 48)
    probe_grad: jnp.ndarray  # (v_cap, 2) screen-space grads at visible rows
    radii_compact: jnp.ndarray  # (v_cap,)
    n_isects: jnp.ndarray
    inv: jnp.ndarray = None  # (C,) full row -> compact position (v_cap = miss)
    stat_full: jnp.ndarray = None  # (C, 2) [screen-grad norm, visible] f32


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "isect_cap", "v_cap", "lambda_dssim", "loss_scale",
    ),
)
def micro_step_visible(
    xyz, opacity, log_scale, quat,
    sh_compact,  # (v_cap, 48) — the streamed working set
    idx,  # (v_cap,) int32, fill = C
    viewmat, Kmat, campos, gt, sh_degree, background,
    width: int, height: int, isect_cap: int, v_cap: int,
    lambda_dssim: float = 0.2,
    loss_scale: float = 1.0,
) -> MicroOut:
    """One camera's fwd+bwd over its compact visible set. SH colors are
    evaluated from the compact working set; the reference's equivalent is
    pipeline_forward_one_step over filtered params (base_engine.py:106-207,
    SH-inplace variant clm_offload/engine.py:30-127).

    Attribute grads are computed wrt the COMPACT (gathered) rows and expanded
    to full (C, ...) space via one inverse-map gather: differentiating through
    the gather itself would emit 11 channel-scatters of v_cap updates per
    camera, which XLA:TPU lowers near-serially (~20 ms/channel chip-measured,
    dominating the micro-step); the inverse map costs one single-channel
    scatter + row gathers instead. Values are IDENTICAL (idx rows are unique,
    so the scatter-add would sum exactly one contribution per row)."""
    C = xyz.shape[0]
    valid = idx < C
    idc = jnp.minimum(idx, C - 1)
    xyz_r = xyz[idc]
    op_r = opacity[idc]
    ls_r = log_scale[idc]
    qt_r = quat[idc]

    def loss_fn(xyz_r, op_r, ls_r, qt_r, shc, probe):
        op_c = jax.nn.sigmoid(op_r)
        sc_c = jnp.exp(ls_r)
        proj = fully_fused_projection(
            xyz_r, qt_r, sc_c, viewmat[None], Kmat[None], width, height,
            alive=valid,
        )
        means2d = proj.means2d[0] + probe
        dirs = xyz_r - campos[None, :]
        basis = sh_basis(dirs) * degree_mask(sh_degree)
        colors = jnp.maximum(
            jnp.einsum("nk,nkc->nc", basis, shc.reshape(v_cap, 16, 3)) + 0.5, 0.0
        )
        image, _, n_isects = rasterize(
            means2d, proj.conics[0], colors, op_c, proj.depths[0], proj.radii[0],
            width, height, background, isect_cap,
        )
        return (
            photometric_loss(image, gt, lambda_dssim, loss_scale),
            (proj.radii[0], n_isects),
        )

    probe0 = jnp.zeros((v_cap, 2), jnp.float32)
    (loss, (radii, n_isects)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(xyz_r, op_r, ls_r, qt_r, sh_compact, probe0)
    g_xyz_c, g_op_c, g_ls_c, g_qt_c, g_sh, g_probe = grads

    # inverse map: full row -> its compact position (v_cap = not visible).
    # Only valid entries scatter (padding rows clamp idc to C-1 and would
    # otherwise overwrite a genuinely-visible last row).
    inv = (
        jnp.full(C, v_cap, jnp.int32)
        .at[jnp.where(valid, idc, C)]
        .set(jnp.arange(v_cap, dtype=jnp.int32), mode="drop",
             unique_indices=True, indices_are_sorted=True)
    )
    hit = inv < v_cap
    invc = jnp.minimum(inv, v_cap - 1)

    # ONE packed row-gather for all 11 grad columns + the 2 densify-stat
    # columns: per-attribute gathers on narrow-row (v_cap, 3/4) tables pay a
    # relayout per channel (chip trace: ~78 ms for the quat channel alone);
    # random-access COUNT dominates TPU gather cost, so the 16-col padded
    # table costs about the same as one narrow gather (same lesson as the
    # rasterizer's packed attr table).
    gscale = jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
    norm_c = jnp.linalg.norm(g_probe * gscale, axis=-1)
    vis_c = (radii > 0).astype(jnp.float32)
    packed = jnp.concatenate(
        [
            g_xyz_c, g_op_c[:, None], g_ls_c, g_qt_c,
            norm_c[:, None], vis_c[:, None],
            jnp.zeros((v_cap, 3), jnp.float32),
        ],
        axis=1,
    )  # (v_cap, 16)
    rows = jnp.where(hit[:, None], packed[invc], 0.0)  # (C, 16)

    return MicroOut(
        loss=loss,
        gpu_grads={
            "xyz": rows[:, 0:3], "opacity": rows[:, 3],
            "log_scale": rows[:, 4:7], "quat": rows[:, 7:11],
        },
        sh_grad_compact=g_sh,
        probe_grad=g_probe,
        radii_compact=radii,
        n_isects=n_isects,
        inv=inv,
        stat_full=rows[:, 11:13],  # [screen-grad norm, visible] at full rows
    )


class ClmAcc(NamedTuple):
    """Per-batch accumulators carried through the clm camera loop as ONE
    donated pytree, so the whole per-camera accumulation (4 attribute grads,
    densify stats, visibility union, isect max) fuses into the micro-step
    dispatch instead of ~8 separate XLA launches per camera (each launch
    pays the tunnel/dispatch floor; the reference's per-camera accumulation
    is free inside its CUDA stream, clm_offload/engine.py:722-743)."""

    g_xyz: jnp.ndarray  # (C, 3)
    g_opacity: jnp.ndarray  # (C,)
    g_log_scale: jnp.ndarray  # (C, 3)
    g_quat: jnp.ndarray  # (C, 4)
    accum: jnp.ndarray  # (C,) densify stat numerator
    denom: jnp.ndarray  # (C,) densify stat denominator
    vis_any: jnp.ndarray  # (C,) bool
    max_isects: jnp.ndarray  # ()


def make_clm_acc(params) -> ClmAcc:
    C = params.xyz.shape[0]
    return ClmAcc(
        g_xyz=jnp.zeros_like(params.xyz),
        g_opacity=jnp.zeros_like(params.opacity),
        g_log_scale=jnp.zeros_like(params.log_scale),
        g_quat=jnp.zeros_like(params.quat),
        accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
        vis_any=jnp.zeros(C, bool),
        max_isects=jnp.zeros((), jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "isect_cap", "v_cap", "lambda_dssim", "loss_scale",
    ),
    donate_argnums=(5, 12),
)
def clm_fused_step(
    xyz, opacity, log_scale, quat,
    shc,  # (v_cap, 48) current working set
    grad_buf,  # (v_cap, 48) accumulated SH grads, donated
    idx_all,  # (B, v_cap) all cameras' visible-index lists (resident)
    viewmats, Ks, campos_all, gts,  # (B, ...) resident batch arrays
    cam,  # () int32 — which camera (host passes the TSP-ordered id)
    acc: ClmAcc,  # donated
    sh_degree, background,
    width: int, height: int, isect_cap: int, v_cap: int,
    lambda_dssim: float = 0.2,
    loss_scale: float = 1.0,
):
    """One clm camera: micro-step + ALL per-camera accumulation in a single
    dispatch. Equivalent to micro_step_visible followed by the caller-side
    gpu-grad adds, scatter_stats, vis_any union, max_isects fold and the
    grad_buf accumulation — fused so each camera costs one XLA launch and the
    accumulators update in place (donated)."""
    idx = idx_all[cam]
    out = micro_step_visible(
        xyz, opacity, log_scale, quat, shc, idx,
        viewmats[cam], Ks[cam], campos_all[cam], gts[cam],
        sh_degree, background, width, height, isect_cap, v_cap,
        lambda_dssim=lambda_dssim, loss_scale=loss_scale,
    )
    # densify stats / visibility union from the micro-step's packed expansion
    # (stat_full rides the same row-gather as the grads; no XLA scatters —
    # identical values: idx rows unique)
    hit = out.inv < v_cap
    vis_f = out.stat_full[:, 1] > 0.0
    new_acc = ClmAcc(
        g_xyz=acc.g_xyz + out.gpu_grads["xyz"],
        g_opacity=acc.g_opacity + out.gpu_grads["opacity"],
        g_log_scale=acc.g_log_scale + out.gpu_grads["log_scale"],
        g_quat=acc.g_quat + out.gpu_grads["quat"],
        accum=acc.accum + jnp.where(vis_f, out.stat_full[:, 0], 0.0),
        denom=acc.denom + vis_f.astype(jnp.float32),
        vis_any=acc.vis_any | hit,
        max_isects=jnp.maximum(acc.max_isects, out.n_isects),
    )
    return out.loss, grad_buf + out.sh_grad_compact, new_acc


class MicroBatchOut(NamedTuple):
    losses: jnp.ndarray  # (D,)
    gpu_grads: dict  # full (C, ...) grads SUMMED over the D cameras
    sh_grad_compact: jnp.ndarray  # (D, v_cap, 48)
    probe_grad: jnp.ndarray  # (D, v_cap, 2)
    radii_compact: jnp.ndarray  # (D, v_cap)
    n_isects: jnp.ndarray  # () max over cameras


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "isect_cap", "v_cap", "lambda_dssim", "loss_scale",
    ),
)
def micro_step_visible_batch(
    xyz, opacity, log_scale, quat,
    shc_d,  # (D, v_cap, 48) — one working set per parallel camera chain
    idx_d,  # (D, v_cap)
    viewmats_d, Ks_d, campos_d, gts_d, sh_degree, background,
    width: int, height: int, isect_cap: int, v_cap: int,
    lambda_dssim: float = 0.2,
    loss_scale: float = 1.0,
) -> MicroBatchOut:
    """D cameras' micro-steps in ONE dispatch (the clm x data-parallel mesh:
    the leading D axis is sharded over the mesh's `data` axis, so each chip
    group renders its own camera chain while GSPMD gathers the gauss-sharded
    attributes; per-camera semantics identical to micro_step_visible)."""
    outs = jax.vmap(
        lambda shc, idx, vm, K, cp, gt: micro_step_visible(
            xyz, opacity, log_scale, quat, shc, idx, vm, K, cp, gt,
            sh_degree, background, width, height, isect_cap, v_cap,
            lambda_dssim=lambda_dssim, loss_scale=loss_scale,
        )
    )(shc_d, idx_d, viewmats_d, Ks_d, campos_d, gts_d)
    return MicroBatchOut(
        losses=outs.loss,
        gpu_grads={k: jnp.sum(v, axis=0) for k, v in outs.gpu_grads.items()},
        sh_grad_compact=outs.sh_grad_compact,
        probe_grad=outs.probe_grad,
        radii_compact=outs.radii_compact,
        n_isects=jnp.max(outs.n_isects),
    )


@partial(jax.jit, static_argnames=("width", "height", "isect_cap", "v_cap"))
def eval_visible(
    xyz, opacity, log_scale, quat, sh_compact, idx,
    viewmat, Kmat, campos, sh_degree, background,
    width: int, height: int, isect_cap: int, v_cap: int,
):
    """Eval render from a compact visible set (clm_offload_eval_one_cam,
    clm_offload/engine.py:928-979)."""
    C = xyz.shape[0]
    valid = idx < C
    idc = jnp.minimum(idx, C - 1)
    xyz_c = xyz[idc]
    proj = fully_fused_projection(
        xyz_c, quat[idc], jnp.exp(log_scale[idc]), viewmat[None], Kmat[None],
        width, height, alive=valid,
    )
    dirs = xyz_c - campos[None, :]
    basis = sh_basis(dirs) * degree_mask(sh_degree)
    colors = jnp.maximum(
        jnp.einsum("nk,nkc->nc", basis, sh_compact.reshape(v_cap, 16, 3)) + 0.5,
        0.0,
    )
    image, _, n_isects = rasterize(
        proj.means2d[0], proj.conics[0], colors, jax.nn.sigmoid(opacity[idc]),
        proj.depths[0], proj.radii[0], width, height, background, isect_cap,
    )
    return image, n_isects


@partial(jax.jit, static_argnames=())
def scatter_stats(xyz_grad_accum, denom, idx, probe_grad, radii_compact, width, height):
    """Densification stats from a compact probe grad
    (update_densification_stats_offload_accum_grads, densification.py:59)."""
    g = probe_grad * jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
    norm = jnp.linalg.norm(g, axis=-1)
    vis = radii_compact > 0
    C = xyz_grad_accum.shape[0]
    dst = jnp.where(vis, idx, C)
    return (
        xyz_grad_accum.at[dst].add(norm, mode="drop"),
        denom.at[dst].add(1.0, mode="drop"),
    )


def hamming_distance_matrix(sample):
    """(B, S) bool visibility samples -> (B, B) int32 Hamming distances for the
    camera-order TSP (clm_offload/engine.py:158-176)."""
    s = sample.astype(jnp.int32)
    inter = s @ s.T  # (B, B) count of common-visible
    ones = jnp.sum(s, axis=1)
    return (ones[:, None] + ones[None, :] - 2 * inter).astype(jnp.int32)
