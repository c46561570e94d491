"""Adaptive densification (clone / split / prune / opacity reset).

Replaces the reference's densify_and_prune stack (strategies/
base_gaussian_model.py:364-388, no_offload/gaussian_model.py:678-753,
densification.py:5-56) with mask-based updates on the fixed-capacity padded
buffers — in JAX, growing the model is writing into free slots, not
reallocating tensors (SURVEY.md §7.2 hard-part #5). Semantics preserved:

  - grads = xyz_gradient_accum / denom, NaN (denom 0) -> 0
  - clone:  grad >= thresh and max(scale) <= percent_dense * extent
            -> one exact copy
  - split:  grad >= thresh and max(scale) >  percent_dense * extent
            -> N=2 samples from N(0, scale) rotated into world frame,
               new log_scale = log(scale / (0.8 N)); source pruned
  - prune:  opacity < min_opacity, plus (when size pruning is active, i.e.
            iteration > opacity_reset_interval) max(scale) > 0.1 * extent.
            The reference's max_radii2D screen-size branch is a proven no-op
            (base_gaussian_model.py:374-381 asserts it) and is omitted.
    As in the reference, pruning is evaluated *after* clone/split on the grown
    set, so fresh rows failing the predicate die at birth.
  - all densification stats reset to zero afterwards (densification_postfix,
    no_offload/gaussian_model.py:643-676)
  - optimizer moments of new rows start at zero; opacity reset zeroes only the
    opacity moments (reset_opacity :385, replace_tensor_to_unified_adam).

Capacity handling: `count_densify` is a cheap jitted pre-pass that reports how
many new rows the next densify would produce, so the host can grow buffers
(models.gaussians.grow_capacity) to a bucketed capacity *before* running the
jitted `densify_and_prune` — no data-dependent shapes anywhere.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState, activated
from clm_gs_tpu.optim import AdamState, zero_opacity_rows
from clm_gs_tpu.utils.general import build_rotation, inverse_sigmoid


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_alive: jnp.ndarray
    overflow: jnp.ndarray  # bool: ran out of capacity (host must grow + retry)
    # Row-movement plan, so offload strategies can replay clone/split on
    # host-resident SH buffers (the reference's CPU-side pinned-buffer row
    # copies, clm_offload/gaussian_model.py:687-831). dest == capacity means
    # "no row written for this source".
    clone_dest: jnp.ndarray = None  # (C,) int32
    split_dest: jnp.ndarray = None  # (n_split_samples, C) int32
    written: jnp.ndarray = None  # (C,) bool — slots written this round


def _masks(state: GaussianState, grad_threshold, percent_dense, extent):
    grads = jnp.where(
        state.denom > 0, state.xyz_grad_accum / jnp.maximum(state.denom, 1.0), 0.0
    )
    _, scales = activated(state.params)
    smax = jnp.max(scales, axis=1)
    hot = state.alive & (grads >= grad_threshold)
    clone_mask = hot & (smax <= percent_dense * extent)
    split_mask = hot & (smax > percent_dense * extent)
    return clone_mask, split_mask, smax


@partial(jax.jit, static_argnames=())
def count_densify(state: GaussianState, grad_threshold, percent_dense, extent):
    """Number of new rows the next densify would write (clone + 2*split)."""
    clone_mask, split_mask, _ = _masks(state, grad_threshold, percent_dense, extent)
    return jnp.sum(clone_mask) + 2 * jnp.sum(split_mask)


@partial(jax.jit, static_argnames=("n_split_samples", "include_sh"))
def densify_and_prune(
    state: GaussianState,
    opt_state: AdamState,
    rng: jnp.ndarray,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    size_prune: jnp.ndarray,
    n_split_samples: int = 2,
    include_sh: bool = True,
):
    """One densification round. Returns (state, opt_state, DensifyInfo).

    include_sh=False: the SH buffer lives on the host (clm strategy) and is a
    tiny placeholder here — row movements are skipped on device and replayed
    host-side from the returned plan (opt_state may be None likewise).
    """
    C = state.capacity
    p = state.params
    clone_mask, split_mask, smax = _masks(state, grad_threshold, percent_dense, extent)
    opac = jax.nn.sigmoid(p.opacity)
    scales = jnp.exp(p.log_scale)
    N = n_split_samples

    # ---- prune the existing set (sources of splits die; opacity/size prune) ----
    base_prune = (opac < min_opacity) | (size_prune & (smax > 0.1 * extent))
    prune_existing = state.alive & (base_prune | split_mask)

    # ---- birth-survival of new rows (reference prunes after the grow) ----
    clone_survives = ~base_prune  # clones copy opacity and scale
    split_smax_new = smax / (0.8 * N)
    split_survives = ~((opac < min_opacity) | (size_prune & (split_smax_new > 0.1 * extent)))

    n_requests = (
        clone_mask.astype(jnp.int32) * clone_survives.astype(jnp.int32)
        + N * split_mask.astype(jnp.int32) * split_survives.astype(jnp.int32)
    )
    rank = jnp.cumsum(n_requests) - n_requests  # exclusive: slot rank per source
    n_new = jnp.sum(n_requests)

    alive_after_prune = state.alive & ~prune_existing
    n_free = C - jnp.sum(alive_after_prune)
    overflow = n_new > n_free

    # k-th free slot (in index order): stable argsort of aliveness
    free_slots = jnp.argsort(alive_after_prune, stable=True)  # free first

    # ---- build new rows: for each source, up to N+1 generated rows ----
    # row 0: clone copy; rows 1..N: split samples.
    stds = scales  # (C, 3)
    rots = build_rotation(p.quat)  # (C, 3, 3)
    noise = jax.random.normal(rng, (N, C, 3), jnp.float32) * stds[None]
    split_xyz = jnp.einsum("cij,ncj->nci", rots, noise) + p.xyz[None]  # (N, C, 3)
    split_log_scale = jnp.log(jnp.maximum(scales / (0.8 * N), 1e-30))

    def scatter_rows(dest_params: GaussianParams, src_mask, k_offset, xyz, log_scale):
        """Scatter one generated row per masked source into free slots."""
        k = rank + k_offset
        dest = jnp.where(src_mask, free_slots[jnp.minimum(k, C - 1)], C)

        def sc(dst_arr, src_arr):
            return dst_arr.at[dest].set(src_arr, mode="drop")

        return GaussianParams(
            xyz=sc(dest_params.xyz, xyz),
            opacity=sc(dest_params.opacity, p.opacity),
            log_scale=sc(dest_params.log_scale, log_scale),
            quat=sc(dest_params.quat, p.quat),
            sh=sc(dest_params.sh, p.sh) if include_sh else dest_params.sh,
        ), dest

    new_params = p
    written = jnp.zeros(C, bool)
    # clones
    cm = clone_mask & clone_survives & ~overflow
    new_params, clone_dest = scatter_rows(new_params, cm, 0, p.xyz, p.log_scale)
    written = written.at[clone_dest].set(cm, mode="drop")
    # splits: sample r occupies rank offset (clone_present? no: a source is
    # either clone or split, masks disjoint) -> offsets 0..N-1
    sm = split_mask & split_survives & ~overflow
    split_dests = []
    for r in range(N):
        new_params, dest = scatter_rows(
            new_params, sm, r, split_xyz[r], split_log_scale
        )
        split_dests.append(dest)
        written = written.at[dest].set(sm, mode="drop")

    alive_new = alive_after_prune | written
    n_alive = jnp.sum(alive_new).astype(jnp.int32)

    # ---- optimizer state: zero moments at freshly-written rows ----
    def zero_written(x):
        if x.shape[0] != C:  # host-managed placeholder group
            return x
        bshape = (C,) + (1,) * (x.ndim - 1)
        return jnp.where(written.reshape(bshape), 0.0, x)

    if opt_state is not None:
        opt_state = AdamState(
            mu=jax.tree.map(zero_written, opt_state.mu),
            nu=jax.tree.map(zero_written, opt_state.nu),
            steps=opt_state.steps,
        )

    # dead rows zeroed so masked projection sees benign values
    def clear_dead(x):
        if x.shape[0] != C:
            return x
        bshape = (C,) + (1,) * (x.ndim - 1)
        return jnp.where(alive_new.reshape(bshape), x, 0.0)

    new_params = GaussianParams(*[clear_dead(a) for a in new_params.astuple()])

    new_state = GaussianState(
        params=new_params,
        alive=alive_new,
        n_alive=n_alive,
        xyz_grad_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
        max_radii2d=jnp.zeros(C, jnp.float32),
    )
    info = DensifyInfo(
        n_cloned=jnp.sum(cm),
        n_split=jnp.sum(sm),
        n_pruned=jnp.sum(prune_existing),
        n_alive=n_alive,
        overflow=overflow,
        clone_dest=jnp.where(cm, clone_dest, C).astype(jnp.int32),
        split_dest=jnp.stack(
            [jnp.where(sm, dst, C).astype(jnp.int32) for dst in split_dests]
        ),
        written=written,
    )
    return new_state, opt_state, info


@jax.jit
def reset_opacity(state: GaussianState, opt_state):
    """opacity <- inverse_sigmoid(min(sigmoid(opacity), 0.01)); zero the
    opacity Adam moments (reset_opacity, no_offload/gaussian_model.py:385).

    opt_state may be None (naive_offload keeps ALL moments host-side and the
    strategy's post_opacity_reset zeroes them there) — densify_and_prune has
    the same guard; its absence here crashed the first 3000-iteration reset
    of a full-schedule naive run."""
    p = state.params
    new_op = inverse_sigmoid(jnp.clip(jax.nn.sigmoid(p.opacity), 1e-7, 0.01))
    new_op = jnp.where(state.alive, new_op, 0.0)
    state = replace(state, params=replace(p, opacity=new_op))
    if opt_state is not None:
        opt_state = zero_opacity_rows(opt_state, state.alive)
    return state, opt_state


@jax.jit
def add_densification_stats(
    state: GaussianState, means2d_grad, visibility, width, height
):
    """Accumulate screen-space gradient norms (gsplat_add_densification_stats,
    no_offload/gaussian_model.py:766-787): grad scaled by (W/2, H/2), L2 norm
    added at visible rows; denom incremented at visible rows."""
    g = means2d_grad * jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
    norm = jnp.linalg.norm(g, axis=-1)
    vis = visibility.astype(jnp.float32)
    return replace(
        state,
        xyz_grad_accum=state.xyz_grad_accum + norm * vis,
        denom=state.denom + vis,
    )
