"""Adam optimizers for Gaussian training.

Replaces the reference's optimizer stack (optimizer.py: SelectiveAdam :6,
UnifiedAdam :91; cpu_adam.FusedCPUAdam per SURVEY.md §2.3c) with one functional
Adam over the GaussianParams pytree. The *placement* question that UnifiedAdam
answers (which groups live on CPU vs GPU) is a strategies-layer concern here;
the update math is identical everywhere:

  - per-group learning rates (position uses the exponential schedule; the
    feature/"sh" group uses per-column LRs: dc columns at feature_lr, rest
    columns at feature_lr/20 — columns_sizes=[3,45] of
    clm_offload/gaussian_model.py:161-162),
  - eps = 1e-15, betas (0.9, 0.999) (naive_offload/gaussian_model.py:146),
  - selective/sparse mode: only rows visible in the current batch are updated
    (clm_kernels.selective_adam_update, optimizer.py:47-88) — non-visible rows
    keep params AND moments untouched; bias correction uses the global step
    count exactly like torch.optim.Adam / Taming-3DGS do,
  - batch-size LR scaling rules (lr_scale_mode, clm_offload/
    gaussian_model.py:183-211): "linear": lr *= bsz; "sqrt" (default):
    lr *= sqrt(bsz), eps /= sqrt(bsz), betas = betas**bsz; "accumu": none.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from clm_gs_tpu.models.gaussians import GaussianParams


@dataclass(frozen=True)
class AdamConfig:
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-15

    def scaled(self, bsz: int, mode: str) -> "AdamConfig":
        """Apply the reference's bsz scaling rules to eps/betas. LR scaling is
        applied in `group_lrs` (the schedules return unscaled values)."""
        if mode == "sqrt":
            return AdamConfig(
                betas=tuple(b**bsz for b in self.betas),
                eps=self.eps / (bsz**0.5),
            )
        return self


def lr_batch_scale(bsz: int, mode: str) -> float:
    if mode == "sqrt":
        return bsz**0.5
    if mode == "linear":
        return float(bsz)
    return 1.0


@dataclass(frozen=True)
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    steps: jnp.ndarray  # () global step count (torch.optim.Adam semantics)


jtu.register_dataclass(AdamState, data_fields=["mu", "nu", "steps"], meta_fields=[])


def init_adam(params: GaussianParams) -> AdamState:
    # mu and nu must be DISTINCT buffers: sharing one zeros tree trips
    # "donate the same buffer twice" in donated steps (clm's _adam_tail)
    return AdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        steps=jnp.zeros((), jnp.float32),
    )


def sh_column_lr(feature_lr: float, capacity_cols: int = 48) -> jnp.ndarray:
    """(48,) per-column LR for the concatenated sh array: dc at feature_lr,
    rest at feature_lr/20 (columns_lr of optimizer.py:130-144)."""
    lr = jnp.full((capacity_cols,), feature_lr / 20.0, jnp.float32)
    return lr.at[0:3].set(feature_lr)


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    cfg: AdamConfig,
    update_mask: jnp.ndarray,
):
    """One (optionally selective) Adam step.

    Args:
      lrs: {"xyz": scalar, "opacity": scalar, "log_scale": scalar,
            "quat": scalar, "sh": (48,) per-column}.
      update_mask: (C,) bool — rows to update (alive & visible for selective
        mode; alive for dense mode).

    Returns (new_params, new_state).
    """
    b1, b2 = cfg.betas
    steps = state.steps + 1.0
    bc1 = jnp.maximum(1.0 - b1**steps, 1e-30)
    bc2 = jnp.maximum(1.0 - b2**steps, 1e-30)

    def upd(p, g, m, v, lr):
        bshape = (p.shape[0],) + (1,) * (p.ndim - 1)
        maskb = update_mask.reshape(bshape)
        m_new = jnp.where(maskb, b1 * m + (1 - b1) * g, m)
        v_new = jnp.where(maskb, b2 * v + (1 - b2) * g * g, v)
        step = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps)
        p_new = jnp.where(maskb, p - step, p)
        return p_new, m_new, v_new

    new_p, new_m, new_v = {}, {}, {}
    for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
        p = getattr(params, name)
        m = getattr(state.mu, name)
        v = getattr(state.nu, name)
        if name not in lrs:  # group managed elsewhere (clm: SH lives on host)
            new_p[name], new_m[name], new_v[name] = p, m, v
            continue
        g = getattr(grads, name)
        new_p[name], new_m[name], new_v[name] = upd(p, g, m, v, lrs[name])

    return (
        GaussianParams(**new_p),
        AdamState(mu=GaussianParams(**new_m), nu=GaussianParams(**new_v), steps=steps),
    )


def zero_rows(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero optimizer state at masked rows (the reference's optimizer-state
    surgery on densify/prune/opacity-reset, clm_offload/gaussian_model.py:
    488-699)."""

    def z(x):
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        return jnp.where(mask.reshape(bshape), 0.0, x)

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
        steps=state.steps,
    )


def zero_opacity_rows(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Opacity-reset surgery: only the opacity group's moments are cleared
    (replace_tensor_to_unified_adam, clm_offload/gaussian_model.py:488-520)."""
    mu = replace(state.mu, opacity=jnp.where(mask, 0.0, state.mu.opacity))
    nu = replace(state.nu, opacity=jnp.where(mask, 0.0, state.nu.opacity))
    return replace(state, mu=mu, nu=nu)
