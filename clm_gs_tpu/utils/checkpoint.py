"""Full train-state checkpointing — params + both Adam moments + step +
iteration + RNG.

The reference's checkpoint path is non-functional (capture/restore assert
False, no_offload/gaussian_model.py:39,56; SURVEY.md §5.4); this module is the
working replacement. Format: one .npz of flat arrays + a small JSON sidecar.
Layout:  <model_path>/checkpoints/<iteration>/chkpnt.npz  (mirroring
train.py:507-526), discovered for resume by `latest_checkpoint`
(--auto_start_checkpoint, arguments/__init__.py:323-330).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState
from clm_gs_tpu.optim import AdamState


def _atomic_savez(path: str, arrays: dict):
    """np.savez via tmp + os.replace: a SIGKILL mid-write leaves no truncated
    file behind (the failure mode: resume picks a half-written npz as the
    latest checkpoint and dies on BadZipFile)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(
    model_path: str,
    iteration: int,
    state: GaussianState,
    opt_state: AdamState,
    rng_key,
    extra: Optional[dict] = None,
    strategy_extra: Optional[dict] = None,
):
    """Crash-safe ordering: all array files land atomically first; meta.json
    is written (atomically) LAST and acts as the completion marker that
    `latest_checkpoint` requires — a kill at any point leaves either a
    complete checkpoint or one that resume skips."""
    out_dir = os.path.join(model_path, "checkpoints", str(iteration))
    os.makedirs(out_dir, exist_ok=True)
    arrays = {}
    p = state.params
    for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
        arrays[f"params.{name}"] = np.asarray(getattr(p, name))
        arrays[f"mu.{name}"] = np.asarray(getattr(opt_state.mu, name))
        arrays[f"nu.{name}"] = np.asarray(getattr(opt_state.nu, name))
    arrays["alive"] = np.asarray(state.alive)
    arrays["xyz_grad_accum"] = np.asarray(state.xyz_grad_accum)
    arrays["denom"] = np.asarray(state.denom)
    arrays["max_radii2d"] = np.asarray(state.max_radii2d)
    arrays["steps"] = np.asarray(opt_state.steps)
    arrays["rng_key"] = np.asarray(jax.random.key_data(rng_key))
    _atomic_savez(os.path.join(out_dir, "chkpnt.npz"), arrays)
    if strategy_extra:
        _atomic_savez(os.path.join(out_dir, "strategy_extra.npz"), strategy_extra)
    meta = {"iteration": iteration, "n_alive": int(state.n_alive)}
    if extra:
        meta.update(extra)
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_dir, "meta.json"))


def load_checkpoint(path: str) -> Tuple[GaussianState, AdamState, object, int]:
    """`path` is a checkpoint dir (…/checkpoints/<iter>). Returns
    (state, opt_state, rng_key, next_iteration)."""
    z = np.load(os.path.join(path, "chkpnt.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    def grp(prefix):
        return GaussianParams(
            xyz=jnp.asarray(z[f"{prefix}.xyz"]),
            opacity=jnp.asarray(z[f"{prefix}.opacity"]),
            log_scale=jnp.asarray(z[f"{prefix}.log_scale"]),
            quat=jnp.asarray(z[f"{prefix}.quat"]),
            sh=jnp.asarray(z[f"{prefix}.sh"]),
        )

    alive = jnp.asarray(z["alive"])
    state = GaussianState(
        params=grp("params"), alive=alive,
        n_alive=jnp.asarray(int(z["alive"].sum()), jnp.int32),
        xyz_grad_accum=jnp.asarray(z["xyz_grad_accum"]),
        denom=jnp.asarray(z["denom"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
    )
    opt = AdamState(mu=grp("mu"), nu=grp("nu"), steps=jnp.asarray(z["steps"]))
    rng_key = jax.random.wrap_key_data(jnp.asarray(z["rng_key"]))
    return state, opt, rng_key, meta["iteration"]


def latest_checkpoint(model_path: str) -> Optional[str]:
    """Newest COMPLETE checkpoint dir (meta.json is written last, so its
    presence certifies every array file landed; incomplete dirs from a crash
    mid-save are skipped in favor of the previous checkpoint)."""
    root = os.path.join(model_path, "checkpoints")
    if not os.path.isdir(root):
        return None
    for it in sorted(
        (int(d) for d in os.listdir(root) if d.isdigit()), reverse=True
    ):
        d = os.path.join(root, str(it))
        if os.path.exists(os.path.join(d, "meta.json")) and os.path.exists(
            os.path.join(d, "chkpnt.npz")
        ):
            return d
    return None
