"""Surgical A/B of one training batch: no_offload.train_step vs the
naive_offload path (_batch_grads + HostAdam), from identical state, on the
current backend. Prints per-group max|delta| of updated params and of the
accumulated grads, to localize the TPU-only naive drift."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from clm_gs_tpu.config import parse_config, init_config
from clm_gs_tpu.scene import Scene
from clm_gs_tpu.data.cameras import stack_cameras
from clm_gs_tpu.optim import AdamConfig, init_adam
from clm_gs_tpu.strategies import naive_offload, no_offload
from clm_gs_tpu.utils.logger import RunLogger
from clm_gs_tpu.utils.general import get_expon_lr_func
from clm_gs_tpu.optim import lr_batch_scale, sh_column_lr


def main():
    cfg = init_config(parse_config([
        "-s", "/tmp/qscene/scene", "-m", "/tmp/sbdiff", "--no_offload",
        "--eval", "--llffhold", "8", "--bsz", "4", "--isect_cap", "262144",
        "--do_not_save", "--quiet",
    ]))
    logger = RunLogger(cfg.model.model_path, quiet=True)
    scene = Scene(cfg, logger)
    state = scene.gaussians
    W, H = scene.width, scene.height
    bsz = 4
    adam_cfg = AdamConfig().scaled(bsz, cfg.opt.lr_scale_mode)
    lr_scale = lr_batch_scale(bsz, cfg.opt.lr_scale_mode)
    spatial = scene.cameras_extent
    xyz_lr = get_expon_lr_func(
        cfg.opt.position_lr_init * spatial, cfg.opt.position_lr_final * spatial,
        lr_delay_mult=cfg.opt.position_lr_delay_mult,
        max_steps=cfg.opt.position_lr_max_steps,
    )(1)
    lrs = {
        "xyz": jnp.float32(float(xyz_lr) * lr_scale),
        "opacity": jnp.float32(cfg.opt.opacity_lr * lr_scale),
        "log_scale": jnp.float32(cfg.opt.scaling_lr * lr_scale),
        "quat": jnp.float32(cfg.opt.rotation_lr * lr_scale),
        "sh": sh_column_lr(cfg.opt.feature_lr) * lr_scale,
    }
    background = jnp.zeros(3, jnp.float32)
    dataset = scene.train_dataset(bsz)
    cams, gt, _idxs = dataset.next_batch()
    cb = stack_cameras(cams)
    gt = jnp.asarray(gt)

    # path A: no_offload
    opt_state = init_adam(state.params)
    stA, optA, outA = no_offload.train_step(
        state, opt_state, cb, gt, 0, lrs, adam_cfg, background,
        W, H, 262144, sparse_adam=False, accumulate_stats=True,
    )

    # path B: naive
    ctx = naive_offload.make_context(cfg, state, adam_cfg)
    stripped = naive_offload.strip_device_params(state)
    stB, _, ctx, outB = naive_offload.train_one_batch(
        stripped, None, ctx, cb, gt, 0, lrs, adam_cfg, background,
        W, H, 262144, cfg,
    )
    matB = naive_offload.materialize(stB, ctx)

    print("losses A:", np.asarray(outA.losses))
    print("losses B:", np.asarray(outB.losses))
    for n in ("xyz", "opacity", "log_scale", "quat", "sh"):
        a = np.asarray(getattr(stA.params, n))
        b = np.asarray(getattr(matB.params, n))
        p0 = np.asarray(getattr(state.params, n))
        d = np.abs(a - b).max()
        upd = np.abs(a - p0).max()
        print(f"{n:10s} max|A-B| {d:.3e}   max|A-init| {upd:.3e}")
    # stats parity
    for nm, a, b in (
        ("xyz_grad_accum", stA.xyz_grad_accum, stB.xyz_grad_accum),
        ("denom", stA.denom, stB.denom),
    ):
        print(f"{nm:14s} max|A-B| {np.abs(np.asarray(a)-np.asarray(b)).max():.3e}")


if __name__ == "__main__":
    main()
