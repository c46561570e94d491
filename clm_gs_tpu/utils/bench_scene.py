"""Shared synthetic benchmark scene (bicycle-like scale: 1M Gaussians,
1237x822 ~= 1.02 Mpix cameras). Used by bench.py and tools/profile_stages.py
so stage-level profiling measures exactly the benchmarked workload."""

from __future__ import annotations

import numpy as np

N = 1_000_000
CAP = 1_048_576
W, H = 1237, 822
BSZ = 4
# the cap the trainer's adaptive bucketing converges to for this scene:
# round_up(n_isects * 1.15, 2**17) with n_isects = 1501798 under the
# opacity-aware tight bboxes + 32x16 rectangular tiles (train.py grows the
# bucket whenever max_isects > 0.93 * cap)
ISECT_CAP = 1835008


def make_scene(n: int = N, cap: int = CAP, bsz: int = BSZ, w: int = W, h: int = H):
    """Returns (state, opt_state, cam_batch, gt_images, lrs, adam_cfg, bg)."""
    import jax.numpy as jnp

    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
    from tests.utils3d import make_camera

    rng = np.random.RandomState(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    log_scale = np.full((n, 3), np.log(0.01), np.float32) + 0.3 * rng.normal(
        size=(n, 3)
    ).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(-2.0, 1.0, n).astype(np.float32)
    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = rng.uniform(-1, 1, (n, 3))
    sh[:, 3:] = 0.05 * rng.normal(size=(n, 45)).astype(np.float32)

    def pad(x):
        return jnp.asarray(np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)))

    params = G.GaussianParams(
        xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat), sh=pad(sh),
    )
    state = G.GaussianState(
        params=params, alive=jnp.asarray(np.arange(cap) < n),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )
    opt = init_adam(params)
    cams = [
        make_camera(uid=i, width=w, height=h, dist=6.0, angle=2 * np.pi * i / bsz)
        for i in range(bsz)
    ]
    cb = stack_cameras(cams)
    gts = jnp.zeros((bsz, 3, h, w), jnp.float32)
    lrs = {
        "xyz": jnp.float32(1.6e-4), "opacity": jnp.float32(0.05),
        "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
        "sh": sh_column_lr(0.0025),
    }
    return state, opt, cb, gts, lrs, AdamConfig(), jnp.zeros(3, jnp.float32)


def drain_scalar(*arrays) -> float:
    """Force a real device round-trip (block_until_ready lies on the axon
    tunnel): pull one scalar element from each array."""
    tot = 0.0
    for a in arrays:
        tot += float(a.reshape(-1)[0])
    return tot
