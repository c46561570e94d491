"""Headline benchmark: fwd+bwd rasterization throughput (Mpix/s) on one chip.

Runs the full differentiable training-step path (projection -> SH -> binning ->
Pallas compositing -> loss -> hand-derived backward -> Adam) of the no_offload
strategy on a synthetic scene, and reports Mpix/s of training throughput.

Baseline: the reference trains Mip-360 bicycle (images_4, ~1.0 Mpix cameras)
at 30000 iterations / 734 s = 40.87 cameras/s on an RTX 4090 (BASELINE.md,
README.md:70-74) => ~40.2 Mpix/s fwd+bwd+step. vs_baseline = ours / that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
    from clm_gs_tpu.strategies import no_offload
    from clm_gs_tpu.data.cameras import stack_cameras
    from tests.utils3d import make_camera

    # synthetic scene: 1M Gaussians in a shell around the origin, bicycle-like
    # camera resolution (images_4: 1237x822 ~= 1.0 Mpix)
    N, CAP = 1_000_000, 1_048_576
    W, H = 1237, 822
    BSZ = 4
    # the cap the trainer's adaptive bucketing converges to for this scene:
    # round_up(n_isects * 1.25, 2**18) with n_isects = 2287250
    # (train.py grows the bucket whenever max_isects > 0.92 * cap)
    ISECT_CAP = 2883584
    rng = np.random.RandomState(0)
    xyz = rng.normal(size=(N, 3)).astype(np.float32) * 2.0
    log_scale = np.full((N, 3), np.log(0.01), np.float32) + 0.3 * rng.normal(
        size=(N, 3)
    ).astype(np.float32)
    quat = rng.normal(size=(N, 4)).astype(np.float32)
    opacity = rng.uniform(-2.0, 1.0, N).astype(np.float32)
    sh = np.zeros((N, 48), np.float32)
    sh[:, :3] = rng.uniform(-1, 1, (N, 3))
    sh[:, 3:] = 0.05 * rng.normal(size=(N, 45)).astype(np.float32)

    def pad(x):
        return jnp.asarray(
            np.pad(x, [(0, CAP - N)] + [(0, 0)] * (x.ndim - 1))
        )

    params = G.GaussianParams(
        xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat), sh=pad(sh),
    )
    state = G.GaussianState(
        params=params, alive=jnp.asarray(np.arange(CAP) < N),
        n_alive=jnp.asarray(N, jnp.int32),
        xyz_grad_accum=jnp.zeros(CAP), denom=jnp.zeros(CAP),
        max_radii2d=jnp.zeros(CAP),
    )
    opt = init_adam(params)
    cams = [
        make_camera(uid=i, width=W, height=H, dist=6.0, angle=2 * np.pi * i / BSZ)
        for i in range(BSZ)
    ]
    cb = stack_cameras(cams)
    gts = jnp.zeros((BSZ, 3, H, W), jnp.float32)
    lrs = {
        "xyz": jnp.float32(1.6e-4), "opacity": jnp.float32(0.05),
        "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
        "sh": sh_column_lr(0.0025),
    }
    bg = jnp.zeros(3, jnp.float32)
    cfg = AdamConfig()

    def step(state, opt):
        return no_offload.train_step(
            state, opt, cb, gts, 3, lrs, cfg, bg, W, H, ISECT_CAP,
            accumulate_stats=False,
        )

    def drain(s, o, out):
        # On remote-tunneled devices block_until_ready can return before the
        # queue drains; fetching values is the only reliable sync.
        return float(out.losses.sum()) + float(s.params.opacity[0]) + float(
            o.mu.xyz[0, 0]
        )

    # warmup / compile
    s, o, out = step(state, opt)
    drain(s, o, out)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        s, o, out = step(s, o)
    drain(s, o, out)
    dt = time.perf_counter() - t0

    mpix_s = iters * BSZ * W * H / dt / 1e6
    baseline_mpix_s = 30000 / 734.0 * (W * H / 1e6)  # 4090 bicycle no_offload
    print(
        json.dumps(
            {
                "metric": "train_throughput_fwd_bwd",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix_s / baseline_mpix_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
