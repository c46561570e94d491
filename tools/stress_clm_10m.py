"""VERDICT #5: clm_offload host-path stress at 10M Gaussians on one chip.

Validates the beyond-HBM mechanism at reference scale (the reference's bigcity
configs run 10M-102M, release_scripts/bigcity_README.md:121-127): 10M-row host
SH buffers (~3.8 GB pinned-equivalent host DRAM), per-camera retention
delta transfers, finish-set scheduling, and the C++ host Adam — with
per-stage timers so the host-side costs are measured, not guessed.

Cameras look at different sub-regions of a wide scene so visible sets are
partial and consecutive cameras share gaussians (retention exercised).

Usage: nohup timeout 3000 python -u tools/stress_clm_10m.py [n] [bsz] > /tmp/stress10m.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    w, h = 640, 480

    import jax
    import jax.numpy as jnp

    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
    from clm_gs_tpu.strategies import clm_offload
    from clm_gs_tpu.utils.timer import Timer
    from tests.utils3d import make_camera

    cap = -(-n // 65536) * 65536
    rng = np.random.RandomState(0)
    print(f"n={n} cap={cap} bsz={bsz}", flush=True)

    # wide scene: points spread over a 40-unit disc, cameras orbit at
    # radius 26 looking inward-tangentially -> each sees a sector
    t0 = time.time()
    xyz = np.empty((n, 3), np.float32)
    xyz[:, 0] = rng.uniform(-20, 20, n)
    xyz[:, 1] = rng.uniform(-20, 20, n)
    xyz[:, 2] = rng.uniform(-2, 2, n)
    log_scale = np.full((n, 3), np.log(0.02), np.float32)
    quat = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opacity = rng.uniform(-2.0, 1.0, n).astype(np.float32)
    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = rng.uniform(-1, 1, (n, 3)).astype(np.float32)

    def pad(x):
        return jnp.asarray(np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)))

    # SH never touches the device: fill the host buffer directly and use
    # make_context_empty — round-tripping cap x 48 floats through the sandbox
    # tunnel costs ~40 min at 100M-scale for nothing
    params = G.GaussianParams(
        xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat + 0.01 * rng.normal(size=(n, 4)).astype(np.float32)),
        sh=jnp.zeros((1, 48), jnp.float32),
    )
    state = G.GaussianState(
        params=params, alive=jnp.asarray(np.arange(cap) < n),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )
    print(f"host build {time.time()-t0:.1f} s", flush=True)

    cams = [
        make_camera(
            uid=i, width=w, height=h, dist=26.0, angle=2 * np.pi * i / (2 * bsz)
        )
        for i in range(bsz)
    ]
    cb = stack_cameras(cams)
    gts = jnp.zeros((bsz, 3, h, w), jnp.float32)
    lrs = {
        "xyz": jnp.float32(1.6e-4), "opacity": jnp.float32(0.05),
        "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
        "sh": sh_column_lr(0.0025),
    }
    bg = jnp.zeros(3, jnp.float32)
    adam_cfg = AdamConfig()

    cfg = Config()
    cfg.aux.clm_offload = True
    cfg.opt.bsz = bsz
    cfg.opt.lr_scale_mode = "accumu"
    cfg.bench.enable_timer = True
    init_config(cfg)

    t0 = time.time()
    ctx = clm_offload.make_context_empty(cfg, cap, adam_cfg)
    ctx.sh_host[:n] = sh
    opt = init_adam(state.params)
    print(f"make_context {time.time()-t0:.1f} s "
          f"(host buffers {2*cap*48*4/2**30:.2f} GB)", flush=True)

    import resource

    isect_cap = max(2**18, min(4 * 2**20, -(-2 * n // 2**18) * 2**18))
    tm = Timer(enabled=True)
    for it in range(3):
        t0 = time.time()
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, w, h,
            isect_cap, cfg, timers=tm,
        )
        losses = np.asarray(out.losses)
        dt = time.time() - t0
        mi = int(out.max_isects)
        hbm = (jax.local_devices()[0].memory_stats() or {}).get(
            "peak_bytes_in_use", 0
        )
        print(
            f"batch {it}: {dt:.2f} s ({bsz/dt:.2f} cam/s), "
            f"loss {losses.mean():.4f} max_isects {mi} "
            f"hbm_peak {hbm/2**30:.2f} GB "
            f"host_rss {resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/2**20:.1f} GB",
            flush=True,
        )
        if mi > isect_cap:
            isect_cap = -(-int(mi * 1.25) // 2**18) * 2**18
            print(f"isect_cap -> {isect_cap}", flush=True)
    print(tm.report(), flush=True)
    nb = ctx.n_batches
    if nb:
        print(
            f"clm overlap: host work {ctx.host_work_s/nb*1e3:.1f} ms/batch, "
            f"trailing {ctx.trailing_s/nb*1e3:.1f} ms/batch, "
            f"comm-hidden {max(0.0, 1.0 - ctx.trailing_s/max(ctx.host_work_s,1e-9))*100:.0f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
