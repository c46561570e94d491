"""Root-cause probe for the offload-training host RSS growth (~5 MB/batch,
PARITY known gaps): trains clm_offload on a small synthetic scene, samples
RSS every batch, and periodically calls glibc malloc_trim(0).

If trim reclaims the growth -> glibc arena/free-list retention of the
transfer staging buffers (mitigation: periodic malloc_trim in the trainer).
If not -> live references (axon client staging log or our own), and the
growth curve + gc object census point at the owner.

Usage: timeout 900 python tools/rss_probe.py [n_batches]
"""

import ctypes
import gc
import sys
import time

import numpy as np
import psutil

sys.path.insert(0, "/root/repo")


def rss_mb():
    return psutil.Process().memory_info().rss / 2**20


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    # small scene: 64k gaussians, 320x240 so transfers are quick through the
    # 5 MB/s tunnel but every staging path still runs (env is read at
    # bench_scene import time)
    import os

    os.environ.setdefault("CLMGS_BENCH_N", "65536")
    os.environ.setdefault("CLMGS_BENCH_W", "320")
    os.environ.setdefault("CLMGS_BENCH_H", "240")
    os.environ.setdefault("CLMGS_BENCH_ISECT", "262144")
    import jax  # noqa: F401

    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.optim import init_adam
    from clm_gs_tpu.strategies import clm_offload
    import clm_gs_tpu.utils.bench_scene as bs
    from clm_gs_tpu.utils.bench_scene import drain_scalar, make_scene

    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()

    cfg = Config()
    cfg.aux.clm_offload = True
    cfg.opt.bsz = bs.BSZ
    init_config(cfg)
    ctx = clm_offload.make_context(cfg, state, adam_cfg)
    state = clm_offload.strip_device_sh(state)
    opt = init_adam(state.params)

    libc = ctypes.CDLL("libc.so.6")
    rows = []
    t0 = time.time()
    for b in range(nb):
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, bs.W, bs.H,
            bs.ISECT_CAP, cfg,
        )
        drain_scalar(out.losses)
        r = rss_mb()
        trimmed = None
        if b and b % 20 == 0:
            gc.collect()
            libc.malloc_trim(0)
            trimmed = rss_mb()
        rows.append((b, r, trimmed))
        if b % 5 == 0 or trimmed is not None:
            msg = f"batch {b:3d}  rss {r:8.1f} MB"
            if trimmed is not None:
                msg += f"  after gc+malloc_trim {trimmed:8.1f} MB"
            print(msg, flush=True)
    # slope over the last 30 batches (post-warmup), excluding trim points
    tail = [(b, r) for b, r, t in rows[-30:]]
    slope = np.polyfit([b for b, _ in tail], [r for _, r in tail], 1)[0]
    print(f"steady-state slope {slope:.2f} MB/batch over last 30 batches; "
          f"total wall {time.time()-t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
