"""Stage-3 RSS probe (no tracemalloc — it starves the tunnel-bound step):
per-10-batch RSS + jax.live_arrays census + ctx attribute sizes.

Usage: timeout 900 python tools/rss_probe3.py [n_batches]
"""

import sys

import numpy as np
import psutil

sys.path.insert(0, "/root/repo")


def rss_mb():
    return psutil.Process().memory_info().rss / 2**20


def np_bytes(obj):
    """Shallow numpy-array byte census of the context: top-level attrs that
    are ndarrays, or dicts/lists/tuples OF ndarrays (one level). No generic
    recursion — ctx references threads/modules and a full walk never ends."""
    total = 0
    for v in vars(obj).values():
        if isinstance(v, np.ndarray):
            total += v.nbytes
        elif isinstance(v, dict):
            total += sum(x.nbytes for x in v.values()
                         if isinstance(x, np.ndarray))
        elif isinstance(v, (list, tuple)):
            total += sum(x.nbytes for x in v if isinstance(x, np.ndarray))
    return total


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import os

    os.environ.setdefault("CLMGS_BENCH_N", "65536")
    os.environ.setdefault("CLMGS_BENCH_W", "320")
    os.environ.setdefault("CLMGS_BENCH_H", "240")
    os.environ.setdefault("CLMGS_BENCH_ISECT", "262144")
    import jax
    if os.environ.get('RSSP_CPU') == '1':
        jax.config.update('jax_platforms', 'cpu')

    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.optim import init_adam
    from clm_gs_tpu.strategies import clm_offload
    import clm_gs_tpu.utils.bench_scene as bs
    from clm_gs_tpu.utils.bench_scene import drain_scalar, make_scene

    print("building scene", flush=True)
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    print("scene built", flush=True)
    cfg = Config()
    cfg.aux.clm_offload = True
    cfg.opt.bsz = bs.BSZ
    init_config(cfg)
    ctx = clm_offload.make_context(cfg, state, adam_cfg)
    state = clm_offload.strip_device_sh(state)
    opt = init_adam(state.params)

    def step():
        nonlocal state, opt, ctx
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, bs.W, bs.H,
            bs.ISECT_CAP, cfg,
        )
        drain_scalar(out.losses)

    for b in range(nb):
        step()
        if b % 10 == 0 or b == nb - 1:
            la = list(jax.live_arrays())
            if b == nb - 1:
                from collections import Counter
                cnt = Counter((str(x.dtype), x.shape) for x in la)
                for k, c in cnt.most_common(15):
                    print("   ", c, "x", k, flush=True)
            ctx_mb = np_bytes(ctx) / 2**20
            print(
                f"batch {b:3d}  rss {rss_mb():8.1f} MB  "
                f"live_arrays {len(la)} ({sum(x.nbytes for x in la)/2**20:.1f}"
                f" MB)  ctx_np {ctx_mb:.1f} MB",
                flush=True,
            )


if __name__ == "__main__":
    main()
