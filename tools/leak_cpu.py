"""Minimal CPU repro for the per-batch live-array growth: run no_offload
train_step in a loop on the CPU backend and census jax.live_arrays by shape.

Usage: python tools/leak_cpu.py [n_batches] [strategy]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

os.environ.setdefault("CLMGS_BENCH_N", "16384")
os.environ.setdefault("CLMGS_BENCH_CAP", "16384")
os.environ.setdefault("CLMGS_BENCH_W", "160")
os.environ.setdefault("CLMGS_BENCH_H", "120")
os.environ.setdefault("CLMGS_BENCH_ISECT", "131072")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import psutil  # noqa: E402


def census():
    la = list(jax.live_arrays())
    return len(la), sum(x.nbytes for x in la), Counter(
        (str(x.dtype), x.shape) for x in la
    )


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    strat = sys.argv[2] if len(sys.argv) > 2 else "no_offload"
    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.optim import init_adam
    from clm_gs_tpu.strategies import clm_offload, no_offload
    import clm_gs_tpu.utils.bench_scene as bs
    from clm_gs_tpu.utils.bench_scene import drain_scalar, make_scene

    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    cfg = Config()
    setattr(cfg.aux, strat, True)
    cfg.opt.bsz = bs.BSZ
    init_config(cfg)
    ctx = None
    if strat == "clm_offload":
        from clm_gs_tpu.optim import AdamConfig

        ctx = clm_offload.make_context(cfg, state, adam_cfg)
        state = clm_offload.strip_device_sh(state)
        opt = init_adam(state.params)

    def step():
        nonlocal state, opt, ctx
        if strat == "no_offload":
            state, opt, out = no_offload.train_step(
                state, opt, cb, gts, 3, lrs, adam_cfg, bg, bs.W, bs.H,
                bs.ISECT_CAP, accumulate_stats=False,
            )
            drain_scalar(out.losses)
        else:
            state, opt, ctx, out = clm_offload.train_one_batch(
                state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, bs.W, bs.H,
                bs.ISECT_CAP, cfg,
            )
            drain_scalar(out.losses)

    for _ in range(5):
        step()
    n0, b0, c0 = census()
    r0 = psutil.Process().memory_info().rss / 2**20
    for _ in range(nb):
        step()
    n1, b1, c1 = census()
    r1 = psutil.Process().memory_info().rss / 2**20
    print(f"{strat}: rss {r0:.0f} -> {r1:.0f} MB (+{(r1-r0)/nb:.2f}/batch)  "
          f"arrays {n0} -> {n1}  MB {b0/2**20:.1f} -> {b1/2**20:.1f}")
    grown = (c1 - c0)
    for k, v in grown.most_common(10):
        print("  grown", v, "x", k)


if __name__ == "__main__":
    main()
