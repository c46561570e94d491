"""Stage-2 RSS probe: who owns the ~20 MB/batch of live allocations during
clm_offload training? Tracks (a) Python-visible allocations via tracemalloc,
(b) jax.live_arrays() count/bytes, (c) RSS — per 10-batch window.

Usage: timeout 900 python tools/rss_probe2.py [n_batches]
"""

import sys
import tracemalloc

import psutil

sys.path.insert(0, "/root/repo")


def rss_mb():
    return psutil.Process().memory_info().rss / 2**20


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import os

    os.environ.setdefault("CLMGS_BENCH_N", "65536")
    os.environ.setdefault("CLMGS_BENCH_W", "320")
    os.environ.setdefault("CLMGS_BENCH_H", "240")
    os.environ.setdefault("CLMGS_BENCH_ISECT", "262144")
    import jax

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

    def step():
        nonlocal state, opt, ctx
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, bs.W, bs.H,
            bs.ISECT_CAP, cfg,
        )
        drain_scalar(out.losses)

    for _ in range(10):  # warmup incl. compiles
        step()

    tracemalloc.start(5)
    snap0 = tracemalloc.take_snapshot()
    la0 = list(jax.live_arrays())
    n0, b0 = len(la0), sum(x.nbytes for x in la0)
    r0 = rss_mb()
    for _ in range(nb):
        step()
    r1 = rss_mb()
    la1 = list(jax.live_arrays())
    n1, b1 = len(la1), sum(x.nbytes for x in la1)
    snap1 = tracemalloc.take_snapshot()
    print(f"rss {r0:.0f} -> {r1:.0f} MB  (+{(r1-r0)/nb:.1f} MB/batch)")
    print(f"jax live arrays {n0} -> {n1}  bytes {b0/2**20:.1f} -> "
          f"{b1/2**20:.1f} MB")
    print("\ntop tracemalloc growth:")
    for stat in snap1.compare_to(snap0, "traceback")[:12]:
        mb = stat.size_diff / 2**20
        if abs(mb) < 0.5:
            continue
        print(f"  {mb:+8.1f} MB  x{stat.count_diff:+d}")
        for line in stat.traceback.format()[-4:]:
            print("    " + line.strip())


if __name__ == "__main__":
    main()
