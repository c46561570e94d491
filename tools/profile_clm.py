"""Device trace of the clm resident replay loop (prepare_device_loop): where
does the clm batch's device time actually go, with all host streaming removed?

Usage: timeout 1800 python tools/profile_clm.py [outdir]
"""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, "/root/repo")

import jax

from clm_gs_tpu.config import Config, init_config
from clm_gs_tpu.optim import init_adam
from clm_gs_tpu.strategies import clm_offload
from clm_gs_tpu.utils.bench_scene import BSZ, H, ISECT_CAP, W, drain_scalar, make_scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_clm"
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    cfg = Config()
    cfg.aux.clm_offload = True
    cfg.opt.bsz = BSZ
    cfg.opt.lr_scale_mode = "accumu"
    init_config(cfg)
    ctx = clm_offload.make_context(cfg, state, adam_cfg)
    state = clm_offload.strip_device_sh(state)
    opt = init_adam(state.params)

    # one real batch to adapt isect_cap like bench.py does
    state2, opt2, ctx, outv = clm_offload.train_one_batch(
        state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, W, H, ISECT_CAP, cfg
    )
    mi = int(outv.max_isects)
    isect_cap = -(-int(mi * 1.05) // 2**17) * 2**17
    print("isect_cap", isect_cap, "v_cap", ctx.v_cap, flush=True)

    run, n_disp = clm_offload.prepare_device_loop(
        state, ctx, cb, gts, 3, bg, W, H, isect_cap, cfg
    )
    loss, _ = run()
    drain_scalar(loss)
    print("compiled; tracing", flush=True)
    import time

    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        for _ in range(2):
            loss, _ = run()
        drain_scalar(loss)
    print(f"trace done, {(time.perf_counter()-t0)/2:.3f} s/batch", flush=True)

    pbs = sorted(glob.glob(out + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        print("no xplane.pb found under", out)
        return
    from tools.xplane_topops import summarize

    summarize(pbs[-1], topn=40)


if __name__ == "__main__":
    main()
