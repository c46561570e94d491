"""Capture a jax.profiler device trace of the full training step and print the
top HLO ops by self time (the evidence the per-stage standalone timings can't
give: in-step fusion boundaries and data movement).

Usage: timeout 1800 python tools/profile_trace.py [outdir]
"""

from __future__ import annotations

import glob


import sys

sys.path.insert(0, "/root/repo")

import jax

from clm_gs_tpu.utils.bench_scene import BSZ, H, ISECT_CAP, W, drain_scalar, make_scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    from clm_gs_tpu.strategies import no_offload

    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()

    def step(s, o):
        return no_offload.train_step(
            s, o, cb, gts, 3, lrs, adam_cfg, bg, W, H, ISECT_CAP,
            accumulate_stats=False,
        )

    s, o, outv = step(state, opt)
    drain_scalar(outv.losses)
    print("compiled; tracing", flush=True)
    with jax.profiler.trace(out):
        for _ in range(2):
            s, o, outv = step(s, o)
        drain_scalar(outv.losses, s.params.xyz)
    print("trace done", flush=True)

    pbs = sorted(glob.glob(out + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        print("no xplane.pb found under", out)
        return
    from tools.xplane_topops import summarize

    summarize(pbs[-1], topn=40)


if __name__ == "__main__":
    main()
