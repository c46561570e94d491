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
    from clm_gs_tpu.strategies import no_offload
    from clm_gs_tpu.utils.bench_scene import BSZ, H, ISECT_CAP, W, make_scene

    state, opt, cb, gts, lrs, cfg, bg = make_scene()

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
