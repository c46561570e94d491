"""Triage probe for the clm densification-trajectory divergence (VERDICT r2
weak #3: clm ends at 21,472 gaussians vs 18,268 for no_offload on the 3k-iter
synthetic quality run, lagging 0.54 dB at iteration 1000).

Runs no_offload and clm_offload from the SAME initial state on the synthetic
test scene and diffs, per batch:
  1. densification stats (xyz_grad_accum, denom) — with params FROZEN
     (stop_update_param) so both strategies see identical inputs every batch,
  2. the same with live updates (isolates optimizer drift vs stats-path bugs),
  3. per-parameter update deltas after one batch.

Usage: JAX_PLATFORMS=cpu python tools/clm_stats_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from dataclasses import replace

    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.optim import AdamConfig, init_adam
    from clm_gs_tpu.strategies import clm_offload, no_offload
    from tests.test_strategies import _mk_cfg, _perturbed
    from tests.test_train_synthetic import BG, H, ISECT_CAP, LRS, W

    state0, cb, gts = _perturbed()

    def run_no(state, n_steps, stop_update):
        opt = init_adam(state.params)
        recs = []
        for _ in range(n_steps):
            state, opt, out = no_offload.train_step(
                state, opt, cb, gts, 3, LRS, AdamConfig(), BG, W, H, ISECT_CAP,
                stop_update_param=stop_update,
            )
            recs.append(
                dict(
                    accum=np.asarray(state.xyz_grad_accum),
                    denom=np.asarray(state.denom),
                    losses=np.sort(np.asarray(out.losses)),
                )
            )
        return state, recs

    def run_clm(state, n_steps, stop_update, retention=True):
        cfg = _mk_cfg("clm_offload")
        cfg.debug.stop_update_param = stop_update
        cfg.tpu.retention = retention
        ctx = clm_offload.make_context(cfg, state, AdamConfig())
        state = clm_offload.strip_device_sh(state)
        opt = init_adam(state.params)
        recs = []
        for _ in range(n_steps):
            state, opt, ctx, out = clm_offload.train_one_batch(
                state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
                ISECT_CAP, cfg,
            )
            recs.append(
                dict(
                    accum=np.asarray(state.xyz_grad_accum),
                    denom=np.asarray(state.denom),
                    losses=np.sort(np.asarray(out.losses)),
                )
            )
        return clm_offload.materialize(state, ctx), recs

    def diff(tag, a, b):
        d = np.abs(a - b)
        rel = d.max() / max(np.abs(a).max(), 1e-12)
        print(
            f"  {tag}: max|Δ|={d.max():.3e} rel={rel:.3e} "
            f"(a.max={np.abs(a).max():.3e})"
        )
        return rel

    print("=== frozen params (stats path isolation), 3 batches ===")
    _, rno = run_no(state0, 3, True)
    _, rclm = run_clm(state0, 3, True)
    for i, (a, b) in enumerate(zip(rno, rclm)):
        print(f" batch {i}:")
        diff("losses", a["losses"], b["losses"])
        diff("accum", a["accum"], b["accum"])
        diff("denom", a["denom"], b["denom"])

    print("=== live updates, 6 batches ===")
    s_no, rno = run_no(state0, 6, False)
    s_clm, rclm = run_clm(state0, 6, False)
    for i, (a, b) in enumerate(zip(rno, rclm)):
        print(f" batch {i}:")
        diff("losses", a["losses"], b["losses"])
        diff("accum", a["accum"], b["accum"])
        diff("denom", a["denom"], b["denom"])
    for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
        a = np.asarray(getattr(s_no.params, name))
        b = np.asarray(getattr(s_clm.params, name))
        diff(f"param {name}", a, b)

    print("=== live updates, retention OFF, 6 batches ===")
    s_c2, rclm2 = run_clm(state0, 6, False, retention=False)
    for i, (a, b) in enumerate(zip(rno, rclm2)):
        print(f" batch {i}:")
        diff("losses", a["losses"], b["losses"])
        diff("accum", a["accum"], b["accum"])
        diff("denom", a["denom"], b["denom"])


if __name__ == "__main__":
    main()
