"""Headline benchmark: fwd+bwd training throughput (Mpix/s) on one chip, plus
the reference's headline strategy matrix (throughput / device HBM peak / host
memory per strategy — reference README.md:70-74 reports peak GPU memory and
end-to-end time for no_offload / naive_offload / clm_offload).

Each strategy runs in its own subprocess so device memory peaks are isolated;
the parent prints ONE JSON line whose headline metric is no_offload training
throughput:

  {"metric", "value", "unit", "vs_baseline", "strategies": {...}}

Baseline: the reference trains Mip-360 bicycle (images_4, ~1.0 Mpix cameras)
at 30000 iterations / 734 s = 40.87 cameras/s on an RTX 4090 (BASELINE.md,
README.md:70-74) => ~40.2 Mpix/s fwd+bwd+step. vs_baseline = ours / that.
"""

import json
import os
import subprocess
import sys
import time

CHILD_TIMEOUT_S = 1500


def _mem_stats():
    """(hbm_peak_gb, hbm_limit_gb) or (None, None) when unavailable."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        limit = stats.get("bytes_limit")
        return (
            round(peak / 2**30, 3) if peak else None,
            round(limit / 2**30, 3) if limit else None,
        )
    except Exception:
        return None, None


def _host_peak_gb():
    import resource

    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 3)


def run_child(strategy: str):
    import jax
    import jax.numpy as jnp  # noqa: F401

    # CPU smoke-test hook (env JAX_PLATFORMS=cpu can't be used: it hangs the
    # axon plugin's init; the post-import config update bypasses it)
    if os.environ.get("CLMGS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CLMGS_BENCH_PLATFORM"])

    sys.path.insert(0, "/root/repo")
    from clm_gs_tpu.config import Config, init_config
    from clm_gs_tpu.optim import AdamConfig, init_adam
    from clm_gs_tpu.strategies import clm_offload, naive_offload, no_offload
    from clm_gs_tpu.utils.bench_scene import BSZ, H, ISECT_CAP, W, make_scene

    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene()
    n_gauss = int(state.n_alive)

    cfg = Config()
    setattr(cfg.aux, strategy, True)
    cfg.opt.bsz = BSZ
    cfg.opt.lr_scale_mode = "accumu"
    init_config(cfg)

    from clm_gs_tpu.utils.bench_scene import drain_scalar as drain

    if strategy == "no_offload":
        vis_cap = 0  # sized from the warmup batch like the trainer's budget

        def one_batch(s, o, _ctx, cap):
            s, o, out = no_offload.train_step(
                s, o, cb, gts, 3, lrs, adam_cfg, bg, W, H, cap,
                accumulate_stats=False,
                update_cap=vis_cap if vis_cap < s.capacity else 0,
            )
            return s, o, _ctx, out

        ctx = None
    elif strategy == "naive_offload":
        ctx = naive_offload.make_context(cfg, state, adam_cfg)

        def one_batch(s, o, c, cap):
            s, _, c, out = naive_offload.train_one_batch(
                s, None, c, cb, gts, 3, lrs, adam_cfg, bg, W, H, cap, cfg
            )
            return s, o, c, out
    else:
        ctx = clm_offload.make_context(cfg, state, adam_cfg)
        state = clm_offload.strip_device_sh(state)
        opt = init_adam(state.params)

        def one_batch(s, o, c, cap):
            s, o, c, out = clm_offload.train_one_batch(
                s, o, c, cb, gts, 3, lrs, adam_cfg, bg, W, H, cap, cfg
            )
            return s, o, c, out

    # warmup: compile + (for offload strategies) first full SH fetch; then
    # adapt the isect capacity to this scene exactly like the trainer's
    # steady-state bucketing (train.py round_up(max_isects*margin, 2**17))
    isect_cap = ISECT_CAP
    state, opt, ctx, out = one_batch(state, opt, ctx, isect_cap)
    mi = int(out.max_isects)
    margin = float(os.environ.get("CLMGS_ISECT_MARGIN", "1.05"))
    snug = -(-int(mi * margin) // 2**17) * 2**17
    if strategy == "no_offload":
        # size the scatter-update budget exactly like train.py's vis_cap
        import jax.numpy as _jnp

        nv = int(_jnp.sum(out.visible_any))
        vis_cap = -(-max(int(nv * 1.1), 2**16) // 2**16) * 2**16
    if snug != isect_cap or (strategy == "no_offload" and vis_cap):
        isect_cap = snug
        state, opt, ctx, out = one_batch(state, opt, ctx, isect_cap)
    drain(out.losses, state.params.xyz)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, opt, ctx, out = one_batch(state, opt, ctx, isect_cap)
    drain(out.losses, state.params.xyz)
    dt = time.perf_counter() - t0

    hbm_peak, hbm_limit = _mem_stats()
    # this sandbox's axon plugin returns memory_stats() = None; fall back to
    # (a) live device array bytes (strategy-resident state) and (b) the
    # compiler's own memory analysis of the no_offload step (args + temps)
    try:
        live_gb = round(sum(x.nbytes for x in jax.live_arrays()) / 2**30, 3)
    except Exception:
        live_gb = None
    prog_gb = None
    if strategy == "no_offload":
        try:
            ma = (
                no_offload.train_step.lower(
                    state, opt, cb, gts, 3, lrs, adam_cfg, bg, W, H, isect_cap,
                    accumulate_stats=False,
                )
                .compile()
                .memory_analysis()
            )
            prog_gb = round(
                (
                    ma.argument_size_in_bytes
                    + ma.temp_size_in_bytes
                    + ma.output_size_in_bytes
                )
                / 2**30,
                3,
            )
        except Exception:
            pass
    rec = {
        "strategy": strategy,
        "mpix_s": round(iters * BSZ * W * H / dt / 1e6, 3),
        "sec_per_batch": round(dt / iters, 3),
        "hbm_peak_gb": hbm_peak,
        "hbm_limit_gb": hbm_limit,
        "device_live_gb": live_gb,
        "hbm_program_gb": prog_gb,
        "host_peak_gb": _host_peak_gb(),
        "n_gaussians": n_gauss,
        "isect_cap": isect_cap,
    }
    if strategy == "clm_offload":
        # per-gaussian device bytes with SH + moments off-device: 11 attr
        # floats + 4 Adam groups' moments (11*3 f32) + stats ~= 4 more.
        # live_gb can be None (live_arrays() failed above) — fall back to the
        # analytic 44 f32/gaussian rather than crashing after the timed runs.
        live = live_gb if live_gb is not None else n_gauss * 44 * 4 / 2**30
        dev_bytes_per_gauss = max(live, 0.001) * 2**30 / n_gauss
        rec["max_gaussians_per_chip_est"] = int(
            (hbm_limit or 16.0) * 2**30 * 0.85 / dev_bytes_per_gauss
        )
        nb = ctx.n_batches
        if nb:
            rec["overlap_host_work_ms"] = round(ctx.host_work_s / nb * 1e3, 1)
            rec["overlap_trailing_ms"] = round(ctx.trailing_s / nb * 1e3, 1)
            rec["comm_hidden_frac"] = round(
                max(0.0, 1.0 - ctx.trailing_s / max(ctx.host_work_s, 1e-9)), 3
            )
        # Interconnect-projected throughput (this sandbox's host<->chip
        # tunnel is ~5 MB/s, so measured clm sec_per_batch says nothing
        # about the design at a realistic link): run ONE instrumented batch
        # to split device compute out of the loop, then model
        #   projected_batch_s = max(device_s,
        #                           bytes/batch / link_bw + scatter_s,
        #                           adam_s)
        # — in steady state the transfers + host scatter pipeline against
        # device render, and host Adam runs on its own worker thread (the
        # reference's two-stream + cpuadam_thread overlap, SURVEY §3.3).
        from clm_gs_tpu.utils.timer import Timer

        tmr = Timer(enabled=True)
        ctx.h2d_bytes = ctx.d2h_bytes = 0.0
        sw0, aw0 = ctx.scatter_work_s, ctx.adam_work_s
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, lrs, adam_cfg, bg, W, H, isect_cap,
            cfg, timers=tmr,
        )
        drain(out.losses, state.params.xyz)
        device_s_instr = tmr.sums.get("clm.filters", 0.0) + tmr.sums.get(
            "clm.micro", 0.0
        )
        bytes_b = ctx.h2d_bytes + ctx.d2h_bytes
        link_gbps = float(os.environ.get("CLMGS_LINK_GBPS", "16"))
        transfer_s = bytes_b / (link_gbps * 1e9)
        scatter_s = ctx.scatter_work_s - sw0
        adam_s = ctx.adam_work_s - aw0

        # Decomposition of the clm device-side cost (VERDICT r4 #1): replay
        # the batch's exact device sequence (fused micro-steps + retention
        # advances) with every input pre-staged — no host work, no H2D
        # fetches, no grad drains, one final sync. What remains is real
        # device work + per-dispatch floors; the instrumented in-situ number
        # additionally contains per-span tunnel syncs and streaming waits.
        run_dev, n_disp = clm_offload.prepare_device_loop(
            state, ctx, cb, gts, 3, bg, W, H, isect_cap, cfg
        )
        loss, _ = run_dev()  # warmup: compiles any remaining bucket shapes
        drain(loss)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            loss, _ = run_dev()
        drain(loss)
        device_s_resident = (time.perf_counter() - t0) / reps
        # per-dispatch floor: tiny jitted op, async back-to-back
        import jax.numpy as jnp_

        tiny = jax.jit(lambda x: x + 1.0)
        xtiny = tiny(jnp_.zeros((8, 128), jnp_.float32))
        drain(xtiny)
        t0 = time.perf_counter()
        for _ in range(50):
            xtiny = tiny(xtiny)
        drain(xtiny)
        floor_ms = (time.perf_counter() - t0) / 50 * 1e3

        proj_batch = max(device_s_resident, transfer_s + scatter_s, adam_s)
        rec["clm_projected_mpix_s"] = round(
            BSZ * W * H / proj_batch / 1e6, 3
        )
        rec["clm_projection"] = {
            "formula": (
                "max(device_s_resident, bytes/link_bw + scatter_s, adam_s); "
                "device_s_resident = pre-staged device-only replay of the "
                "batch (fused steps + advances), single final sync"
            ),
            "link_gbps_assumed": link_gbps,
            "bytes_per_batch_mb": round(bytes_b / 2**20, 1),
            "device_s": round(device_s_resident, 3),
            "transfer_s_at_link": round(transfer_s, 3),
            "host_scatter_s": round(scatter_s, 3),
            "host_adam_s": round(adam_s, 3),
        }
        rec["clm_device_decomposition"] = {
            "device_s_resident": round(device_s_resident, 3),
            "device_s_instrumented": round(device_s_instr, 3),
            "sync_and_stream_overhead_s": round(
                max(0.0, device_s_instr - device_s_resident), 3
            ),
            "n_dispatches_per_batch": n_disp,
            "dispatch_floor_ms": round(floor_ms, 2),
            "dispatch_floor_total_s": round(n_disp * floor_ms / 1e3, 3),
            "note": (
                "device_s_resident is the honest device-side cost of a clm "
                "batch (compare against no_offload sec_per_batch); "
                "device_s_instrumented additionally pays a tunnel "
                "sync per timed span plus in-loop streaming waits"
            ),
        }
    print("BENCH_CHILD " + json.dumps(rec), flush=True)


def run_roofline():
    """Hardware-vs-achieved arithmetic for the BENCH record (VERDICT r4 #5):
    measured device ceilings (VPU f32 elementwise rate, HBM stream bandwidth,
    sort rate, random-row gather rate) next to the rasterizer's achieved
    rates, so an outside reader can audit how much of the ~4x residual gap to
    the 4090 baseline is hardware-shaped. All numbers measured on this chip
    in this process; kernel op-rate is CONSERVATIVE (the whole fwd pass —
    binning + gather + kernel — is charged to the kernel's op count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("CLMGS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CLMGS_BENCH_PLATFORM"])
    sys.path.insert(0, "/root/repo")
    from clm_gs_tpu.ops import rasterize as R
    from clm_gs_tpu.ops.projection import fully_fused_projection
    from clm_gs_tpu.utils.bench_scene import (
        H, ISECT_CAP, W, drain_scalar, make_scene,
    )

    def timeit(fn, *args, iters=6):
        out = fn(*args)
        drain_scalar(*[x for x in jax.tree.leaves(out) if hasattr(x, "reshape")][:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain_scalar(*[x for x in jax.tree.leaves(out) if hasattr(x, "reshape")][:1])
        return (time.perf_counter() - t0) / iters

    # 1. VPU f32 elementwise ceiling: 256-deep FMA chain on 2M lanes
    # (CPU smoke mode shrinks every probe so the child stays ~seconds)
    small = os.environ.get("CLMGS_BENCH_PLATFORM") == "cpu"
    CH = 64 if small else 256
    NE = (256 * 1024) if small else 2 * 1024 * 1024

    @jax.jit
    def fma(x):
        for _ in range(CH):
            x = x * 1.0000001 + 1e-9
        return x

    t = timeit(fma, jnp.ones((NE,), jnp.float32))
    vpu_gflops = 2 * CH * NE / t / 1e9

    # 2. HBM stream: add over 64M f32 (read+write 512 MB)
    nbig = (1 << 22) if small else 64 * 1024 * 1024
    big = jnp.ones((nbig,), jnp.float32)
    t = timeit(jax.jit(lambda x: x + 1.0), big)
    hbm_gbps = 2 * big.nbytes / t / 1e9

    # 3. sort rate: 4M random s32 keys + 1 payload (2 operands)
    rng = np.random.RandomState(0)
    nsort = (1 << 18) if small else 4 * 2**20
    keys = jnp.asarray(rng.randint(0, 1 << 30, nsort, dtype=np.int32))
    pay = jnp.arange(nsort, dtype=jnp.int32)
    t = timeit(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), keys, pay)
    sort_ms_per_mop = t * 1e3 / (2 * nsort / 2**20)

    # 4. random-row gather: (1M, 16) f32 table, 2.6M random rows
    ntab = (1 << 16) if small else (1 << 20)
    ngat = (1 << 18) if small else 2_621_440
    table = jnp.asarray(rng.rand(ntab, 16).astype(np.float32))
    gidx = jnp.asarray(rng.randint(0, ntab, ngat, dtype=np.int32))
    t = timeit(jax.jit(lambda tb, i: tb[i]), table, gidx)
    gather_gbps = ngat * 16 * 4 / t / 1e9
    gather_ms_per_mrow = t * 1e3 / (ngat / 2**20)

    # 5. rasterize fwd and fwd+bwd on the bench scene's camera 0
    state, _opt, cb, _gts, _lrs, _ac, bg = make_scene()
    p = state.params
    proj = fully_fused_projection(
        p.xyz, p.quat, jnp.exp(p.log_scale), cb.viewmats[:1], cb.Ks[:1],
        W, H, alive=state.alive,
    )
    means2d, conics = proj.means2d[0], proj.conics[0]
    depths, radii = proj.depths[0], proj.radii[0]
    colors = jnp.abs(jnp.tanh(p.xyz))
    opac = jax.nn.sigmoid(p.opacity)

    @jax.jit
    def fwd(m, c, col, op):
        img, _a, n = R.rasterize(m, c, col, op, depths, radii, W, H, bg,
                                 ISECT_CAP)
        return img, n

    @jax.jit
    def fwdbwd(m, c, col, op):
        def f(m, c, col, op):
            img, _a, _n = R.rasterize(m, c, col, op, depths, radii, W, H, bg,
                                      ISECT_CAP)
            return jnp.sum(img * img)

        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(m, c, col, op)

    t_f = timeit(fwd, means2d, conics, colors, opac)
    _img, n_isects = fwd(means2d, conics, colors, opac)
    n_i = float(n_isects)
    t_fb = timeit(fwdbwd, means2d, conics, colors, opac)
    P = R.TILE_W * R.TILE_H
    # per instance-pixel f32 op counts read from the kernel bodies
    # (ops/rasterize.py): fwd ~13 (sigma 5, exp-approx 4, alpha/T/rgb 4);
    # bwd adds ~21 (recompute + 5-row cotangent contraction)
    OPS_F, OPS_FB = 13, 34
    fwd_gflops = n_i * P * OPS_F / t_f / 1e9
    fb_gflops = n_i * P * OPS_FB / t_fb / 1e9
    rec = {
        "measured_ceilings": {
            "vpu_fma_gflops_f32": round(vpu_gflops, 1),
            "hbm_stream_gbps": round(hbm_gbps, 1),
            "sort_ms_per_M_operands": round(sort_ms_per_mop, 3),
            "gather_gbps_16col_random": round(gather_gbps, 2),
            "gather_ms_per_M_rows_16col": round(gather_ms_per_mrow, 2),
        },
        "rasterize_camera0": {
            "n_instances": int(n_i),
            "pixels_per_tile": P,
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_bwd_ms": round(t_fb * 1e3, 2),
            "fwd_gflops_conservative": round(fwd_gflops, 1),
            "fwd_bwd_gflops_conservative": round(fb_gflops, 1),
            "fwd_pct_of_vpu": round(100 * fwd_gflops / vpu_gflops, 1),
            "fwd_bwd_pct_of_vpu": round(100 * fb_gflops / vpu_gflops, 1),
            "ops_per_instance_pixel_assumed": [OPS_F, OPS_FB],
        },
        "note": (
            "kernel pct-of-VPU is conservative: binning/sort/gather/plan "
            "time is charged to the kernel op count; the elementwise FMA "
            "chain is the practical VPU f32 ceiling on this chip"
        ),
    }
    print("BENCH_CHILD " + json.dumps({"strategy": "roofline", **rec}),
          flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        if sys.argv[2] == "roofline":
            run_roofline()
        else:
            run_child(sys.argv[2])
        return

    # `--res 4k`: one no_offload child at 3840x2160 with a 4K-scaled isect
    # seed (Rubble-4K regime, tools/bench4k.py carries the tile-packing
    # asserts + record file). The default invocation is unchanged.
    res4k = False
    if "--res" in sys.argv:
        res = sys.argv[sys.argv.index("--res") + 1].lower()
        assert res in ("4k",), res
        res4k = True
        # setdefault so CPU smoke tests can shrink the canvas while still
        # exercising the 4K code path (single strategy, isect seed)
        os.environ.setdefault("CLMGS_BENCH_W", "3840")
        os.environ.setdefault("CLMGS_BENCH_H", "2160")
        os.environ.setdefault("CLMGS_BENCH_ISECT", str(24 * 2**20))

    # fast-fail when the sandbox's axon relay is down (jax init would
    # otherwise hang until each child's timeout: 3 strategies x 25 min).
    # Gated on the axon plugin actually being selected — a real TPU VM has
    # no tunnel on 8082 and must not be blocked by this probe.
    if (not os.environ.get("CLMGS_BENCH_PLATFORM")
            and os.environ.get("JAX_PLATFORMS") == "axon"):
        import socket

        try:
            s = socket.socket()
            s.settimeout(3)
            s.connect(("127.0.0.1", 8082))
            s.close()
        except OSError as e:
            print(f"bench: TPU tunnel unreachable ({e}); no measurement",
                  file=sys.stderr)
            sys.exit(3)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    results = {}
    # headline strategy first so its result survives later failures/timeouts
    # (4K mode: compute-path only — offload transfers through this sandbox's
    # tunnel at 4K would time out without measuring anything new)
    strategies = (
        ("no_offload",) if res4k
        else ("no_offload", "naive_offload", "clm_offload", "roofline")
    )
    for strategy in strategies:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", strategy],
                capture_output=True, text=True, timeout=CHILD_TIMEOUT_S, env=env,
            )
            rec = None
            for line in proc.stdout.splitlines():
                if line.startswith("BENCH_CHILD "):
                    rec = json.loads(line[len("BENCH_CHILD "):])
            if rec is None:
                tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
                rec = {"error": " | ".join(tail)[-300:]}
            results[strategy] = rec
        except subprocess.TimeoutExpired:
            results[strategy] = {"error": f"timeout {CHILD_TIMEOUT_S}s"}

    import numpy as np  # noqa: F401  (keep import parity with children)
    from clm_gs_tpu.utils.bench_scene import H, W

    # tunnel (host<->device) bandwidth probe: on this sandbox the chip sits
    # behind an axon network tunnel (measured as low as ~0.01 GB/s D2H), so
    # the offload strategies' sec_per_batch is transfer-floor-bound here —
    # on a TPU VM (H2D/D2H >= 30 GB/s) the same transfers take ~1000x less.
    tunnel = _tunnel_probe(env)
    pinned_ok = _pinned_host_probe(env)
    headline = results.get("no_offload", {}).get("mpix_s")
    baseline_mpix_s = 30000 / 734.0 * (W * H / 1e6)  # 4090 bicycle no_offload
    print(
        json.dumps(
            {
                "metric": "train_throughput_fwd_bwd",
                "value": headline if headline is not None else 0.0,
                "unit": "Mpix/s/chip",
                "vs_baseline": round(headline / baseline_mpix_s, 4)
                if headline
                else 0.0,
                "strategies": results,
                "tunnel_h2d_gbps": tunnel,
                "pinned_host_supported": pinned_ok,
                "note": (
                    "offload sec_per_batch is bound by this sandbox's "
                    "host<->chip tunnel bandwidth (tunnel_h2d_gbps), not by "
                    "the strategy design; see overlap_*/comm_hidden_frac for "
                    "the measured host-side overlap"
                ),
            }
        )
    )


def _pinned_host_probe(env):
    """Whether this backend compiles the pinned_host SH transport
    (utils/hostmem.probe) — the --pinned_host flag only takes effect where
    this is true. Subprocess: keeps the chip claim out of the parent."""
    plat = os.environ.get("CLMGS_BENCH_PLATFORM")
    plat_line = (
        f"import jax; jax.config.update('jax_platforms', {plat!r})\n"
        if plat else ""
    )
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        f"{plat_line}"
        "from clm_gs_tpu.utils.hostmem import probe\n"
        "print('PINNED', probe())\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=env,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("PINNED"):
                return line.split()[1] == "True"
    except Exception:
        pass
    return None


def _tunnel_probe(env, mb: int = 32):
    """Measured host->device GB/s for one mid-size transfer (subprocess so the
    chip claim does not collide with the children)."""
    plat = os.environ.get("CLMGS_BENCH_PLATFORM")
    plat_line = f"jax.config.update('jax_platforms', {plat!r})\n" if plat else ""
    code = (
        "import jax, time, numpy as np, jax.numpy as jnp\n"
        f"{plat_line}"
        f"h = np.random.rand({mb} * 1024 * 256).astype(np.float32)\n"
        "y = jax.device_put(h); jax.block_until_ready(y)\n"
        "h2 = h + 1\n"
        "t0 = time.perf_counter(); y = jax.device_put(h2)\n"
        "float(y[0]); t1 = time.perf_counter()\n"
        f"print('GBPS', {mb} / 1024 / (t1 - t0))\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=600, env=env,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("GBPS"):
                return round(float(line.split()[1]), 4)
    except Exception:
        pass
    return None


if __name__ == "__main__":
    main()
