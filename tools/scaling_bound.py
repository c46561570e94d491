"""Collective-overhead bound for the multi-chip scaling claim (BASELINE.json
north star: >= 0.8 Mpix/s scaling efficiency from 1 to N chips).

No multi-chip hardware exists in this sandbox, so the bound comes from a
method, not a hope:

  1. lower the sharded train step at bench scale on a virtual 8-device
     (2 data x 4 gauss) mesh and enumerate the collective ops XLA actually
     emitted (all_gather of the compacted visible attributes inside the
     camera scan; all_reduce of grads/stats over the data axis;
     reduce_scatter from the shard_map autodiff transpose),
  2. count per-device bytes analytically from the same shapes XLA lowered
     (ring-collective cost model: all_gather receives (n-1)/n of the result,
     all_reduce moves 2(n-1)/n of the buffer, reduce_scatter (n-1)/n),
  3. combine with the measured single-chip batch time (BENCH_r02) and a
     configurable ICI bandwidth:

       eff >= (t1/8) / (t1/8 + bytes_per_device / ici_bw)

     — conservative: assumes zero compute/comm overlap, while XLA's
     latency-hiding scheduler overlaps the grad all_reduce with backward
     compute.

Usage: python tools/scaling_bound.py [--ici-gbs G] -> one JSON line.
"""

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

# v5e per-chip aggregate ICI bandwidth, one direction, torus-adjacent links
# (public figure; override with --ici-gbs to test sensitivity)
ICI_GBS_DEFAULT = 100.0


def analytic_bound(d_ax: int, g_ax: int, t1: float, ici_gbs: float = ICI_GBS_DEFAULT,
                   C: int = 1_048_576, V: int = 786_432, B: int = 4):
    """Zero-overlap scaling-efficiency bound for a (data=d_ax, gauss=g_ax)
    mesh at bench scale — the analytic ring-collective byte model of this
    file's step 2-3, reusable from __graft_entry__.dryrun_multichip so every
    MULTICHIP record carries the number machine-readably."""
    f32 = 4
    cams_per_dev = max(B // max(d_ax, 1), 1)
    ag_cols = 11
    bytes_gather = cams_per_dev * (g_ax - 1) / max(g_ax, 1) * V * ag_cols * f32
    gr_cols = 59 + 4
    bytes_reduce = (
        2 * (d_ax - 1) / max(d_ax, 1) * (C // max(g_ax, 1)) * gr_cols * f32
    )
    bytes_rs = cams_per_dev * (g_ax - 1) / max(g_ax, 1) * V * 9 * f32
    per_dev = bytes_gather + bytes_reduce + bytes_rs
    n_dev = d_ax * g_ax
    t_comm = per_dev / (ici_gbs * 1e9)
    eff = (t1 / n_dev) / (t1 / n_dev + t_comm)
    return {
        "mesh": f"{d_ax}x{g_ax}",
        "bytes_per_device_per_batch": int(per_dev),
        "assumed_ici_gbs_one_way": ici_gbs,
        "single_chip_sec_per_batch": t1,
        "est_comm_sec_per_batch": round(t_comm, 6),
        "projected_scaling_efficiency": round(eff, 4),
    }


def main():
    ici_gbs = ICI_GBS_DEFAULT
    args = sys.argv[1:]
    if "--ici-gbs" in args:
        ici_gbs = float(args[args.index("--ici-gbs") + 1])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from clm_gs_tpu.optim import AdamConfig, init_adam
    from clm_gs_tpu.parallel.mesh import data_sharding, make_mesh, shard_state
    from clm_gs_tpu.parallel.shard import make_sharded_train_step
    from clm_gs_tpu.utils.bench_scene import BSZ, H, ISECT_CAP, W, make_scene

    # ---- 1. HLO inventory at reduced capacity (lowering only; the op SET is
    # shape-independent, the byte model below uses bench-scale shapes) ----
    state, opt, cb, gts, lrs, adam_cfg, bg = make_scene(n=20000, cap=32768)
    mesh = make_mesh("2x4")
    d_ax, g_ax = mesh.shape["data"], mesh.shape["gauss"]
    state_sh = shard_state(state, mesh)
    opt_sh = init_adam(state_sh.params)
    cbs = jax.tree.map(lambda x: jax.device_put(x, data_sharding(mesh)), cb)
    gtss = jax.device_put(gts, data_sharding(mesh))
    step = make_sharded_train_step(mesh, W, H, ISECT_CAP, gather_cap=16384)
    txt = step.lower(
        state_sh, opt_sh, cbs, gtss, 3, lrs, AdamConfig(), bg
    ).as_text()
    inventory = {
        op: txt.count(f"stablehlo.{op}")
        for op in ("all_gather", "all_reduce", "reduce_scatter",
                   "collective_permute", "all_to_all")
    }
    assert inventory["all_gather"] > 0 and inventory["all_reduce"] > 0, (
        "expected collectives missing from the lowered step", inventory
    )

    # ---- 2-3. analytic per-device bytes + efficiency bound (see
    # analytic_bound; shared with __graft_entry__.dryrun_multichip) ----
    t1 = latest_bench_t1()
    rec = analytic_bound(d_ax, g_ax, t1, ici_gbs, B=BSZ)
    rec["hlo_collective_inventory"] = inventory
    rec["note"] = (
        "zero-overlap bound; XLA's latency-hiding scheduler overlaps "
        "the grad all_reduce with backward compute, so realized "
        "efficiency should exceed this"
    )
    print(json.dumps(rec))


def latest_bench_t1() -> float:
    """Most recent committed single-chip no_offload sec_per_batch."""
    import glob

    for p in sorted(glob.glob("/root/repo/BENCH_r0*.json"), reverse=True):
        try:
            b = json.load(open(p))
            parsed = b.get("parsed") or {}
            t1 = parsed["strategies"]["no_offload"]["sec_per_batch"]
            if t1:
                return float(t1)
        except Exception:
            continue
    return 0.428  # BENCH_r04 fallback


if __name__ == "__main__":
    main()
