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

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# v5e per-chip aggregate ICI bandwidth, one direction, torus-adjacent links
# (public figure; override with --ici-gbs to test sensitivity)
ICI_GBS_DEFAULT = 100.0


def main():
    ici_gbs = ICI_GBS_DEFAULT
    args = sys.argv[1:]
    if "--ici-gbs" in args:
        ici_gbs = float(args[args.index("--ici-gbs") + 1])

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

    # ---- 2. analytic per-device bytes per BATCH at bench scale ----
    C = 1_048_576            # bench capacity
    V = 786_432              # steady-state gather budget (~663k visible)
    B = BSZ                  # 4 cameras
    cams_per_dev = B // d_ax
    f32 = 4

    # per camera: all_gather of the compacted projected attributes
    # (means2d 2 + conic 3 + color 3 + opac 1 + depth 1 + radii 1 = 11 cols
    # after compaction, NGC=9 live in the kernel table + depth + radii)
    ag_cols = 11
    bytes_gather = cams_per_dev * (g_ax - 1) / g_ax * V * ag_cols * f32

    # per batch: grads + stats all_reduce over the data axis of the
    # gauss-sharded buffers (59 param floats + probe-stat 2 + denom/accum 2)
    gr_cols = 59 + 4
    bytes_reduce = 2 * (d_ax - 1) / d_ax * (C // g_ax) * gr_cols * f32

    # shard_map transpose: reduce_scatter of gathered-attr gradients
    bytes_rs = cams_per_dev * (g_ax - 1) / g_ax * V * 9 * f32

    per_dev = bytes_gather + bytes_reduce + bytes_rs

    # ---- 3. efficiency bound ----
    bench = json.load(open("/root/repo/BENCH_r02.json"))
    t1 = bench["parsed"]["strategies"]["no_offload"]["sec_per_batch"]
    n_dev = d_ax * g_ax
    t_comm = per_dev / (ici_gbs * 1e9)
    eff = (t1 / n_dev) / (t1 / n_dev + t_comm)
    print(json.dumps({
        "mesh": f"{d_ax}x{g_ax}",
        "hlo_collective_inventory": inventory,
        "bytes_per_device_per_batch": {
            "attr_all_gather": int(bytes_gather),
            "grad_stat_all_reduce": int(bytes_reduce),
            "attr_grad_reduce_scatter": int(bytes_rs),
            "total": int(per_dev),
        },
        "assumed_ici_gbs_one_way": ici_gbs,
        "single_chip_sec_per_batch": t1,
        "est_comm_sec_per_batch": round(t_comm, 6),
        "efficiency_bound_1_to_8": round(eff, 4),
        "note": (
            "zero-overlap bound; XLA's latency-hiding scheduler overlaps "
            "the grad all_reduce with backward compute, so realized "
            "efficiency should exceed this"
        ),
    }))


if __name__ == "__main__":
    main()
