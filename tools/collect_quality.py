"""Build QUALITY_r04.json (flagship-scale record, VERDICT r3 #2) from a
train.py run directory's events.jsonl: wall-clock time-to-PSNR curve,
gaussian-count curve, memory, final metrics.

Usage: python tools/collect_quality.py <run_dir> <out.json> [label]
"""

import json
import os
import re
import sys


def main():
    run_dir = sys.argv[1]
    out_path = sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else os.path.basename(run_dir)
    events = [
        json.loads(l)
        for l in open(os.path.join(run_dir, "events.jsonl"))
        if l.strip()
    ]
    t0 = events[0]["t"] if events else 0.0
    curve = [
        {
            "iteration": e["iteration"],
            "wall_s": round(e["t"] - t0, 1),
            "test_psnr": round(e["psnr"], 3),
        }
        for e in events
        if e.get("kind") == "eval" and e.get("split") == "test"
    ]
    train_curve = {
        e["iteration"]: round(e["psnr"], 3)
        for e in events
        if e.get("kind") == "eval" and e.get("split") == "train"
    }
    dens = [e for e in events if e.get("kind") == "densify"]
    log = open(os.path.join(run_dir, "python.log")).read()
    e2e = re.findall(r"end2end total_time: ([\d.]+) s", log)
    args = json.load(open(os.path.join(run_dir, "args.json")))
    rec = {
        "label": label,
        "scene": "64-cam 1237x822 (1.02 Mpix) synthetic COLMAP, "
                 "trained-3DGS statistics + smooth two-scale positional "
                 "palette (round-5 tools/make_flagship_scene.py), 600k-"
                 "gaussian GT, 150k init points",
        "strategy": next(
            k for k in ("no_offload", "naive_offload", "clm_offload")
            if args.get("aux", {}).get(k)
        ),
        "iterations": args.get("opt", {}).get("iterations"),
        "bsz": args.get("opt", {}).get("bsz"),
        "test_psnr_vs_wall": curve,
        "train_psnr": train_curve,
        "final_n3dgs": dens[-1]["num_3dgs"] if dens else None,
        "max_n3dgs": max((d["num_3dgs"] for d in dens), default=None),
        "host_gb_final": round(dens[-1]["host_gb"], 2) if dens else None,
        "end2end_s": float(e2e[-1]) if e2e else None,
    }
    # densification diagnosis (VERDICT r4 'investigate why densification nets
    # negative'): per-event deltas + where the big prunes land relative to
    # opacity resets. On synthetic-from-model scenes with a dense init the
    # optimizer prunes redundant splats right after each reset (opacity
    # clamped to 0.01, unneeded rows decay under min_opacity within ~100
    # iters) while clone/split stays subcritical (screen-space grads below
    # 2e-4 — the init already resolves the scene's spatial detail); the
    # parity scene grows 1.5k -> 22k under the same code.
    resets = [
        int(m) for m in re.findall(r"iteration\[(\d+),\d+\) reset_opacity", log)
    ]
    deltas = [
        {"iter": dens[i]["iteration"],
         "delta": dens[i]["num_3dgs"] - dens[i - 1]["num_3dgs"]}
        for i in range(1, len(dens))
    ]
    big_drops = [d for d in deltas if d["delta"] < -1000]
    rec["densification"] = {
        "init_n3dgs": dens[0]["num_3dgs"] if dens else None,
        "opacity_reset_iters": resets,
        "big_prune_events": big_drops,
        "note": (
            "large prunes land ~100 iters after each opacity reset "
            "(redundant splats from the dense init decay under "
            "min_opacity); clone/split subcritical because the init "
            "already resolves the palette's spatial detail"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec)[:500])


if __name__ == "__main__":
    main()
