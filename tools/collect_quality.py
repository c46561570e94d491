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
                 "trained-3DGS statistics (tools/make_flagship_scene.py), "
                 "520k init points",
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
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec)[:500])


if __name__ == "__main__":
    main()
