"""Build BIGCITY_r04.json (BigCity-regime record, VERDICT r3 #3) from the
bigcity train.py run: 25M-gaussian clm_offload, bsz 64, sparse_adam,
densification off — s/iter, device-live bytes, host memory, overlap meters,
final eval.

Usage: python tools/collect_bigcity.py <run_dir> <out.json>
"""

import json
import os
import re
import sys


def main():
    run_dir, out_path = sys.argv[1], sys.argv[2]
    log = open(os.path.join(run_dir, "python.log")).read()
    overlap = re.findall(
        r"clm overlap: host work ([\d.]+) ms/batch, trailing ([\d.]+) "
        r"ms/batch, comm-hidden (\d+)%",
        log,
    )
    evals = re.findall(
        r"\[ITER (\d+)\] Evaluating (test|train): L1 ([\d.]+) PSNR ([\d.]+)",
        log,
    )
    e2e = re.findall(
        r"end2end total_time: ([\d.]+) s, iterations: (\d+), "
        r"throughput ([\d.]+) it/s",
        log,
    )
    iters = re.findall(r"iteration\[(\d+),(\d+)\) loss: ([\d.]+)", log)
    mem = re.findall(r"host peak rss ([\d.]+) GB", log)
    dev_live = re.findall(r"device live ([\d.]+) GB", log)
    init = re.findall(r"Initialized (\d+) gaussians \(capacity (\d+)\)", log)
    rec = {
        "scene": "25M-gaussian synthetic city, 64 cams 640x400, serpentine "
                 "path (tools/make_bigcity_scene.py); reference regime: "
                 "bigcity.sh 102M / bsz 64 / sparse_adam / densification off",
        "strategy": "clm_offload",
        "n_gaussians": int(init[-1][0]) if init else None,
        "capacity": int(init[-1][1]) if init else None,
        "losses": [
            {"iter": int(a), "loss": float(l)} for a, b, l in iters
        ],
        "overlap_last": (
            {
                "host_work_ms_per_batch": float(overlap[-1][0]),
                "trailing_ms_per_batch": float(overlap[-1][1]),
                "comm_hidden_pct": int(overlap[-1][2]),
            }
            if overlap
            else None
        ),
        "host_peak_gb": float(mem[-1]) if mem else None,
        "device_live_gb_max": max((float(x) for x in dev_live), default=None),
        "final_eval": [
            {"iter": int(i), "split": s, "psnr": float(p)}
            for i, s, l, p in evals
        ],
        "end2end": (
            {
                "total_s": float(e2e[-1][0]),
                "iterations": int(e2e[-1][1]),
                "it_per_s": float(e2e[-1][2]),
            }
            if e2e
            else None
        ),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec)[:500])


if __name__ == "__main__":
    main()
