"""Collect the 30k strategy-parity record (VERDICT r3 #6) from train.py run
directories into PARITY30K_r04.json: per-strategy test-PSNR at every eval
milestone, final gaussian counts, wall-clock, and the iso-iteration spread
at the highest milestone every strategy reached.

Usage: python tools/collect_parity.py <out.json> <dir1> [dir2 ...]
"""

import json
import os
import re
import sys


def parse_run(d):
    log_path = os.path.join(d, "python.log")
    if not os.path.exists(log_path):
        return None
    log = open(log_path).read()
    evals = re.findall(
        r"\[ITER (\d+)\] Evaluating (test|train): L1 ([\d.]+) PSNR ([\d.]+)",
        log,
    )
    tests = {int(i): float(p) for i, s, l, p in evals if s == "test"}
    n3dgs = re.findall(r"Now num of 3dgs: (\d+)", log)
    end2end = re.findall(r"end2end total_time: ([\d.]+) s", log)
    last_iter = re.findall(r"iteration\[(\d+),(\d+)\)", log)
    return {
        "test_psnr": {str(k): tests[k] for k in sorted(tests)},
        "final_n3dgs": int(n3dgs[-1]) if n3dgs else None,
        "n_densify_events": len(n3dgs),
        "end2end_s": float(end2end[-1]) if end2end else None,
        "reached_iter": int(last_iter[-1][1]) - 1 if last_iter else None,
    }


def main():
    out = sys.argv[1]
    runs = {}
    for d in sys.argv[2:]:
        if d.endswith(".json"):
            # merge strategies from a prior record (e.g. PARITY30K_r04's
            # no_offload run, whose trajectory code is unchanged)
            prev = json.load(open(d))
            for name, rec in prev.get("runs", {}).items():
                if name not in runs:
                    rec = dict(rec, source=os.path.basename(d))
                    runs[name] = rec
            continue
        name = os.path.basename(d.rstrip("/")).replace("run_", "")
        rec = parse_run(d)
        if rec:
            runs[name] = rec
    # iso-iteration spread at the highest milestone all strategies reached
    common = None
    for rec in runs.values():
        ms = set(int(k) for k in rec["test_psnr"])
        common = ms if common is None else (common & ms)
    spread = None
    at_iter = None
    if common:
        at_iter = max(common)
        vals = [rec["test_psnr"][str(at_iter)] for rec in runs.values()]
        spread = round(max(vals) - min(vals), 3)
    # pairwise spreads at each pair's own highest common milestone (a run
    # stopped early by wall-clock still gets compared as deep as it went)
    pairwise = {}
    names = sorted(runs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            com = set(int(k) for k in runs[a]["test_psnr"]) & set(
                int(k) for k in runs[b]["test_psnr"]
            )
            if com:
                m = max(com)
                pairwise[f"{a}|{b}"] = {
                    "at_iter": m,
                    "spread_db": round(
                        abs(
                            runs[a]["test_psnr"][str(m)]
                            - runs[b]["test_psnr"][str(m)]
                        ),
                        3,
                    ),
                }
    record = {
        "schedule": {
            "iterations": 30000, "bsz": 4, "densify": "500..15000/100",
            "opacity_reset_interval": 3000, "densify_grad_threshold": 2e-4,
            "scene": "48-cam 320x240 synthetic COLMAP (seed 3)",
        },
        "runs": runs,
        "iso_iter_spread_db": spread,
        "spread_at_iter": at_iter,
        "pairwise": pairwise,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record)[:600])


if __name__ == "__main__":
    main()
