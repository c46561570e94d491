"""VERDICT #10: PSNR-parity quality run across all three strategies.

Trains the same enriched synthetic COLMAP scene (48 cameras, densification
from a sparse init) with no_offload / naive_offload / clm_offload and compares
final test PSNR: the reference's own parity bar is the PSNR tables in
release_scripts/*_README.md agreeing across strategies (SURVEY.md §4), so the
pass criterion here is max spread <= 0.3 dB.

Usage: nohup timeout 9000 python -u tools/quality_run.py [iters] [outroot] > /tmp/quality.log 2>&1 &
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/qscene"
    scene = os.path.join(root, "scene")
    if not os.path.exists(os.path.join(scene, "sparse")):
        from tests.make_synthetic_colmap import make_dataset

        t0 = time.time()
        make_dataset(scene, n_points=1500, n_cams=48, width=320, height=240,
                     seed=3)
        print(f"dataset built in {time.time()-t0:.0f} s", flush=True)

    from clm_gs_tpu.train import main as train_main

    results = {}
    for strategy in ("no_offload", "naive_offload", "clm_offload"):
        out = os.path.join(root, f"run_{strategy}")
        t0 = time.time()
        train_main([
            "-s", scene, "-m", out, f"--{strategy}", "--eval",
            "--llffhold", "8", "--bsz", "4", "--iterations", str(iters),
            "--test_iterations", *[str(i) for i in
                                   range(1000, iters + 1, 1000)],
            "--save_iterations", str(iters),
            "--densify_from_iter", "500",
            "--densification_interval", "100",
            "--densify_until_iter", str(int(iters * 0.6)),
            "--isect_cap", "262144", "--log_interval", "500",
            "--do_not_save" if False else "--quiet",
        ])
        dt = time.time() - t0
        log = open(os.path.join(out, "python.log")).read()
        evals = re.findall(
            r"\[ITER (\d+)\] Evaluating (test|train): L1 ([\d.]+) PSNR ([\d.]+)",
            log,
        )
        n3dgs = re.findall(r"Now num of 3dgs: (\d+)", log)
        tests = [(int(i), float(p)) for i, s, l, p in evals if s == "test"]
        results[strategy] = {
            "final_test_psnr": tests[-1][1] if tests else None,
            "psnr_trajectory": tests,
            "final_n3dgs": int(n3dgs[-1]) if n3dgs else None,
            "wall_s": round(dt, 1),
        }
        print(f"{strategy}: {json.dumps(results[strategy])}", flush=True)

    psnrs = [r["final_test_psnr"] for r in results.values() if r["final_test_psnr"]]
    spread = max(psnrs) - min(psnrs) if len(psnrs) == 3 else None
    print(json.dumps({
        "quality_run": results,
        "psnr_spread_db": round(spread, 3) if spread is not None else None,
        "parity_pass": spread is not None and spread <= 0.3,
    }), flush=True)


if __name__ == "__main__":
    main()
