"""Flagship-scale quality run (VERDICT r4 #6): 1-Mpix cameras, no_offload,
15k iterations on the flagship scene (tools/make_flagship_scene.py — round-5
scene carries smooth positional-palette colors so held-out views are
predictable and test PSNR keeps moving).

Usage: python tools/flagship_run.py <iters> [sceneroot] [outdir]
Collect with: python tools/collect_quality.py <outdir> QUALITY_r05.json flagship_1mpix
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    scene = sys.argv[2] if len(sys.argv) > 2 else "/tmp/flagship/scene"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/flagship/run"

    from clm_gs_tpu.train import main as train_main

    t0 = time.time()
    train_main([
        "-s", scene, "-m", out, "--no_offload", "--eval",
        "--llffhold", "8", "--bsz", "4", "--iterations", str(iters),
        "--test_iterations", *[str(i) for i in range(1000, iters + 1, 1000)],
        "--save_iterations", "0",
        "--densify_from_iter", "500",
        "--densification_interval", "100",
        "--densify_until_iter", str(min(9000, int(iters * 0.6))),
        "--opacity_reset_interval", "3000",
        "--isect_cap", str(6 * 2**20),
        "--log_interval", "500", "--quiet",
    ])
    print(f"flagship: done in {time.time()-t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
