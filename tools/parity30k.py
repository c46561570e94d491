"""Full-schedule strategy-parity run (VERDICT r4 #3).

Runs ONE strategy on the canonical 48-cam 320x240 synthetic COLMAP parity
scene (seed 3) with the exact schedule recorded in PARITY30K_r04.json:
30k iterations, bsz 4, densify 500..15000/100, opacity reset every 3000,
grad threshold 2e-4, eval every 1000.  The reference's own validation bar
is three-strategy PSNR agreement on this schedule
(/root/reference/release_scripts/mip360_README.md:52-86).

Usage: python tools/parity30k.py <strategy> [iters] [outroot]
Collect with: python tools/collect_parity.py PARITY30K_r05.json <dir...>
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    strategy = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/parity30k"
    scene = os.path.join(root, "scene")
    if not os.path.exists(os.path.join(scene, "sparse")):
        from tests.make_synthetic_colmap import make_dataset

        t0 = time.time()
        make_dataset(scene, n_points=1500, n_cams=48, width=320, height=240,
                     seed=3)
        print(f"dataset built in {time.time()-t0:.0f} s", flush=True)

    from clm_gs_tpu.train import main as train_main

    out = os.path.join(root, f"run_{strategy}")
    t0 = time.time()
    train_main([
        "-s", scene, "-m", out, f"--{strategy}", "--eval",
        "--llffhold", "8", "--bsz", "4", "--iterations", str(iters),
        "--test_iterations", *[str(i) for i in range(1000, iters + 1, 1000)],
        "--save_iterations", str(iters),
        "--densify_from_iter", "500",
        "--densification_interval", "100",
        "--densify_until_iter", "15000",
        "--opacity_reset_interval", "3000",
        "--densify_grad_threshold", "0.0002",
        "--isect_cap", "262144", "--log_interval", "500",
        "--quiet",
    ])
    print(f"{strategy}: done in {time.time()-t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
