"""At-scale clm training record (VERDICT r4 #4): 25M-gaussian BigCity-25M
analogue, clm_offload, bsz 64, --sparse_adam, densification off — the
reference's bigcity.sh regime (release_scripts/bigcity.sh:72-96, bsz 64,
500k iters, densification off). Scene from tools/make_bigcity_scene.py.

Usage: python tools/bigcity_run.py <iters> [sceneroot] [outdir]
Collect with: python tools/collect_bigcity.py <outdir> QUALITY_BIGCITY_r05.json
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    scene = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bigcity/scene"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bigcity/run"
    evals = [str(i) for i in range(512, iters + 1, 512)] + [str(iters)]

    from clm_gs_tpu.train import main as train_main

    t0 = time.time()
    train_main([
        "-s", scene, "-m", out, "--clm_offload", "--eval",
        "--llffhold", "8", "--bsz", "64", "--iterations", str(iters),
        "--sparse_adam",
        "--load_ply_path", os.path.join(scene, "init_model.ply"),
        "--prealloc_capacity", os.environ.get("BIGCITY_CAP", str(382 * 65536)),
        "--test_iterations", *evals,
        "--save_iterations", "0",
        "--densify_until_iter", "0",
        "--isect_cap", os.environ.get("BIGCITY_ISECT", str(2 * 2**20)),
        "--check_gpu_memory", "--check_cpu_memory",
        "--log_interval", "64", "--quiet",
    ])
    print(f"bigcity: done in {time.time()-t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
