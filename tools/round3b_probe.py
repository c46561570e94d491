"""Round-3 continuation A/B: grid-step amortization levers at the 64x32
tile geometry.

Motivation (PARITY round-3 notes): the compositing kernels are
fetch/sequencing-bound per grid step (an all-terminated pass still costs 95%
of full compute), and the K=256-at-P=2048 VMEM OOM that forced K=128 predates
the pixel-slab bound (CLMGS_SLAB_P). K=256 + SLAB_P=1024 keeps per-pixel
temporaries at the exact same (K*PS) footprint as the default K=128/PS=2048
while HALVING grid steps. MXU_GEOM also deserves a re-probe here: its loss at
32x16 (P=512) was Mosaic relayout overhead around small matmuls; at P=2048
the (K,8)@(8,P) fwd form and (K,P)@(P,8) bwd moment contraction amortize far
better.

Usage: timeout 3000 python tools/round3b_probe.py [per-config-budget-s]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("default", {}),  # 64x32 / K=128 / pack on — reproduces BENCH headline
    ("k256_s1024", {"CLMGS_CHUNK_K": "256", "CLMGS_SLAB_P": "1024"}),
    ("mxu", {"CLMGS_MXU_GEOM": "1"}),
    ("k256_s1024+mxu", {"CLMGS_CHUNK_K": "256", "CLMGS_SLAB_P": "1024",
                        "CLMGS_MXU_GEOM": "1"}),
]


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    results = {}
    for name, extra in CONFIGS:
        env = dict(os.environ)
        env.update(extra)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--child",
                 "no_offload"],
                capture_output=True, text=True, timeout=budget, env=env,
            )
            rec = None
            for line in proc.stdout.splitlines():
                if line.startswith("BENCH_CHILD "):
                    # a child killed mid-print emits a truncated JSON line;
                    # fall through to the error-tail record instead of
                    # aborting the whole sweep
                    try:
                        rec = json.loads(line[len("BENCH_CHILD "):])
                    except json.JSONDecodeError:
                        rec = None
            if rec is None:
                tail = (proc.stdout + proc.stderr).strip().splitlines()[-2:]
                rec = {"error": " | ".join(tail)[-200:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout {budget}s"}
        results[name] = rec
        print(f"{name}: " + json.dumps(
            {k: rec.get(k) for k in ("mpix_s", "sec_per_batch", "error")
             if k in rec}
        ), flush=True)

    ranked = sorted(
        ((n, r.get("mpix_s")) for n, r in results.items() if r.get("mpix_s")),
        key=lambda t: -t[1],
    )
    print("RANKING " + json.dumps(ranked), flush=True)


if __name__ == "__main__":
    main()
