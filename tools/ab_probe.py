"""One-command A/B sweep of the env-gated rasterizer variants on the chip.

Each config runs in its own subprocess (the gates — CLMGS_CHUNK_K,
CLMGS_PACK_GRADS, CLMGS_TILE_W/H — are read at import/trace time) and times
bench-scene fwd+bwd through bench.py's no_offload child. Prints one line per
config plus a final ranking, so a single `timeout 3600 python tools/ab_probe.py`
answers every open kernel/glue question in one chip claim.

CLMGS_PACK_GRADS is default-ON since the round-2 A/B (+12.6%); every config
here pins it explicitly so "baseline" stays the exact-regroup baseline and
"pack_grads" measures the packed path against it.

Configs probed (see PARITY.md round-2 lever notes):
  - baseline (K=256, exact grad regroup, PACK_GRADS=0)
  - CLMGS_PACK_GRADS=1  (6-operand bf16-packed grad-regroup sort)
  - CLMGS_CHUNK_K=128 / 512  (grid-step count vs alignment-slot tradeoff)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("baseline", {"CLMGS_PACK_GRADS": "0"}),
    ("pack_grads", {"CLMGS_PACK_GRADS": "1"}),
    ("k128", {"CLMGS_PACK_GRADS": "0", "CLMGS_CHUNK_K": "128"}),
    ("k512", {"CLMGS_PACK_GRADS": "0", "CLMGS_CHUNK_K": "512"}),
    ("pack+k512", {"CLMGS_PACK_GRADS": "1", "CLMGS_CHUNK_K": "512"}),
    ("mxu_geom", {"CLMGS_PACK_GRADS": "0", "CLMGS_MXU_GEOM": "1"}),
    ("mxu+pack", {"CLMGS_MXU_GEOM": "1", "CLMGS_PACK_GRADS": "1"}),
    ("tile_cull", {"CLMGS_PACK_GRADS": "0", "CLMGS_TILE_CULL": "1"}),
    ("cull+mxu", {"CLMGS_PACK_GRADS": "0", "CLMGS_TILE_CULL": "1",
                  "CLMGS_MXU_GEOM": "1"}),
    ("cull+mxu+pack", {"CLMGS_TILE_CULL": "1", "CLMGS_MXU_GEOM": "1",
                       "CLMGS_PACK_GRADS": "1"}),
    ("block_scan", {"CLMGS_BLOCK_SCAN": "1"}),
    ("gather_pad16", {"CLMGS_GATHER_PACK": "pad16"}),
    ("gather_c64", {"CLMGS_GATHER_PACK": "c64"}),
    ("cull+mxu+scan", {"CLMGS_PACK_GRADS": "0", "CLMGS_TILE_CULL": "1",
                       "CLMGS_MXU_GEOM": "1", "CLMGS_BLOCK_SCAN": "1"}),
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
                    rec = json.loads(line[len("BENCH_CHILD "):])
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
