"""4K-resolution validation (VERDICT r3 #7, Rubble-4K regime): render + train
the bench scene at 3840x2160 on chip, assert the tile-geometry packing
limits hold, and record throughput / isect demand / program memory.

The tile bbox pack (ops/tiles.py: geo_pre = x0<<18 | y0<<9 | (x1-x0)) gives
9 bits per axis -> up to 512 tiles/axis; 4K at the default 64x32 tiles is
60x68 tiles, comfortably inside (8K would still fit at 120x135).

Writes BENCH4K_r04.json. Usage: python tools/bench4k.py [out.json]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH4K_r04.json"
    )
    W, H = 3840, 2160
    tile_w = int(os.environ.get("CLMGS_TILE_W", "64"))
    tile_h = int(os.environ.get("CLMGS_TILE_H", "32"))
    tw = -(-W // tile_w)
    th = -(-H // tile_h)
    assert tw < 512 and th < 512, (tw, th)  # 9-bit/axis packing bound

    env = dict(os.environ)
    env.update(
        CLMGS_BENCH_W=str(W),
        CLMGS_BENCH_H=str(H),
        # instance demand scales ~linearly with pixel area: ~8.2x the 1 Mpix
        # scene's 2.4M -> seed ~22M; bench re-snugs after the warmup batch
        CLMGS_BENCH_ISECT=str(24 * 2**20),
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--child",
         "no_offload"],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    rec = None
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_CHILD "):
            try:
                rec = json.loads(line[len("BENCH_CHILD "):])
            except json.JSONDecodeError:
                rec = None
    result = {
        "resolution": f"{W}x{H}",
        "tiles": f"{tw}x{th} ({tile_w}x{tile_h} px)",
        "tile_packing_headroom": "9 bits/axis = 512 tiles max; 8K still fits",
        "no_offload": rec,
    }
    if rec is None:
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        result["error"] = " | ".join(tail)[-300:]
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
