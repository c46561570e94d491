"""Degrade a model PLY's appearance channels for a from-imperfect-init
training record: geometry (xyz/scale/rot/opacity) is kept so visibility and
retention statistics stay realistic, but SH colors are damped + noised so the
(host-resident, clm-streamed) color state genuinely has to be re-learned —
a synthetic-scene init that equals the GT generator would show a flat loss.

Streams in chunks: works on BigCity-scale (6+ GB) PLYs in ~2 GB of RAM.

Usage: python tools/degrade_ply.py <in.ply> <out.ply> [dc_keep=0.3] [noise=0.15]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    keep = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    noise = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
    with open(src, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
        props = [l.split()[-1] for l in lines if l.startswith("property float")]
        ncol = len(props)
        sh_cols = [i for i, p in enumerate(props)
                   if p.startswith("f_dc_") or p.startswith("f_rest_")]
        lo, hi = min(sh_cols), max(sh_cols) + 1
        assert sh_cols == list(range(lo, hi)), "non-contiguous SH columns"
        rng = np.random.RandomState(0)
        with open(dst, "wb") as out:
            out.write(header)
            chunk = 4_000_000
            done = 0
            while done < n:
                m = min(chunk, n - done)
                buf = np.frombuffer(f.read(m * ncol * 4), dtype="<f4").reshape(
                    m, ncol
                ).copy()
                buf[:, lo:hi] = keep * buf[:, lo:hi] + noise * rng.normal(
                    size=(m, hi - lo)
                ).astype(np.float32)
                out.write(buf.tobytes())
                done += m
    print(f"degraded {n} rows ({src} -> {dst}, keep={keep}, noise={noise})")


if __name__ == "__main__":
    main()
