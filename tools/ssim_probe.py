"""Chip A/B of the SSIM blur formulations (CLMGS_SSIM_T).

The 11-tap W-axis (lane-dim) shifted-slice sum forces a lane-rotation
relayout per tap; the transpose form runs both 1-D blurs along sublanes.
Times combined_loss_batch fwd+bwd at bench-scene geometry (4 x 3 x 822 x
1237) and checks the two paths agree bitwise.

Usage: python tools/ssim_probe.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def run(mode: str, imgs, gts, iters=20):
    os.environ["CLMGS_SSIM_T"] = mode
    from clm_gs_tpu.ops import ssim as S

    def loss(im):
        return jnp.sum(S.combined_loss_batch(im, gts))

    f = jax.jit(jax.value_and_grad(loss))
    v, g = f(imgs)
    v.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = f(imgs)
    g.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, float(v), np.asarray(g[0, 0, :2, :2])


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 3, 822, 1237), dtype=np.float32))
    gts = jnp.asarray(rng.random((4, 3, 822, 1237), dtype=np.float32))
    for mode, name in (("0", "lane-shift"), ("1", "transpose")):
        # fresh traces per mode: the env is read at trace time
        jax.clear_caches()
        dt, v, g00 = run(mode, imgs, gts)
        print(f"{name:10s} {dt*1e3:8.2f} ms/batch fwd+bwd  loss={v:.6f} "
              f"g00={g00[0,0]:.6e}")


if __name__ == "__main__":
    main()
