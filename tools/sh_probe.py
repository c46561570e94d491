"""SH color-eval layout probe.

profile_stages measures sh_fwd at 8.1 ms/camera for 1M gaussians — the
(N,48) f32 coefficient read is only 192 MB (~0.3 ms at HBM bandwidth), so
most of the time is layout: the (N,16) basis and (N,16,3) einsum operands pad
their minor dims to the 128-lane tile. Variants:

  A. current: einsum('nk,nkc->nc', basis(N,16), coeffs(N,16,3))
  B. column arithmetic: 48 (N,) column slices of the flat (N,48) table,
     basis kept as 16 separate (N,) vectors (never materializing (N,16))
  C. read floor: sum of the (N,48) table

Usage: nohup timeout 2400 python -u tools/sh_probe.py > /tmp/shp.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.ops.sh import degree_mask, sh_basis, spherical_harmonics

N = 1_000_000


def drain(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.asarray(leaf).reshape(-1)[-1])


def timeit(name, fn, *args, iters=10):
    drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def _basis_cols(dirs):
    from clm_gs_tpu.ops.sh import C0, C1, C2, C3

    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return [
        C0 * one, -C1 * y, C1 * z, -C1 * x,
        C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz, C2[4] * (xx - yy),
        C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
        C3[2] * y * (4.0 * zz - xx - yy),
        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        C3[4] * x * (4.0 * zz - xx - yy), C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3.0 * yy),
    ]


def main():
    rng = np.random.default_rng(0)
    sh48 = jnp.asarray(rng.normal(size=(N, 48)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 5)
    campos = jnp.asarray(np.array([0.0, 0.0, -10.0], np.float32))
    deg = jnp.asarray(3)

    @jax.jit
    def cur(sh48, xyz, deg):
        dirs = xyz - campos[None, :]
        coeffs = sh48.reshape(N, 16, 3)
        basis = sh_basis(dirs) * degree_mask(deg)
        return jnp.einsum("nk,nkc->nc", basis, coeffs)

    @jax.jit
    def colwise(sh48, xyz, deg):
        dirs = xyz - campos[None, :]
        cols = _basis_cols(dirs)
        m = degree_mask(deg)
        out = []
        for c in range(3):
            acc = None
            for k in range(16):
                t = cols[k] * m[k] * sh48[:, 3 * k + c]
                acc = t if acc is None else acc + t
            out.append(acc)
        return jnp.stack(out, axis=1)

    @jax.jit
    def floor_read(sh48):
        return jnp.sum(sh48, axis=1)

    a = cur(sh48, xyz, deg)
    b = colwise(sh48, xyz, deg)
    print("colwise max diff:", float(jnp.max(jnp.abs(a - b))), flush=True)
    timeit("sh fwd einsum (current)", cur, sh48, xyz, deg)
    timeit("sh fwd column arithmetic", colwise, sh48, xyz, deg)
    timeit("(N,48) read floor", floor_read, sh48)

    @jax.jit
    def cur_bwd(sh48, xyz, deg):
        return jax.grad(lambda s: jnp.sum(cur(s, xyz, deg) ** 2))(sh48)

    @jax.jit
    def col_bwd(sh48, xyz, deg):
        return jax.grad(lambda s: jnp.sum(colwise(s, xyz, deg) ** 2))(sh48)

    timeit("sh fwd+bwd einsum (current)", cur_bwd, sh48, xyz, deg)
    timeit("sh fwd+bwd column arithmetic", col_bwd, sh48, xyz, deg)


if __name__ == "__main__":
    main()
