"""Shared synthetic benchmark scene (bicycle-like scale: 1M Gaussians,
1237x822 ~= 1.02 Mpix cameras). Used by bench.py and tools/profile_stages.py
so stage-level profiling measures exactly the benchmarked workload."""

from __future__ import annotations

import os

import numpy as np

# env overrides are for CPU smoke tests of bench.py's code paths only; the
# recorded benchmark always runs the defaults
N = int(os.environ.get("CLMGS_BENCH_N", 1_000_000))
CAP = int(os.environ.get("CLMGS_BENCH_CAP", 1_048_576))
W = int(os.environ.get("CLMGS_BENCH_W", 1237))
H = int(os.environ.get("CLMGS_BENCH_H", 822))
BSZ = 4
# the cap the trainer's adaptive bucketing converges to for this scene:
# round_up(max_isects * 1.05, 2**17) with max_isects ~ 2.40M over the 4
# bench cameras under the opacity-aware tight bboxes + the 64x32 default
# tiles (was 5767168 at 32x16). bench.py re-snugs at runtime either way; a
# correct seed just avoids one throwaway compile at the wrong capacity and
# keeps the probe tools (profile_trace, kernel_probe) at the real size.
ISECT_CAP = int(os.environ.get("CLMGS_BENCH_ISECT", 2621440))


def _surface_gaussians(n: int, rng):
    """Trained-scene-like parameter distributions: gaussians concentrated on
    opaque surfaces (ground plane + object shells) with pancake shapes aligned
    to surface normals, plus a low-opacity background shell. Mirrors the
    statistics of a converged 3DGS scene (bimodal opacity, scales ~ local
    point spacing) so pixel saturation/termination engages like it does on the
    reference's own benchmark scenes (trained Mip-360 bicycle) — the random
    fog scene composites essentially without termination (99.3% of chunks
    live), which benchmarks the worst case instead of the measured workload.
    """
    n_ground = int(n * 0.35)
    n_obj = int(n * 0.50)
    n_fog = n - n_ground - n_obj

    # ground plane y = -1, extent 8x8
    gx = rng.uniform(-4, 4, n_ground)
    gz = rng.uniform(-4, 4, n_ground)
    g_xyz = np.stack([gx, np.full(n_ground, -1.0), gz], axis=1)
    g_normal = np.tile(np.array([[0.0, 1.0, 0.0]]), (n_ground, 1))

    # object shells: points on ellipsoid surfaces
    n_shapes = 150
    centers = np.stack(
        [
            rng.uniform(-2.5, 2.5, n_shapes),
            rng.uniform(-1.0, 1.5, n_shapes),
            rng.uniform(-2.5, 2.5, n_shapes),
        ],
        axis=1,
    )
    radii = rng.uniform(0.15, 0.8, (n_shapes, 3))
    which = rng.randint(0, n_shapes, n_obj)
    u = rng.normal(size=(n_obj, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    o_xyz = centers[which] + u * radii[which]
    o_normal = u / radii[which]
    o_normal /= np.linalg.norm(o_normal, axis=1, keepdims=True)

    # background shell (sky/far fluff), low opacity
    f_dir = rng.normal(size=(n_fog, 3))
    f_dir /= np.linalg.norm(f_dir, axis=1, keepdims=True)
    f_xyz = f_dir * rng.uniform(8.0, 14.0, (n_fog, 1))
    f_normal = -f_dir

    xyz = np.concatenate([g_xyz, o_xyz, f_xyz]).astype(np.float32)
    normal = np.concatenate([g_normal, o_normal, f_normal]).astype(np.float32)

    # surface splats: tangent scales ~ local spacing (lognormal around 2.5 cm
    # at 850k points over ~500 units^2 of surface), normal axis 10x thinner
    n_surf = n_ground + n_obj
    base = 0.025 * np.exp(0.5 * rng.normal(size=n_surf)).astype(np.float32)
    log_scale = np.empty((n, 3), np.float32)
    log_scale[:n_surf, 0] = np.log(base)
    log_scale[:n_surf, 1] = np.log(base * np.exp(0.3 * rng.normal(size=n_surf)))
    log_scale[:n_surf, 2] = np.log(0.1 * base)
    fog_base = 0.3 * np.exp(0.4 * rng.normal(size=(n_fog, 3)))
    log_scale[n_surf:] = np.log(fog_base).astype(np.float32)

    # quat rotating local z-axis onto the surface normal (half-angle form)
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(np.tile(z, (n, 1)), normal)
    s = np.linalg.norm(axis, axis=1)
    c = normal @ z
    wq = np.sqrt(np.maximum(0.5 * (1.0 + c), 1e-12))
    xyzq = axis / np.maximum(s, 1e-12)[:, None] * np.sqrt(
        np.maximum(0.5 * (1.0 - c), 0.0)
    )[:, None]
    quat = np.concatenate([wq[:, None], xyzq], axis=1).astype(np.float32)

    # bimodal opacity: surfaces mostly near-opaque, background faint
    opacity = np.empty(n, np.float32)
    opacity[:n_surf] = rng.normal(2.5, 1.2, n_surf)
    opacity[n_surf:] = rng.normal(-2.0, 1.0, n_fog)

    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = rng.uniform(-1, 1, (n, 3))
    sh[:, 3:] = 0.05 * rng.normal(size=(n, 45)).astype(np.float32)
    return xyz, log_scale, quat, opacity.astype(np.float32), sh


def make_scene(
    n: int = N, cap: int = CAP, bsz: int = BSZ, w: int = W, h: int = H,
    kind: str = "trained",
):
    """Returns (state, opt_state, cam_batch, gt_images, lrs, adam_cfg, bg).

    kind="trained": surface-concentrated, opacity-bimodal scene matching
    trained-3DGS statistics (the reference's baseline number is measured on a
    trained scene). kind="fog": the round-1/2 random-cloud scene (termination-
    free worst case), kept for cross-round comparability.
    """
    import jax.numpy as jnp

    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
    from tests.utils3d import make_camera

    rng = np.random.RandomState(0)
    if kind == "trained":
        xyz, log_scale, quat, opacity, sh = _surface_gaussians(n, rng)
    else:
        xyz = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        log_scale = np.full((n, 3), np.log(0.01), np.float32) + 0.3 * rng.normal(
            size=(n, 3)
        ).astype(np.float32)
        quat = rng.normal(size=(n, 4)).astype(np.float32)
        opacity = rng.uniform(-2.0, 1.0, n).astype(np.float32)
        sh = np.zeros((n, 48), np.float32)
        sh[:, :3] = rng.uniform(-1, 1, (n, 3))
        sh[:, 3:] = 0.05 * rng.normal(size=(n, 45)).astype(np.float32)

    def pad(x):
        return jnp.asarray(np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)))

    params = G.GaussianParams(
        xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat), sh=pad(sh),
    )
    state = G.GaussianState(
        params=params, alive=jnp.asarray(np.arange(cap) < n),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )
    opt = init_adam(params)
    cams = [
        make_camera(uid=i, width=w, height=h, dist=6.0, angle=2 * np.pi * i / bsz)
        for i in range(bsz)
    ]
    cb = stack_cameras(cams)
    gts = jnp.zeros((bsz, 3, h, w), jnp.float32)
    lrs = {
        "xyz": jnp.float32(1.6e-4), "opacity": jnp.float32(0.05),
        "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
        "sh": sh_column_lr(0.0025),
    }
    return state, opt, cb, gts, lrs, AdamConfig(), jnp.zeros(3, jnp.float32)


def drain_scalar(*arrays) -> float:
    """Force a real device round-trip (block_until_ready lies on the axon
    tunnel): pull one scalar element from each array."""
    tot = 0.0
    for a in arrays:
        tot += float(a.reshape(-1)[0])
    return tot
