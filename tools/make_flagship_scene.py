"""Build the flagship-scale synthetic COLMAP scene (VERDICT r3 #2): ~1 Mpix
cameras over a trained-3DGS-statistics scene (bench_scene._surface_gaussians
— surface-concentrated, opacity-bimodal), GT images rendered ON CHIP with the
production rasterizer, COLMAP sparse init from a noised subsample of the
gaussian centers (SfM-like).

This is the repo's analogue of Mip-360 bicycle (images_4, ~1.0 Mpix) until
real datasets are available: same camera count scale (64 vs 194), same
resolution class, trained-scene termination statistics, densification-driven
growth to >= 500k gaussians.

Usage: python tools/make_flagship_scene.py <root> [n_gauss] [n_cams] [W] [H]
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def lookat_camera(uid, pos, target, width, height, fov=0.8):
    from clm_gs_tpu.data.cameras import Camera

    pos = np.asarray(pos, np.float64)
    forward = target - pos
    forward /= np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    nr = np.linalg.norm(right)
    if nr < 1e-6:  # looking straight down/up
        right = np.array([1.0, 0.0, 0.0])
    else:
        right /= nr
    up2 = np.cross(forward, right)
    R = np.stack([right, up2, forward], axis=1)
    T = -R.T @ pos
    return Camera(
        uid=uid, image_name=f"cam{uid}", width=width, height=height,
        R=R, T=T, fovx=fov, fovy=fov * height / width,
    )


def flagship_cameras(n_cams, width, height, rng):
    """Three rings around the 8x8 surface scene: orbit, elevated, high."""
    cams = []
    n1 = n_cams // 2
    n2 = n_cams - n1 - n_cams // 8
    n3 = n_cams - n1 - n2
    uid = 1
    for i in range(n1):
        a = 2 * np.pi * i / n1
        pos = np.array([6.0 * np.sin(a), 0.3, -6.0 * np.cos(a)])
        cams.append(lookat_camera(uid, pos, np.zeros(3), width, height))
        uid += 1
    for i in range(n2):
        a = 2 * np.pi * (i + 0.5) / n2
        pos = np.array([4.5 * np.sin(a), 1.8, -4.5 * np.cos(a)])
        cams.append(
            lookat_camera(uid, pos, np.array([0.0, -0.5, 0.0]), width, height)
        )
        uid += 1
    for i in range(n3):
        a = 2 * np.pi * (i + 0.25) / max(n3, 1)
        pos = np.array([3.0 * np.sin(a), 4.0, -3.0 * np.cos(a)])
        cams.append(
            lookat_camera(uid, pos, np.array([0.0, -1.0, 0.0]), width, height)
        )
        uid += 1
    return cams


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship/scene"
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    n_cams = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    width = int(sys.argv[4]) if len(sys.argv) > 4 else 1237
    height = int(sys.argv[5]) if len(sys.argv) > 5 else 822
    n_init = int(os.environ.get("FLAGSHIP_INIT_POINTS", "300000"))
    seed = 7

    import jax.numpy as jnp
    from PIL import Image

    from clm_gs_tpu.data import colmap
    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models.gaussians import GaussianParams
    from clm_gs_tpu.strategies.base import render_one_cam
    from clm_gs_tpu.utils.bench_scene import _surface_gaussians

    rng = np.random.RandomState(seed)
    xyz, log_scale, quat, opacity, sh = _surface_gaussians(n_gauss, rng)
    # LEARNABLE colors (round-5 fix, VERDICT r4 #6): the bench scene's
    # per-gaussian uniform-random DC is sub-pixel color noise — novel views
    # are unpredictable in principle, so test PSNR saturates near the noise
    # floor (~26 dB in QUALITY_r04) while train memorizes to 43. Replace DC
    # with a smooth positional palette (+ mild per-gaussian texture noise)
    # and damp the high-order SH so appearance interpolates across views the
    # way real captured scenes do. Perf bench statistics are unaffected
    # (bench_scene keeps its own distribution).
    # Two palette scales: a broad base + a FINE pattern (several cycles per
    # scene unit). The fine component is view-independent (predictable at
    # held-out views) but spatially beyond the init point density, so the
    # optimizer must keep densifying/refining to resolve it — test PSNR
    # climbs gradually instead of saturating at a per-gaussian-noise floor
    # (QUALITY_r04's failure mode, and the flat-33dB first round-5 attempt).
    Wmix = rng.uniform(0.5, 1.4, (3, 3)) * rng.choice([-1.0, 1.0], (3, 3))
    Wfine = rng.uniform(3.0, 7.0, (3, 3)) * rng.choice([-1.0, 1.0], (3, 3))
    phase = rng.uniform(0, 2 * np.pi, 3)
    phase2 = rng.uniform(0, 2 * np.pi, 3)
    rgb = (
        0.5
        + 0.22 * np.sin(xyz @ Wmix.T.astype(np.float32) + phase)
        + 0.20 * np.sin(xyz @ Wfine.T.astype(np.float32) + phase2)
    )
    sh[:, 0:3] = (rgb - 0.5) / 0.28209479 + 0.03 * rng.normal(
        size=(n_gauss, 3)
    ).astype(np.float32)
    sh[:, 3:] *= 0.2
    cap = -(-n_gauss // 65536) * 65536

    def pad(x):
        return jnp.asarray(
            np.pad(x, [(0, cap - n_gauss)] + [(0, 0)] * (x.ndim - 1))
        )

    params = GaussianParams(
        xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat), sh=pad(sh),
    )
    alive = jnp.asarray(np.arange(cap) < n_gauss)
    cams = flagship_cameras(n_cams, width, height, rng)
    cb = stack_cameras(cams)
    bg = jnp.zeros(3, jnp.float32)

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    isect_cap = int(os.environ.get("FLAGSHIP_ISECT", str(6 * 2**20)))
    names = [f"img_{i:03d}.png" for i in range(n_cams)]
    import time

    t0 = time.time()
    for i, name in enumerate(names):
        out = render_one_cam(
            params, alive, cb.viewmats[i], cb.Ks[i], cb.camera_centers[i],
            3, width, height, bg, isect_cap,
        )
        ni = int(out.n_isects)
        assert ni < isect_cap, (name, ni, isect_cap)
        arr = (
            np.asarray(jnp.clip(out.image, 0, 1) * 255)
            .astype(np.uint8)
            .transpose(1, 2, 0)
        )
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        if i % 8 == 0:
            print(f"rendered {i}/{n_cams} (isects {ni/1e6:.2f} M, "
                  f"{time.time()-t0:.0f} s)", flush=True)

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    colmap_cams = {
        1: colmap.ColmapCamera(
            1, "PINHOLE", width, height,
            np.array([cams[0].K[0, 0], cams[0].K[1, 1],
                      width / 2, height / 2]),
        )
    }
    colmap.write_cameras_binary(
        os.path.join(sparse, "cameras.bin"), colmap_cams
    )
    imgs = {}
    for i, cam in enumerate(cams):
        qvec = colmap.rotmat2qvec(cam.R.T)
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, qvec, cam.T.astype(np.float64), 1, names[i]
        )
    colmap.write_images_binary(os.path.join(sparse, "images.bin"), imgs)

    # SfM-like init: noised subsample of the true centers
    sel = rng.choice(n_gauss, size=min(n_init, n_gauss), replace=False)
    pts = xyz[sel] + 0.02 * rng.normal(size=(len(sel), 3)).astype(np.float32)
    dc_rgb = np.clip(sh[sel, :3] * 0.28209479 + 0.5, 0, 1)
    colmap.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"), pts.astype(np.float64),
        (dc_rgb * 255).astype(np.uint8),
    )
    print(f"scene at {root}: {n_cams} cams {width}x{height}, "
          f"{n_gauss} gaussians, {len(sel)} init points", flush=True)


if __name__ == "__main__":
    main()
