"""Build the BigCity-regime scene (VERDICT r3 #3): tens of millions of
gaussians over a 100x100-unit city (ground + box-building shells), cameras on
a serpentine street-level path so each sees only a local neighborhood — the
visibility-sparse access pattern the clm working-set design exists for
(reference release_scripts/bigcity.sh: 102M gaussians, bsz 64, sparse_adam,
densification off).

Writes a model-schema PLY (train.py --load_ply_path init) + COLMAP images/
cameras + chip-rendered GT images.

Usage: python tools/make_bigcity_scene.py <root> [n_gauss] [n_cams] [W] [H]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def city_gaussians(n, rng, extent=50.0):
    """Ground + building-shell gaussians with trained-scene statistics."""
    n_ground = int(n * 0.35)
    n_bld = n - n_ground

    gx = rng.uniform(-extent, extent, n_ground).astype(np.float32)
    gz = rng.uniform(-extent, extent, n_ground).astype(np.float32)
    g_xyz = np.stack([gx, np.zeros(n_ground, np.float32), gz], axis=1)

    n_boxes = 2500
    bc = np.stack(
        [
            rng.uniform(-extent * 0.95, extent * 0.95, n_boxes),
            np.zeros(n_boxes),
            rng.uniform(-extent * 0.95, extent * 0.95, n_boxes),
        ],
        axis=1,
    ).astype(np.float32)
    bsz = np.stack(
        [
            rng.uniform(1.0, 4.0, n_boxes),
            rng.uniform(2.0, 12.0, n_boxes),
            rng.uniform(1.0, 4.0, n_boxes),
        ],
        axis=1,
    ).astype(np.float32)
    which = rng.randint(0, n_boxes, n_bld)
    # points on box surfaces: pick a face, uniform on it
    face = rng.randint(0, 5, n_bld)  # 4 walls + roof
    u = rng.uniform(-1, 1, n_bld).astype(np.float32)
    v = rng.uniform(0, 1, n_bld).astype(np.float32)
    s = bsz[which]
    local = np.zeros((n_bld, 3), np.float32)
    walls = face < 4
    sgn = np.where(face % 2 == 0, 1.0, -1.0).astype(np.float32)
    xw = face < 2  # faces 0,1: +-x walls; 2,3: +-z walls
    local[walls & xw, 0] = (sgn * s[:, 0])[walls & xw]
    local[walls & xw, 2] = (u * s[:, 2])[walls & xw]
    local[walls & ~xw, 2] = (sgn * s[:, 2])[walls & ~xw]
    local[walls & ~xw, 0] = (u * s[:, 0])[walls & ~xw]
    local[walls, 1] = (v * s[:, 1])[walls]
    roof = ~walls
    local[roof, 0] = (u * s[:, 0])[roof]
    local[roof, 2] = (rng.uniform(-1, 1, n_bld).astype(np.float32) * s[:, 2])[
        roof
    ]
    local[roof, 1] = s[roof, 1]
    b_xyz = bc[which] + local

    xyz = np.concatenate([g_xyz, b_xyz]).astype(np.float32)
    # scales ~ local spacing; opacity bimodal (opaque surfaces + haze)
    spacing = extent * 2 / np.sqrt(n / 4.0)
    log_scale = (
        np.log(spacing) + 0.4 * rng.normal(size=(n, 3))
    ).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    opaque = rng.rand(n) < 0.7
    opacity = np.where(
        opaque, rng.uniform(1.5, 5.0, n), rng.uniform(-3.0, -0.5, n)
    ).astype(np.float32)
    sh = np.zeros((n, 48), np.float32)
    # per-building base colors, ground gray-green
    bld_col = rng.uniform(-0.8, 0.8, (n_boxes, 3)).astype(np.float32)
    sh[:n_ground, :3] = np.array([0.1, 0.2, 0.1]) + 0.1 * rng.normal(
        size=(n_ground, 3)
    )
    sh[n_ground:, :3] = bld_col[which] + 0.05 * rng.normal(size=(n_bld, 3))
    sh[:, 3:] = 0.02 * rng.normal(size=(n, 45)).astype(np.float32)
    return xyz, log_scale, quat, opacity, sh


def serpentine_cameras(n_cams, width, height, extent=50.0):
    from tools.make_flagship_scene import lookat_camera

    side = int(np.ceil(np.sqrt(n_cams)))
    cams = []
    uid = 1
    step = 2 * extent * 0.8 / side
    for r in range(side):
        cols = range(side) if r % 2 == 0 else range(side - 1, -1, -1)
        for c in cols:
            if uid > n_cams:
                break
            x = -extent * 0.8 + (c + 0.5) * step
            z = -extent * 0.8 + (r + 0.5) * step
            pos = np.array([x, 10.0, z])
            tgt = np.array([x + step * 0.8, 0.0, z + step * 0.4])
            cams.append(lookat_camera(uid, pos, tgt, width, height))
            uid += 1
    return cams


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bigcity/scene"
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000_000
    n_cams = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    width = int(sys.argv[4]) if len(sys.argv) > 4 else 640
    height = int(sys.argv[5]) if len(sys.argv) > 5 else 400
    seed = 11

    rng = np.random.RandomState(seed)
    t0 = time.time()
    xyz, log_scale, quat, opacity, sh = city_gaussians(n_gauss, rng)
    print(f"gaussians built in {time.time()-t0:.0f} s", flush=True)

    # model-schema PLY for --load_ply_path (written without instantiating a
    # GaussianState: at 25M+ rows the padded device state wouldn't be needed
    # host-side)
    from clm_gs_tpu.models.gaussians import PLY_PROPS

    ply_path = os.path.join(root, "init_model.ply")
    os.makedirs(root, exist_ok=True)
    if os.environ.get("BIGCITY_SKIP_PLY") != "1":
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n_gauss}\n"
            + "".join(f"property float {p}\n" for p in PLY_PROPS)
            + "end_header\n"
        )
        with open(ply_path, "wb") as f:
            f.write(header.encode("ascii"))
            chunk = 1 << 20
            for i in range(0, n_gauss, chunk):
                j = min(i + chunk, n_gauss)
                rest = (
                    sh[i:j, 3:]
                    .reshape(j - i, 15, 3)
                    .transpose(0, 2, 1)
                    .reshape(j - i, 45)
                )
                cols = np.concatenate(
                    [
                        xyz[i:j], np.zeros((j - i, 3), np.float32),
                        sh[i:j, 0:3], rest, opacity[i:j, None],
                        log_scale[i:j], quat[i:j],
                    ],
                    axis=1,
                ).astype("<f4")
                f.write(cols.tobytes())
        print(f"PLY written ({os.path.getsize(ply_path)/2**30:.2f} GB, "
              f"{time.time()-t0:.0f} s)", flush=True)

    if os.environ.get("BIGCITY_SKIP_RENDER") == "1":
        return

    # GT images on chip
    import jax.numpy as jnp
    from PIL import Image

    from clm_gs_tpu.data import colmap
    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models.gaussians import GaussianParams
    from clm_gs_tpu.strategies.base import render_one_cam

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
    cams = serpentine_cameras(n_cams, width, height)
    cb = stack_cameras(cams)
    bg = jnp.zeros(3, jnp.float32)
    isect_cap = int(os.environ.get("BIGCITY_ISECT", str(8 * 2**20)))
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    names = [f"img_{i:03d}.png" for i in range(n_cams)]
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
    colmap.write_cameras_binary(
        os.path.join(sparse, "cameras.bin"),
        {1: colmap.ColmapCamera(
            1, "PINHOLE", width, height,
            np.array([cams[0].K[0, 0], cams[0].K[1, 1],
                      width / 2, height / 2]))},
    )
    imgs = {}
    for i, cam in enumerate(cams):
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, colmap.rotmat2qvec(cam.R.T), cam.T.astype(np.float64), 1,
            names[i],
        )
    colmap.write_images_binary(os.path.join(sparse, "images.bin"), imgs)
    # tiny points3D (unused: init comes from --load_ply_path) to satisfy
    # the COLMAP reader
    sel = rng.choice(n_gauss, size=10000, replace=False)
    colmap.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"),
        xyz[sel].astype(np.float64),
        np.full((10000, 3), 128, np.uint8),
    )
    print(f"scene at {root}: {n_cams} cams {width}x{height}, "
          f"{n_gauss/1e6:.0f}M gaussians", flush=True)


if __name__ == "__main__":
    main()
