"""Standalone trajectory/inference renderer.

Replacement for the reference's render_bigcity_images.py (:753-1017): load a
trained model (PLY or tensor checkpoint) under any strategy's memory placement,
generate a smooth camera path through the scene, render frames to PNG and
optionally an MP4.

Trajectory generation mirrors generate_convex_hull_trajectory_v2 (:149-268) in
spirit without the hardcoded BigCity waypoints: waypoints are placed on a
shrunk convex hull (or bounding ellipse) of the training-camera positions at a
blended height, connected by a closed Catmull-Rom spline, with look-at targets
toward the scene centroid.

CLI: python -m clm_gs_tpu.render_trajectory --load_ply_path model.ply
       --out_dir frames/ [--num_frames 300] [--width 1280 --height 720]
       [--source_path scene/  (for camera-derived trajectories)]
       [--mp4 out.mp4] [--clm_offload]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np


def catmull_rom_closed(points: np.ndarray, samples: int) -> np.ndarray:
    """Closed Catmull-Rom spline through (K, 3) waypoints -> (samples, 3)."""
    k = len(points)
    out = np.zeros((samples, 3), np.float64)
    for s in range(samples):
        t = s / samples * k
        i = int(math.floor(t)) % k
        f = t - math.floor(t)
        p0, p1, p2, p3 = (points[(i + j - 1) % k] for j in range(4))
        out[s] = 0.5 * (
            (2 * p1)
            + (-p0 + p2) * f
            + (2 * p0 - 5 * p1 + 4 * p2 - p3) * f * f
            + (-p0 + 3 * p1 - 3 * p2 + p3) * f * f * f
        )
    return out


def generate_orbit_trajectory(
    centers: np.ndarray, num_frames: int, shrink: float = 0.7,
    height_blend: float = 0.5, n_waypoints: int = 8,
) -> np.ndarray:
    """(num_frames, 3) camera positions around the scene derived from training
    camera centers (the convex-hull loop of render_bigcity_images.py:149-268)."""
    centroid = centers.mean(axis=0)
    try:
        from scipy.spatial import ConvexHull

        xy = centers[:, [0, 2]]
        hull = ConvexHull(xy)
        hull_pts = xy[hull.vertices]
    except Exception:
        # fallback: bounding ellipse
        ang = np.linspace(0, 2 * np.pi, n_waypoints, endpoint=False)
        r = np.ptp(centers[:, [0, 2]], axis=0) / 2
        hull_pts = np.stack(
            [centroid[0] + r[0] * np.cos(ang), centroid[2] + r[1] * np.sin(ang)], 1
        )
    # resample hull to n_waypoints, shrink toward centroid
    idx = np.linspace(0, len(hull_pts), n_waypoints, endpoint=False).astype(int)
    wp_xy = hull_pts[idx]
    wp_xy = centroid[[0, 2]] + shrink * (wp_xy - centroid[[0, 2]])
    h = np.quantile(centers[:, 1], height_blend)
    waypoints = np.stack(
        [wp_xy[:, 0], np.full(len(wp_xy), h), wp_xy[:, 1]], axis=1
    )
    return catmull_rom_closed(waypoints, num_frames)


def look_at_camera(pos, target, up=(0.0, -1.0, 0.0)):
    """viewmat (4,4) world->view, COLMAP convention (y down, z forward)."""
    pos = np.asarray(pos, np.float64)
    fwd = np.asarray(target, np.float64) - pos
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0, 0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world->view rotation
    vm = np.eye(4)
    vm[:3, :3] = R
    vm[:3, 3] = -R @ pos
    return vm.astype(np.float32)


def save_topdown_view(state, path, camera_centers=None, max_points=200_000,
                      seed=0):
    """Top-down point-cloud visualization with optional camera/trajectory
    overlay (render_bigcity_images.py:271-637 analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(state.params.xyz)[np.asarray(state.alive)]
    if len(pts) > max_points:
        pts = pts[np.random.RandomState(seed).choice(len(pts), max_points)]
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(pts[:, 0], pts[:, 2], s=0.2, c=pts[:, 1], cmap="viridis",
               alpha=0.5, linewidths=0)
    if camera_centers is not None:
        cc = np.asarray(camera_centers)
        ax.plot(cc[:, 0], cc[:, 2], "r.-", markersize=3, linewidth=0.5,
                label="trajectory")
        ax.legend()
    ax.set_aspect("equal")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser("clm_gs_tpu trajectory renderer")
    ap.add_argument(
        "--model_dir", default="",
        help="trained run dir: reads args.json and the newest point_cloud "
             "(the reference's get_combined_args/cfg_args merge)",
    )
    ap.add_argument("--load_ply_path", default="")
    ap.add_argument("--load_pt_path", default="")
    ap.add_argument("--source_path", "-s", default="")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--num_frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--fov_deg", type=float, default=60.0)
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--isect_cap", type=int, default=4 << 20)
    ap.add_argument("--mp4", default="")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument(
        "--topdown", default="",
        help="also write a top-down point-cloud + trajectory PNG here",
    )
    ap.add_argument("--no_offload", action="store_true")
    ap.add_argument("--naive_offload", action="store_true")
    ap.add_argument("--clm_offload", action="store_true")
    ap.add_argument("--white_background", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from clm_gs_tpu.data.cameras import intrinsics_from_fov
    from clm_gs_tpu.models import gaussians as G

    if args.model_dir:
        # merge the run's saved config (get_combined_args analogue,
        # arguments/__init__.py:281-310)
        import json as _json

        cfg_path = os.path.join(args.model_dir, "args.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                run_cfg = _json.load(f)
            args.source_path = args.source_path or run_cfg["model"]["source_path"]
            args.sh_degree = run_cfg["model"]["sh_degree"]
            if run_cfg["model"].get("white_background"):
                args.white_background = True
        pc_root = os.path.join(args.model_dir, "point_cloud")
        iters = sorted(
            (d for d in os.listdir(pc_root) if d.startswith("iteration_")),
            key=lambda d: int(d.split("_")[1]),
        )
        args.load_ply_path = os.path.join(pc_root, iters[-1], "point_cloud.ply")
        print(f"using {args.load_ply_path}", file=sys.stderr)

    # clm placement: SH loads into host memory and never lands on device
    # (BigCity-scale models OOM HBM otherwise; same path as Scene)
    host_sh = None
    if args.load_pt_path:
        if args.clm_offload:
            state, host_sh = G.load_tensors(args.load_pt_path, host_sh=True)
        else:
            state = G.load_tensors(args.load_pt_path)
    elif args.load_ply_path:
        if args.clm_offload:
            state, host_sh = G.load_ply(args.load_ply_path, host_sh=True)
        else:
            state = G.load_ply(args.load_ply_path)
    else:
        ap.error("need --model_dir, --load_ply_path or --load_pt_path")
    print(f"loaded {int(state.n_alive)} gaussians", file=sys.stderr)

    # trajectory from training cameras if a scene is given, else orbit the pcd
    if args.source_path:
        from clm_gs_tpu.config import Config
        from clm_gs_tpu.data import readers

        scene_type = readers.detect_scene_type(args.source_path)
        if scene_type == "city":
            info = readers.read_city_scene(args.source_path)
        elif scene_type == "blender":
            info = readers.read_blender_scene(args.source_path)
        else:
            info = readers.read_colmap_scene(args.source_path)
        centers = np.stack([c.camera_center for c in info.train_cameras])
    else:
        pts = np.asarray(state.params.xyz)[np.asarray(state.alive)]
        centers = pts[np.random.RandomState(0).choice(len(pts), min(4096, len(pts)))]
    positions = generate_orbit_trajectory(centers, args.num_frames)
    target = centers.mean(axis=0)

    if args.topdown:
        try:
            save_topdown_view(state, args.topdown, camera_centers=positions)
            print(f"wrote {args.topdown}", file=sys.stderr)
        except Exception as e:  # matplotlib optional
            print(f"topdown view unavailable: {e}", file=sys.stderr)

    fov = math.radians(args.fov_deg)
    fovy = 2 * math.atan(math.tan(fov / 2) * args.height / args.width)
    K = jnp.asarray(intrinsics_from_fov(fov, fovy, args.width, args.height))
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if args.white_background else [0.0, 0.0, 0.0], jnp.float32
    )

    # render with the clm-style compact path when requested (bounded HBM),
    # full-buffer render otherwise
    use_clm = args.clm_offload
    if use_clm:
        from clm_gs_tpu.config import Config
        from clm_gs_tpu.optim import AdamConfig
        from clm_gs_tpu.strategies import clm_offload

        if host_sh is not None:
            ctx = clm_offload.make_context_from_host(
                Config(), host_sh, AdamConfig()
            )
            state_r = state  # already carries the (1, 48) placeholder
        else:
            ctx = clm_offload.make_context(Config(), state, AdamConfig())
            state_r = clm_offload.strip_device_sh(state)
        render = lambda vm, c2w: clm_offload.eval_one_cam(
            (state_r, ctx), jnp.asarray(vm), K, jnp.asarray(c2w),
            args.sh_degree, bg, args.width, args.height, args.isect_cap,
        )[0]
    else:
        from clm_gs_tpu.strategies import no_offload

        render = lambda vm, c2w: no_offload.eval_one_cam(
            state, jnp.asarray(vm), K, jnp.asarray(c2w), args.sh_degree, bg,
            args.width, args.height, args.isect_cap,
        )[0]

    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image

    frames = []
    for i, pos in enumerate(positions):
        vm = look_at_camera(pos, target)
        c2w = np.linalg.inv(vm)
        img = np.asarray(jnp.clip(render(vm, c2w), 0, 1) * 255).astype(np.uint8)
        img = img.transpose(1, 2, 0)
        Image.fromarray(img).save(os.path.join(args.out_dir, f"frame_{i:05d}.png"))
        if args.mp4:
            frames.append(img)
        if i % 10 == 0:
            print(f"frame {i}/{len(positions)}", file=sys.stderr)

    if args.mp4:
        try:
            import imageio.v2 as imageio

            imageio.mimwrite(args.mp4, frames, fps=args.fps)
            print(f"wrote {args.mp4}", file=sys.stderr)
        except Exception as e:
            print(f"mp4 writing unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
