"""Gaussian model state: a fixed-capacity padded pytree.

Replaces the reference's per-strategy ``GaussianModel`` classes
(strategies/base_gaussian_model.py:32, strategies/*/gaussian_model.py) with a
single functional pytree. Parameter placement (HBM vs host memory) is decided
by the *strategies* layer, not baked into the model — the pytree is identical
across no_offload / naive_offload / clm_offload.

Data model matches the reference exactly (SURVEY.md §2.4): per Gaussian
  xyz(3), opacity(1, pre-sigmoid logit), log_scale(3), quat(4, unnormalized,
  [w,x,y,z]), sh(48) = [dc(3) ; rest(45)] row-concatenated, reshaped (16, 3)
  for evaluation (clm_offload/gaussian_model.py:95-107 layout).

TPU-first design decision: arrays are allocated at a *bucketed capacity* C
>= n_alive with an ``alive`` mask, so densification grows/shrinks without
changing traced shapes (recompiles happen only on capacity-bucket jumps —
SURVEY.md §7.2 hard-part #2/#5; the reference's prealloc'd pinned buffer,
clm_offload/gaussian_model.py:34-44, is the same idea for different reasons).
Dead rows carry zeros and are masked out of projection by ``alive``.

Init semantics (create_from_pcd, clm_offload/gaussian_model.py:46-92):
  opacity = inverse_sigmoid(0.1), scale = log(sqrt(mean sq dist to 3-NN)),
  quat = (1,0,0,0), sh_dc = RGB2SH(color), sh_rest = 0.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from clm_gs_tpu.ops.knn import knn_mean_sq_dist
from clm_gs_tpu.ops.sh import rgb_to_sh
from clm_gs_tpu.utils.general import inverse_sigmoid, next_capacity


@dataclass(frozen=True)
class GaussianParams:
    """The learnable parameters (a pure pytree of (C, ...) arrays)."""

    xyz: jnp.ndarray  # (C, 3)
    opacity: jnp.ndarray  # (C,) pre-sigmoid
    log_scale: jnp.ndarray  # (C, 3)
    quat: jnp.ndarray  # (C, 4) unnormalized [w, x, y, z]
    sh: jnp.ndarray  # (C, 48) [dc(3); rest(45)]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def astuple(self):
        return (self.xyz, self.opacity, self.log_scale, self.quat, self.sh)


jtu.register_dataclass(
    GaussianParams, data_fields=["xyz", "opacity", "log_scale", "quat", "sh"],
    meta_fields=[],
)


@dataclass(frozen=True)
class GaussianState:
    """Parameters + liveness + densification statistics."""

    params: GaussianParams
    alive: jnp.ndarray  # (C,) bool
    n_alive: jnp.ndarray  # () int32
    xyz_grad_accum: jnp.ndarray  # (C,) accumulated screen-space grad norms
    denom: jnp.ndarray  # (C,) visibility counts since last densify
    max_radii2d: jnp.ndarray  # (C,) tracked for parity (prune branch is a no-op
    # in the reference, base_gaussian_model.py:374-381)

    @property
    def capacity(self) -> int:
        return self.params.capacity


jtu.register_dataclass(
    GaussianState,
    data_fields=["params", "alive", "n_alive", "xyz_grad_accum", "denom", "max_radii2d"],
    meta_fields=[],
)


def activated(params: GaussianParams):
    """(opacity, scales) activations (base_gaussian_model.py:35-50). Rotation
    normalization happens inside build_rotation; sh reshape at eval."""
    return jax.nn.sigmoid(params.opacity), jnp.exp(params.log_scale)


def sh_coeffs(params: GaussianParams):
    return params.sh.reshape(params.capacity, 16, 3)


def empty_state(capacity: int) -> GaussianState:
    z = lambda *s: jnp.zeros(s, jnp.float32)
    params = GaussianParams(
        xyz=z(capacity, 3), opacity=z(capacity), log_scale=z(capacity, 3),
        quat=z(capacity, 4), sh=z(capacity, 48),
    )
    return GaussianState(
        params=params,
        alive=jnp.zeros((capacity,), bool),
        n_alive=jnp.zeros((), jnp.int32),
        xyz_grad_accum=z(capacity),
        denom=z(capacity),
        max_radii2d=z(capacity),
    )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: Optional[int] = None,
    downsample_ratio: float = 1.0,
    seed: int = 0,
    host_sh: bool = False,
):
    """Initialize from a point cloud (positions + RGB in [0,1]).

    Mirrors create_from_pcd (clm_offload/gaussian_model.py:46-92), including
    the optional random downsample (--initial_point_cloud_downsampled_ratio).

    host_sh=True (clm placement): the (capacity, 48) SH block NEVER touches
    the device — the state carries the (1, 48) placeholder and the call
    returns (state, sh_host numpy). The reference's clm model likewise loads
    SH straight into the pinned host buffer (clm_offload/gaussian_model.py:
    34-44); materializing it on device first OOMs HBM at BigCity scale.
    """
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    if downsample_ratio < 1.0:
        rng = np.random.RandomState(seed)
        keep = rng.rand(len(points)) < downsample_ratio
        points, colors = points[keep], colors[keep]
    n = len(points)
    if capacity is None:
        capacity = next_capacity(n)
    assert capacity >= n, (capacity, n)

    dist2 = np.asarray(knn_mean_sq_dist(jnp.asarray(points)))
    log_scale = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    sh = np.zeros((n, 48), np.float32)
    sh[:, 0:3] = np.asarray(rgb_to_sh(colors))
    quat = np.zeros((n, 4), np.float32)
    quat[:, 0] = 1.0
    opacity = np.full((n,), float(inverse_sigmoid(0.1)), np.float32)

    if host_sh:
        sh_np = np.zeros((capacity, 48), np.float32)
        sh_np[:n] = sh
        sh_leaf = jnp.zeros((1, 48), jnp.float32)
    else:
        sh_leaf = pad(sh)
    params = GaussianParams(
        xyz=pad(points), opacity=pad(opacity), log_scale=pad(log_scale),
        quat=pad(quat), sh=sh_leaf,
    )
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    state = GaussianState(
        params=params,
        alive=jnp.asarray(alive),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
    )
    return (state, sh_np) if host_sh else state


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Re-pad all arrays to a larger capacity (host-side, outside jit)."""
    old = state.capacity
    assert new_capacity >= old
    extra = new_capacity - old

    def pad(x):
        pads = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads)

    return GaussianState(
        params=GaussianParams(*[pad(x) for x in state.params.astuple()]),
        alive=pad(state.alive),
        n_alive=state.n_alive,
        xyz_grad_accum=pad(state.xyz_grad_accum),
        denom=pad(state.denom),
        max_radii2d=pad(state.max_radii2d),
    )


# ---------------------------------------------------------------------------
# PLY / tensor IO (schema parity with base_gaussian_model.py:165-187 and the
# 5-tensor .pt layout of clm_offload/gaussian_model.py:236-243)
# ---------------------------------------------------------------------------

PLY_PROPS = (
    ["x", "y", "z", "nx", "ny", "nz"]
    + [f"f_dc_{i}" for i in range(3)]
    + [f"f_rest_{i}" for i in range(45)]
    + ["opacity"]
    + [f"scale_{i}" for i in range(3)]
    + [f"rot_{i}" for i in range(4)]
)


def _compact(state: GaussianState):
    """Gather live rows to the front, as host numpy arrays."""
    alive = np.asarray(state.alive)
    idx = np.nonzero(alive)[0]
    p = state.params
    return {
        "xyz": np.asarray(p.xyz)[idx],
        "opacity": np.asarray(p.opacity)[idx],
        "log_scale": np.asarray(p.log_scale)[idx],
        "quat": np.asarray(p.quat)[idx],
        "sh": np.asarray(p.sh)[idx],
    }


def save_ply(state: GaussianState, path: str, chunk_rows: Optional[int] = None):
    """Binary-little-endian PLY with the reference's exact property schema.

    `chunk_rows` mirrors save_sub_plys (clm_offload/gaussian_model.py:292-361):
    when set, writes `<stem>_rk{i}_ws{n}.ply` chunks to bound peak host RAM.
    """
    d = _compact(state)
    n = len(d["xyz"])
    # PLY f_rest ordering is channel-major (features_rest.transpose(1,2) in the
    # reference): f_rest_{c*15+j} = sh[:, (16,3) row j+1, channel c].
    rest = d["sh"][:, 3:].reshape(n, 15, 3).transpose(0, 2, 1).reshape(n, 45)
    cols = np.concatenate(
        [
            d["xyz"], np.zeros((n, 3), np.float32), d["sh"][:, 0:3], rest,
            d["opacity"][:, None], d["log_scale"], d["quat"],
        ],
        axis=1,
    ).astype("<f4")

    def write_one(path, rows):
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(rows)}\n"
            + "".join(f"property float {p}\n" for p in PLY_PROPS)
            + "end_header\n"
        )
        with open(path, "wb") as f:
            f.write(header.encode("ascii"))
            f.write(rows.tobytes())

    if chunk_rows is None or n <= chunk_rows:
        write_one(path, cols)
    else:
        import math as _math

        ws = _math.ceil(n / chunk_rows)
        stem = path[:-4] if path.endswith(".ply") else path
        for i in range(ws):
            write_one(
                f"{stem}_rk{i}_ws{ws}.ply", cols[i * chunk_rows : (i + 1) * chunk_rows]
            )


def load_ply(path: str, capacity: Optional[int] = None, host_sh: bool = False):
    """host_sh=True: SH stays a host numpy buffer, the device gets the (1,48)
    placeholder; returns (state, sh_host) — see create_from_pcd."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n = None
    props = []
    for line in header:
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property float"):
            props.append(line.split()[-1])
    assert n is not None and props == PLY_PROPS, "unexpected PLY schema"
    cols = np.frombuffer(data[end:], dtype="<f4").reshape(n, len(props))
    xyz = cols[:, 0:3]
    dc = cols[:, 6:9]
    rest = cols[:, 9:54].reshape(n, 3, 15).transpose(0, 2, 1).reshape(n, 45)
    opacity = cols[:, 54]
    log_scale = cols[:, 55:58]
    quat = cols[:, 58:62]
    if capacity is None:
        capacity = next_capacity(n)

    def pad(x):
        out = np.zeros((capacity,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    if host_sh:
        sh_np = np.zeros((capacity, 48), np.float32)
        sh_np[:n, 0:3] = dc
        sh_np[:n, 3:] = rest
        sh_leaf = jnp.zeros((1, 48), jnp.float32)
    else:
        sh_leaf = pad(np.concatenate([dc, rest], axis=1))
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    state = GaussianState(
        params=GaussianParams(
            xyz=pad(xyz), opacity=pad(opacity), log_scale=pad(log_scale),
            quat=pad(quat), sh=sh_leaf,
        ),
        alive=jnp.asarray(alive),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
    )
    return (state, sh_np) if host_sh else state


def resize_rows(state: GaussianState, coeff: float) -> GaussianState:
    """--drop_duplicate_gaussians_coeff analogue (reference
    utils/general_utils.py:417-452, applied on checkpoint load at :472-475):
    keep the first int(n*coeff) alive rows modulo n — truncates when
    coeff < 1, tiles (duplicates) when > 1. Densification stats reset; the
    caller resets the optimizer like the reference's ``opt_dict = None``.
    Requires a full (non-SH-stripped) state."""
    assert state.params.sh.shape[0] == state.capacity, (
        "resize_rows needs a full checkpoint (SH on device); "
        "clm mid-run checkpoints strip SH"
    )
    d = _compact(state)
    n = d["xyz"].shape[0]
    keep = np.arange(int(n * coeff), dtype=np.int64) % max(n, 1)
    m = len(keep)
    capacity = next_capacity(m)

    def pad(x):
        out = np.zeros((capacity,) + x.shape[1:], np.float32)
        out[:m] = x[keep]
        return jnp.asarray(out)

    alive = np.zeros(capacity, bool)
    alive[:m] = True
    return GaussianState(
        params=GaussianParams(
            xyz=pad(d["xyz"]), opacity=pad(d["opacity"]),
            log_scale=pad(d["log_scale"]), quat=pad(d["quat"]), sh=pad(d["sh"]),
        ),
        alive=jnp.asarray(alive),
        n_alive=jnp.asarray(m, jnp.int32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
    )


def save_tensors(state: GaussianState, path: str):
    """.npz analogue of the reference's 5-tensor .pt checkpoint
    (clm_offload/gaussian_model.py:236-243: xyz/opacity/scaling/rotation/
    parameters)."""
    d = _compact(state)
    np.savez(
        path, xyz=d["xyz"], opacity=d["opacity"], scaling=d["log_scale"],
        rotation=d["quat"], parameters=d["sh"],
    )


def load_tensors(path: str, capacity: Optional[int] = None, host_sh: bool = False):
    """host_sh=True: returns (state, sh_host) with SH never on device — see
    create_from_pcd."""
    z = np.load(path)
    n = len(z["xyz"])
    if capacity is None:
        capacity = next_capacity(n)

    def pad(x):
        out = np.zeros((capacity,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    if host_sh:
        sh_np = np.zeros((capacity, 48), np.float32)
        sh_np[:n] = z["parameters"]
        sh_leaf = jnp.zeros((1, 48), jnp.float32)
    else:
        sh_leaf = pad(z["parameters"])
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    state = GaussianState(
        params=GaussianParams(
            xyz=pad(z["xyz"]), opacity=pad(z["opacity"].reshape(n)),
            log_scale=pad(z["scaling"]), quat=pad(z["rotation"]),
            sh=sh_leaf,
        ),
        alive=jnp.asarray(alive),
        n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
    )
    return (state, sh_np) if host_sh else state
