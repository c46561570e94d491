"""Math helpers and schedules.

Semantics match the reference's ``utils/general_utils.py`` (inverse_sigmoid :145,
build_rotation :311, build_scaling_rotation :337, get_expon_lr_func :259-292,
check_update_at_this_iter :130-142) but are pure-functional JAX.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def build_rotation(q):
    """Unnormalized quaternion (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def build_scaling_rotation(s, q):
    """L = R(q) @ diag(s); covariance = L @ L^T."""
    R = build_rotation(q)
    return R * s[..., None, :]


def quat_normalize(q):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def get_expon_lr_func(
    lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000
):
    """Exponential log-linear LR schedule with optional sine-delay warmup.

    Mirrors the reference schedule (general_utils.py:259-292). Returns a function
    of the step that is safe to call with either python ints or traced values.
    """

    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(max(lr_init, 1e-30)) * (1 - t) + jnp.log(max(lr_final, 1e-30)) * t
        )
        out = delay_rate * log_lerp
        # Reference returns 0.0 when step < 0 or lr params are degenerate.
        zero = (step < 0) | (lr_init == 0.0 and lr_final == 0.0)
        return jnp.where(zero, 0.0, out)

    return helper


def check_update_at_this_iter(iteration, bsz, interval, offset=0):
    """Does an interval boundary (k*interval + offset) fall inside [iteration, iteration+bsz)?

    Reference: general_utils.py:130-142.
    """
    left = iteration - offset
    right = iteration + bsz - offset
    idx_left = math.ceil(left / interval)
    idx_right = math.ceil(right / interval)
    return idx_left < idx_right


def strip_symmetric(cov):
    """(...,3,3) symmetric -> (...,6) [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_capacity(n: int, granule: int = 65536, headroom: float = 1.25) -> int:
    """Bucketed capacity growth: pick the padded capacity for n live Gaussians.

    Capacities only take values on a coarse lattice so that densification causes
    at most O(log) recompiles over a whole training run.
    """
    want = max(int(n * headroom), granule)
    # round to the nearest power-of-two-ish lattice: {1, 1.5} * 2^k granules
    k = max(0, math.ceil(math.log2(max(1.0, want / granule))))
    for cand_mult in (2 ** (k - 1) * 1.5, 2**k, 2**k * 1.5):
        cap = int(granule * cand_mult)
        if cap >= want:
            return round_up(cap, granule)
    return round_up(int(granule * 2 ** (k + 1)), granule)


def psnr(img, gt):
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0) - 10.0 * jnp.log10(mse)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def memory_report(check_device: bool = False, check_host: bool = False) -> str:
    """--check_gpu_memory / --check_cpu_memory analogue (reference
    utils/general_utils.py:149-241 memory reporters printed at log
    intervals). Device peak from XLA memory_stats (None on backends that
    don't report, e.g. this sandbox's axon plugin); host peak RSS from
    getrusage."""
    parts = []
    if check_device:
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            parts.append(
                f"device peak {peak / 2**30:.2f} GB" if peak
                else "device peak n/a"
            )
        except Exception:
            parts.append("device peak n/a")
        try:
            # live device array bytes: works even where memory_stats is None
            # (this sandbox's axon plugin) — the strategy-resident state
            live = sum(
                x.nbytes for x in jax.live_arrays()
                if getattr(x, "is_deleted", lambda: False)() is False
            )
            parts.append(f"device live {live / 2**30:.2f} GB")
        except Exception:
            pass
    if check_host:
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
        parts.append(f"host peak rss {rss:.2f} GB")
    return ", ".join(parts)


def drop_duplicate_gaussians(xyz: np.ndarray, coeff: float = 1.0):
    """Debug helper (general_utils.py:417): indices of unique gaussian
    positions after rounding by `coeff` (duplicates from densification)."""
    key = np.round(np.asarray(xyz) * coeff, 6)
    _, idx = np.unique(key, axis=0, return_index=True)
    return np.sort(idx)
