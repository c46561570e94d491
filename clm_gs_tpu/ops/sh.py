"""Real spherical harmonics evaluation (degrees 0..3) for Gaussian colors.

Replaces gsplat's ``spherical_harmonics`` CUDA kernel and the reference's
``utils/sh_utils.py`` polynomials (sh_utils.py:57-118). The SH basis is a pure
function of the (normalized) view direction, so color = basis @ coeffs is a
batched (16,)x(16,3) contraction that XLA vectorizes on the VPU; there is no
need for a hand-written kernel here.

Conventions (must match the reference bit-for-intent, SURVEY.md §2.4):
  - coefficient layout per Gaussian: (16, 3) = [DC, 15 rest], row-major in the
    flat (48,) storage: [dc_r, dc_g, dc_b, rest_0_r, ...] i.e. reshape (16,3).
  - direction = gaussian_center - camera_center, normalized here (gsplat
    normalizes internally as well).
  - active degree masks basis entries >= (deg+1)^2 (traced-friendly: no
    recompile when ramping SH degree every 1000 iters, train.py:253).
  - final color = clamp(sh + 0.5, min=0) applied by the caller
    (base_engine.py:164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def rgb_to_sh(rgb):
    """RGB in [0,1] -> DC coefficient (sh_utils.py:121-123)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    return sh * C0 + 0.5


def sh_basis(dirs):
    """(..., 3) unnormalized directions -> (..., 16) SH basis values (deg 3)."""
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            C0 * one,
            -C1 * y,
            C1 * z,
            -C1 * x,
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )


def degree_mask(active_degree, dtype=jnp.float32):
    """(16,) mask of basis entries enabled at `active_degree` (0..3). Traceable."""
    idx = jnp.arange(16)
    n_active = (jnp.asarray(active_degree) + 1) ** 2
    return (idx < n_active).astype(dtype)


def spherical_harmonics(active_degree, dirs, coeffs):
    """Evaluate SH color.

    Args:
      active_degree: int or traced scalar in [0, 3].
      dirs: (N, 3) unnormalized view directions (mean - campos).
      coeffs: (N, 16, 3) SH coefficients.

    Returns:
      (N, 3) raw SH colors (caller adds 0.5 and clamps).
    """
    basis = sh_basis(dirs) * degree_mask(active_degree, dirs.dtype)  # (N, 16)
    return jnp.einsum("nk,nkc->nc", basis, coeffs)


def spherical_harmonics_vjp_coeffs(active_degree, dirs, v_colors):
    """Hand-derived d(color)/d(coeffs) contraction: outer(basis, v_colors).

    Used by the clm_offload engine to write SH-coefficient grads straight into
    the streaming grad buffer without autograd retaining a (N,48) allocation
    (mirrors clm_kernels.spherical_harmonics_bwd_inplace,
    clm_offload/engine.py:709-716). Direction grads are obtained separately via
    jax.vjp of the basis when needed.
    """
    basis = sh_basis(dirs) * degree_mask(active_degree, dirs.dtype)
    return basis[..., None] * v_colors[..., None, :]  # (N, 16, 3)


def sh_color_flat(basis, sh_flat):
    """Contract a masked (N, 16) basis with the FLAT (N, 48) coefficient table
    without reshaping it to (N, 16, 3): color_c = sum_k basis_k * sh[:, 3k+c].

    Rationale: the einsum over a reshaped (N, 16, 3) view makes XLA:TPU
    materialize the table in a {0,2,1} layout (an extra ~380 MB of HBM
    traffic per camera at 1M Gaussians — xplane trace: reshape.2472 +
    copy-start.3). Chip A/B (bench scene, 2026-08-20) measured this variant
    a NET LOSS anyway: 9.04 vs 9.69 Mpix/s — the three strided lane slices
    (stride-3 masks on a 48-lane row) cost more VPU select/compress work
    than the relayout's bandwidth. Kept behind CLMGS_SH_FLAT=1 (default
    OFF) for other hardware generations.
    """
    return jnp.stack(
        [jnp.sum(basis * sh_flat[:, c::3], axis=-1) for c in range(3)],
        axis=-1,
    )


def eval_color(active_degree, means, campos, coeffs):
    """Full color path: dirs -> SH -> +0.5 -> clamp_min(0) (base_engine.py:161-164)."""
    dirs = means - campos[None, :]
    rgb = spherical_harmonics(active_degree, dirs, coeffs)
    return jnp.maximum(rgb + 0.5, 0.0)
