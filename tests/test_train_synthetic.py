"""End-to-end training on a tiny synthetic scene (the strategy-parity oracle
seed, SURVEY.md §4): render ground-truth images from a random Gaussian scene,
perturb the model, train, and require the loss to fall and PSNR to rise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clm_gs_tpu.data.cameras import stack_cameras
from clm_gs_tpu.models import gaussians as G
from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
from clm_gs_tpu.strategies import no_offload
from clm_gs_tpu.strategies.base import render_one_cam
from clm_gs_tpu.utils.general import psnr
from tests.utils3d import make_camera, random_gaussians

W, H = 64, 48
CAP = 128
ISECT_CAP = 8192
BG = jnp.zeros(3, jnp.float32)


def _scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    xyz, log_scales, quats, opacity_logits, sh = random_gaussians(n, rng)
    params = G.GaussianParams(
        xyz=jnp.asarray(np.pad(xyz, ((0, CAP - n), (0, 0)))),
        opacity=jnp.asarray(np.pad(opacity_logits, (0, CAP - n))),
        log_scale=jnp.asarray(np.pad(log_scales, ((0, CAP - n), (0, 0)))),
        quat=jnp.asarray(np.pad(quats, ((0, CAP - n), (0, 0)))),
        sh=jnp.asarray(np.pad(sh.reshape(n, 48), ((0, CAP - n), (0, 0)))),
    )
    alive = jnp.asarray(np.arange(CAP) < n)
    state = G.GaussianState(
        params=params, alive=alive, n_alive=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros(CAP), denom=jnp.zeros(CAP),
        max_radii2d=jnp.zeros(CAP),
    )
    cams = [make_camera(uid=i, width=W, height=H, angle=0.8 * i) for i in range(4)]
    cb = stack_cameras(cams)
    return state, cb


def _render_gts(state, cb):
    gts = []
    for i in range(cb.viewmats.shape[0]):
        out = render_one_cam(
            state.params, state.alive, cb.viewmats[i], cb.Ks[i],
            cb.camera_centers[i], 3, W, H, BG, ISECT_CAP,
        )
        gts.append(out.image)
    return jnp.stack(gts)


LRS = {
    "xyz": jnp.float32(2e-4), "opacity": jnp.float32(0.05),
    "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
    "sh": sh_column_lr(0.0025),
}


@pytest.mark.parametrize("sparse_adam", [False, True])
def test_loss_decreases(sparse_adam):
    state, cb = _scene()
    gts = _render_gts(state, cb)

    # perturb the model
    rng = jax.random.PRNGKey(1)
    p = state.params
    p = G.GaussianParams(
        xyz=p.xyz + 0.03 * jax.random.normal(rng, p.xyz.shape),
        opacity=p.opacity - 0.5,
        log_scale=p.log_scale + 0.2,
        quat=p.quat,
        sh=p.sh * 0.7,
    )
    state = G.GaussianState(
        params=p, alive=state.alive, n_alive=state.n_alive,
        xyz_grad_accum=state.xyz_grad_accum, denom=state.denom,
        max_radii2d=state.max_radii2d,
    )
    opt = init_adam(p)
    cfg = AdamConfig()

    losses = []
    for it in range(30):
        state, opt, out = no_offload.train_step(
            state, opt, cb, gts, 3, LRS, cfg, BG, W, H, ISECT_CAP,
            sparse_adam=sparse_adam,
        )
        losses.append(float(out.losses.mean()))
    assert losses[-1] < 0.7 * losses[0], f"loss did not drop: {losses[0]} -> {losses[-1]}"
    assert all(np.isfinite(losses))
    # densification stats accumulated
    assert float(state.denom.max()) > 0


def test_psnr_improves_and_stats_flow():
    state, cb = _scene(seed=3)
    gts = _render_gts(state, cb)
    p = state.params
    state = G.GaussianState(
        params=G.GaussianParams(
            p.xyz + 0.02, p.opacity, p.log_scale, p.quat, p.sh
        ),
        alive=state.alive, n_alive=state.n_alive,
        xyz_grad_accum=state.xyz_grad_accum, denom=state.denom,
        max_radii2d=state.max_radii2d,
    )
    opt = init_adam(state.params)

    def eval_psnr():
        vals = []
        for i in range(4):
            img, _ = no_offload.eval_one_cam(
                state, cb.viewmats[i], cb.Ks[i], cb.camtoworlds[i], 3, BG, W, H,
                ISECT_CAP,
            )
            vals.append(float(psnr(img, gts[i])))
        return np.mean(vals)

    before = eval_psnr()
    for _ in range(25):
        state, opt, out = no_offload.train_step(
            state, opt, cb, gts, 3, LRS, AdamConfig(), BG, W, H, ISECT_CAP
        )
    after = eval_psnr()
    assert after > before + 2.0, f"PSNR {before:.2f} -> {after:.2f}"
