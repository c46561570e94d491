"""pinned_host SH transport (utils/hostmem): probe gating + numerical parity.

The CPU backend rejects memory-space-annotated programs, so `probe()` must
return False here and the clm strategy must silently keep the numpy
fallback. The transport's jit programs themselves are validated with
kind="device" — the identical code path with the host-space annotations
dropped — against the native numpy gather they replace."""

import numpy as np
import pytest

from clm_gs_tpu.utils import hostmem, native


def test_probe_is_safe_and_gates_cpu():
    # must not raise; CPU backend rejects host-space programs
    assert hostmem.probe() in (False, True)
    if not hostmem.probe():
        # the strategy-level gate: --pinned_host on an unsupporting backend
        # silently keeps the fallback
        from clm_gs_tpu.config import Config, init_config
        from clm_gs_tpu.optim import AdamConfig
        from clm_gs_tpu.strategies import clm_offload
        from tests.test_strategies import _perturbed

        state, _, _ = _perturbed()
        cfg = Config()
        cfg.aux.clm_offload = True
        cfg.tpu.pinned_host = True
        init_config(cfg)
        ctx = clm_offload.make_context(cfg, state, AdamConfig())
        assert ctx.pinned is None


def test_table_fetch_matches_native_gather():
    rng = np.random.RandomState(0)
    buf = rng.rand(64, 48).astype(np.float32)
    t = hostmem.PinnedShTable(buf, kind="device")
    idx = np.array([0, 5, 5, 63, 17], np.int32)
    got = np.asarray(t.fetch(idx))
    np.testing.assert_array_equal(got, native.gather_rows(buf, idx))


def test_table_update_rows_then_fetch():
    rng = np.random.RandomState(1)
    buf = rng.rand(32, 48).astype(np.float32)
    t = hostmem.PinnedShTable(buf, kind="device")
    rows = np.array([3, 7, 31], np.int32)
    buf[rows] += 1.0  # host Adam writes the canonical numpy buffer
    t.update_rows(rows, buf[rows])
    got = np.asarray(t.fetch(np.arange(32, dtype=np.int32)))
    np.testing.assert_array_equal(got, buf)


def test_table_refresh():
    buf = np.zeros((16, 48), np.float32)
    t = hostmem.PinnedShTable(buf, kind="device")
    buf[:] = 2.5
    t.refresh(buf)
    got = np.asarray(t.fetch(np.arange(16, dtype=np.int32)))
    np.testing.assert_array_equal(got, buf)


def test_clm_batch_with_forced_device_kind_table():
    """Run a clm training batch with the transport forcibly enabled (device
    kind stands in for pinned_host on this backend): losses and final params
    must match the numpy-fallback path exactly."""
    from clm_gs_tpu.optim import AdamConfig, init_adam
    from clm_gs_tpu.strategies import clm_offload
    from tests.test_strategies import _mk_cfg, _perturbed
    from tests.test_train_synthetic import BG, H, ISECT_CAP, LRS, W

    def run(enable):
        # fresh state per run: the step's _adam_tail donates params/opt
        state0, cb, gts = _perturbed(seed=3)
        cfg = _mk_cfg("clm_offload")
        ctx = clm_offload.make_context(cfg, state0, AdamConfig())
        if enable:
            ctx.pinned = hostmem.PinnedShTable(ctx.sh_host, kind="device")
        state = clm_offload.strip_device_sh(state0)
        opt = init_adam(state.params)
        losses = []
        for _ in range(3):
            state, opt, ctx, out = clm_offload.train_one_batch(
                state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
                ISECT_CAP, cfg,
            )
            losses.append(np.asarray(out.losses))
        return clm_offload.materialize(state, ctx), np.array(losses)

    s_np, l_np = run(False)
    s_ph, l_ph = run(True)
    np.testing.assert_array_equal(l_np, l_ph)
    for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_np.params, name)),
            np.asarray(getattr(s_ph.params, name)),
            err_msg=name,
        )


def test_grad_buffer_offload_matches_native_scatter_add():
    """D2H direction (device-kind path): PinnedGradBuffer.offload must equal
    the numpy-fallback native.scatter_add_rows accumulate, including
    duplicate target rows and multi-camera accumulation."""
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    ref = np.zeros((64, 48), np.float32)
    buf = hostmem.PinnedGradBuffer((64, 48), kind="device")
    for _ in range(3):  # three cameras' drains
        g = rng.rand(8, 48).astype(np.float32)
        idx = rng.randint(0, 64, size=5).astype(np.int32)
        native.scatter_add_rows(ref, g[:5], idx, accumulate=True)
        buf.offload(jnp.asarray(g), idx)
    np.testing.assert_allclose(buf.to_numpy(), ref, rtol=1e-6)


def test_grad_buffer_reset_rows():
    buf = hostmem.PinnedGradBuffer((16, 48), kind="device")
    import jax.numpy as jnp

    buf.offload(jnp.ones((4, 48), jnp.float32), np.array([1, 2], np.int32))
    buf.reset_rows(np.array([1], np.int32))
    out = buf.to_numpy()
    assert out[1].sum() == 0.0 and out[2].sum() == 48.0
