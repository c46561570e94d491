"""Worker for the multi-host CI harness (tests/test_multihost.py).

Runs ONE sharded train step on the tiny graft scene over a 2 x 4
(data x gauss) mesh and prints the per-camera losses. Invoked either as a
single 8-device process (n_procs=1) or as one rank of a 2-process x
4-device-each jax.distributed job (Gloo CPU collectives) — the losses must
match, proving the sharded step is process-count-agnostic.

Usage: python tools/multihost_worker.py <process_id> <n_procs> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    n_total = 8
    jax.config.update("jax_num_cpu_devices", n_total // nproc)
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    import numpy as np

    from __graft_entry__ import _tiny_scene
    from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
    from clm_gs_tpu.parallel.mesh import make_mesh, data_sharding, shard_state
    from clm_gs_tpu.parallel.multihost import (
        fully_replicated_host_value, put_global,
    )
    from clm_gs_tpu.parallel.shard import make_sharded_train_step
    import jax.numpy as jnp

    assert len(jax.devices()) == n_total, (len(jax.devices()), n_total)
    mesh = make_mesh("2x4")
    bsz = 4
    state, cb, width, height = _tiny_scene(
        n=128, cap=256, width=32, height=32, n_cams=bsz
    )
    state = shard_state(state, mesh)
    opt = init_adam(state.params)
    dsh = data_sharding(mesh)
    gts = put_global(np.zeros((bsz, 3, height, width), np.float32), dsh)
    cb = jax.tree.map(lambda x: put_global(np.asarray(x), dsh), cb)
    step = make_sharded_train_step(
        mesh, width, height, isect_cap=2048, gather_cap=256
    )
    lrs = {
        "xyz": jnp.float32(1e-4), "opacity": jnp.float32(0.05),
        "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
        "sh": sh_column_lr(0.0025),
    }
    new_state, new_opt, out = step(
        state, opt, cb, gts, 3, lrs, AdamConfig(), jnp.zeros(3, jnp.float32)
    )
    losses = fully_replicated_host_value(out.losses)
    print(
        f"MHLOSSES {pid} " + " ".join(f"{v:.8f}" for v in losses.tolist()),
        flush=True,
    )

    if len(sys.argv) > 4 and sys.argv[4] == "densify":
        # Multi-process densification + capacity growth (PARITY known-gap):
        # count -> grow (jitted pads) -> re-shard -> densify_and_prune ->
        # another sharded step. Every process takes the same decisions (the
        # count is fully replicated), so the path is process-count-agnostic.
        from functools import partial

        from clm_gs_tpu.models import densify as Dn
        from clm_gs_tpu.models import gaussians as G
        from clm_gs_tpu.parallel.mesh import shard_capacity_tree
        from clm_gs_tpu.train import _grow_opt

        st = new_state
        n_new = int(fully_replicated_host_value(
            jax.jit(Dn.count_densify)(st, 1e-9, 0.01, jnp.float32(10.0))
        ))
        new_cap = 512
        st = jax.jit(G.grow_capacity, static_argnums=1)(st, new_cap)
        opt2 = jax.jit(_grow_opt, static_argnums=1)(new_opt, new_cap)
        st = shard_capacity_tree(st, mesh, new_cap)
        opt2 = shard_capacity_tree(opt2, mesh, new_cap)
        st, opt2, info = Dn.densify_and_prune(
            st, opt2, jax.random.PRNGKey(7), 1e-9, 0.005,
            jnp.float32(10.0), 0.01, jnp.asarray(False),
        )
        st = shard_capacity_tree(st, mesh, new_cap)
        opt2 = shard_capacity_tree(opt2, mesh, new_cap)
        step2 = make_sharded_train_step(
            mesh, width, height, isect_cap=4096, gather_cap=512
        )
        _, _, out2 = step2(
            st, opt2, cb, gts, 3, lrs, AdamConfig(), jnp.zeros(3, jnp.float32)
        )
        l2 = fully_replicated_host_value(out2.losses)
        n_alive = int(fully_replicated_host_value(info.n_alive))
        print(
            f"MHDENSIFY {pid} {n_new} {n_alive} "
            + " ".join(f"{v:.8f}" for v in l2.tolist()),
            flush=True,
        )


if __name__ == "__main__":
    main()
