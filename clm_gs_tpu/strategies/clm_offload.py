"""clm_offload strategy: hybrid placement + visibility-driven SH streaming.

TPU analogue of strategies/clm_offload/engine.py (the paper's design,
SURVEY.md §3.3). Placement: the selection-critical attributes (xyz, opacity,
log_scale, quat — 11 floats) and their Adam moments stay in device HBM; the
bulky SH coefficients (48 floats) and their Adam moments live in host DRAM
(the device-side pytree carries a (1, 48) placeholder). Per batch:

  1. [device]  visibility filters for all bsz cameras from the HBM attributes
               only — no host traffic (calculate_filters, engine.py:369-386),
  2. [host]    TSP over cameras on 1/32-sampled visibility bitmaps to maximize
               consecutive-camera overlap (order_calculation :135-298; C++
               fast_tsp via utils.native), optional rotate-min-sparsity-last,
  3. [host]    last-use ("finish set") computation per Gaussian so host Adam
               can start as soon as a row's final gradient has landed
               (extract_ffs analogue :197-262),
  4. per ordered camera: gather the visible SH rows from the host buffer
     (native gather — the send_shs2gpu analogue's host half), async H2D of the
     compact (v_cap, 48) working set, jitted fwd/bwd micro-step over the
     compact visible set, D2H of the compact SH grads, scatter-add into the
     host grad buffer (send_shs2cpu analogue), then submit the finished rows
     to the background host-Adam worker (cpuadam_thread :301-335; the
     signal-tensor/threadfence protocol becomes a ThreadPoolExecutor queue —
     ordering is guaranteed by submission order on one worker thread),
  5. [device]  Adam for the 4 HBM groups (grad/bsz; engine.py:869-882),
  6. join the host worker (:898).

Retention delta-transfers (H/D/G classification, engine.py:568-636): between
consecutive cameras in the TSP order, the working set is advanced in place —
retained rows (D) move device-side to their new positions, only newly-visible
rows (H) are fetched from the host, and only dropped rows' accumulated
gradients (G) are offloaded; the final microbatch flushes its whole buffer
(engine.py:815-822). Disable with --no-retention to fall back to full
per-camera re-gather (same math, more traffic).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field, replace
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState
from clm_gs_tpu.optim import AdamConfig, adam_step
from clm_gs_tpu.strategies import offload_common as oc
from clm_gs_tpu.strategies.no_offload import StepOut
from clm_gs_tpu.utils import native
from clm_gs_tpu.utils import timer
from clm_gs_tpu.utils.general import round_up

_SYNC_EVERY = int(os.environ.get("CLMGS_CLM_SYNC_EVERY", "0"))

SH_COLS = 48
_NULL_TIMER = timer.Timer(enabled=False)


@dataclass
class ClmContext:
    sh_host: np.ndarray  # (C, 48) canonical SH parameters (host DRAM)
    sh_grad_host: np.ndarray  # (C, 48) streaming gradient buffer
    adam: native.HostAdam
    v_cap: int
    executor: ThreadPoolExecutor = field(
        default_factory=lambda: ThreadPoolExecutor(max_workers=1)
    )
    # overlap meter accumulators (reference trailing-overhead meter,
    # engine.py:888-917): trailing_s = device-idle wait for the host side per
    # batch. Scatter (main thread) and Adam (worker thread) busy times live in
    # SEPARATE fields — a shared float with += from both threads is a
    # read-modify-write race that silently drops increments.
    trailing_s: float = 0.0
    scatter_work_s: float = 0.0
    adam_work_s: float = 0.0
    n_batches: int = 0
    # host<->device traffic accounting (buffer bytes actually moved, i.e.
    # bucketed transfer sizes, not just valid prefixes): feeds bench.py's
    # interconnect-projected throughput so the record is comparable to the
    # reference's PCIe4 wall-clocks even where the sandbox tunnel is slow
    h2d_bytes: float = 0.0
    d2h_bytes: float = 0.0
    # optional pinned_host transport (utils/hostmem.PinnedShTable): a
    # host-memory-space mirror of sh_host serving the per-camera SH fetches
    # via a compiled host-DMA gather (--pinned_host + backend support)
    pinned: object = None

    @property
    def host_work_s(self) -> float:
        return self.scatter_work_s + self.adam_work_s


def _maybe_pinned(cfg, sh_host):
    """PinnedShTable when --pinned_host is set AND the backend compiles
    host-space programs; None otherwise (numpy + device_put fallback)."""
    if not getattr(cfg.tpu, "pinned_host", False):
        return None
    from clm_gs_tpu.utils import hostmem

    if not hostmem.probe():
        return None
    return hostmem.PinnedShTable(sh_host)


def make_context_empty(cfg, capacity: int, adam_cfg: AdamConfig) -> ClmContext:
    """Zero-filled context (buffers restored afterwards via restore_extra)."""
    sh_host = np.zeros((capacity, SH_COLS), np.float32)
    return ClmContext(
        sh_host=sh_host,
        sh_grad_host=np.zeros((capacity, SH_COLS), np.float32),
        adam=native.HostAdam(
            capacity, SH_COLS, np.zeros(SH_COLS, np.float32),
            betas=adam_cfg.betas, eps=adam_cfg.eps,
        ),
        v_cap=max(round_up(min(capacity, 1 << 16), 1 << 12), 4096),
        pinned=_maybe_pinned(cfg, sh_host),
    )


def make_context(cfg, state: GaussianState, adam_cfg: AdamConfig) -> ClmContext:
    C = state.capacity
    sh_host = np.asarray(state.params.sh, np.float32).copy()
    assert sh_host.shape == (C, SH_COLS), (
        "state is already SH-stripped; use make_context_empty + restore_extra"
    )
    return ClmContext(
        sh_host=sh_host,
        sh_grad_host=np.zeros((C, SH_COLS), np.float32),
        adam=native.HostAdam(
            C, SH_COLS, np.zeros(SH_COLS, np.float32),
            betas=adam_cfg.betas, eps=adam_cfg.eps,
        ),
        v_cap=max(round_up(min(C, 1 << 16), 1 << 12), 4096),
        pinned=_maybe_pinned(cfg, sh_host),
    )


def make_context_from_host(cfg, sh_host: np.ndarray, adam_cfg: AdamConfig) -> ClmContext:
    """Context from a host-resident SH buffer (Scene loaded with host_sh=True:
    the (C, 48) block never touched the device — required at BigCity scale
    where materializing SH in HBM OOMs; the reference loads PLY/.pt straight
    into its pinned buffer, clm_offload/gaussian_model.py:236-290)."""
    sh_host = np.ascontiguousarray(sh_host, np.float32)
    C = len(sh_host)
    return ClmContext(
        sh_host=sh_host,
        sh_grad_host=np.zeros((C, SH_COLS), np.float32),
        adam=native.HostAdam(
            C, SH_COLS, np.zeros(SH_COLS, np.float32),
            betas=adam_cfg.betas, eps=adam_cfg.eps,
        ),
        v_cap=max(round_up(min(C, 1 << 16), 1 << 12), 4096),
        pinned=_maybe_pinned(cfg, sh_host),
    )


def materialize_host(state: GaussianState, ctx: ClmContext) -> GaussianState:
    """State whose SH leaf is the host numpy buffer itself (no device copy):
    for PLY/tensor export paths, which only np.asarray the leaves. Use
    `materialize` when a device-resident SH is genuinely needed."""
    return replace(state, params=replace(state.params, sh=ctx.sh_host))


def strip_device_sh(state: GaussianState) -> GaussianState:
    """Replace the device SH buffer with a (1, 48) placeholder — HBM holds
    only the 11 selection-critical floats per Gaussian (the paper's core
    memory saving, clm_offload/gaussian_model.py:89-104)."""
    return replace(
        state,
        params=replace(state.params, sh=jnp.zeros((1, SH_COLS), jnp.float32)),
    )


def materialize(state: GaussianState, ctx: ClmContext) -> GaussianState:
    """Full state with SH restored from the host buffer (for PLY export)."""
    return replace(state, params=replace(state.params, sh=jnp.asarray(ctx.sh_host)))


def grow_context(ctx: ClmContext, new_cap: int, cfg) -> ClmContext:
    for name in ("sh_host", "sh_grad_host"):
        old = getattr(ctx, name)
        new = np.zeros((new_cap, SH_COLS), np.float32)
        new[: len(old)] = old
        setattr(ctx, name, new)
    ctx.adam.grow(new_cap)
    if ctx.pinned is not None:
        from clm_gs_tpu.utils.hostmem import PinnedShTable

        ctx.pinned = PinnedShTable(ctx.sh_host, kind=ctx.pinned.kind)
    return ctx


def _order_and_finish_sets(idx_np, counts_np, dist, alive_np, reorder_min_last,
                           n_chains: int = 1):
    """Camera order + per-step finish sets (order_calculation,
    engine.py:135-298).

    n_chains > 1 (clm x data-parallel mesh): the TSP tour splits into
    n_chains CONTIGUOUS segments processed in lockstep — step s runs the
    s-th camera of every segment at once. Retention stays within a segment
    (tour adjacency preserved); finish sets bucket by STEP, since a row may
    finish only after every chain's step-s gradients have landed."""
    B = len(counts_np)
    order = native.find_tour(dist)
    if reorder_min_last and B > 1:
        # rotate so the sparsest camera is last (engine.py:181-190)
        k = int(np.argmin(counts_np[order]))
        order = np.concatenate([order[k + 1 :], order[: k + 1]])
    C = len(alive_np)
    S = B // n_chains
    # int16 keeps this 2 bytes/row: at C=100M the array is 200 MB, and the
    # scattered writes + the two full scans below are memory-bound
    last_use = np.full(C, -1, np.int16)
    # stamp in STEP-major order so ascending overwrites leave max(step)
    for s in range(S):
        for d in range(n_chains):
            cam = order[d * S + s]
            v = idx_np[cam][: counts_np[cam]]
            if not native.stamp_rows(last_use, v, s):
                last_use[v] = s
    # one visible-row scan + a union-sized stable argsort-split instead of a
    # full-capacity nonzero scan per camera: B scans over C rows cost 35 s
    # per batch at C=100M, bsz=64 (measured, tools/stress_host_100m.py);
    # this form is ~2 s. Rows within each finish set stay ascending (vis is
    # ascending and the sort is stable), matching the previous output.
    vis = native.nonzero_stamp(last_use, None, 0)
    if vis is None:
        vis = np.nonzero(last_use >= 0)[0]
    lu = last_use[vis]
    cs = native.counting_sort_perm(lu, S)
    if cs is not None:
        by_pos, bucket_counts = cs
        bounds = np.cumsum(bucket_counts)[:-1]
    else:
        by_pos = np.argsort(lu, kind="stable")
        bounds = np.cumsum(np.bincount(lu, minlength=S))[:-1]
    vs = vis[by_pos]
    finish_sets = (
        list(np.split(vs, bounds)) if vs.dtype == np.int32
        else [p.astype(np.int32) for p in np.split(vs, bounds)]
    )
    never_raw = native.nonzero_stamp(last_use, alive_np, 1)
    if never_raw is None:
        never_raw = np.nonzero((last_use == -1) & alive_np)[0]
    never = np.ascontiguousarray(never_raw, np.int32)
    return order, finish_sets, never


@partial(jax.jit, donate_argnums=(0, 1))
def _advance_ws_packed(sh_prev, grad_prev, h_rows, idxv):
    """Working-set advance as PURE GATHERS with host-inverted index maps.

    The scatter formulation (zeros.at[pn].set(sh_prev[pd])) lowers on XLA:TPU
    to a near-serial per-element scatter — chip-measured ~140 ms per
    (900k, 48) buffer, making the advance HALF the clm batch's device time.
    Row gathers are ~25x cheaper, so the host inverts the maps once per
    transition (O(v_cap) numpy, overlapped with device work) and the device
    executes:  sh_next = [sh_prev | h_rows | 0][src],
               grad_carry = [grad_prev | 0][gsrc],  g_rows = grad_prev[gp].
    idxv = [src (v_cap) | gsrc (v_cap) | gp (g_cap)] — one device_put.
    sh/grad buffers donated (the previous layout is dead after the advance).
    """
    v = sh_prev.shape[0]
    h_cap = h_rows.shape[0]
    src = idxv[:v]  # in [0, v+h_cap]: prev row | v+h slot | v+h_cap = zero
    gsrc = idxv[v : 2 * v]  # in [0, v]: prev row | v = zero
    gp = jnp.minimum(idxv[2 * v :], v - 1)
    sh_next = jnp.concatenate(
        [sh_prev, h_rows, jnp.zeros((1, sh_prev.shape[1]), sh_prev.dtype)]
    )[src]
    grad_carry = jnp.concatenate(
        [grad_prev, jnp.zeros((1, grad_prev.shape[1]), grad_prev.dtype)]
    )[gsrc]
    g_rows = grad_prev[gp]
    return sh_next, grad_carry, g_rows


def _invert_transition(pd, pn, hn, v_cap, h_cap):
    """Build the gather maps for _advance_ws_packed from the classification's
    position arrays (pd/pn: retained rows' positions in prev/next layouts;
    hn: host-fetched rows' positions in next — all RAW, unpadded).
    Returns (src, gsrc) int32 (v_cap,)."""
    src = np.full(v_cap, v_cap + h_cap, np.int32)
    src[pn] = pd
    src[hn] = v_cap + np.arange(len(hn), dtype=np.int32)
    gsrc = np.full(v_cap, v_cap, np.int32)
    gsrc[pn] = pd
    return src, gsrc


@partial(jax.jit, donate_argnums=(0, 1))
def _advance_ws_packed_batch(sh_d, grad_d, h_d, idxv_d):
    """D chains' gather-form advances in one dispatch (leading axis = the
    mesh `data` axis in the clm x data-parallel regime); same per-chain
    semantics as _advance_ws_packed."""

    def one(sh_prev, grad_prev, h_rows, idxv):
        v = sh_prev.shape[0]
        src = idxv[:v]
        gsrc = idxv[v : 2 * v]
        gp = jnp.minimum(idxv[2 * v :], v - 1)
        sh_next = jnp.concatenate(
            [sh_prev, h_rows, jnp.zeros((1, sh_prev.shape[1]), sh_prev.dtype)]
        )[src]
        grad_carry = jnp.concatenate(
            [grad_prev, jnp.zeros((1, grad_prev.shape[1]), grad_prev.dtype)]
        )[gsrc]
        return sh_next, grad_carry, grad_prev[gp]

    return jax.vmap(one)(sh_d, grad_d, h_d, idxv_d)


def _bucket(n: int, v_cap: int) -> int:
    """Static transfer-buffer size for n rows: next power of two, >= 256,
    <= v_cap. Bounds the number of _advance_ws_packed recompiles while
    keeping H2D/D2H traffic proportional to the actual delta (the reference
    sizes its retention transfers by the precomputed cnt_h/cnt_g,
    engine.py:226-236)."""
    b = 256
    while b < n:
        b <<= 1
    return min(b, v_cap)


def _classify_transition(prev_ids, next_ids, v_cap):
    """H/D/G classification for one camera pair (the nonzero_static retention
    split, engine.py:568-636). Both id lists arrive sorted-unique (they come
    from jnp.nonzero), so a searchsorted merge does it in O(a log b) — no
    re-sort like np.intersect1d. Returns padded position arrays
    (pd, pn: v_cap; hn: h_cap; gp: g_cap) plus the raw gp/hn."""
    na, nb = len(prev_ids), len(next_ids)
    nat = native.classify_sorted(prev_ids, next_ids)
    if nat is not None:
        # single-pass C++ merge (~10x the searchsorted merge at 2M rows:
        # sequential scan vs ~21 cache-hostile binary-search probes/element)
        pd, pn, gp, hn = nat
    else:
        if nb:
            loc = np.searchsorted(next_ids, prev_ids)
            locc = np.minimum(loc, nb - 1)
            common_prev = next_ids[locc] == prev_ids
        else:
            loc = np.zeros(na, np.int64)
            common_prev = np.zeros(na, bool)
        pd = np.nonzero(common_prev)[0]
        pn = loc[pd]
        gp = np.nonzero(~common_prev)[0]
        in_common_next = np.zeros(nb, bool)
        in_common_next[pn] = True
        hn = np.nonzero(~in_common_next)[0]

    def pad(x, cap):
        out = np.full(cap, v_cap, np.int32)
        out[: len(x)] = x
        return out

    h_cap = _bucket(len(hn), v_cap)
    g_cap = _bucket(len(gp), v_cap)
    return pad(pd, v_cap), pad(pn, v_cap), pad(hn, h_cap), pad(gp, g_cap), gp, hn


def _timed_sparse_step(ctx, rows, grad_scale, step):
    """Executor-thread entry: host Adam over `rows`, accumulating busy time
    for the overlap meter (single worker thread; main thread reads the
    accumulator only after joining the futures)."""
    t0 = time.perf_counter()
    ctx.adam.sparse_step(ctx.sh_host, ctx.sh_grad_host, rows, grad_scale, step)
    ctx.adam_work_s += time.perf_counter() - t0


def _drain_pending(ctx, pending, futures, grad_scale, step, stop_update):
    """Consume one deferred grad transfer: wait for its async D2H, scatter-add
    into the host grad buffer (send_shs2cpu analogue), then submit the finish
    set whose last-use grads just landed (the set_signal -> cpuadam_thread
    handoff, engine.py:807-825)."""
    g_dev, ids, fin_rows = pending
    t0 = time.perf_counter()
    if len(ids):
        g_np = np.asarray(g_dev)[: len(ids)]
        native.scatter_add_rows(ctx.sh_grad_host, g_np, ids, accumulate=True)
    ctx.scatter_work_s += time.perf_counter() - t0
    if len(fin_rows) and not stop_update:
        futures.append(
            ctx.executor.submit(_timed_sparse_step, ctx, fin_rows, grad_scale, step)
        )


def _drain_pending_multi(ctx, pending, futures, grad_scale, step, stop_update):
    """Multi-chain variant: one (D, cap, 48) grad block per step, one id list
    per chain. The finish set is submitted only after EVERY chain's step-s
    grads have landed (a row's last use is its max step over all chains)."""
    g_dev, ids_list, fin_rows = pending
    t0 = time.perf_counter()
    g_np = None
    for d, ids in enumerate(ids_list):
        if len(ids):
            if g_np is None:
                g_np = np.asarray(g_dev)
            native.scatter_add_rows(
                ctx.sh_grad_host, g_np[d][: len(ids)], ids, accumulate=True
            )
    ctx.scatter_work_s += time.perf_counter() - t0
    if len(fin_rows) and not stop_update:
        futures.append(
            ctx.executor.submit(_timed_sparse_step, ctx, fin_rows, grad_scale, step)
        )


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3, 4),
    static_argnames=("adam_cfg", "sparse_adam", "bsz"),
)
def _adam_tail(
    params, opt_state, acc, xyz_grad_accum, denom, alive, lrs, adam_cfg,
    sparse_adam: bool, bsz: int,
):
    """Device Adam for the 4 HBM groups + stat fold-in, ONE donated dispatch.

    Donation matters at BigCity scale: the eager tail (grads = acc/bsz copies,
    then adam_step op-by-op) held old params+moments, new params+moments, the
    accumulator AND the scaled-grad copies live at once — ~+5.5 GB transient
    at 25M rows, which OOM'd the 25M single-chip run while steady-state live
    was only ~5 GB. Donating params/opt/acc/stats reuses those buffers
    in place."""
    grads = GaussianParams(
        xyz=acc.g_xyz / bsz,
        opacity=acc.g_opacity / bsz,
        log_scale=acc.g_log_scale / bsz,
        quat=acc.g_quat / bsz,
        sh=jnp.zeros_like(params.sh),
    )
    update_mask = (alive & acc.vis_any) if sparse_adam else alive
    new_params, new_opt = adam_step(
        params, grads, opt_state, lrs, adam_cfg, update_mask
    )
    return (
        new_params, new_opt,
        xyz_grad_accum + acc.accum, denom + acc.denom,
        acc.vis_any, acc.max_isects,
    )


def train_one_batch(
    state, opt_state, ctx: ClmContext, cams, gt, sh_degree,
    lrs, adam_cfg, background, width, height, isect_cap, cfg, timers=None,
    n_chains: int = 1, data_sharding=None,
):
    """n_chains > 1: clm x data-parallel — the TSP tour splits into n_chains
    contiguous segments processed in lockstep, D cameras per jitted dispatch
    with the chain axis laid on the mesh `data` axis (data_sharding). Lifts
    the round-2 `data=1` restriction for the bsz-64 BigCity regime."""
    tm = timers if timers is not None else _NULL_TIMER
    p = state.params
    C = state.capacity
    bsz = gt.shape[0]
    gt = jnp.asarray(gt)

    # 1. visibility filters (device, GPU attrs only)
    tm.start("clm.filters")
    F = oc.calculate_filters(
        p.xyz, p.quat, p.log_scale, state.alive, cams.viewmats, cams.Ks,
        width, height, cfg.model.radius_clip, ctx.v_cap,
    )
    counts_np = np.asarray(F.counts)
    if counts_np.max() >= ctx.v_cap:
        ctx.v_cap = round_up(int(counts_np.max() * 1.3) + 1, 1 << 12)
        F = oc.calculate_filters(
            p.xyz, p.quat, p.log_scale, state.alive, cams.viewmats, cams.Ks,
            width, height, cfg.model.radius_clip, ctx.v_cap,
        )
    idx_np = np.asarray(F.idx)
    tm.stop("clm.filters")

    # 2-3. TSP order + finish sets (host)
    tm.start("clm.order")
    dist = np.asarray(oc.hamming_distance_matrix(F.sample))
    alive_np = np.asarray(state.alive)
    if n_chains > 1 and bsz % n_chains != 0:
        n_chains = 1  # uneven split: fall back to the single chain
    order, finish_sets, never_visible = _order_and_finish_sets(
        idx_np, counts_np, dist, alive_np,
        cfg.aux.reorder_by_min_sparsity_at_end, n_chains=n_chains,
    )
    tm.stop("clm.order")

    # host adam hyper-state for this batch
    ctx.adam.lr_cols = np.ascontiguousarray(np.asarray(lrs["sh"]), np.float32)
    ctx.adam.step_count += 1
    step = ctx.adam.step_count
    grad_scale = 1.0 / bsz
    sparse_adam = cfg.aux.sparse_adam
    stop_update = cfg.debug.stop_update_param

    # 4. microbatch loop. Overlap structure (the two-stream + event pipeline
    # of engine.py:464-822, re-expressed via JAX async dispatch): camera i's
    # grad D2H is started asynchronously and *drained one iteration later* —
    # after camera i+1's micro-step has been dispatched — so the device
    # renders camera i+1 while the host scatters camera i's grads and the
    # worker thread runs Adam on the rows that just finished.
    losses = []
    futures = []
    pending = None  # (g_rows device array, target ids, finish rows)

    use_retention = getattr(cfg.tpu, "retention", True)
    B = len(order)
    drain_fn = _drain_pending if n_chains == 1 else _drain_pending_multi

    if n_chains > 1:
        gpu_grads = {
            n: jnp.zeros_like(getattr(p, n))
            for n in ("xyz", "opacity", "log_scale", "quat")
        }
        accum = jnp.zeros(C, jnp.float32)
        denom = jnp.zeros(C, jnp.float32)
        vis_any = jnp.zeros(C, bool)
        max_isects = jnp.zeros((), jnp.int32)
        D = n_chains
        S = B // D
        seg = [order[d * S : (d + 1) * S] for d in range(D)]

        def put_d(x):
            x = jnp.asarray(x)
            return (
                jax.device_put(x, data_sharding)
                if data_sharding is not None else x
            )

        shc_d = None  # (D, v_cap, 48)
        grad_d = None
        for s in range(S):
            cams_s = np.array([int(seg[d][s]) for d in range(D)])
            idxs = F.idx[cams_s]  # (D, v_cap)
            ids_s = [idx_np[c][: int(counts_np[c])] for c in cams_s]

            if shc_d is None or not use_retention:
                tm.start("clm.fetch_h2d")
                rows = np.stack(
                    [
                        native.gather_rows(
                            ctx.sh_host,
                            np.where(idx_np[c] < C, idx_np[c], 0).astype(
                                np.int32
                            ),
                        )
                        for c in cams_s
                    ]
                )
                shc_d = put_d(rows)
                if grad_d is None:
                    grad_d = put_d(
                        np.zeros((D, ctx.v_cap, SH_COLS), np.float32)
                    )
                tm.stop("clm.fetch_h2d", sync=shc_d)

            tm.start("clm.micro")
            out = oc.micro_step_visible_batch(
                p.xyz, p.opacity, p.log_scale, p.quat, shc_d, idxs,
                cams.viewmats[cams_s], cams.Ks[cams_s],
                cams.camtoworlds[cams_s][:, :3, 3], gt[cams_s],
                sh_degree, background, width, height, isect_cap, ctx.v_cap,
                lambda_dssim=cfg.opt.lambda_dssim,
                loss_scale=cfg.opt.lr_scale_loss,
            )
            for n in gpu_grads:
                gpu_grads[n] = gpu_grads[n] + out.gpu_grads[n]
            accum, denom = oc.scatter_stats(
                accum, denom, idxs, out.probe_grad, out.radii_compact,
                width, height,
            )
            vis_any = vis_any.at[jnp.minimum(idxs, C - 1)].max(idxs < C)
            losses.append(out.losses)
            max_isects = jnp.maximum(max_isects, out.n_isects)
            grad_d = grad_d + out.sh_grad_compact
            tm.stop("clm.micro", sync=out.losses)

            rows_fin = finish_sets[s]
            if s == 0 and not sparse_adam and len(never_visible):
                rows_fin = np.concatenate([never_visible, rows_fin])

            if use_retention and s + 1 < S:
                tm.start("clm.advance")
                cls = [
                    _classify_transition(
                        ids_s[d],
                        idx_np[int(seg[d][s + 1])][
                            : int(counts_np[int(seg[d][s + 1])])
                        ],
                        ctx.v_cap,
                    )
                    for d in range(D)
                ]
                # uniform static buckets across chains (one compiled shape);
                # gather-form advance: per-chain host-inverted maps (see
                # _advance_ws_packed)
                h_cap = max(len(c[2]) for c in cls)
                g_cap = max(len(c[3]) for c in cls)
                idxv_d = np.zeros((D, 2 * ctx.v_cap + g_cap), np.int32)
                h_rows = np.zeros((D, h_cap, SH_COLS), np.float32)
                g_ids = []
                for d in range(D):
                    pd, pn, hn, gp, gp_raw, hn_raw = cls[d]
                    nxt = idx_np[int(seg[d][s + 1])][
                        : int(counts_np[int(seg[d][s + 1])])
                    ]
                    if len(hn_raw):
                        h_rows[d, : len(hn_raw)] = native.gather_rows(
                            ctx.sh_host, nxt[hn_raw].astype(np.int32)
                        )
                    nr = len(ids_s[d]) - len(gp_raw)
                    src, gsrc = _invert_transition(
                        pd[:nr], pn[:nr], hn_raw, ctx.v_cap, h_cap
                    )
                    gp_pad = np.full(g_cap, ctx.v_cap, np.int32)
                    gp_pad[: len(gp_raw)] = gp[: len(gp_raw)]
                    idxv_d[d] = np.concatenate([src, gsrc, gp_pad])
                    g_ids.append(ids_s[d][gp_raw])
                shc_d, grad_d, g_rows_d = _advance_ws_packed_batch(
                    shc_d, grad_d, put_d(h_rows), put_d(idxv_d)
                )
                new_pending = (g_rows_d, g_ids, rows_fin)
                tm.stop("clm.advance")
            else:
                new_pending = (grad_d, ids_s, rows_fin)
                if use_retention:
                    grad_d = None
                    shc_d = None
                else:
                    grad_d = put_d(
                        np.zeros((D, ctx.v_cap, SH_COLS), np.float32)
                    )
                    shc_d = None

            ctx.d2h_bytes += new_pending[0].nbytes
            try:
                new_pending[0].copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                tm.start("clm.d2h_scatter")
                drain_fn(ctx, pending, futures, grad_scale, step, stop_update)
                tm.stop("clm.d2h_scatter")
            pending = new_pending
        losses = [l for ls in losses for l in ls]  # flatten (S, D) -> (B,)

    grad_buf = None  # (v_cap, 48) accumulated SH grads in current-camera layout
    shc = None
    acc = None
    if n_chains == 1:
        # resident per-batch camera arrays for the fused step (one dispatch)
        campos_all = cams.camtoworlds[:, :3, 3]
    for pos, cam_i in enumerate(order if n_chains == 1 else []):
        cam_i = int(cam_i)
        n_vis = int(counts_np[cam_i])
        idx_k = idx_np[cam_i]
        valid_ids = idx_k[:n_vis]

        if shc is None or not use_retention:
            # full fetch of the visible working set (first camera, or
            # retention disabled); padded rows gather row 0 — masked out by
            # idx >= C inside the micro step.
            tm.start("clm.fetch_h2d")
            gather_idx = np.where(idx_k < C, idx_k, 0).astype(np.int32)
            if ctx.pinned is not None:
                # compiled host-DMA gather from the pinned_host mirror
                # (send_shs2gpu_stream analogue, engine.py:499-505)
                shc = ctx.pinned.fetch(gather_idx)
            else:
                shc = jax.device_put(native.gather_rows(ctx.sh_host, gather_idx))
            ctx.h2d_bytes += gather_idx.size * SH_COLS * 4
            if grad_buf is None:
                grad_buf = jnp.zeros((ctx.v_cap, SH_COLS), jnp.float32)
            tm.stop("clm.fetch_h2d", sync=shc)

        # fused micro-step: fwd+bwd AND every per-camera accumulator update
        # (4 gpu grads, densify stats, vis union, isect max, grad_buf) in ONE
        # dispatch — the caller-side adds this replaces each cost a separate
        # launch through the transport (~8 extra launches/camera)
        tm.start("clm.micro")
        if acc is None:
            acc = oc.make_clm_acc(p)
        loss, grad_buf, acc = oc.clm_fused_step(
            p.xyz, p.opacity, p.log_scale, p.quat, shc, grad_buf,
            F.idx, cams.viewmats, cams.Ks, campos_all, gt,
            jnp.int32(cam_i), acc, sh_degree, background,
            width, height, isect_cap, ctx.v_cap,
            lambda_dssim=cfg.opt.lambda_dssim,
            loss_scale=cfg.opt.lr_scale_loss,
        )
        losses.append(loss)
        tm.stop("clm.micro", sync=loss)
        if _SYNC_EVERY and (pos + 1) % _SYNC_EVERY == 0:
            # CLMGS_CLM_SYNC_EVERY=k: bound async dispatch run-ahead. At
            # BigCity scale the host can queue many cameras' programs ahead
            # of the device; each queued execution pins its output buffers,
            # and the allocation peak under a shared chip then exceeds what
            # steady-state live bytes suggest.
            jax.block_until_ready(loss)

        rows = finish_sets[pos]
        if pos == 0 and not sparse_adam and len(never_visible):
            rows = np.concatenate([never_visible, rows])

        if use_retention and pos + 1 < B:
            # advance the working set to the next camera: keep D rows on
            # device, fetch only H rows, offload only G rows' grads
            # (send_shs2gpu_stream_retention / send_shs2cpu_..._retention,
            # engine.py:623-636, 789-803). All transfers bucketed to the
            # actual delta size; the four index arrays ship as ONE packed
            # device_put (see _advance_ws_packed).
            tm.start("clm.advance")
            next_i = int(order[pos + 1])
            next_ids = idx_np[next_i][: int(counts_np[next_i])]
            pd, pn, hn, gp, gp_raw, hn_raw = _classify_transition(
                valid_ids, next_ids, ctx.v_cap
            )
            if ctx.pinned is not None:
                # rows beyond the hn_raw prefix fetch row 0 — never read:
                # src points only at the valid h slots
                ids_p = np.zeros(len(hn), np.int32)
                ids_p[: len(hn_raw)] = next_ids[hn_raw]
                h_dev = ctx.pinned.fetch(ids_p)
            else:
                h_rows = np.zeros((len(hn), SH_COLS), np.float32)
                if len(hn_raw):
                    h_rows[: len(hn_raw)] = native.gather_rows(
                        ctx.sh_host, next_ids[hn_raw].astype(np.int32)
                    )
                h_dev = jax.device_put(h_rows)
            ctx.h2d_bytes += len(hn) * SH_COLS * 4
            nr = len(valid_ids) - len(gp_raw)  # retained count
            src, gsrc = _invert_transition(
                pd[:nr], pn[:nr], hn_raw, ctx.v_cap, len(hn)
            )
            idxv = jax.device_put(np.concatenate([src, gsrc, gp]))
            shc, grad_buf, g_rows = _advance_ws_packed(
                shc, grad_buf, h_dev, idxv
            )
            new_pending = (g_rows, valid_ids[gp_raw], rows)
            tm.stop("clm.advance")
        else:
            # final microbatch (or retention off): flush the whole buffer
            # (engine.py:815-822)
            new_pending = (grad_buf, valid_ids, rows)
            if use_retention:
                grad_buf = None
                shc = None
            else:
                grad_buf = jnp.zeros((ctx.v_cap, SH_COLS), jnp.float32)
                shc = None

        # start the async D2H of this camera's outgoing grads, then drain the
        # PREVIOUS one (whose transfer completed during this micro-step)
        ctx.d2h_bytes += new_pending[0].nbytes  # bucketed buffer, not prefix
        try:
            new_pending[0].copy_to_host_async()
        except Exception:
            pass
        if pending is not None:
            tm.start("clm.d2h_scatter")
            _drain_pending(ctx, pending, futures, grad_scale, step, stop_update)
            tm.stop("clm.d2h_scatter")
        pending = new_pending

    # 5. device Adam for the 4 HBM groups
    gpu_lrs = {k: lrs[k] for k in ("xyz", "opacity", "log_scale", "quat")}
    if acc is not None and not stop_update:
        # single-chain path: grad scaling + Adam + stat fold-in as ONE
        # donated dispatch (see _adam_tail: the eager version's transient
        # old+new params/moments/grad copies OOM'd the 25M run)
        (new_params, new_opt, new_accum, new_denom, vis_any, max_isects) = (
            _adam_tail(
                p, opt_state, acc, state.xyz_grad_accum, state.denom,
                state.alive, gpu_lrs, adam_cfg, sparse_adam, bsz,
            )
        )
    else:
        if acc is not None:
            # stop_update: acc not donated, read the accumulators directly
            gpu_grads = {
                "xyz": acc.g_xyz, "opacity": acc.g_opacity,
                "log_scale": acc.g_log_scale, "quat": acc.g_quat,
            }
            accum, denom, vis_any = acc.accum, acc.denom, acc.vis_any
            max_isects = acc.max_isects
        if stop_update:
            new_params, new_opt = p, opt_state
        else:
            grads = GaussianParams(
                xyz=gpu_grads["xyz"] / bsz,
                opacity=gpu_grads["opacity"] / bsz,
                log_scale=gpu_grads["log_scale"] / bsz,
                quat=gpu_grads["quat"] / bsz,
                sh=jnp.zeros_like(p.sh),
            )
            update_mask = (
                (state.alive & vis_any) if sparse_adam else state.alive
            )
            new_params, new_opt = adam_step(
                p, grads, opt_state, gpu_lrs, adam_cfg, update_mask
            )
        new_accum = state.xyz_grad_accum + accum
        new_denom = state.denom + denom

    # 6. drain the final flush + join host workers (engine.py:898), measuring
    # the trailing overhead — how long the device sits idle waiting for the
    # host side after its own work is done (the reference's CPU-Adam
    # trailing-overhead meter, engine.py:888-917).
    # drain the device Adam output too, not just the last micro's loss:
    # stamping t_dev_done before the Adam step completes would count device
    # Adam time as host wait and overstate trailing_s / understate
    # comm_hidden_frac (the reference meters around cpuadam_worker.join()
    # with the GPU fully drained, engine.py:888-917)
    timer.drain(losses[-1])
    if not stop_update:
        timer.drain(new_params.xyz)
    t_dev_done = time.perf_counter()
    if pending is not None:
        drain_fn(ctx, pending, futures, grad_scale, step, stop_update)
    for f in futures:
        f.result()
    ctx.trailing_s += time.perf_counter() - t_dev_done
    ctx.n_batches += 1

    # pinned_host mirror: reflect the rows the host Adam rewrote this batch
    # (host->host donated scatter; the reference needs no mirror because its
    # CPU Adam writes the very pinned buffer the GPU kernel DMAs from)
    if ctx.pinned is not None and not stop_update:
        touched = [fs for fs in finish_sets if len(fs)]
        if not sparse_adam and len(never_visible):
            touched.append(never_visible)
        if touched:
            rows = np.concatenate(touched)
            ctx.pinned.update_rows(rows, ctx.sh_host[rows])

    new_state = GaussianState(
        params=new_params, alive=state.alive, n_alive=state.n_alive,
        xyz_grad_accum=new_accum,
        denom=new_denom,
        max_radii2d=state.max_radii2d,
    )
    return new_state, new_opt, ctx, StepOut(jnp.stack(losses), max_isects, vis_any)


def prepare_device_loop(
    state, ctx: ClmContext, cams, gt, sh_degree, background,
    width, height, isect_cap, cfg,
):
    """Bench decomposition harness (VERDICT r4 #1): pre-stage EVERYTHING a clm
    batch needs on device (working sets, retention index vectors, H rows), and
    return (run, n_dispatches) where run() executes the per-camera device
    sequence — fused micro-step + working-set advance — with zero host work,
    zero H2D fetches and zero grad drains in the loop. Timing run() with a
    single final drain measures the REAL device-side cost of a clm batch,
    cleanly separated from tunnel-sync floors and host streaming that the
    instrumented in-situ batch necessarily includes."""
    p = state.params
    C = state.capacity
    gt = jnp.asarray(gt)
    F = oc.calculate_filters(
        p.xyz, p.quat, p.log_scale, state.alive, cams.viewmats, cams.Ks,
        width, height, cfg.model.radius_clip, ctx.v_cap,
    )
    counts_np = np.asarray(F.counts)
    idx_np = np.asarray(F.idx)
    dist = np.asarray(oc.hamming_distance_matrix(F.sample))
    alive_np = np.asarray(state.alive)
    order, _, _ = _order_and_finish_sets(
        idx_np, counts_np, dist, alive_np,
        cfg.aux.reorder_by_min_sparsity_at_end,
    )
    B = len(order)
    campos_all = cams.camtoworlds[:, :3, 3]

    first = int(order[0])
    gather_idx = np.where(idx_np[first] < C, idx_np[first], 0).astype(np.int32)
    shc0 = jax.device_put(native.gather_rows(ctx.sh_host, gather_idx))
    cam_dev = [jnp.int32(int(c)) for c in order]
    trans = []
    for pos in range(B - 1):
        prev_ids = idx_np[int(order[pos])][: int(counts_np[int(order[pos])])]
        nxt_i = int(order[pos + 1])
        next_ids = idx_np[nxt_i][: int(counts_np[nxt_i])]
        pd, pn, hn, gp, gp_raw, hn_raw = _classify_transition(
            prev_ids, next_ids, ctx.v_cap
        )
        h_rows = np.zeros((len(hn), SH_COLS), np.float32)
        if len(hn_raw):
            h_rows[: len(hn_raw)] = native.gather_rows(
                ctx.sh_host, next_ids[hn_raw].astype(np.int32)
            )
        nr = len(prev_ids) - len(gp_raw)
        src, gsrc = _invert_transition(
            pd[:nr], pn[:nr], hn_raw, ctx.v_cap, len(hn)
        )
        trans.append(
            (
                jax.device_put(h_rows),
                jax.device_put(np.concatenate([src, gsrc, gp])),
            )
        )

    def run():
        # fresh copies for the donated buffers; shc0/trans stay reusable
        shc = shc0 + 0.0
        grad_buf = jnp.zeros((ctx.v_cap, SH_COLS), jnp.float32)
        acc = oc.make_clm_acc(p)
        loss = None
        for pos in range(B):
            loss, grad_buf, acc = oc.clm_fused_step(
                p.xyz, p.opacity, p.log_scale, p.quat, shc, grad_buf,
                F.idx, cams.viewmats, cams.Ks, campos_all, gt,
                cam_dev[pos], acc, sh_degree, background,
                width, height, isect_cap, ctx.v_cap,
                lambda_dssim=cfg.opt.lambda_dssim,
                loss_scale=cfg.opt.lr_scale_loss,
            )
            if pos + 1 < B:
                h_dev, idxv = trans[pos]
                shc, grad_buf, _ = _advance_ws_packed(
                    shc, grad_buf, h_dev, idxv
                )
        return loss, acc

    # per run(): B fused steps + (B-1) advances + 1 shc copy + 2 allocs
    return run, 2 * B + 2


def post_densify(ctx: ClmContext, state: GaussianState, info):
    """Replay the densification row-movement plan on the host SH buffers
    (the reference's CPU-side pinned-buffer row copies,
    clm_offload/gaussian_model.py:609-699): clone/split children copy the
    source row's SH; moments and pending grads of written rows reset.

    All source rows are gathered BEFORE any write: children may land in
    freed split-source slots (the device-side scatter always reads the
    pre-densify params), so a sequential copy-then-copy replay would read
    corrupted sources. This skew was the round-2 clm densification-trajectory
    divergence (clm ended with 17% more gaussians than no_offload,
    QUALITY_r02): split children born with another row's SH render wrong,
    inflating screen-space grads and densifying extra rows."""
    C = state.capacity
    plans = [np.asarray(info.clone_dest)] + [
        np.asarray(info.split_dest[r]) for r in range(info.split_dest.shape[0])
    ]
    moves = []  # (dest_rows, source_values) with all gathers up front
    for sd in plans:
        src = np.nonzero(sd < C)[0]
        moves.append((sd[src], ctx.sh_host[src].copy()))
    for dest, vals in moves:
        ctx.sh_host[dest] = vals
    written = np.asarray(info.written)
    ctx.adam.exp_avg[written] = 0.0
    ctx.adam.exp_avg_sq[written] = 0.0
    ctx.sh_grad_host[written] = 0.0
    if ctx.pinned is not None:
        ctx.pinned.refresh(ctx.sh_host)  # densify is rare: full re-mirror
    return ctx


def post_opacity_reset(ctx: ClmContext, state: GaussianState):
    return ctx  # opacity lives on device; SH untouched


def checkpoint_extra(ctx: ClmContext) -> dict:
    return {
        "clm.sh_host": ctx.sh_host,
        "clm.exp_avg": ctx.adam.exp_avg,
        "clm.exp_avg_sq": ctx.adam.exp_avg_sq,
        "clm.step_count": np.asarray(ctx.adam.step_count),
    }


def restore_extra(ctx: ClmContext, arrays: dict) -> ClmContext:
    ctx.sh_host = np.ascontiguousarray(arrays["clm.sh_host"], np.float32)
    ctx.adam.exp_avg = np.ascontiguousarray(arrays["clm.exp_avg"], np.float32)
    ctx.adam.exp_avg_sq = np.ascontiguousarray(arrays["clm.exp_avg_sq"], np.float32)
    ctx.adam.step_count = int(arrays["clm.step_count"])
    ctx.sh_grad_host = np.zeros_like(ctx.sh_host)
    if ctx.pinned is not None:
        ctx.pinned.refresh(ctx.sh_host)
    return ctx


def eval_one_cam(
    state_and_ctx, viewmat, Kmat, camtoworld, sh_degree, background,
    width, height, isect_cap,
):
    """clm eval: filter, gather host SH rows for the visible set, render
    (clm_offload_eval_one_cam, engine.py:928-979). `state_and_ctx` is the
    (GaussianState, ClmContext) pair bound by the driver."""
    state, ctx = state_and_ctx
    p = state.params
    C = state.capacity
    F = oc.calculate_filters(
        p.xyz, p.quat, p.log_scale, state.alive, viewmat[None], Kmat[None],
        width, height, 0.0, ctx.v_cap,
    )
    idx_np = np.asarray(F.idx[0])
    gather_idx = np.where(idx_np < C, idx_np, 0).astype(np.int32)
    if ctx.pinned is not None:
        shc = ctx.pinned.fetch(gather_idx)
    else:
        shc = jax.device_put(native.gather_rows(ctx.sh_host, gather_idx))
    img, n_isects = oc.eval_visible(
        p.xyz, p.opacity, p.log_scale, p.quat, shc, F.idx[0],
        viewmat, Kmat, camtoworld[:3, 3], sh_degree, background,
        width, height, isect_cap, ctx.v_cap,
    )
    return img, n_isects
