"""Pallas TPU segment-reduction for the rasterizer backward pass.

Reduces per-instance gradient rows (grouped by gaussian id via one sort) to
per-gaussian sums. TPU-native replacement for the scatter-add the CUDA
rasterizer backward performs with atomics (gsplat rasterize_to_pixels bwd;
reference call site strategies/base_engine.py:192-203).

Why not cumsum + fence gather: a (cap, 16) cumsum followed by a (N, 16) row
gather at the segment fences costs ~50 ms at bench scale (1M gaussians, 2.4M
instances) because XLA lays the cumsum output column-major, which turns the
row gather into 16 strided streams. This kernel instead streams the sorted
rows sequentially HBM->VMEM and reduces each chunk onto its output block with
a one-hot MXU matmul:

    out[g, c] += sum_k (ids[k] - block_base == g) * v[k, c]

The one-hot mask makes out-of-block rows (shared boundary chunks, padding
rows with id >= n_gauss) contribute exactly zero, so chunks never need
masking logic. A flat chunk plan (same pattern as the rasterizer: consecutive
grid steps revisiting one output block accumulate in VMEM) maps grid step i
-> (output block cb[i], input chunk ck[i], first-visit cf[i]).

Cost model: ~n_isects/CH + N/GBLK chunks, each one 32 KB sequential DMA +
a (GBLK, CH) x (CH, 16) f32 matmul — ~6-10 ms at bench scale vs ~50.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GBLK = 512  # gaussians per output block
CH = 512  # instance rows per input chunk
VCOLS = 16  # padded value columns (live cols zero-padded by the caller)


def _interpret_mode():
    return jax.default_backend() != "tpu"


def _kernel(cb, ck, cf, v_ref, out_ref, *, n_blocks):
    i = pl.program_id(0)
    alive = cb[i] < n_blocks

    @pl.when(alive & (cf[i] == 1))
    def _():
        out_ref[0] = jnp.zeros((VCOLS, GBLK), jnp.float32)

    @pl.when(alive)
    def _():
        # (VCOLS, CH) chunk — column-per-row like the rasterizer's attr
        # blocks: TPU tiles the last two dims (8, 128), so a (CH, 16) block
        # would pad its 16-lane dim to 128 (8x HBM blowup; the (rows, 1)
        # stack intermediates were 128x — a 1.6 GB buffer each at 3.4M rows)
        vblk = v_ref[0]
        ids = jax.lax.bitcast_convert_type(
            vblk[VCOLS - 1 :, :], jnp.int32
        )  # (1, CH)
        rel = ids - cb[i] * GBLK
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (GBLK, CH), 0)
        onehot = (rel == g_iota).astype(jnp.float32)  # (GBLK, CH)
        # NaN-safe select (not multiply) of in-block rows: foreign rows may
        # carry garbage from attr blocks the rasterizer backward never visits
        in_blk = (rel >= 0) & (rel < GBLK)  # (1, CH)
        v = jnp.where(in_blk, vblk, 0.0)  # (VCOLS, CH)
        out_ref[0] = out_ref[0] + jax.lax.dot_general(
            v, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _chunk_plan(en_blocks, n_blocks: int, n_in_blocks: int, plan_cap: int):
    """Flat (cb, ck, cf) chunk list. Block b's rows live in input chunks
    [en_blocks[b] // CH, ceil(en_blocks[b+1] / CH)) (boundary chunks shared
    with the neighbor; the one-hot masks the foreign rows). Every block gets
    >= 1 visit so its output is always zeroed."""
    from clm_gs_tpu.ops.tiles import _forward_fill

    lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), en_blocks[:-1]]) // CH
    hi = -(-en_blocks // CH)
    nchunks = jnp.maximum(hi - lo, 1)  # every block visited >= once
    ccum = jnp.cumsum(nchunks)
    cstarts = ccum - nchunks
    dst = cstarts  # nchunks >= 1 by construction: all scatter slots real
    blk_fill, cstart_fill, lo_fill = _forward_fill(
        (
            jnp.zeros(plan_cap, jnp.int32).at[dst].set(
                jnp.arange(1, n_blocks + 1, dtype=jnp.int32), mode="drop"
            ),
            jnp.zeros(plan_cap, jnp.int32).at[dst].set(cstarts, mode="drop"),
            jnp.zeros(plan_cap, jnp.int32).at[dst].set(lo, mode="drop"),
        ),
        block=512 if plan_cap % 512 == 0 else plan_cap,
    )
    slots = jnp.arange(plan_cap, dtype=jnp.int32)
    valid = (slots < ccum[-1]) & (blk_fill > 0)
    local = slots - cstart_fill
    # invalid entries target the trash output block n_blocks
    cb = jnp.where(valid, blk_fill - 1, n_blocks).astype(jnp.int32)
    ck = jnp.where(valid, jnp.clip(lo_fill + local, 0, n_in_blocks - 1), 0).astype(
        jnp.int32
    )
    cf = (valid & (local == 0)).astype(jnp.int32)
    return cb, ck, cf


@partial(jax.jit, static_argnames=("n_gauss",))
def segment_reduce_sorted(ids_sorted, v_cols, counts_orig, n_gauss: int):
    """Per-gaussian sums of value rows grouped by gaussian id.

    Args:
      ids_sorted: (cap_total,) int32, ascending; padding rows carry
        id >= n_gauss and sort last.
      v_cols: tuple of <= VCOLS-1 (cap_total,) f32 columns in the same order
        (padding rows are zero, but any value is safe — the one-hot masks
        them). Passed as columns so the (cap_total, VCOLS) kernel input is
        materialized exactly once: column VCOLS-1 carries the bitcast ids
        (Mosaic needs lane-dim blocks of 128 or the full array, so the ids
        ride the value rows instead of a separate (1, CH) input).
      counts_orig: (n_gauss,) int32 instances per gaussian in id order. On
        instance-buffer overflow these overcount the materialized rows; the
        reduction then degrades gracefully (extra rows read are masked or
        zero) exactly like the pre-Pallas cumsum path.
      n_gauss: static gaussian count.

    Returns: (n_gauss, VCOLS) f32 sums (columns beyond the supplied ones are
    zero; column VCOLS-1 is garbage).
    """
    cap_total = ids_sorted.shape[0]
    pad = (-cap_total) % CH
    cap_ch = cap_total + pad
    n_in_blocks = cap_ch // CH
    n_blocks = -(-n_gauss // GBLK)
    # worst case: every block adds one shared boundary chunk, every empty
    # block still gets one zeroing visit
    plan_cap = n_in_blocks + 2 * n_blocks + 1

    cnt_pad = jnp.zeros(n_blocks * GBLK, jnp.int32).at[:n_gauss].set(counts_orig)
    en = jnp.cumsum(cnt_pad)
    en_blocks = jnp.clip(en[GBLK - 1 :: GBLK], 0, cap_ch)

    cb, ck, cf = _chunk_plan(en_blocks, n_blocks, n_in_blocks, plan_cap)

    assert len(v_cols) <= VCOLS - 1, len(v_cols)
    zero = jnp.zeros(cap_ch, jnp.float32)
    ids_col = jax.lax.bitcast_convert_type(
        jnp.pad(ids_sorted, (0, pad), constant_values=jnp.int32(1 << 30)),
        jnp.float32,
    )
    cols = [
        jnp.pad(c, (0, pad)) if pad else c for c in v_cols
    ] + [zero] * (VCOLS - 1 - len(v_cols)) + [ids_col]
    # (VCOLS, cap_ch) stack keeps columns 1-D (no tile padding), then one
    # transpose lands the row-major (n_in, VCOLS, CH) the kernel consumes
    v3d = jnp.transpose(
        jnp.stack(cols, axis=0).reshape(VCOLS, n_in_blocks, CH), (1, 0, 2)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan_cap,),
        in_specs=[
            pl.BlockSpec((1, VCOLS, CH), lambda i, cb, ck, cf: (ck[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, VCOLS, GBLK), lambda i, cb, ck, cf: (cb[i], 0, 0)
        ),
    )
    out = pl.pallas_call(
        lambda cb_r, ck_r, cf_r, v_ref, out_ref: _kernel(
            cb_r, ck_r, cf_r, v_ref, out_ref, n_blocks=n_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks + 1, VCOLS, GBLK), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret_mode(),
    )(cb, ck, cf, v3d)
    # (n_blocks, VCOLS, GBLK) -> (n_gauss, VCOLS)
    return (
        jnp.transpose(out[:-1], (0, 2, 1)).reshape(n_blocks * GBLK, VCOLS)[
            :n_gauss
        ]
    )
