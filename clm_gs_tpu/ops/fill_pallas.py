"""Pallas TPU forward-fill kernel for the binning expansion.

The binning stages (ops/tiles.py) forward-fill scattered per-gaussian channels
across a multi-million-slot instance buffer ("rightmost valid wins", validity =
channel 0 nonzero). The XLA formulation (_forward_fill) runs ~13 doubling
passes, each a full HBM round trip over every channel — measured ~26 ms/camera
at bench scale, the single largest glue stage. This kernel runs the same
doubling *inside VMEM*: the grid walks row-blocks sequentially, each step does
log2(lanes) lane-fill passes + a small sublane scan on-chip, and a scratch
carry propagates the last valid values across steps. HBM traffic drops to one
read + one write per element (the associativity of "rightmost valid" is what
makes the single left-to-right pass correct).

Semantics match ops/tiles._forward_fill exactly: positions before the first
valid entry keep 0; all channels share channel 0's validity structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 512  # lanes per row (4 physical lane-tiles)
_RB = 256  # sublane rows per grid step; block = C * 512 KB


def _interpret_mode():
    return jax.default_backend() != "tpu"


def _fill_kernel(*refs, c: int, rb: int):
    ins = refs[:c]
    outs = refs[c : 2 * c]
    scr = refs[2 * c]

    @pl.when(pl.program_id(0) == 0)
    def _():
        scr[...] = jnp.zeros_like(scr)

    xs = [r[...] for r in ins]  # (rb, L) int32 each

    # lane fill: after pass s, every slot holds the rightmost valid value
    # within 2s-1 lanes to its left (validity == channel-0 nonzero is
    # preserved by the combine, so the mask is recomputed from xs[0])
    s = 1
    while s < _L:
        mask = xs[0] != 0
        pad = jnp.zeros((rb, s), jnp.int32)
        xs = [
            jnp.where(mask, x, jnp.concatenate([pad, x[:, : _L - s]], axis=1))
            for x in xs
        ]
        s *= 2

    # per-row summaries -> inclusive sublane scan (rightmost valid row wins).
    # Mosaic can't concatenate 1-lane-wide arrays along sublanes ("offset
    # mismatch on non-concat dimension"), so the last-lane summary is
    # broadcast to a full 128-lane tile first — every lane of `lasts` holds
    # the same per-row value.
    lasts = [
        jnp.broadcast_to(x[:, _L - 1 : _L], (rb, 128)) for x in xs
    ]  # (rb, 128)
    s = 1
    while s < rb:
        mask = lasts[0] != 0
        pad = jnp.zeros((s, 128), jnp.int32)
        lasts = [
            jnp.where(mask, l, jnp.concatenate([pad, l[: rb - s]], axis=0))
            for l in lasts
        ]
        s *= 2

    # exclusive row prefixes, seeded with the cross-step carry
    carry = [scr[j, 0:1, :] for j in range(c)]  # (1, 128) each
    pad1 = jnp.zeros((1, 128), jnp.int32)
    exs = [jnp.concatenate([pad1, l[: rb - 1]], axis=0) for l in lasts]
    exmask = exs[0] != 0
    exs = [
        jnp.where(exmask, e, jnp.broadcast_to(cr, (rb, 128)))
        for e, cr in zip(exs, carry)
    ]

    mask = xs[0] != 0
    for j in range(c):
        # all 128 lanes of exs[j] are equal; widen to L by tiling lane-tiles
        ex_wide = jnp.concatenate([exs[j]] * (_L // 128), axis=1)
        outs[j][...] = jnp.where(mask, xs[j], ex_wide)

    # new carry = this block's total (last row's inclusive fill, or the old
    # carry when the whole block is invalid)
    tmask = lasts[0][rb - 1 : rb, :] != 0
    for j in range(c):
        tot = jnp.where(tmask, lasts[j][rb - 1 : rb, :], carry[j])
        scr[j] = jnp.broadcast_to(tot, (8, 128))


@functools.partial(jax.jit, static_argnames=("rb",))
def forward_fill_pallas(channels, rb: int = _RB):
    """Forward-fill 1-D int32 channels (validity = channel 0 nonzero).

    Drop-in replacement for ops/tiles._forward_fill on TPU. Channels of any
    common length; zero-padding is appended internally and sliced back off.
    """
    c = len(channels)
    n = channels[0].shape[0]
    blk = rb * _L
    npad = -(-n // blk) * blk
    grid = npad // blk
    xs = [
        jnp.pad(ch, (0, npad - n)).reshape(npad // _L, _L) for ch in channels
    ]
    spec = pl.BlockSpec((rb, _L), lambda i: (i, 0))
    outs = pl.pallas_call(
        functools.partial(_fill_kernel, c=c, rb=rb),
        grid=(grid,),
        in_specs=[spec] * c,
        out_specs=[spec] * c,
        out_shape=[jax.ShapeDtypeStruct((npad // _L, _L), jnp.int32)] * c,
        scratch_shapes=[pltpu.VMEM((c, 8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret_mode(),
    )(*xs)
    return tuple(o.reshape(npad)[:n] for o in outs)
