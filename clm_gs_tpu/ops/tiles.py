"""Tile intersection binning for the rasterizer.

TPU-native replacement for gsplat's ``isect_tiles`` + ``isect_offset_encode``
CUDA kernels (reference call sites strategies/base_engine.py:178-186). The CUDA
version builds a dynamically-sized (gaussian, tile) instance list and radix-sorts
it by a packed (tile | depth-bits) key. Under XLA everything must be static
shape, so we:

  1. stable-sort the N Gaussians by depth once (N << number of instances),
  2. expand to instances into a fixed-capacity padded buffer. Because the
     expansion is gaussian-major over the depth-sorted order, instances are
     already depth-ordered *within* every tile,
  3. stable-sort instances by tile id only (single int32 key — cheaper than the
     packed 64-bit key sort, and preserves the in-tile depth order),
  4. per-tile start offsets via searchsorted (the isect_offset_encode analogue).

Tie-breaking matches the CUDA stable radix sort: equal (tile, depth) pairs keep
ascending gaussian order.

Overflow policy: if the true instance count exceeds ``isect_cap`` the surplus
instances are dropped (deepest-sorted gaussians lose tiles); callers read
``n_isects`` and re-run with a larger bucketed capacity next step (SURVEY.md
§7.2: fixed-capacity padded buffers + counts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AlignedIsect(NamedTuple):
    ids: jnp.ndarray  # (isect_cap + align*num_tiles,) gaussian id, -1 = padding
    starts: jnp.ndarray  # (num_tiles + 1,) aligned segment starts
    counts: jnp.ndarray  # (num_tiles,) true per-tile instance counts
    n_isects: jnp.ndarray  # () true instance count
    # backward-pass helper (scatter-free per-gaussian gradient reduction):
    counts_orig: jnp.ndarray  # (N,) instances per gaussian, ORIGINAL id order


class IsectResults(NamedTuple):
    gauss_ids: jnp.ndarray  # (cap,) int32 index into the *input* gaussian arrays
    tile_ids: jnp.ndarray  # (cap,) int32; == num_tiles for padding slots
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) int32 start offsets
    n_isects: jnp.ndarray  # () int32 true instance count (may exceed cap)


def _forward_fill(channels, block: int = 1024):
    """Rightmost-valid forward fill over 1-D int32 channels; "valid" means
    channel 0 is nonzero. On TPU this dispatches to the Pallas VMEM fill
    kernel (ops/fill_pallas.py): the doubling passes run on-chip instead of
    round-tripping HBM once per pass — measured 21.5 -> 1.6 ms for 3 channels
    at the 6.3M-slot bench scale. Elsewhere (CPU tests, virtual meshes) the
    XLA formulation below runs: blocked two-level Hillis-Steele — intra-block
    fill along the minor axis, then a small inter-block carry pass, compiling
    in O(log block + log n/block) uniform-shape ops (jax.lax.associative_scan
    at multi-million sizes sends XLA:TPU compile times superlinear: 66 s at
    1M elements, ~4 min at 2M, >20 min at 4M measured on v5e).

    Positions before the first valid entry keep channel values 0.

    All channels share channel 0's validity structure, so they are stacked
    into ONE (C, rows, block) array and filled with a single broadcast mask:
    XLA then emits one fused doubling chain instead of C separate ones
    (measured 14.5 -> ~5 ms per camera at bench scale for C=3 at 2.4M).
    """
    if jax.default_backend() == "tpu":
        from clm_gs_tpu.ops.fill_pallas import forward_fill_pallas

        return forward_fill_pallas(channels)
    n = channels[0].shape[0]
    if n % block != 0:  # small/odd capacities (tests): single-level fill
        block = n
    rows = n // block
    x = jnp.stack([c.reshape(rows, block) for c in channels], axis=0)

    def fill3d(x, axis):
        size = x.shape[axis]
        s = 1
        while s < size:
            # shifted-by-s copy with zero fill (zero = invalid)
            pad = [(0, 0), (0, 0), (0, 0)]
            pad[axis] = (s, 0)
            sl = [slice(None), slice(None), slice(None)]
            sl[axis] = slice(0, size)
            shifted = jnp.pad(x, pad)[tuple(sl)]
            x = jnp.where(x[0:1] != 0, x, shifted)
            s *= 2
        return x

    intra = fill3d(x, axis=2)
    # inter-block carries: last column of each row, filled along rows, shifted
    # down by one (exclusive) so row i sees the fill from rows < i
    lasts_f = fill3d(intra[:, :, -1:], axis=1)
    carries = jnp.pad(lasts_f, ((0, 0), (1, 0), (0, 0)))[:, :rows]
    out = jnp.where(intra[0:1] != 0, intra, carries)
    return tuple(out[c].reshape(n) for c in range(len(channels)))


def _tile_wh(tile_size):
    """tile_size may be an int (square) or an (x, y) pair (rectangular —
    wide 32x16 tiles halve the per-splat tile coverage for small splats,
    which is most of the sort/gather/fill work)."""
    if isinstance(tile_size, (tuple, list)):
        return int(tile_size[0]), int(tile_size[1])
    return int(tile_size), int(tile_size)


def _f2i(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def pack_bf16_pair(a, b):
    """Two f32 columns -> one int32 sort/fill payload holding their bf16
    roundings (v5e sort and fill costs are per ELEMENT, so halving operand
    count — not bytes — is what pays)."""
    ha = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    hb = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return ((ha.astype(jnp.uint32) << 16) | hb.astype(jnp.uint32)).astype(
        jnp.int32
    )


def unpack_bf16_pair(w):
    w = w.astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return hi, lo


# Relative slack on the per-tile min-sigma test (the test runs on conics
# pre-divided by each gaussian's threshold t_sup = ln(255*op), so "reaches the
# alpha threshold" is exactly smin' <= 1): drop an instance only when every
# pixel of the tile is at least this fraction past the kernel's threshold,
# absorbing f32 reassociation noise in the analytic minimum even under heavy
# cross-term cancellation (error ~6e-8 x term magnitude).
_CULL_MARGIN = 0.02


def _tile_min_sigma(lx0, lx1, ly0, ly1, ca, cb, cc):
    """Minimum of sigma(dx, dy) = 0.5(ca dx^2 + cc dy^2) + cb dx dy over the
    rectangle [lx0,lx1] x [ly0,ly1] (mean-relative pixel bounds).

    The only stationary point of the quadratic is (0,0) with value 0, so the
    minimum is min over the boundary (per edge the 1-D restriction's clamped
    vertex, plus the 4 corners, which dominate when a degenerate conic makes
    an edge restriction concave), additionally clamped to <= 0 when the mean
    lies inside the rectangle — exact for PSD, degenerate, and indefinite
    conics alike (for indefinite ones every interior descent direction exits
    through the boundary)."""

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    ca_s = jnp.where(jnp.abs(ca) > 1e-12, ca, 1e-12)
    cc_s = jnp.where(jnp.abs(cc) > 1e-12, cc, 1e-12)
    m = jnp.minimum
    s = q(lx0, jnp.clip(-cb * lx0 / cc_s, ly0, ly1))
    s = m(s, q(lx1, jnp.clip(-cb * lx1 / cc_s, ly0, ly1)))
    s = m(s, q(jnp.clip(-cb * ly0 / ca_s, lx0, lx1), ly0))
    s = m(s, q(jnp.clip(-cb * ly1 / ca_s, lx0, lx1), ly1))
    s = m(s, m(q(lx0, ly0), q(lx0, ly1)))
    s = m(s, m(q(lx1, ly0), q(lx1, ly1)))
    inside = (lx0 <= 0) & (lx1 >= 0) & (ly0 <= 0) & (ly1 >= 0)
    return jnp.where(inside, jnp.minimum(0.0, s), s)


def _depth_key(depths, valid):
    """Monotone int32 sort key for positive camera-space depths (projection
    culls z <= near, so visible depths are positive and their IEEE-754 bit
    patterns order like the floats). s32 keys sort ~15% faster than f32 on
    v5e; invalid rows get INT32_MAX and sort last."""
    bits = jax.lax.bitcast_convert_type(depths, jnp.int32)
    return jnp.where(valid, bits, jnp.int32(0x7FFFFFFF))


def tile_bbox(means2d, rx, ry, tile_size, tile_width, tile_height):
    """Per-gaussian inclusive-exclusive tile bounds ([x0,x1) x [y0,y1)) from
    per-axis half-extents (pass rx == ry == radii for the gsplat circle
    bbox)."""
    tsx, tsy = _tile_wh(tile_size)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tsx), 0, tile_width)
    x1 = jnp.clip(jnp.ceil((means2d[:, 0] + rx) / tsx), 0, tile_width)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tsy), 0, tile_height)
    y1 = jnp.clip(jnp.ceil((means2d[:, 1] + ry) / tsy), 0, tile_height)
    return (
        x0.astype(jnp.int32),
        x1.astype(jnp.int32),
        y0.astype(jnp.int32),
        y1.astype(jnp.int32),
    )


def tight_extents(conics, opacities, radii):
    """Opacity-aware per-axis bbox half-extents (pixels).

    The support of a splat at the kernel's alpha threshold is the ellipse
    sigma <= ln(255 * op); its axis-aligned bbox half-widths are
    sqrt(2 ln(255 op) * Sigma_xx|yy) with Sigma = inv(conic). Capped at the
    gsplat 3-sigma circle radius so coverage is exactly (circle bbox) ∩
    (alpha >= 1/255 support) — every pixel the circle bbox would have
    composited still renders bit-identically, while instance counts drop
    ~20% (gsplat bins the full circle bbox, isect_tiles CUDA kernel).
    Returns (rx, ry), zeroed where the gaussian is culled or can never
    reach the alpha threshold.
    """
    t_sup = jnp.log(255.0 * jnp.maximum(opacities, 1e-12))
    det_c = jnp.maximum(conics[:, 0] * conics[:, 2] - conics[:, 1] ** 2, 1e-12)
    tt = 2.0 * jnp.maximum(t_sup, 0.0)
    # +1px margin absorbs fp rounding in the sqrt/threshold comparison
    rx_e = jnp.sqrt(tt * conics[:, 2] / det_c) + 1.0
    ry_e = jnp.sqrt(tt * conics[:, 0] / det_c) + 1.0
    valid = (radii > 0) & (t_sup > 0)
    rx = jnp.where(valid, jnp.minimum(rx_e, radii), 0.0)
    ry = jnp.where(valid, jnp.minimum(ry_e, radii), 0.0)
    return rx, ry


@partial(
    jax.jit, static_argnames=("tile_size", "tile_width", "tile_height", "isect_cap")
)
def isect_tiles(
    means2d,
    radii,
    depths,
    tile_size: int,
    tile_width: int,
    tile_height: int,
    isect_cap: int,
    extents=None,
) -> IsectResults:
    """Bin one camera's projected Gaussians into 2D tiles.

    Args:
      means2d: (N, 2) screen positions. radii: (N,) with 0 = culled.
      depths: (N,) camera-space z.
      isect_cap: static instance capacity (padded).
      extents: optional (rx, ry) per-axis bbox half-extents (tight_extents);
        defaults to the gsplat circle bbox (radii, radii).

    Returns IsectResults; instances are grouped by tile (ascending), ordered by
    depth (ascending, stable) within each tile.
    """
    num_tiles = tile_width * tile_height
    n = means2d.shape[0]

    # 1. depth-sort gaussians (culled ones to the back via +inf depth). The
    # per-gaussian tile geometry is computed pre-sort and carried as two sort
    # payloads — payload columns ride the sort at ~1 ms per M-operand, while
    # post-sort row gathers of means2d/radii cost ~10-20 ms each at 1M.
    rx, ry = extents if extents is not None else (radii, radii)
    x0, x1, y0, y1 = tile_bbox(means2d, rx, ry, tile_size, tile_width, tile_height)
    geo_pre = (x0 << 18) | (y0 << 9) | (x1 - x0)  # 9 bits each; tiles < 512/axis
    valid_g = (radii > 0) & (rx > 0) & (ry > 0)
    cnt_pre = jnp.where(valid_g, (x1 - x0) * (y1 - y0), 0)
    d_key = _depth_key(depths, valid_g)
    _, order, packed_geo, counts = jax.lax.sort(
        (d_key, jnp.arange(n, dtype=jnp.int32), geo_pre, cnt_pre),
        num_keys=1, is_stable=True,
    )
    cum = jnp.cumsum(counts)
    n_isects = cum[-1]
    starts = cum - counts

    # 2. instance expansion into the fixed-capacity buffer: slot s belongs to
    # the gaussian whose [starts, cum) range contains it. Large random gathers
    # are the enemy on TPU (searchsorted = ~20 serial gather passes ~600 ms;
    # even 4 direct gathers of the per-gaussian fields cost ~300 ms at 4M):
    # instead scatter each gaussian's fields at its start slot and forward-fill
    # with one associative scan ("rightmost valid wins"). Gaussians with
    # count > 0 have strictly increasing starts, so scatters never collide,
    # and the packed geometry word is nonzero exactly at set slots (wds >= 1).
    # XLA:TPU scatter costs ~10 ms per 1M-update channel (near-serial; the
    # fill itself is cheap), so only the geometry and id channels are
    # scattered — the `starts` channel is derived for free: its scattered
    # value at a set slot IS that slot's index, so the filled channel equals
    # the fill of iota masked by the set-slot indicator (chip-validated
    # identical, tools/fill_probe.py).
    slots = jnp.arange(isect_cap, dtype=jnp.int32)
    dst = jnp.where(counts > 0, starts, isect_cap)

    def scat(src, dtype=jnp.int32):
        return jnp.zeros(isect_cap, dtype).at[dst].set(src, mode="drop")

    geo_s = scat(packed_geo)
    starts_s = jnp.where(geo_s != 0, slots, 0)
    geo_f, starts_f, orig_f = _forward_fill((geo_s, starts_s, scat(order)))
    valid = slots < n_isects
    local = slots - starts_f
    w = jnp.maximum(geo_f & 0x1FF, 1)
    ty = ((geo_f >> 9) & 0x1FF) + local // w
    tx = (geo_f >> 18) + local % w
    tile = jnp.where(valid, ty * tile_width + tx, num_tiles)

    # 3. stable sort instances by tile id, carrying the original gaussian id
    # (depth order within a tile is preserved: slots are depth-major).
    tile_sorted, gauss_ids = jax.lax.sort((tile, orig_f), num_keys=1, is_stable=True)

    # 4. per-tile offsets (isect_offset_encode analogue).
    tile_offsets = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return IsectResults(gauss_ids, tile_sorted, tile_offsets, n_isects)


@partial(
    jax.jit,
    static_argnames=(
        "tile_size", "tile_width", "tile_height", "isect_cap", "align",
        "update_cap",
    ),
)
def isect_tiles_aligned(
    means2d,
    radii,
    depths,
    tile_size: int,
    tile_width: int,
    tile_height: int,
    isect_cap: int,
    align: int,
    extents=None,
    cull=None,
    update_cap: int = 0,
):
    """Binning straight into the K-aligned per-tile layout the rasterizer
    consumes: instead of sorting into contiguous ranges and then permuting
    (a ~95 ms scatter at 4M on v5e), per-tile padding *dummies* are appended
    before the tile sort — the stable sort then emits every tile's segment
    already rounded up to `align` slots (reals first, depth-ordered; dummies
    carry id -1). Returns (ids (isect_cap + align*num_tiles,), starts
    (num_tiles+1,), counts (num_tiles,), n_isects).

    cull: optional (conics (N,3), opacities (N,)) enabling the exact per-tile
    ellipse test (gsplat bins the plain bbox; FlashGS/StopThePop-style tile
    culling): an instance whose analytic in-tile max alpha stays below the
    compositing kernel's 1/255 threshold is demoted to an in-tile dummy —
    same segment layout (starts stay bbox-sized so the buffer/overflow
    semantics don't change), but per-tile/per-gaussian counts shrink to the
    kept instances, so compositing chunk steps and backward segment work
    drop with output identical up to chunk-reduction reassociation (~1 ulp). The conic/mean/opacity needed by the
    test ride the depth sort and the expansion forward-fill as bitcast
    payload channels (post-expansion row gathers are ~10x costlier).
    """
    num_tiles = tile_width * tile_height
    n = means2d.shape[0]

    # tile geometry computed pre-sort and carried as sort payloads (see
    # isect_tiles: payload columns beat post-sort row gathers on TPU)
    rx, ry = extents if extents is not None else (radii, radii)
    x0, x1, y0, y1 = tile_bbox(means2d, rx, ry, tile_size, tile_width, tile_height)
    geo_pre = (x0 << 18) | (y0 << 9) | (x1 - x0)
    valid_g = (radii > 0) & (rx > 0) & (ry > 0)
    cnt_pre = jnp.where(valid_g, (x1 - x0) * (y1 - y0), 0)
    # instance-producing gaussians sort to the front (zero-count ones emit
    # nothing, so their position is irrelevant): with `update_cap` set, the
    # expansion scatters slice to that prefix — XLA:TPU scatter cost is
    # linear in UPDATE count (~10 ms per 1M rows per channel, fill_probe),
    # so a visibility-sized budget cuts it by the invisible fraction. A
    # batch whose instance-producing count exceeds the budget drops its
    # deepest gaussians, exactly like an isect_cap overflow batch; callers
    # adapt the budget the same way.
    d_key = _depth_key(depths, valid_g & (cnt_pre > 0))
    pre_ops = (d_key, jnp.arange(n, dtype=jnp.int32), geo_pre, cnt_pre)
    if cull is not None:
        # conic pre-divided by t_sup = ln(255*op) so the per-instance test is
        # smin' <= 1 + margin — one channel fewer than carrying t_sup. The
        # conic stays f32: its quadratic terms CANCEL for elongated rotated
        # splats (b ~ -sqrt(ac) with huge individual terms near the major
        # axis), so bf16-packing them (0.4% per-term) could exceed any fixed
        # margin and wrongly cull a visible instance; f32's 6e-8 per-term
        # stays inside _CULL_MARGIN up to ~3e5x cancellation.
        conics, opacities = cull
        t_sup = jnp.log(255.0 * jnp.maximum(opacities, 1e-12))
        inv_t = 1.0 / jnp.maximum(t_sup, 1e-6)
        pre_ops = pre_ops + (
            _f2i(means2d[:, 0]), _f2i(means2d[:, 1]),
            _f2i(conics[:, 0] * inv_t), _f2i(conics[:, 1] * inv_t),
            _f2i(conics[:, 2] * inv_t),
        )
    sorted_ops = jax.lax.sort(pre_ops, num_keys=1, is_stable=True)
    order, packed_geo, counts_g = sorted_ops[1:4]
    cum = jnp.cumsum(counts_g)
    n_isects = cum[-1]
    starts_g = cum - counts_g

    slots = jnp.arange(isect_cap, dtype=jnp.int32)
    dst = jnp.where(counts_g > 0, starts_g, isect_cap)

    # scatter-update budget: instance-producing gaussians are a depth-sorted
    # prefix, so slicing the updates to `update_cap` rows drops only the
    # deepest gaussians — and only when the budget is exceeded (an adapt-and-
    # retry condition for callers, exact otherwise). The expansion's valid
    # bound must then be the PREFIX's instance total, not n_isects: the fill
    # would otherwise extend the last scattered gaussian's run across the
    # dropped gaussians' slots.
    uc = min(update_cap, n) if update_cap else n
    if uc < n:
        ni_used = jnp.minimum(cum[uc - 1], n_isects)
    else:
        ni_used = n_isects

    def scat(src):
        return jnp.zeros(isect_cap, jnp.int32).at[dst[:uc]].set(
            src[:uc], mode="drop"
        )

    # `starts` derived from the set-slot indicator instead of scattered:
    # XLA:TPU scatter is ~10 ms per 1M-update channel (see isect_tiles)
    geo_s = scat(packed_geo)
    starts_s = jnp.where(geo_s != 0, slots, 0)
    fill_in = (geo_s, starts_s, scat(order)) + tuple(
        scat(c) for c in sorted_ops[4:]
    )
    geo_f, starts_f, orig_f, *cull_f = _forward_fill(fill_in)
    valid = slots < ni_used
    local = slots - starts_f
    w = jnp.maximum(geo_f & 0x1FF, 1)
    ty = ((geo_f >> 9) & 0x1FF) + local // w
    tx = (geo_f >> 18) + local % w
    tile = jnp.where(valid, ty * tile_width + tx, num_tiles)
    orig = jnp.where(valid, orig_f, -1)

    keep = None
    if cull is not None:
        tsx, tsy = _tile_wh(tile_size)
        mx, my, ca, cb, cc = (_i2f(c) for c in cull_f)
        # pixel-center bounds of the tile, mean-relative
        lx0 = tx.astype(jnp.float32) * tsx + 0.5 - mx
        ly0 = ty.astype(jnp.float32) * tsy + 0.5 - my
        smin = _tile_min_sigma(lx0, lx0 + (tsx - 1), ly0, ly0 + (tsy - 1),
                               ca, cb, cc)
        keep = smin <= 1.0 + _CULL_MARGIN

    # Per-tile counts. The common path avoids a 2M+-element scatter-add
    # (~18 ms at bench scale — XLA:TPU scatters are near-serial) by counting
    # per-gaussian bbox coverage with an interval-indicator matmul on the MXU:
    # counts2d[y, x] = sum_g U[g, y] * V[g, x] with U/V 0-1 row/col interval
    # indicators — exact (integer-valued f32 accumulation, counts << 2^24).
    # That equals the histogram of the expanded `tile` array only when no
    # truncation happened; on overflow (n_isects > isect_cap, the adaptive
    # cap-growth step) fall back to the exact histogram of materialized slots.
    ycells = jnp.arange(tile_height, dtype=jnp.int32)[None, :]
    xcells = jnp.arange(tile_width, dtype=jnp.int32)[None, :]
    U = (
        (ycells >= y0[:, None]) & (ycells < y1[:, None]) & valid_g[:, None]
    ).astype(jnp.bfloat16)
    V = ((xcells >= x0[:, None]) & (xcells < x1[:, None])).astype(jnp.bfloat16)
    counts_mm = jax.lax.dot_general(
        U, V, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(num_tiles).astype(jnp.int32)

    def hist_counts(_):
        return jnp.zeros(num_tiles + 1, jnp.int32).at[tile].add(
            1, mode="drop"
        )[:num_tiles]

    exact_pred = n_isects <= isect_cap
    if uc < n:
        # the interval-indicator matmul counts ALL instance-producing
        # gaussians; when the update budget truncated (deepest dropped),
        # only the materialized-slot histogram matches the kept prefix —
        # stale matmul counts would shift every later tile's segment starts
        exact_pred = exact_pred & (ni_used >= n_isects)
    counts_t = jax.lax.cond(
        exact_pred, lambda _: counts_mm, hist_counts, operand=None
    )
    padded_t = -(-counts_t // align) * align
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_t).astype(jnp.int32)]
    )
    n_dummy_t = padded_t - counts_t  # in [0, align)
    dcap = align * num_tiles
    dcum = jnp.cumsum(n_dummy_t)
    dstarts = dcum - n_dummy_t
    ddst = jnp.where(n_dummy_t > 0, dstarts, dcap)
    (dtile_f,) = _forward_fill(
        (
            jnp.zeros(dcap, jnp.int32)
            .at[ddst]
            .set(jnp.arange(1, num_tiles + 1, dtype=jnp.int32), mode="drop"),
        )
    )
    dslots = jnp.arange(dcap, dtype=jnp.int32)
    dvalid = (dslots < dcum[-1]) & (dtile_f > 0)
    dummy_tile = jnp.where(dvalid, dtile_f - 1, num_tiles)

    if cull is None:
        # stable sort: reals (earlier positions) precede dummies within a tile.
        keys = jnp.concatenate([tile, dummy_tile])
        payload = jnp.concatenate([orig, jnp.full(dcap, -1, jnp.int32)])
        _, ids = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)
        # counts_orig may OVERCOUNT under update_cap truncation (it is the
        # pre-truncation per-gaussian bbox count): consumers must reduce by
        # id-masked segments, not trust the counts as materialized-instance
        # totals — segment_reduce_sorted's id-keyed reduction satisfies this
        # (same contract as isect_cap overflow, where slots are also dropped).
        return AlignedIsect(
            ids=ids, starts=starts, counts=counts_t, n_isects=n_isects,
            counts_orig=cnt_pre,
        )

    # Culling: kept reals key 2*tile, culled reals join the dummies at
    # 2*tile + 1 (id -1) — the segment layout (starts, sized from the bbox
    # counts above) is unchanged, but within each segment the kept reals are
    # compacted to the front in depth order.
    culled = valid & jnp.logical_not(keep)
    keys = jnp.concatenate(
        [
            jnp.where(valid, tile * 2 + culled.astype(jnp.int32),
                      2 * num_tiles + 1),
            jnp.where(dvalid, dummy_tile * 2 + 1, 2 * num_tiles + 1),
        ]
    )
    payload = jnp.concatenate(
        [jnp.where(culled, -1, orig), jnp.full(dcap, -1, jnp.int32)]
    )
    keys_sorted, ids = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)

    # exact kept counts per tile from the sorted keys (fence differences)
    pos = jnp.searchsorted(
        keys_sorted, jnp.arange(2 * num_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)
    kept_t = pos[1:2 * num_tiles + 1:2] - pos[0:2 * num_tiles:2]

    # kept counts per gaussian (the backward's segment fences): segment sums
    # of the keep indicator over each gaussian's contiguous expansion range,
    # un-permuted back to original id order with one small sort
    k01 = (valid & keep).astype(jnp.int32)
    cpad = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(k01)])
    lim = jnp.int32(isect_cap)
    kept_depth = (
        cpad[jnp.minimum(cum, lim)] - cpad[jnp.minimum(starts_g, lim)]
    )
    _, kept_orig = jax.lax.sort((order, kept_depth), num_keys=1)
    return AlignedIsect(
        ids=ids, starts=starts, counts=kept_t, n_isects=n_isects,
        counts_orig=kept_orig,
    )


class BatchAligned(NamedTuple):
    """Flat multi-camera aligned layout: camera b's slots occupy
    [b*cap_padded, (b+1)*cap_padded) with the single-camera structure inside
    (tile segments aligned to `align`, reals first in depth order, dummies
    id -1, per-camera invalid slots at the block's back)."""

    ids: jnp.ndarray  # (B*cap_padded,) GLOBAL gaussian id b*N+g; -1 = padding
    starts: jnp.ndarray  # (B*T,) flat aligned segment starts (b offsets baked)
    counts: jnp.ndarray  # (B*T,) true per-tile instance counts
    n_isects: jnp.ndarray  # (B,) true per-camera instance counts
    counts_orig: jnp.ndarray  # (B*N,) instances per gaussian, global id order


@partial(
    jax.jit,
    static_argnames=(
        "tile_size", "tile_width", "tile_height", "isect_cap", "align",
        "update_cap",
    ),
)
def isect_tiles_aligned_batch(
    means2d,  # (B, N, 2)
    radii,  # (B, N)
    depths,  # (B, N)
    tile_size,
    tile_width: int,
    tile_height: int,
    isect_cap: int,  # per camera
    align: int,
    extents=None,  # optional ((B, N), (B, N))
    update_cap: int = 0,  # per camera
):
    """All B cameras binned in ONE dispatch (VERDICT r3 lever #1: amortize the
    per-camera fixed costs of the sorts/scatters/fills across the batch).

    Same algorithm as `isect_tiles_aligned` generalized with per-camera
    offsets: the depth sort and cumsums run batched along the camera axis;
    the expansion scatters into one flat (B*cap) buffer with destination
    b*cap + start (one forward fill serves all cameras — a camera's slot 0 is
    always set when it has any instance, so fills never leak across camera
    boundaries where the per-camera validity bound is live); the tile sort is
    ONE flat sort keyed b*(T+1) + tile, so camera b's slots land exactly at
    [b*(cap+align*T), ...) with invalids at the block's back — fixed offsets. Per-tile counts come from the same
    interval-indicator matmul, batched on the MXU; overflow falls back to one
    global histogram (batch-level cond, so the fallback never runs in the
    vmap-style both-branches mode). The per-tile ellipse cull gate is NOT
    supported here (chip A/B measured it negative; use the single-camera path
    for that probe). At B=1 the output is bit-identical to
    `isect_tiles_aligned` with local ids."""
    B, n = radii.shape
    T = tile_width * tile_height
    cap = isect_cap

    rx, ry = extents if extents is not None else (radii, radii)
    x0, x1, y0, y1 = tile_bbox(
        means2d.reshape(B * n, 2), rx.reshape(-1), ry.reshape(-1),
        tile_size, tile_width, tile_height,
    )
    geo_pre = ((x0 << 18) | (y0 << 9) | (x1 - x0)).reshape(B, n)
    valid_g = (radii > 0) & (rx > 0) & (ry > 0)
    cnt_pre = jnp.where(valid_g, ((x1 - x0) * (y1 - y0)).reshape(B, n), 0)
    d_key = _depth_key(depths, valid_g & (cnt_pre > 0))
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (B, n))
    _, order, packed_geo, counts_g = jax.lax.sort(
        (d_key, gid, geo_pre, cnt_pre), dimension=1, num_keys=1, is_stable=True
    )
    cum = jnp.cumsum(counts_g, axis=1)
    n_isects = cum[:, -1]  # (B,)
    starts_g = cum - counts_g
    boff = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    dst = jnp.where(counts_g > 0, starts_g + boff, B * cap)

    uc = min(update_cap, n) if update_cap else n
    if uc < n:
        ni_used = jnp.minimum(cum[:, uc - 1], n_isects)
    else:
        ni_used = n_isects

    dstf = dst[:, :uc].reshape(-1)

    def scat(src):
        return jnp.zeros(B * cap, jnp.int32).at[dstf].set(
            src[:, :uc].reshape(-1), mode="drop"
        )

    slots = jnp.arange(B * cap, dtype=jnp.int32)
    geo_s = scat(packed_geo)
    starts_s = jnp.where(geo_s != 0, slots, 0)  # global slot index
    order_glob = order + (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
    geo_f, starts_f, orig_f = _forward_fill((geo_s, starts_s, scat(order_glob)))
    # per-camera validity bound, broadcast without a gather
    valid = (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < ni_used[:, None]
    ).reshape(-1)
    local = slots - starts_f
    w = jnp.maximum(geo_f & 0x1FF, 1)
    ty = ((geo_f >> 9) & 0x1FF) + local // w
    tx = (geo_f >> 18) + local % w
    tile = ty * tile_width + tx  # per-camera tile id; garbage where ~valid
    key_space = T + 1
    bkey = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) * key_space)[:, None], (B, cap)
    ).reshape(-1)
    keys_real = bkey + jnp.where(valid, tile, T)
    orig = jnp.where(valid, orig_f, -1)

    # per-tile counts: batched interval-indicator matmul (exact integer f32)
    x0r, x1r = x0.reshape(B, n), x1.reshape(B, n)
    y0r, y1r = y0.reshape(B, n), y1.reshape(B, n)
    ycells = jnp.arange(tile_height, dtype=jnp.int32)[None, None, :]
    xcells = jnp.arange(tile_width, dtype=jnp.int32)[None, None, :]
    U = (
        (ycells >= y0r[:, :, None]) & (ycells < y1r[:, :, None])
        & valid_g[:, :, None]
    ).astype(jnp.bfloat16)
    V = ((xcells >= x0r[:, :, None]) & (xcells < x1r[:, :, None])).astype(
        jnp.bfloat16
    )
    counts_mm = (
        jax.lax.dot_general(
            U, V, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        .reshape(B * T)
        .astype(jnp.int32)
    )

    def hist_counts(_):
        gt_tile = (
            jnp.broadcast_to(
                (jnp.arange(B, dtype=jnp.int32) * T)[:, None], (B, cap)
            ).reshape(-1)
            + jnp.where(valid, tile, 0)
        )
        gt_tile = jnp.where(valid, gt_tile, B * T)
        return jnp.zeros(B * T + 1, jnp.int32).at[gt_tile].add(
            1, mode="drop"
        )[: B * T]

    exact_pred = jnp.all(n_isects <= cap)
    if uc < n:
        exact_pred = exact_pred & jnp.all(ni_used >= n_isects)
    counts_t = jax.lax.cond(
        exact_pred, lambda _: counts_mm, hist_counts, operand=None
    )

    padded_t = (-(-counts_t // align) * align).reshape(B, T)
    pcs = jnp.cumsum(padded_t, axis=1)
    cap_padded = cap + align * T
    starts = (
        pcs - padded_t
        + (jnp.arange(B, dtype=jnp.int32) * cap_padded)[:, None]
    ).reshape(B * T)

    # alignment dummies, per camera (same scatter+fill pattern; local tile+1
    # values so leaks across camera boundaries are masked by the per-camera
    # dummy-count bound exactly like the real expansion)
    n_dummy_t = (padded_t - counts_t.reshape(B, T)).astype(jnp.int32)
    dcap = align * T
    dcum = jnp.cumsum(n_dummy_t, axis=1)
    dstarts = dcum - n_dummy_t
    dboff = (jnp.arange(B, dtype=jnp.int32) * dcap)[:, None]
    ddst = jnp.where(n_dummy_t > 0, dstarts + dboff, B * dcap).reshape(-1)
    dval = jnp.broadcast_to(
        jnp.arange(1, T + 1, dtype=jnp.int32)[None, :], (B, T)
    ).reshape(-1)
    (dtile_f,) = _forward_fill(
        (jnp.zeros(B * dcap, jnp.int32).at[ddst].set(dval, mode="drop"),)
    )
    dvalid = (
        (
            jnp.arange(dcap, dtype=jnp.int32)[None, :]
            < dcum[:, -1][:, None]
        ).reshape(-1)
        & (dtile_f > 0)
    )
    dbkey = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) * key_space)[:, None], (B, dcap)
    ).reshape(-1)
    keys_dummy = dbkey + jnp.where(dvalid, dtile_f - 1, T)

    keys = jnp.concatenate([keys_real, keys_dummy])
    payload = jnp.concatenate([orig, jnp.full(B * dcap, -1, jnp.int32)])
    _, ids = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)
    return BatchAligned(
        ids=ids, starts=starts, counts=counts_t, n_isects=n_isects,
        counts_orig=cnt_pre.reshape(B * n),
    )


def align_tile_ranges(res: IsectResults, num_tiles: int, align: int, cap_padded: int):
    """Re-lay the sorted instance list so every tile's range starts at a
    multiple of `align` (TPU DMA slices along the instance axis must be
    lane-aligned). Returns:

      ids_padded: (cap_padded,) int32 gaussian index per slot, -1 = padding
      starts:     (num_tiles + 1,) int32 aligned start offsets
      counts:     (num_tiles,) int32 true per-tile instance counts
    """
    counts = jnp.diff(res.tile_offsets)
    pad_counts = ((counts + align - 1) // align) * align
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts).astype(jnp.int32)]
    )
    t = jnp.minimum(res.tile_ids, num_tiles - 1)
    valid = res.tile_ids < num_tiles
    idx = jnp.arange(res.gauss_ids.shape[0], dtype=jnp.int32)
    pos = starts[t] + (idx - res.tile_offsets[t])
    pos = jnp.where(valid, pos, cap_padded)
    ids_padded = (
        jnp.full((cap_padded,), -1, jnp.int32)
        .at[pos]
        .set(res.gauss_ids, mode="drop")
    )
    return ids_padded, starts, counts
