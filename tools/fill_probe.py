"""Split the binning expansion's scatter+forward-fill cost (the largest glue
stage, ~26 ms/camera at bench scale) into its parts on the chip:

  1. the XLA scatter (.at[dst].set) of the per-gaussian channels,
  2. the same scatter with unique_indices/indices_are_sorted hints,
  3. the blocked-doubling forward fill (current _forward_fill),
  4. a Pallas VMEM fill prototype (doubling passes stay on-chip instead of
     round-tripping HBM once per doubling step).

Usage: nohup timeout 2400 python -u tools/fill_probe.py > /tmp/fp.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.ops.tiles import _forward_fill

CAP = 6291456
N = 1_000_000


def drain(out):
    # fetch a scalar from every leaf: block_until_ready alone does not force
    # execution through the axon tunnel
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.asarray(leaf).reshape(-1)[-1])


def timeit(name, fn, *args, iters=10):
    drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)  # queued async dispatch; one drain forces the whole queue
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # ~85% of gaussians real, sorted increasing starts like the real expansion
    counts = rng.integers(0, 12, size=N).astype(np.int32)
    starts = np.cumsum(counts) - counts
    dst = np.where(counts > 0, starts, CAP).astype(np.int32)
    geo = rng.integers(1, 1 << 27, size=N).astype(np.int32)
    order = np.arange(N, dtype=np.int32)
    dstj = jnp.asarray(dst)
    geoj = jnp.asarray(geo)
    stj = jnp.asarray(starts.astype(np.int32))
    orj = jnp.asarray(order)

    @jax.jit
    def scat3(dst, a, b, c):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        return s(a), s(b), s(c)

    @jax.jit
    def scat3_hint(dst, a, b, c):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(
                x, mode="drop", unique_indices=True
            )

        return s(a), s(b), s(c)

    @jax.jit
    def scat3_sorted(dst, a, b, c):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(
                x, mode="drop", unique_indices=True, indices_are_sorted=True
            )

        return s(a), s(b), s(c)

    @jax.jit
    def fill3(sa, sb, sc):
        return _forward_fill((sa, sb, sc), block=512)

    @jax.jit
    def scat_fill(dst, a, b, c):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        return _forward_fill((s(a), s(b), s(c)), block=512)

    @jax.jit
    def scat_rows(dst, a, b, c):
        rows = jnp.stack([a, b, c], axis=1)  # (N, 3)
        return jnp.zeros((CAP, 3), jnp.int32).at[dst].set(
            rows, mode="drop", unique_indices=True
        )

    @jax.jit
    def scat1(dst, a):
        return jnp.zeros(CAP, jnp.int32).at[dst].set(a, mode="drop")

    timeit("scatter 3ch (current)", scat3, dstj, geoj, stj, orj)
    timeit("scatter 3ch unique hint", scat3_hint, dstj, geoj, stj, orj)
    timeit("scatter 3ch unique+sorted hint", scat3_sorted, dstj, geoj, stj, orj)
    timeit("scatter 1ch", scat1, dstj, geoj)
    timeit("scatter (N,3) rows unique", scat_rows, dstj, geoj, stj, orj)
    sa, sb, sc = jax.block_until_ready(scat3(dstj, geoj, stj, orj))
    timeit("fill 3ch (current doubling)", fill3, sa, sb, sc)
    timeit("scatter+fill fused (current total)", scat_fill, dstj, geoj, stj, orj)

    # Pallas fill prototype
    from clm_gs_tpu.ops.fill_pallas import forward_fill_pallas

    f = jax.jit(lambda a, b, c: forward_fill_pallas((a, b, c)))
    out = jax.block_until_ready(f(sa, sb, sc))
    ref = jax.block_until_ready(fill3(sa, sb, sc))
    for o, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    print("pallas fill matches XLA fill", flush=True)
    timeit("fill 3ch (pallas)", f, sa, sb, sc)

    @jax.jit
    def scat_fill_pallas(dst, a, b, c):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        return forward_fill_pallas((s(a), s(b), s(c)))

    timeit("scatter+pallas fill (new total)", scat_fill_pallas, dstj, geoj, stj, orj)


if __name__ == "__main__":
    import sys as _sys
    if "--part2" not in _sys.argv and "--part3" not in _sys.argv:
        main()


def main2():
    """Scatter-avoidance probes: jnp.repeat lowering, 2-channel scatter,
    iota-derived starts channel."""
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 12, size=N).astype(np.int32)
    starts = np.cumsum(counts) - counts
    dst = np.where(counts > 0, starts, CAP).astype(np.int32)
    geo = rng.integers(1, 1 << 27, size=N).astype(np.int32)
    order = np.arange(N, dtype=np.int32)
    dstj, geoj, cj, orj = map(jnp.asarray, (dst, geo, counts, order))
    stj = jnp.asarray(starts.astype(np.int32))

    @jax.jit
    def rep(g, c):
        return jnp.repeat(g, c, total_repeat_length=CAP)

    @jax.jit
    def scat2_fill_derive(dst, a, b):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        sa, sb = s(a), s(b)
        iota = jnp.arange(CAP, dtype=jnp.int32)
        # starts channel derived: value at valid slots == the slot index
        sc = jnp.where(sa != 0, iota, 0)
        from clm_gs_tpu.ops.fill_pallas import forward_fill_pallas

        return forward_fill_pallas((sa, sb, sc))

    @jax.jit
    def scat2_fill_derive_xla(dst, a, b):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        sa, sb = s(a), s(b)
        iota = jnp.arange(CAP, dtype=jnp.int32)
        sc = jnp.where(sa != 0, iota, 0)
        return _forward_fill((sa, sb, sc), block=512)

    timeit("jnp.repeat geo by counts -> CAP", rep, geoj, cj)
    timeit("scat2 + derive starts + pallas fill", scat2_fill_derive, dstj, geoj, orj)
    timeit("scat2 + derive starts + xla fill", scat2_fill_derive_xla, dstj, geoj, orj)

    # numeric check of the derived-starts trick vs the 3-scatter reference
    ref = jax.jit(
        lambda d, a, b, c: _forward_fill(
            (
                jnp.zeros(CAP, jnp.int32).at[d].set(a, mode="drop"),
                jnp.zeros(CAP, jnp.int32).at[d].set(b, mode="drop"),
                jnp.zeros(CAP, jnp.int32).at[d].set(c, mode="drop"),
            ),
            block=512,
        )
    )(dstj, geoj, orj, stj)
    out = scat2_fill_derive(dstj, geoj, orj)
    ni = int(np.cumsum(counts)[-1])
    # derived channel = slot of last valid = starts_f (identical by construction)
    np.testing.assert_array_equal(np.asarray(out[0])[:ni], np.asarray(ref[0])[:ni])
    np.testing.assert_array_equal(np.asarray(out[1])[:ni], np.asarray(ref[1])[:ni])
    np.testing.assert_array_equal(np.asarray(out[2])[:ni], np.asarray(ref[2])[:ni])
    print("derived-starts matches scattered starts", flush=True)


if __name__ == "__main__":
    if "--part2" in sys.argv:
        main2()


def main3():
    """Can the two remaining scatters (geo, order) ride ONE complex64
    scatter? c64 packing is lossless (real/imag round-trip bitwise) and the
    fill consumes the int32 views, so only the scatter itself changes."""
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 12, size=N).astype(np.int32)
    starts = np.cumsum(counts) - counts
    dst = np.where(counts > 0, starts, CAP).astype(np.int32)
    geo = rng.integers(1, 1 << 27, size=N).astype(np.int32)
    order = np.arange(N, dtype=np.int32)
    dstj, geoj, orj = map(jnp.asarray, (dst, geo, order))

    @jax.jit
    def scat_c64(dst, a, b):
        af = jax.lax.bitcast_convert_type(a, jnp.float32)
        bf = jax.lax.bitcast_convert_type(b, jnp.float32)
        z = jax.lax.complex(af, bf)
        s = jnp.zeros(CAP, jnp.complex64).at[dst].set(z, mode="drop")
        sa = jax.lax.bitcast_convert_type(jnp.real(s), jnp.int32)
        sb = jax.lax.bitcast_convert_type(jnp.imag(s), jnp.int32)
        return sa, sb

    @jax.jit
    def scat_2i32(dst, a, b):
        def s(x):
            return jnp.zeros(CAP, jnp.int32).at[dst].set(x, mode="drop")

        return s(a), s(b)

    @jax.jit
    def scat_f64view(dst, a, b):
        # same trick through one (N, 2) row scatter
        rows = jnp.stack([a, b], axis=1)
        return jnp.zeros((CAP, 2), jnp.int32).at[dst].set(rows, mode="drop")

    @jax.jit
    def scat_half(dst, a):
        # does scatter cost scale with update count? (500k updates)
        return jnp.zeros(CAP, jnp.int32).at[dst[: N // 2]].set(
            a[: N // 2], mode="drop"
        )

    ra = scat_2i32(dstj, geoj, orj)
    rb = scat_c64(dstj, geoj, orj)
    np.testing.assert_array_equal(np.asarray(ra[0]), np.asarray(rb[0]))
    np.testing.assert_array_equal(np.asarray(ra[1]), np.asarray(rb[1]))
    print("c64-packed scatter bitwise-matches 2x int32", flush=True)
    timeit("scatter 2x int32", scat_2i32, dstj, geoj, orj)
    timeit("scatter 1x c64 (packed pair)", scat_c64, dstj, geoj, orj)
    timeit("scatter (N,2) rows", scat_f64view, dstj, geoj, orj)
    timeit("scatter 1ch half updates", scat_half, dstj, geoj)


if __name__ == "__main__":
    if "--part3" in sys.argv:
        main3()
