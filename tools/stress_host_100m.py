"""Host-path stress at reference BigCity scale (100M Gaussians) — no TPU.

The clm_offload host machinery is the part that must keep up at 102M rows
(reference release_scripts/bigcity_README.md:121-127, bsz 64): per-pair H/D/G
retention classification, delta gathers from / scatter-adds into the big SH
host buffers, TSP camera ordering + finish sets, and the eager C++ SIMD Adam.
All of it is numpy + csrc — this tool times every stage against 100M-row
buffers with realistic visible-set sizes and overlap, independent of the
device path (which tools/stress_clm_10m.py covers end-to-end at 10M).

Usage: python -u tools/stress_host_100m.py [n=100_000_000] [bsz=64] [v=2_000_000]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    v = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    from clm_gs_tpu.optim import AdamConfig
    from clm_gs_tpu.strategies.clm_offload import (
        _classify_transition, _order_and_finish_sets,
    )
    from clm_gs_tpu.utils import native

    print(f"n={n} bsz={bsz} visible/cam={v} "
          f"(sh+grad host buffers {2*n*48*4/2**30:.1f} GB)", flush=True)

    t0 = time.time()
    sh_host = np.zeros((n, 48), np.float32)
    grad_host = np.zeros((n, 48), np.float32)
    adam = native.HostAdam(n, 48, np.full(48, 1e-3, np.float32),
                           betas=(0.9, 0.999), eps=1e-15)
    print(f"alloc {time.time()-t0:.1f} s (lazy; native adam: "
          f"{native.have_native_adam()})", flush=True)

    # sliding-window visible sets over the id space: consecutive cameras
    # share ~80% of rows (the retention-friendly regime the TSP produces)
    rng = np.random.RandomState(0)
    stride = max(1, (n - v) // max(1, bsz - 1) // 5)
    # int32 like production (visible-id lists come from jnp.nonzero)
    idx = [np.arange(i * stride, i * stride + v, dtype=np.int32)
           for i in range(bsz)]
    counts = np.asarray([len(x) for x in idx])
    alive = np.zeros(n, bool)

    # --- TSP ordering + finish sets (order_calculation analogue) ---
    t0 = time.time()
    sample = np.stack([
        np.isin(np.arange(0, n, max(1, n // 4096)), x[:: max(1, v // 1024)])
        for x in idx
    ])
    d = np.bitwise_xor(sample[:, None, :], sample[None, :, :]).sum(-1)
    t_dist = time.time() - t0
    for x in idx:
        alive[x[:: 7]] = True
    t0 = time.time()
    order, finish_sets, never = _order_and_finish_sets(
        idx, counts, d.astype(np.int32), alive, True
    )
    t_order = time.time() - t0
    print(f"hamming-dist {t_dist*1e3:.0f} ms, order+finish-sets "
          f"{t_order*1e3:.0f} ms (union rows "
          f"{sum(len(f) for f in finish_sets)})", flush=True)

    # --- per-transition classification + delta transfers, then the eager
    # host Adam over the finish sets. Two passes: pass 1 is first-touch
    # (page faults on the lazy 48-col buffers — the worst case right after
    # densification grows them), pass 2 is the warm steady state.
    batch_host_s = None
    for label in ("cold", "warm"):
        t_cls = t_gather = t_scatter = 0.0
        h_total = 0
        v_cap = 1 << 21
        for pos in range(1, bsz):
            a, b = idx[order[pos - 1]], idx[order[pos]]
            t0 = time.time()
            pd, pn, hn, gp, gp_raw, hn_raw = _classify_transition(a, b, v_cap)
            t_cls += time.time() - t0
            t0 = time.time()
            h_rows = native.gather_rows(sh_host, b[hn_raw].astype(np.int32))
            t_gather += time.time() - t0
            h_total += len(hn_raw)
            g_rows = np.ones((len(gp_raw), 48), np.float32)
            t0 = time.time()
            native.scatter_add_rows(
                grad_host, g_rows, a[gp_raw].astype(np.int32), accumulate=True
            )
            t_scatter += time.time() - t0
        print(f"[{label}] classify {t_cls/(bsz-1)*1e3:.1f} ms/pair, "
              f"H-gather {t_gather/(bsz-1)*1e3:.1f} ms/pair "
              f"(avg {h_total//(bsz-1)} rows), "
              f"G-scatter {t_scatter/(bsz-1)*1e3:.1f} ms/pair", flush=True)

        t0 = time.time()
        rows_done = 0
        for pos in range(bsz):
            fs = finish_sets[pos]
            if len(fs):
                adam.sparse_step(sh_host, grad_host, fs,
                                 grad_scale=1.0 / bsz, step=1)
                rows_done += len(fs)
        t_adam = time.time() - t0
        print(f"[{label}] host adam: {rows_done} rows in {t_adam:.2f} s "
              f"({rows_done/max(t_adam,1e-9)/1e6:.1f} M rows/s)", flush=True)
        batch_host_s = t_cls + t_gather + t_scatter + t_adam + t_order + t_dist

    import resource
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(f"peak RSS {rss:.1f} GB; warm host-side work for one bsz={bsz} "
          f"batch at {n/1e6:.0f}M rows: {batch_host_s:.2f} s", flush=True)


if __name__ == "__main__":
    main()
