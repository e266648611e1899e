"""r5d: explain the 50M pipelined collapse (VERDICT r4 task 3).

r3q2.log: blocking 156.2 ms/batch but depth-96 "pipelined" 2.1 s/batch —
13x WORSE than serial. Hypotheses:
  H1 HBM pressure: each in-flight fused search holds a (104, 390656) f32
     group-max slab = 162 MB; 96 concurrent programs want 15.6 GB of
     scratch against ~9.4 GB free (16 - 6.6 db) -> allocator stalls.
     Prediction: collapse grows with depth; depth<=48 behaves.
  H2 recompile storm: per-thread cache misses. Prediction: fn-cache
     entries jump during the pipelined phase.
  H3 tunnel/client contention at 96 threads. Prediction: small nq (cheap
     slab) still collapses at depth 96.
Measures: on-device slope (the true per-batch device time), blocking x5,
pipelined at depth {8, 24, 48, 96} with fn-cache counts, and a depth-96
nq=8 control (16x smaller slab). No oracle re-run (recall 0.977 is on
record, r3q2.log).
"""
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import faiss_tpu

NV_TOTAL = int(os.environ.get("FT_NV", 50_000_000))
BATCH = 1_000_000
D, NQ, K = 128, 100, 10


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    from faiss_tpu.ops.pallas_fused import DIRECT_BV

    rng = np.random.default_rng(42)
    xq = rng.integers(0, 256, (NQ, D)).astype(np.float32)
    xq8 = xq[:8]

    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="int8")
    cap = ((NV_TOTAL + DIRECT_BV - 1) // DIRECT_BV) * DIRECT_BV
    idx.store._ensure_capacity(cap, exact=True)
    t0 = time.perf_counter()
    for b in range(NV_TOTAL // BATCH):
        idx.add(rng.integers(0, 256, (BATCH, D)).astype(np.float32))
        if b % 10 == 9:
            print(f"added {(b + 1) / 1:.0f}M ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
    print(f"add {time.perf_counter()-t0:.0f}s; "
          f"hbm {idx.store.hbm_bytes()/1e9:.2f} GB", flush=True)

    ngroups = idx.store.capacity // 128
    print(f"per-call group-max slab ~= 104*{ngroups}*4 = "
          f"{104*ngroups*4/1e6:.0f} MB", flush=True)

    # warmup both query shapes
    for q in (xq, xq8):
        for _ in range(2):
            idx.search(q, K)
    print(f"fn-cache after warmup: {idx.res.cache_info()['entries']}", flush=True)

    for rep in range(5):
        t0 = time.perf_counter()
        idx.search(xq, K)
        print(f"blocking[{rep}]: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)

    # device-time estimate: wall-clock over n back-to-back ASYNC searches
    # (device-serial, tunnel overlapped) at two chain lengths; the slope of
    # total time vs n approximates device time per batch without a second
    # process or an unchainable host program.
    for n1, n2 in ((4, 12),):
        ts = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            toks = [idx.search_async(xq, K) for _ in range(n)]
            for t in toks:
                t.wait()
            ts.append(time.perf_counter() - t0)
        slope = (ts[1] - ts[0]) / (n2 - n1) * 1e3
        print(f"async-chain slope ({n1}->{n2}): {slope:.1f} ms/batch",
              flush=True)

    def pipelined(q, depth, nbatches):
        t0 = time.perf_counter()
        done = []
        with cf.ThreadPoolExecutor(max_workers=depth) as pool:
            futs = [pool.submit(idx.search, q, K) for _ in range(nbatches)]
            for f in futs:
                f.result()
                done.append(time.perf_counter() - t0)
        total = time.perf_counter() - t0
        gaps = np.diff([0.0] + done)
        return total / nbatches, gaps

    for depth in (8, 24, 48, 96):
        per, gaps = pipelined(xq, depth, depth * 2)
        print(f"depth {depth:3d}: {per*1e3:8.1f} ms/batch  "
              f"gap p50 {np.median(gaps)*1e3:.0f} max {gaps.max()*1e3:.0f} "
              f"fn-cache {idx.res.cache_info()['entries']}", flush=True)

    per, _ = pipelined(xq8, 96, 96)
    print(f"depth 96 nq=8 control: {per*1e3:.1f} ms/batch "
          f"(slab 16x smaller)", flush=True)
    print(f"fn-cache end: {idx.res.cache_info()['entries']}", flush=True)


if __name__ == "__main__":
    main()
