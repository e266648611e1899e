"""Round-5a: diagnose the 50M pipelined collapse (VERDICT r4 task #3).

r3q2.log recorded 50M x 128 int8 blocking at 156.2 ms/batch but "pipelined
47 QPS" = 2.1 s/batch at thread-pool depth 96 — 13x WORSE than serial
blocking calls, and wildly off the 14M scaling (8.57 ms pipelined; 3.6x
the data should land ~30-40 ms). Leading hypothesis: per-in-flight-search
HBM intermediates — the sweep's (nq_pad, ngroups) group-max stream alone
is 104 * 393216 * 4 B ~ 163 MB at 50M rows, so 96 concurrent executions
want ~15.6 GB of temporaries NEXT TO the 6.6 GB database on a 16 GB chip.
This script scans pipeline depth with per-call latency percentiles and
fn-cache counts (recompile-storm check), plus a single-thread token
enqueue/wait split, to localize the cliff. No host oracle copy (recall
0.977 already proven, measurements_r4/r3q2.log) — keeps host RAM flat.
"""
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NV_TOTAL = int(os.environ.get("FT_NV", 50_000_000))
BATCH = 1_000_000
D, NQ, K = 128, 100, 10
DEPTHS = [int(s) for s in os.environ.get(
    "FT_DEPTHS", "2,4,8,16,32,64,96").split(",")]


def main():
    import jax
    if os.environ.get("FT_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.devices()[0].platform == "tpu", jax.devices()
    import faiss_tpu
    from faiss_tpu.ops.pallas_fused import DIRECT_BV

    rng = np.random.default_rng(42)
    xq = rng.integers(0, 256, (NQ, D)).astype(np.float32)
    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="int8")
    if os.environ.get("FT_CPU"):
        idx.set_force_xla(True)
    cap = ((NV_TOTAL + DIRECT_BV - 1) // DIRECT_BV) * DIRECT_BV
    idx.store._ensure_capacity(cap, exact=True)
    t0 = time.perf_counter()
    for b in range(NV_TOTAL // BATCH):
        idx.add(rng.integers(0, 256, (BATCH, D)).astype(np.float32))
        if b % 10 == 9:
            print(f"added {(b + 1) * BATCH / 1e6:.0f}M rows "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"add {time.perf_counter() - t0:.0f}s; {idx.describe()}",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(2):
        idx.search(xq, K)
    print(f"warmup {time.perf_counter() - t0:.0f}s; "
          f"cache {idx.res.cache_info()}", flush=True)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        idx.search(xq, K)
        lats.append(time.perf_counter() - t0)
    print(f"blocking: min {min(lats) * 1e3:.1f} ms, "
          f"median {sorted(lats)[2] * 1e3:.1f} ms "
          f"(fallbacks {idx.fused_fallbacks})", flush=True)

    def one():
        t = time.perf_counter()
        idx.search(xq, K)
        return time.perf_counter() - t

    for depth in DEPTHS:
        n_total = max(depth * 2, 24)
        best, pc = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(max_workers=depth) as pool:
                futs = [pool.submit(one) for _ in range(n_total)]
                this = [f.result() for f in futs]
            dt = (time.perf_counter() - t0) / n_total
            if dt < best:
                best, pc = dt, np.asarray(this) * 1e3
        print(f"depth {depth:3d}: {best * 1e3:8.2f} ms/batch = "
              f"{NQ / best:7.0f} QPS; per-call ms p50 "
              f"{np.percentile(pc, 50):7.0f} p95 {np.percentile(pc, 95):7.0f}"
              f" max {pc.max():7.0f}; cache {idx.res.cache_info()}"
              f" fallbacks {idx.fused_fallbacks}", flush=True)

    # single-thread token enqueue/wait split: separates dispatch-RPC cost
    # from device/concurrency effects (no GIL, no thread pool)
    for depth in (8, 32):
        t0 = time.perf_counter()
        toks = [idx.search_async(xq, K) for _ in range(depth)]
        mid = time.perf_counter()
        for t in toks:
            t.wait()
        t1 = time.perf_counter()
        print(f"tokens depth {depth}: enqueue "
              f"{(mid - t0) / depth * 1e3:.1f} ms/call, e2e "
              f"{(t1 - t0) / depth * 1e3:.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
