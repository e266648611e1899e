"""Round-3g: host-side throughput experiments (the driver-headline lever).

r3f put bf16 device time at 0.62 ms/batch, but measure_search's pipelined
number sits ~3.1 ms/batch — the 32-thread blocking-search pool is bound by
GIL + per-call RPC, not the device. Compare, same index, same process:
  T32  threadpool of blocking search, depth 32 (current measure_search)
  T64  threadpool depth 64
  A32  single-thread sliding window of 32 search_async tokens
  A96  fire 96 search_asyncs, then wait all
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import faiss_tpu

NV, D, NQ, K = 1_000_000, 128, 100, 10


def t32(idx, xq, n, depth=32):
    import concurrent.futures as cf
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=depth) as pool:
        futs = [pool.submit(idx.search, xq, K) for _ in range(n)]
        for f in futs:
            f.result()
    return (time.perf_counter() - t0) / n


def a_window(idx, xq, n, depth=32):
    t0 = time.perf_counter()
    toks = []
    for i in range(n):
        if len(toks) >= depth:
            toks.pop(0).wait()
        toks.append(idx.search_async(xq, K))
    for t in toks:
        t.wait()
    return (time.perf_counter() - t0) / n


def a_fire_all(idx, xq, n):
    t0 = time.perf_counter()
    toks = [idx.search_async(xq, K) for _ in range(n)]
    for t in toks:
        t.wait()
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(42)
    xb = rng.standard_normal((NV, D), dtype=np.float32)
    xq = rng.standard_normal((NQ, D), dtype=np.float32)
    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="bf16")
    t0 = time.perf_counter()
    idx.add(xb)
    print(f"add {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        idx.search(xq, K)
    variants = [
        ("T32", lambda: t32(idx, xq, 64, 32)),
        ("T64", lambda: t32(idx, xq, 128, 64)),
        ("A32", lambda: a_window(idx, xq, 128, 32)),
        ("A96", lambda: a_fire_all(idx, xq, 96)),
    ]
    res = {n: [] for n, _ in variants}
    for rep in range(4):
        for n, fn in variants:
            res[n].append(fn())
        print(f"rep {rep} done", flush=True)
    print(f"== per-batch ms (nq={NQ}) / QPS ==", flush=True)
    for n, _ in variants:
        best = min(res[n])
        print(f"{n}: {best*1e3:.2f} ms  {NQ/best:,.0f} QPS "
              f"(worst {max(res[n])*1e3:.2f})", flush=True)
    print("fallbacks:", idx.fused_fallbacks, flush=True)


if __name__ == "__main__":
    main()
