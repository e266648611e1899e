"""r5f: pin down the 10M-bf16 concurrent-search wedge.

ivf10m_v3 (measurements_r5): ONE blocking 10M flat search succeeded and 5
serial warmups passed, then a depth-64 pipelined block hung >1h with a
worker thread never completing (pipeline4.log rc=130 after SIGINT/TERM).
The 1M and 50M-int8 shapes run the same pattern fine. Suspects: the
certificate fallback tier compiling a huge program under concurrency, an
HBM pile-up of per-call slabs, or an axon-client RPC deadlock.

This run self-reports: faulthandler dumps EVERY thread's stack into the
log every 120 s, so a wedge shows exactly where each thread sits; depth
ramps 1 -> 64 with fallback counters printed between blocks.
"""
import concurrent.futures as cf
import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

NV, D, NQ, K = 10_000_000, 128, 100, 10
BATCH = 1_000_000


def main():
    faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
    assert jax.devices()[0].platform == "tpu", jax.devices()
    import faiss_tpu

    rng = np.random.default_rng(42)
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, NV)
    xb = (cents[comp] + rng.standard_normal((NV, D), dtype=np.float32))
    xq = (cents[rng.integers(0, ncomp, NQ)]
          + rng.standard_normal((NQ, D), dtype=np.float32))
    print("data ready", flush=True)

    idx = faiss_tpu.TpuIndexFlat(D, storage="bf16")
    t0 = time.time()
    for i0 in range(0, NV, BATCH):
        idx.add(xb[i0:i0 + BATCH])
    print(f"add {time.time()-t0:.0f}s {idx.describe()}", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        idx.search(xq, K)
        print(f"blocking[{rep}] {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"fallbacks={idx.fused_fallbacks} "
              f"pinned={sorted(idx._no_reduced_sweep)}", flush=True)

    def one():
        return idx.search_async(xq, K).wait()

    for depth in (2, 4, 8, 16, 32, 64):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=depth) as pool:
            futs = [pool.submit(one) for _ in range(depth * 2)]
            for f in futs:
                f.result()
        per = (time.perf_counter() - t0) / (depth * 2)
        print(f"depth {depth:3d}: {per*1e3:8.1f} ms/batch "
              f"fallbacks={idx.fused_fallbacks} "
              f"fn-cache={idx.res.cache_info()['entries']}", flush=True)
    print("r5f COMPLETE", flush=True)


if __name__ == "__main__":
    main()
