"""r5e: sharded-IVF on-chip overhead line (VERDICT r4 task 8: "a
sharded-IVF line once measured").

Multi-chip hardware does not exist in this environment (one v5e through
the tunnel; scaling behavior is validated on the emulated 8-device CPU
mesh + the driver's dryrun). What CAN be measured honestly on hardware is
the sharded program's PLUMBING cost: ShardedIndexIVFFlat on a 1-device
mesh runs the full shard_map + all_gather + lexicographic-merge program —
its delta vs the plain TpuIndexIVFFlat program at the same shapes is the
per-chip overhead a P-chip deployment pays on top of its 1/P-size local
scan. Slope-measured head-to-head in one process (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import faiss_tpu
from faiss_tpu.parallel.sharded_ivf import ShardedIndexIVFFlat

NV, D, NQ, K, NLIST, NPROBE = 1_000_000, 128, 104, 10, 1024, 4
N1, N2 = 4, 24
REPS = 8


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, NV)
    xb = (cents[comp] + rng.standard_normal((NV, D))).astype(np.float32)
    qcomp = rng.integers(0, ncomp, NQ)
    q = (cents[qcomp] + rng.standard_normal((NQ, D))).astype(np.float32)
    sub = xb[rng.choice(NV, 262_144, replace=False)]

    t0 = time.time()
    ivf = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage="bf16",
                                    nprobe=NPROBE, seed=1234)
    ivf.train(sub)
    ivf.add(xb)
    print(f"plain built ({time.time()-t0:.0f}s) {ivf.describe()}",
          flush=True)

    t0 = time.time()
    sh = ShardedIndexIVFFlat(D, NLIST, storage="bf16", nprobe=NPROBE,
                             num_shards=1, seed=1234)
    sh.train(sub)
    sh.add(xb)
    print(f"sharded built ({time.time()-t0:.0f}s) {sh.describe()}",
          flush=True)

    # parity first
    Dp, Ip = ivf.search(q, K)
    Ds, Is = sh.search(q, K)
    agree = float((Ip == Is).mean())
    print(f"P=1 id agreement vs plain: {agree:.4f}", flush=True)

    # pipelined wall-clock (the serving metric; blocking is tunnel-bound)
    import concurrent.futures as cf

    def pipe(idx, depth=32, nb=64):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(max_workers=depth) as pool:
                futs = [pool.submit(idx.search, q, K) for _ in range(nb)]
                for f in futs:
                    f.result()
            best = min(best, (time.perf_counter() - t0) / nb)
        return best * 1e3

    for _ in range(3):  # warm both
        ivf.search(q, K)
        sh.search(q, K)
    mp = pipe(ivf)
    ms = pipe(sh)
    print(f"pipelined ms/batch (nq={NQ}, k={K}, nprobe={NPROBE}): "
          f"plain {mp:.3f} | sharded P=1 {ms:.3f} | "
          f"overhead {ms-mp:+.3f} ms ({ms/mp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
