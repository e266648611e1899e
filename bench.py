"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: SIFT1M-shaped exact search QPS (nv=1M, d=128, k=10, L2) on
one chip, with recall@10 verified against the numpy oracle on a subsample.
Mirrors the reference's bench grid (tests/bench_metal_flat.mm:115-129):
warmup + timed iterations, CPU-oracle-verified.

vs_baseline: BASELINE.json publishes no measured reference numbers
("published": {}); the north-star bar is ≥2× an M3-Max on SIFT1M. An M3-Max
on this workload (f16 storage, bandwidth-bound at ~400 GB/s reading 256 MB
per query batch sweep) lands around ~1.5k QPS for nq=100 batches
(README.md:12's +22-34% over an f32 path bounded by the same bandwidth).
We report vs_baseline against BASELINE_QPS = 3000 (2× that estimate).
"""

import json
import time

import numpy as np

BASELINE_QPS = 3000.0

NV, D, NQ, K = 1_000_000, 128, 100, 10
WARMUP, ITERS = 3, 10


def main():
    import faiss_tpu

    rng = np.random.default_rng(42)
    xb = rng.standard_normal((NV, D), dtype=np.float32)
    xq = rng.standard_normal((NQ, D), dtype=np.float32)

    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="bfloat16")
    t0 = time.perf_counter()
    idx.add(xb)
    add_s = time.perf_counter() - t0

    for _ in range(WARMUP):
        D_out, I_out = idx.search(xq, K)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        D_out, I_out = idx.search(xq, K)
        times.append(time.perf_counter() - t0)
    best = min(times)
    qps = NQ / best

    # recall@10 vs exact numpy oracle on a query subsample
    ns = min(NQ, 20)
    sub = xq[:ns].astype(np.float64)
    d2 = ((sub * sub).sum(1)[:, None] - 2.0 * (sub @ xb.T.astype(np.float64))
          + (xb.astype(np.float64) ** 2).sum(1)[None, :])
    ref = np.argsort(d2, axis=1, kind="stable")[:, :K]
    hits = sum(len(set(I_out[i, :K]) & set(ref[i])) for i in range(ns))
    recall = hits / (ns * K)

    print(json.dumps({
        "metric": f"flat L2 exact-search QPS (nv={NV}, d={D}, nq={NQ}, k={K}, "
                  f"bf16 storage, 1 chip; recall@10={recall:.4f}; "
                  f"add={add_s:.2f}s)",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
