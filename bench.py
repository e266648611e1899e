"""Benchmark harness — prints ONE JSON line for the driver.

Headline: SIFT1M-shaped exact L2 search (nv=1M, d=128, nq=100, k=10) on one
chip, fp32 storage (recall@10 = 1.0 vs the exact oracle — the BASELINE.json
acceptance bar), measured as pipelined-async throughput (the axon tunnel adds
~25 ms RPC per blocking dispatch; the TpuSearchToken pipeline hides it, which
is also how a serving deployment would run). A bf16-storage variant (2×
less HBM traffic) is reported in the metric string.

vs_baseline: the reference publishes no numbers (BASELINE.md); the north-star
bar is ≥2× an M3-Max on SIFT1M. Estimate: M3-Max ~400 GB/s HBM, 512 MB fp32
sweep/batch → ~78 ms/batch → ~1.3k QPS at nq=100; 2× that ≈ 2600 QPS ≈
BASELINE_QPS. vs_baseline = our QPS / 2600.
"""

import json
import time

import numpy as np

BASELINE_QPS = 2600.0
NV, D, NQ, K = 1_000_000, 128, 100, 10


def main():
    import faiss_tpu
    from faiss_tpu.utils.profiling import measure_search, _oracle_recall

    rng = np.random.default_rng(42)
    xb = rng.standard_normal((NV, D), dtype=np.float32)
    xq = rng.standard_normal((NQ, D), dtype=np.float32)

    idx32 = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="f32")
    t0 = time.perf_counter()
    idx32.add(xb)
    add_s = time.perf_counter() - t0

    lat32, pipe32 = measure_search(idx32, xq, K)
    qps32 = NQ / (pipe32 / 1e3)
    D_out, I_out = idx32.search(xq, K)
    recall = _oracle_recall(xb, xq, K, "l2", I_out, sample=16)
    del idx32

    idx16 = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="bf16")
    idx16.add(xb)
    lat16, pipe16 = measure_search(idx16, xq, K)
    qps16 = NQ / (pipe16 / 1e3)
    D16, I16 = idx16.search(xq, K)
    recall16 = _oracle_recall(xb, xq, K, "l2", I16, sample=16)

    print(json.dumps({
        "metric": (
            f"SIFT1M-shape exact L2 QPS, 1 chip (nv={NV}, d={D}, nq={NQ}, "
            f"k={K}, fp32 storage, fused Pallas path, pipelined async; "
            f"recall@10={recall:.4f}; latency={lat32:.1f}ms/batch; "
            f"bf16 storage: {qps16:.0f} QPS recall@10={recall16:.4f}; "
            f"add={add_s:.2f}s)"
        ),
        "value": round(qps32, 1),
        "unit": "QPS",
        "vs_baseline": round(qps32 / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
