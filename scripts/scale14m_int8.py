"""14M×128 int8 on ONE v5e chip (capacity showcase — bf16 tops out ~7M).

Builds through the real index API in batches, measures blocking latency,
best-of-3 pipelined QPS, and recall@10 vs the unquantized float64 oracle
(numpy, source matrix kept on host).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NV, D, NQ, K = 14_000_000, 128, 100, 10


def main():
    import faiss_tpu
    from faiss_tpu.utils.profiling import measure_search

    rng = np.random.default_rng(7)
    print("synthesizing 14M x 128 ...", flush=True)
    xb = rng.standard_normal((NV, D)).astype(np.float32)
    xq = rng.standard_normal((NQ, D)).astype(np.float32)

    idx = faiss_tpu.TpuIndexFlat(D, storage="int8")
    idx.train(xb[:1_000_000])
    t0 = time.perf_counter()
    for lo in range(0, NV, 2_000_000):
        idx.add(xb[lo : lo + 2_000_000])
    build_s = time.perf_counter() - t0
    assert idx.ntotal == NV
    hbm = idx.store.hbm_bytes() / 1e9
    print(f"built: {NV} rows, {hbm:.2f} GB HBM "
          f"({idx.store.hbm_bytes() / (idx.store.capacity * idx.store.d_pad):.2f} B/elem), "
          f"{build_s:.0f} s", flush=True)

    lat, pipe = measure_search(idx, xq, K)
    D_out, I_out = idx.search(xq, K)
    # oracle on a 16-query sample (full 100×14M f64 argsort is ~an hour)
    s = 2 * (xq[:16].astype(np.float64) @ xb.astype(np.float64).T)
    s -= (xb.astype(np.float64) ** 2).sum(1)[None, :]
    o = np.argsort(-s, axis=1)[:, :K]
    rec = np.mean([len(set(I_out[i].tolist()) & set(o[i].tolist())) / K
                   for i in range(16)])
    print(f"RESULT lat_ms={lat:.1f} pipe_ms={pipe:.2f} "
          f"qps={NQ / (pipe / 1e3):.0f} recall@10={rec:.4f} "
          f"fallbacks={idx.fused_fallbacks}", flush=True)


if __name__ == "__main__":
    main()
