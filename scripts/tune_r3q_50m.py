"""Round-3q: 50M x 128 int8 on ONE chip (r2 record: 14M).

SIFT-like integer data (0..255), int8 storage at 1 B/elem: 6.4 GB codes +
0.2 GB norms — the 16 GB v5e holds it with the exact-capacity reserve
(amortized doubling would overshoot to 64M rows / 8.4 GB). Adds stream in
1M-row batches; scales freeze on the first batch (same distribution, so
the clip counter stays ~0). Measures add throughput, blocking latency,
depth-96 pipelined QPS, certificate rate, and recall@10 vs the exact
float64 oracle on the ORIGINAL (pre-quantization) data, computed in
1M-row chunks on the host (the 100 x 50M score matrix would be 40 GB).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NV_TOTAL = int(os.environ.get("FT_NV", 50_000_000))
BATCH = int(os.environ.get("FT_BATCH", 1_000_000))
D, NQ, K = 128, 100, 10
DEPTH = int(os.environ.get("FT_DEPTH", 96))


def main():
    import jax
    if os.environ.get("FT_CPU"):  # logic smoke test on the CPU backend
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.devices()[0].platform == "tpu", jax.devices()
    import faiss_tpu
    from faiss_tpu.storage import ROW_TILE

    rng = np.random.default_rng(42)
    xq = rng.integers(0, 256, (NQ, D)).astype(np.float32)

    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="int8")
    if os.environ.get("FT_CPU"):
        idx.set_force_xla(True)  # smoke the script, not interpret-mode Pallas
    # capacity aligned to the direct sweep tile: nv_eff then aligns too, so
    # the program is ONE Mosaic sweep kernel (tail-free). The first r4 run
    # allocated ROW_TILE-aligned capacity → a 13k-row transposed-tail kernel
    # entered the program and the remote compile never returned (the r3c
    # main+tail+rescore compile hazard, pallas_fused.py:400-418).
    from faiss_tpu.ops.pallas_fused import DIRECT_BV
    cap = ((NV_TOTAL + DIRECT_BV - 1) // DIRECT_BV) * DIRECT_BV
    idx.store._ensure_capacity(cap, exact=True)  # one 6.4 GB allocation

    db_u8 = np.empty((NV_TOTAL, D), np.uint8)  # host copy for the oracle
    t0 = time.perf_counter()
    for b in range(NV_TOTAL // BATCH):
        xb = rng.integers(0, 256, (BATCH, D))
        db_u8[b * BATCH:(b + 1) * BATCH] = xb
        idx.add(xb.astype(np.float32))
        if b % 10 == 9:
            print(f"added {(b + 1) * BATCH / 1e6:.0f}M rows "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    add_s = time.perf_counter() - t0
    print(idx.describe(), flush=True)
    print(f"add: {add_s:.1f}s total, "
          f"{NV_TOTAL / add_s / 1e6:.2f}M rows/s", flush=True)

    # warmup + blocking latency
    t0 = time.perf_counter()
    for _ in range(2):
        idx.search(xq, K)
    print(f"warmup (first compile): {time.perf_counter() - t0:.0f}s",
          flush=True)
    lats = []
    for _ in range(3):
        t0 = time.perf_counter()
        D_out, I_out = idx.search(xq, K)
        lats.append(time.perf_counter() - t0)
    lat_ms = min(lats) * 1e3
    print(f"blocking lat: {lat_ms:.1f} ms", flush=True)

    # pipelined throughput (depth-96 thread pool, best of 3 blocks)
    import concurrent.futures as cf
    n_total = DEPTH * 2
    pipe = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=DEPTH) as pool:
            futs = [pool.submit(idx.search, xq, K) for _ in range(n_total)]
            for f in futs:
                f.result()
        pipe = min(pipe, (time.perf_counter() - t0) / n_total)
    qps = NQ / pipe
    print(f"pipelined: {pipe * 1e3:.2f} ms/batch = {qps:.0f} QPS; "
          f"starting host f64 oracle (~20-40 min single-core)", flush=True)

    # chunked float64 oracle vs the ORIGINAL integer data: running top-K
    # merge over 1M-row chunks (full matrix would be 40 GB)
    t0 = time.perf_counter()
    q64 = xq.astype(np.float64)
    best_s = np.full((NQ, K), -np.inf)
    best_i = np.full((NQ, K), -1, np.int64)
    for c in range(NV_TOTAL // BATCH):
        xb = db_u8[c * BATCH:(c + 1) * BATCH].astype(np.float64)
        s = 2.0 * q64 @ xb.T - (xb * xb).sum(1)[None, :]
        part = np.argpartition(-s, K - 1, axis=1)[:, :K]
        ps = np.take_along_axis(s, part, axis=1)
        cs = np.concatenate([best_s, ps], axis=1)
        ci = np.concatenate([best_i, part + c * BATCH], axis=1)
        sel = np.argpartition(-cs, K - 1, axis=1)[:, :K]
        best_s = np.take_along_axis(cs, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
        del xb, s
    recall = np.mean([
        len(set(I_out[i]) & set(best_i[i])) / K for i in range(NQ)
    ])
    print(f"oracle: {time.perf_counter() - t0:.0f}s (chunked f64)",
          flush=True)
    print(f"== {NV_TOTAL / 1e6:.0f}M x {D} int8, ONE chip: "
          f"lat {lat_ms:.1f} ms/batch "
          f"(nq={NQ}), pipelined {qps:.0f} QPS, recall@10 {recall:.4f}, "
          f"fallbacks {idx.fused_fallbacks}, "
          f"hbm {idx.store.hbm_bytes() / 1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
