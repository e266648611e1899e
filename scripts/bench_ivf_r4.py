"""Round-4 IVF on-chip benchmark (VERDICT r3 #1: prove IVF is fast).

Measures TpuIndexIVFFlat QPS + recall@10 against the flat index on the SAME
data, nprobe swept, on clusterable (Gaussian-mixture) and i.i.d. Gaussian
data. QPS is pipelined wall-clock (async tokens, depth FT_DEPTH) — the same
host-throughput methodology as bench.py, since a tunneled device makes
blocking per-batch timing meaningless (CLAUDE.md).

Env knobs:
  FT_NV       rows (default 1_000_000)
  FT_NLIST    comma list of nlist values (default "1024")
  FT_STORAGE  comma list of storage modes (default "bf16,f32,int8")
  FT_DATA     "mix" | "gauss" | "mix,gauss" (default both)
  FT_NQ       query batch rows (default 104; also runs nq=8 latency view)
  FT_DEPTH    async pipeline depth (default 64)
  FT_BATCHES  timed batches per config (default 50)

Output: one human table per config + one JSON line per row to stdout
(collected into BENCHMARKS.md by hand).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NV = int(os.environ.get("FT_NV", 1_000_000))
NLISTS = [int(s) for s in os.environ.get("FT_NLIST", "1024").split(",")]
STORAGES = os.environ.get("FT_STORAGE", "bf16,f32,int8").split(",")
DATASETS = os.environ.get("FT_DATA", "mix,gauss").split(",")
D, K = 128, 10
NQ = int(os.environ.get("FT_NQ", 104))
DEPTH = int(os.environ.get("FT_DEPTH", 64))
BATCHES = int(os.environ.get("FT_BATCHES", 100))
TRAIN_N = 262_144
ADD_BATCH = 1_000_000


def make_data(kind, nv, nq, seed=42):
    """Clusterable mixture (the IVF regime) or i.i.d. Gaussian (the
    adversarial regime: true neighbors scatter across cells)."""
    rng = np.random.default_rng(seed)
    xq_extra = 8  # queries drawn from the same distribution
    if kind == "gauss":
        xb = rng.standard_normal((nv, D), dtype=np.float32)
        xq = rng.standard_normal((nq + xq_extra, D), dtype=np.float32)
        return xb, xq[:nq]
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, nv)
    xb = cents[comp] + rng.standard_normal((nv, D), dtype=np.float32)
    qcomp = rng.integers(0, ncomp, nq + xq_extra)
    xq = cents[qcomp] + rng.standard_normal(
        (nq + xq_extra, D), dtype=np.float32)
    return xb.astype(np.float32), xq[:nq].astype(np.float32)


def exact_oracle(xb, xq, k):
    """f64 top-k ids, chunked on the host."""
    out = np.zeros((len(xq), k), np.int64)
    best_d = np.full((len(xq), k), np.inf)
    q64 = xq.astype(np.float64)
    qn = (q64 * q64).sum(1)[:, None]
    for i0 in range(0, len(xb), 1_000_000):
        c = xb[i0:i0 + 1_000_000].astype(np.float64)
        d2 = qn - 2.0 * q64 @ c.T + (c * c).sum(1)[None, :]
        j = np.argpartition(d2, min(k, d2.shape[1] - 1), axis=1)[:, :k]
        dj = np.take_along_axis(d2, j, axis=1)
        alld = np.concatenate([best_d, dj], axis=1)
        alli = np.concatenate([out, j + i0], axis=1)
        sel = np.argsort(alld, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(alld, sel, axis=1)
        out = np.take_along_axis(alli, sel, axis=1)
    return out


def pipelined_qps(search_async, xq, nq, warm=5):
    """Thread-pool blocking searches (the profiling.measure_search serving
    pattern): every per-call host RPC overlaps across worker threads. A
    single-threaded async-enqueue loop caps at ~40 dispatches/s through the
    tunnel (~25 ms dispatch RPC on the calling thread) — the first ivf1m
    run measured exactly that ceiling and understated QPS ~10×."""
    import concurrent.futures as cf

    def one():
        return search_async(xq, K).wait()

    for _ in range(warm):
        one()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=DEPTH) as pool:
            futs = [pool.submit(one) for _ in range(BATCHES)]
            for f in futs:
                f.result()
        best = min(best, time.perf_counter() - t0)
    return BATCHES * nq / best


def recall_at_k(I, oracle, k=K):
    return float(np.mean([
        len(set(I[i, :k].tolist()) & set(oracle[i, :k].tolist())) / k
        for i in range(len(I))]))


def main():
    import jax
    if os.environ.get("FT_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.devices()[0].platform == "tpu", jax.devices()
    import faiss_tpu
    from faiss_tpu import SearchParams

    for data_kind in DATASETS:
        t0 = time.time()
        xb, xq = make_data(data_kind, NV, NQ)
        xq8 = xq[:8]
        print(f"[{data_kind}] data ready ({time.time()-t0:.0f}s)", flush=True)
        t0 = time.time()
        oracle = exact_oracle(xb, xq, K)
        print(f"[{data_kind}] f64 oracle ({time.time()-t0:.0f}s)", flush=True)

        for storage in STORAGES:
            if os.environ.get("FT_SKIP_FLAT"):
                # flat already measured elsewhere (e.g. the 50M r3q2 run);
                # ratios then come from that record, not this process
                If, qps_flat, qps_flat8 = None, 1.0, 1.0
            else:
                # flat baseline
                t0 = time.time()
                flat = faiss_tpu.TpuIndexFlat(D, storage=storage)
                for i0 in range(0, NV, ADD_BATCH):
                    flat.add(xb[i0:i0 + ADD_BATCH])
                print(f"[{data_kind}/{storage}] flat add "
                      f"({time.time()-t0:.0f}s)", flush=True)
                If = flat.search_async(xq, K).wait()[1]
                rf = recall_at_k(If, oracle)
                qps_flat = pipelined_qps(flat.search_async, xq, NQ)
                qps_flat8 = pipelined_qps(flat.search_async, xq8, 8)
                print(json.dumps({
                    "config": f"{data_kind}/{storage}/flat", "nv": NV,
                    "recall@10": round(rf, 4),
                    "qps_nq104": round(qps_flat, 1),
                    "qps_nq8": round(qps_flat8, 1)}), flush=True)
                del flat

            for nlist in NLISTS:
                t0 = time.time()
                ivf = faiss_tpu.TpuIndexIVFFlat(
                    D, nlist, storage=storage, nprobe=1, train_niter=10,
                    seed=7)
                sub = xb[np.random.default_rng(3).choice(
                    NV, min(TRAIN_N, NV), replace=False)]
                ivf.train(sub)
                print(f"  train nlist={nlist} ({time.time()-t0:.0f}s)",
                      flush=True)
                t0 = time.time()
                for i0 in range(0, NV, ADD_BATCH):
                    ivf.add(xb[i0:i0 + ADD_BATCH])
                print(f"  add ({time.time()-t0:.0f}s) {ivf.describe()}",
                      flush=True)
                for nprobe in (1, 2, 4, 8, 16, 32, 64):
                    if nprobe > nlist:
                        continue
                    params = SearchParams(nprobe=nprobe)
                    try:
                        Ii, _ = ivf.search_async(xq, K, params=params
                                                 ).wait()[1], None
                    except ValueError as e:  # gather budget exceeded
                        print(f"  nprobe={nprobe}: {e}", flush=True)
                        break
                    r = recall_at_k(Ii, oracle)
                    # routing recall: vs the flat index's own results
                    # (isolates probe recall from storage quantization,
                    # which caps the oracle recall)
                    r_flat = recall_at_k(Ii, If) if If is not None else -1.0
                    qps = pipelined_qps(
                        lambda q, k: ivf.search_async(q, k, params=params),
                        xq, NQ)
                    qps8 = pipelined_qps(
                        lambda q, k: ivf.search_async(q, k, params=params),
                        xq8, 8)
                    print(json.dumps({
                        "config": f"{data_kind}/{storage}/ivf{nlist}",
                        "nv": NV, "nprobe": nprobe,
                        "recall@10": round(r, 4),
                        "recall_vs_flat": round(r_flat, 4),
                        "qps_nq104": round(qps, 1),
                        "qps_nq8": round(qps8, 1),
                        "vs_flat_nq104": round(qps / qps_flat, 2),
                        "vs_flat_nq8": round(qps8 / qps_flat8, 2),
                        "pool_chunks": int(ivf._used_chunks),
                        "load": round(float(ivf.list_sizes().sum())
                                      / max(ivf._used_chunks * 128, 1), 3)}),
                        flush=True)
                del ivf


if __name__ == "__main__":
    main()
