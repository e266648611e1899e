"""Pipelined-QPS vs pipeline depth (the headline is tunnel/host-bound)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import faiss_tpu
from faiss_tpu.utils.profiling import measure_search

NV, D, NQ, K = 1_000_000, 128, 100, 10
rng = np.random.default_rng(42)
xb = rng.standard_normal((NV, D), dtype=np.float32)
xq = rng.standard_normal((NQ, D), dtype=np.float32)
for storage in ("bf16", "f32"):
    idx = faiss_tpu.TpuIndexFlat(D, storage=storage)
    idx.add(xb)
    idx.search(xq, K)  # warm compile
    for depth in (32, 64, 128, 256):
        lat, pipe = measure_search(idx, xq, K, iters=3, depth=depth)
        print(f"{storage} depth={depth}: pipe={pipe:.2f} ms "
              f"qps={NQ/(pipe/1e3):.0f}", flush=True)
    del idx
