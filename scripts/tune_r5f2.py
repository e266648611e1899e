"""r5f2: bisect the 10M-bf16 flat-search wedge (non-blocking probes).

Evidence so far: the RAW fused_search program at this exact shape ran 256
chained iterations cleanly (r4d_10m.log FLAT row, 3.945 ms median), but
TpuIndexFlat.search at 10M bf16 wedged in device_get on its FIRST
blocking call (r5f.log faulthandler dumps) — after succeeding once in
ivf10m_v3 (the If search) and then wedging in the pipelined block. So
the wedge is (a) nondeterministic and (b) somewhere in the index-glue
program (sentinels / int32 packing / certificate) or its result fetch,
not in the Mosaic kernels.

Every probe here ENQUEUES ASYNC and POLLS token.is_ready() with a 90 s
deadline — a wedge marks the probe WEDGED and moves on (the orphaned
program may hold the device; later probes report CLAIM-LOST if so).
Probes: A1/A2/A3 repeated index searches; B force_xla (plain program);
C raw fused_search (known-good control); D index search again after C.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

NV, D, NQ, K = 10_000_000, 128, 100, 10
BATCH = 1_000_000
DEADLINE = 90.0


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    import faiss_tpu
    from faiss_tpu.dtypes import MetricType
    from faiss_tpu.ops import pallas_fused as pf

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
    print(f"add {time.time()-t0:.0f}s cap={idx.store.capacity}", flush=True)

    def poll(tag, tok):
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < DEADLINE:
            if tok.is_ready():
                out = tok.wait()
                print(f"{tag}: OK {(time.perf_counter()-t0)*1e3:.1f} ms "
                      f"fallbacks={idx.fused_fallbacks}", flush=True)
                return out
            time.sleep(0.2)
        print(f"{tag}: WEDGED (> {DEADLINE:.0f} s, program abandoned)",
              flush=True)
        return None

    for rep in range(3):
        poll(f"A{rep} index fused", idx.search_async(xq, K))

    idx.set_force_xla(True)
    poll("B  force_xla plain", idx.search_async(xq, K))
    idx.set_force_xla(False)

    # raw fused_search control (the r4d_10m-proven call), async via jit
    from faiss_tpu.storage import _round_up
    nv_eff = _round_up(NV, pf.DIRECT_BV)
    qp = np.zeros((_round_up(NQ, 8), D), np.float32)
    qp[:NQ] = xq
    qd = jnp.asarray(qp)

    t0 = time.perf_counter()
    v, i, c = pf.fused_search(qd, idx.store.db, idx.store.norms,
                              jnp.int32(NV), k=K, metric=MetricType.L2,
                              nv_eff=nv_eff, sweep_passes=1)
    got = np.asarray(jax.device_get(v))
    print(f"C  raw fused_search: OK {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"shape {got.shape}", flush=True)

    poll("D  index fused again", idx.search_async(xq, K))
    print("r5f2 COMPLETE", flush=True)


if __name__ == "__main__":
    main()
