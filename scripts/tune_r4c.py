"""Round-4c: IVF fine-scan device-time A/B on the REAL skewed 1M mixture
(the bench regime: nlist=1024, k-means cap=16384, load 0.06).

Host-QPS through the tunnel cannot localize on-device cost (ivf1m_v2
swings: flat 8.6k→15.8k run-to-run while ivf fell 2.1k→0.6k). Slope-measure
the jitted search program itself, variants head-to-head in one process:

  P      coarse probe only (GEMM + top-nprobe)
  G512   full search fn, chunk-row take, chunk=512 (current default)
  G128 / G2048   chunk-size scan
  ROW    full search fn, row-granular take (the pre-r4 gather)
  N4-*   the G512/ROW pair at nprobe=4

All variants share the same trained/filled index tensors.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

import faiss_tpu
from faiss_tpu import ivf as ivf_mod
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import distance as dist_ops

NV, D, NQ, K, NLIST = 1_000_000, 128, 104, 10, 1024
N1, N2 = 4, 24


def chain(n, fn):
    @jax.jit
    def run(x, q, *arrs):
        def step(c, _):
            d_, i_ = fn(*arrs, q + (x + c))
            return (jnp.sum(d_) + jnp.sum(i_.astype(jnp.float32))) * 1e-20, 0.
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c
    return run


def row_take_probed_scores(*, cap, nprobe, metric, kind, with_sel, nbudget):
    """The pre-r4c row-granular gather (for the A/B)."""
    chunk = min(ivf_mod._CHUNK, cap)
    ncand = nbudget * chunk
    QB = ivf_mod._QB

    def block(data, norms, counts, ids, sel, q, qeff, qn, probe, b):
        qs = jax.lax.dynamic_slice_in_dim(qeff, b * QB, QB, axis=0)
        qns = jax.lax.dynamic_slice_in_dim(qn, b * QB, QB, axis=0)
        pr = jax.lax.dynamic_slice_in_dim(probe, b * QB, QB, axis=0)
        cnt = jnp.take(counts, pr, axis=0)
        ccnt = -(-cnt // chunk)
        offs = jnp.cumsum(ccnt, axis=-1) - ccnt
        pos = jax.lax.iota(jnp.int32, nbudget)
        li = jnp.sum((offs[:, :, None] <= pos[None, None, :]).astype(
            jnp.int32), axis=1) - 1
        li = jnp.clip(li, 0, nprobe - 1)
        within = pos[None, :] - jnp.take_along_axis(offs, li, axis=-1)
        okc = within < jnp.take_along_axis(ccnt, li, axis=-1)
        lst = jnp.take_along_axis(pr, li, axis=-1)
        lcnt = jnp.take_along_axis(cnt, li, axis=-1)
        base = jnp.where(okc, lst * cap + within * chunk, 0)
        flat = (base[:, :, None]
                + jax.lax.iota(jnp.int32, chunk)[None, None, :]
                ).reshape(QB, ncand)
        flat = jnp.minimum(flat, data.shape[0] - 1)
        cand = jnp.take(data, flat, axis=0)
        cnn = jnp.take(norms, flat, axis=0)
        cid = jnp.take(ids, flat, axis=0)
        row = (within[:, :, None] * chunk
               + jax.lax.iota(jnp.int32, chunk)[None, None, :])
        valid = (okc[:, :, None] & (row < lcnt[:, :, None])).reshape(QB, ncand)
        from faiss_tpu.storage import split3_f32_bf16
        dn = (((2,), (1,)), ((0,), (0,)))
        dots = None
        for qp_ in split3_f32_bf16(qs):
            dp = jax.lax.dot_general(cand, qp_, dn,
                                     preferred_element_type=jnp.float32)
            dots = dp if dots is None else dots + dp
        s = 2.0 * dots - cnn - qns[:, None]
        return jnp.where(valid, s, -jnp.inf), cid

    return block


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, NV)
    xb = (cents[comp] + rng.standard_normal((NV, D))).astype(np.float32)
    qcomp = rng.integers(0, ncomp, NQ)
    q = jnp.asarray((cents[qcomp]
                     + rng.standard_normal((NQ, D))).astype(np.float32))

    t0 = time.time()
    idx = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage="bf16", nprobe=1,
                                    train_niter=10, seed=7)
    sub = xb[np.random.default_rng(3).choice(NV, 262_144, replace=False)]
    idx.train(sub)
    idx.add(xb)
    print(f"built ({time.time()-t0:.0f}s) {idx.describe()}", flush=True)
    sizes = idx.list_sizes()
    print(f"list sizes: max {sizes.max()}, p99 {np.percentile(sizes, 99):.0f},"
          f" mean {sizes.mean():.0f}, p50 {np.percentile(sizes, 50):.0f}",
          flush=True)
    A = (idx._data, idx._norms, idx._counts_dev, idx._ids, idx._cents,
         idx._cnorms)
    nq_pad = ivf_mod._round_up(NQ, ivf_mod._QB)
    qp = jnp.zeros((nq_pad, idx.d_pad), jnp.float32).at[:NQ].set(q)

    def build(nprobe, chunk, rowtake):
        old_chunk, old_ps = ivf_mod._CHUNK, ivf_mod._probed_scores
        ivf_mod._CHUNK = chunk
        if rowtake:
            ivf_mod._probed_scores = row_take_probed_scores
        try:
            nb = ivf_mod._chunk_budget(idx._counts, nprobe,
                                       min(chunk, idx.cap))
            f = ivf_mod._build_ivf_search_fn(
                nlist=NLIST, cap=idx.cap, nprobe=nprobe, nq_pad=nq_pad,
                k=K, d_pad=idx.d_pad, metric=MetricType.L2, kind="bf16",
                nbudget=nb)
            print(f"  nprobe={nprobe} chunk={chunk} budget={nb} "
                  f"ncand={nb*min(chunk, idx.cap)}", flush=True)
            return lambda *a: f(*a)
        finally:
            ivf_mod._CHUNK, ivf_mod._probed_scores = old_chunk, old_ps

    def probe_only(data, norms, counts, ids, cents_, cnorms_, qq):
        cs = dist_ops.matmul_scores(qq, cents_, cnorms_, MetricType.L2)
        v, i = jax.lax.top_k(cs, 4)
        return v, i

    specs = [
        ("P     probe only", probe_only),
        ("G512  np1 chunk-take", build(1, 512, False)),
        ("G128  np1 chunk-take", build(1, 128, False)),
        ("G2048 np1 chunk-take", build(1, 2048, False)),
        ("ROW   np1 row-take", build(1, 512, True)),
        ("G512n4 np4 chunk-take", build(4, 512, False)),
        ("ROWn4  np4 row-take", build(4, 512, True)),
    ]
    variants = {}
    for name, f in specs:
        t0 = time.time()
        try:
            r1, r2 = chain(N1, f), chain(N2, f)
            _ = np.asarray(r1(jnp.float32(0.0), qp, *A))
            _ = np.asarray(r2(jnp.float32(0.0), qp, *A))
            print(f"compiled {name} ({time.time()-t0:.1f}s)", flush=True)
            variants[name] = (r1, r2)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    res = {n: [] for n in variants}
    for rep in range(6):
        for n, (r1, r2) in variants.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), qp, *A))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), qp, *A))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
        print(f"rep {rep} done", flush=True)
    print(f"== on-device ms/batch (nq={NQ}, k={K}, 1M mixture, "
          f"nlist={NLIST}) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
