"""Certificate pass-rate of the reduced (single-pass) sweep at the bench
shape — decides whether pick_sweep_passes may default to 1 there.

Reports, for fp32/bf16 x gaussian/SIFT-like data, the per-query margin
(vals[k-1] - t) vs the certified error bound eps, and the cert rate for
sweep_passes in (1, 2).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(42)
    nv_eff = 1_000_448

    def mkdata(kind):
        if kind == "gauss":
            xb = rng.standard_normal((NV, D)).astype(np.float32)
            xq = rng.standard_normal((NQ, D)).astype(np.float32)
        else:  # SIFT-like: non-negative heavy-tailed ints
            xb = np.minimum(np.floor(rng.gamma(0.55, 48.0, (NV, D))),
                            218.0).astype(np.float32)
            xq = np.minimum(np.floor(rng.gamma(0.55, 48.0, (NQ, D))),
                            218.0).astype(np.float32)
        return np.pad(xb, ((0, nv_eff - NV), (0, 0))), xq

    for kind in ("gauss", "sift"):
        xb, xq = mkdata(kind)
        q = jnp.asarray(xq)
        for storage in ("bf16", "f32"):
            if storage == "bf16":
                db = jnp.asarray(xb).astype(jnp.bfloat16)
                vn = jnp.sum(db.astype(jnp.float32) ** 2, axis=-1)
                split = None
            else:
                db = jnp.asarray(xb)
                vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
                split = split_f32_bf16(db)
            for sp in (1, 2):
                v, i, c = jax.device_get(pf.fused_search(
                    q, db, vn, jnp.int32(NV), k=K, metric=M,
                    nv_eff=nv_eff, db_split=split, sweep_passes=sp))
                rate = float(np.asarray(c).mean())
                print(f"{kind} {storage} passes={sp}: cert rate {rate:.4f}",
                      flush=True)


if __name__ == "__main__":
    main()
