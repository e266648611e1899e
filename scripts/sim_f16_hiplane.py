"""Round-5: f16 hi-plane-first sweep — certificate-economics simulation
(VERDICT r4 task #7, carried from r3 #7).

Proposal under test: sweep only v_hi = bf16(v_f16) (halving the f16
clean-bits decode, the measured bottleneck: sweep 0.758 ms vs bf16's 0.37
at identical HBM bytes — r3m.log), charge the dropped q·v_lo term into the
certificate ε via a stored per-index statistic s0 = max‖v_f16 − hi‖ (the
exact-stats discipline of storage._split_stats_fn), and decode the full
pair only in the rescore.

This simulation computes, in numpy (f64 rescore, f32 BLAS sweeps), the
REAL per-query certificate margins at the bench shape and reports the
cert rate under the hi-plane ε vs the full-decode ε — on Gaussian data
(where f16 storage is interesting) and SIFT-like integer data (where
lo ≡ 0 and the hi plane is exact — the hi_exact phenomenon). The fused
path's fallback machinery re-runs uncertified queries through the exact
pair sweep, so the hi-plane sweep only wins if its cert rate stays near
the full-decode rate; every 1% of uncertified queries costs a fallback
re-run (at 8-row dispatch granularity).

Model (ops/pallas_fused._sweep_eps structure, dominant terms):
  full-decode 1-pass ε  = 2·(R·V)            + acc      (R = ‖q − bf16(q)‖)
  hi-plane    1-pass ε  = 2·(R·V + Q·s0)     + acc
  acc = 2·[(d+2)·u·((Q+R)·V) + 2·d·u·Q·V]    (sweep + rescore accumulation)
Cert condition per query: kth-best rescored true score ≥ t + ε, where t is
the best group-max among groups NOT nominated by the (hi-plane | full)
sweep, kg = k + GROUP_PAD nominated groups of 128 rows.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NV, D, NQ, K = 1_000_000, 128, 104, 10
GROUP, GROUP_PAD = 128, 4
KG = K + GROUP_PAD
U32 = 2.0 ** -24


def bf16(x):
    """Round f32 -> bf16 (RNE on the high 16 bits), back to f32."""
    u = x.astype(np.float32).view(np.uint32)
    rounded = (u + 0x7FFF + ((u >> 16) & 1)) & 0xFFFF0000
    return rounded.astype(np.uint32).view(np.float32)


def run(kind, seed=42):
    rng = np.random.default_rng(seed)
    if kind == "gauss":
        xb = rng.standard_normal((NV, D)).astype(np.float32)
        xq = rng.standard_normal((NQ, D)).astype(np.float32)
    else:  # SIFT-like non-negative heavy-tailed ints (check_cert_rate.py)
        xb = np.minimum(np.floor(rng.gamma(0.55, 48.0, (NV, D))),
                        218.0).astype(np.float32)
        xq = np.minimum(np.floor(rng.gamma(0.55, 48.0, (NQ, D))),
                        218.0).astype(np.float32)
    v16 = xb.astype(np.float16).astype(np.float32)   # stored f16 values
    hi = bf16(v16)
    lo = v16 - hi                                    # exact in f32
    n = (xb.astype(np.float64) ** 2).sum(1).astype(np.float32)  # stored norms
    s0 = float(np.sqrt((lo.astype(np.float64) ** 2).sum(1)).max())
    Q = np.sqrt((xq.astype(np.float64) ** 2).sum(1))
    qb = bf16(xq)
    R = np.sqrt(((xq - qb).astype(np.float64) ** 2).sum(1))
    V = float(np.sqrt((v16.astype(np.float64) ** 2).sum(1)).max())
    acc = 2.0 * ((D + 2) * U32 * (Q + R) * V + 2 * D * U32 * Q * V)
    eps_full = 2.0 * R * V + acc
    eps_hi = 2.0 * (R * V + Q * s0) + acc
    print(f"[{kind}] s0=max||v16-hi||={s0:.5f}  V={V:.2f}  "
          f"median eps_full={np.median(eps_full):.4f} "
          f"eps_hi={np.median(eps_hi):.4f}", flush=True)

    # sweeps (f32 BLAS): scores = 2 q.v - ||v||^2 (max-is-best)
    t0 = time.time()
    ngr = NV // GROUP
    nused = ngr * GROUP
    rates = {}
    margins = {}
    for name, vb in (("full", v16), ("hi", hi)):
        s = 2.0 * (qb @ vb[:nused].T) - n[None, :nused]  # (NQ, nused) f32
        g = s.reshape(NQ, ngr, GROUP).max(-1)            # group maxes
        nom = np.argpartition(-g, KG - 1, axis=1)[:, :KG]
        # t = best NON-nominated group max
        gm = g.copy()
        np.put_along_axis(gm, nom, -np.inf, axis=1)
        t = gm.max(1)
        # exact rescore of nominated groups (f64)
        kth = np.empty(NQ)
        for qi in range(NQ):
            rows = (nom[qi][:, None] * GROUP
                    + np.arange(GROUP)[None, :]).ravel()
            st = (2.0 * (v16[rows].astype(np.float64) @ xq[qi].astype(
                np.float64)) - n[rows])
            kth[qi] = np.sort(st)[-K]
        margins[name] = kth - t
        rates[name] = {
            "eps_full": float((kth - t >= eps_full).mean()),
            "eps_hi": float((kth - t >= eps_hi).mean()),
        }
        del s, g, gm
    print(f"[{kind}] ({time.time()-t0:.0f}s) "
          f"median margin full={np.median(margins['full']):.4f} "
          f"hi={np.median(margins['hi']):.4f}", flush=True)
    print(f"[{kind}] cert rate: full-decode sweep w/ eps_full "
          f"{rates['full']['eps_full']:.3f} | hi-plane sweep w/ eps_hi "
          f"{rates['hi']['eps_hi']:.3f} | (hi-plane w/ eps_full, UNSOUND, "
          f"upper bound {rates['hi']['eps_full']:.3f})", flush=True)
    return rates


if __name__ == "__main__":
    for kind in ("gauss", "sift"):
        run(kind)
