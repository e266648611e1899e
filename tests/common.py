"""Shared test utilities: numpy oracle + tolerance-ladder comparison.

The reference's oracle is CPU FAISS (tests/test_metal_flat.mm:61-130); ours is
an exact numpy brute-force search, since faiss isn't available in this image.
``compare_results`` mirrors compare_results at test_metal_flat.mm:16-59:
top-1 labels must match exactly, always; distances compared with a relative
tolerance ladder (1e-3 f32-L2 / 1e-2 IP / 5e-2 reduced precision —
BASELINE.md "Distance tolerance enforced by tests").
"""

from __future__ import annotations

import numpy as np

SEED = 42  # fixed everywhere, reference: mt19937 rng(42), test_metal_flat.mm:64


def make_data(nv, nq, d, seed=SEED):
    rng = np.random.default_rng(seed)
    xb = rng.standard_normal((nv, d), dtype=np.float32)
    xq = rng.standard_normal((nq, d), dtype=np.float32)
    return xb, xq


def numpy_search(xb, xq, k, metric="l2"):
    """Exact brute-force oracle. Ties broken by lowest index (stable sort)."""
    xb = np.asarray(xb, np.float64)
    xq = np.asarray(xq, np.float64)
    if metric == "l2":
        d2 = (
            (xq * xq).sum(1)[:, None]
            - 2.0 * (xq @ xb.T)
            + (xb * xb).sum(1)[None, :]
        )
        scores = -d2
    else:
        scores = xq @ xb.T
    k_eff = min(k, xb.shape[0])
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k_eff]
    top = np.take_along_axis(scores, order, axis=1)
    dist = -top if metric == "l2" else top
    D = np.full((xq.shape[0], k), np.inf if metric == "l2" else -np.inf, np.float32)
    I = np.full((xq.shape[0], k), -1, np.int64)
    D[:, :k_eff] = dist.astype(np.float32)
    I[:, :k_eff] = order
    return D, I


def recall_at_k(I_test, I_ref, k):
    """Fraction of oracle top-k ids recovered (BASELINE acceptance metric)."""
    hits = 0
    total = 0
    for row_t, row_r in zip(I_test, I_ref):
        ref = set(int(i) for i in row_r[:k] if i >= 0)
        if not ref:
            continue
        hits += len(ref & set(int(i) for i in row_t[:k]))
        total += len(ref)
    return hits / max(total, 1)


def compare_results(D_test, I_test, D_ref, I_ref, *, dist_tol, k,
                    check_top1=True, label=""):
    """Tolerance-ladder comparison (reference test_metal_flat.mm:16-59)."""
    D_test, I_test = np.asarray(D_test), np.asarray(I_test)
    D_ref, I_ref = np.asarray(D_ref), np.asarray(I_ref)
    assert D_test.shape == D_ref.shape, (label, D_test.shape, D_ref.shape)
    if check_top1:
        np.testing.assert_array_equal(
            I_test[:, 0], I_ref[:, 0],
            err_msg=f"{label}: top-1 labels must match exactly",
        )
    finite = np.isfinite(D_ref) & np.isfinite(D_test)
    # sentinels must agree in position
    np.testing.assert_array_equal(
        np.isfinite(D_test), np.isfinite(D_ref),
        err_msg=f"{label}: sentinel positions differ",
    )
    scale = np.maximum(np.abs(D_ref[finite]), 1.0)
    rel = np.abs(D_test[finite] - D_ref[finite]) / scale
    assert rel.size == 0 or rel.max() <= dist_tol, (
        f"{label}: max rel distance err {rel.max():.3e} > {dist_tol}"
    )
