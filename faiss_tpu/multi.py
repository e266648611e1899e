"""Host-level composition of independent indexes (≈ faiss IndexShards).

Complements parallel.ShardedIndexFlat (one shard_map program over a mesh):
here each sub-index is searched independently — possibly on different
devices, processes or hosts — and the per-index k-lists merge on the host
with the native C++ two-pointer merge (native.ft_merge_topk_f32, the full-k
correct analog of the reference's block_select pairwise merge,
shaders/block_select.metal:49-79).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from . import native
from .dtypes import MetricType


def merge_search_results(
    results: Sequence[Tuple[np.ndarray, np.ndarray]],
    k: int,
    metric=MetricType.L2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-index (D, I) results (each sorted best-first, int64 labels
    already globally meaningful) into one (nq, k) result."""
    metric = MetricType.coerce(metric)
    largest = metric is MetricType.INNER_PRODUCT
    if not results:
        raise ValueError("no results to merge")
    D, I = results[0]
    D, I = np.asarray(D, np.float32), np.asarray(I, np.int64)
    if D.shape[1] > k:
        D, I = D[:, :k], I[:, :k]
    for Dn, In in results[1:]:
        D, I = native.merge_topk(
            D, I, np.asarray(Dn, np.float32), np.asarray(In, np.int64),
            min(k, D.shape[1] + Dn.shape[1]), largest=largest,
        )
    if D.shape[1] < k:  # fewer total candidates than k: sentinel fill
        pad = k - D.shape[1]
        sent = -np.inf if largest else np.inf
        D = np.pad(D, ((0, 0), (0, pad)), constant_values=sent)
        I = np.pad(I, ((0, 0), (0, pad)), constant_values=-1)
    return D, I


class IndexShardsHost:
    """Search several independent indexes as one (host-merged).

    Sub-indexes keep their own id spaces; ``add`` routes whole batches to the
    smallest shard and records each sub-index's global id base, so labels are
    insertion-order global ids like every other index here.
    """

    def __init__(self, indexes: Sequence):
        if not indexes:
            raise ValueError("need at least one sub-index")
        d = indexes[0].d
        metric = indexes[0].metric
        for ix in indexes:
            if ix.d != d or ix.metric != metric:
                raise ValueError("sub-indexes must share d and metric")
            if ix.ntotal:
                raise ValueError("sub-indexes must start empty "
                                 "(id bases are assigned by add())")
        self.indexes = list(indexes)
        self.d = d
        self.metric = metric
        self.ntotal = 0
        # per-sub-index list of (global_base, count) extents, insertion order
        self._extents: List[List[Tuple[int, int]]] = [[] for _ in indexes]

    def add(self, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.float32)
        n = x.shape[0]
        if n == 0:
            return
        tgt = int(np.argmin([ix.ntotal for ix in self.indexes]))
        self._extents[tgt].append((self.ntotal, n))
        self.indexes[tgt].add(x)
        self.ntotal += n

    def _globalize(self, which: int, labels: np.ndarray) -> np.ndarray:
        """local insertion-order id → global id via the extent table."""
        out = np.full_like(labels, -1)
        lo = 0
        for base, cnt in self._extents[which]:
            sel = (labels >= lo) & (labels < lo + cnt)
            out[sel] = labels[sel] - lo + base
            lo += cnt
        return out

    def search(self, x: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        toks = [ix.search_async(x, k) for ix in self.indexes]  # all in flight
        results = []
        for w, t in enumerate(toks):
            D, I = t.wait()
            results.append((D, self._globalize(w, I)))
        return merge_search_results(results, k, self.metric)

    def range_search(
        self, x: np.ndarray, radius: float,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-merged range search (faiss CSR (lims, D, I) — see
        TpuIndexFlat.range_search): every sub-index contributes ALL its
        in-radius rows, so the union is complete by construction; per-query
        segments re-sorted best-first with global-id tiebreak."""
        per = [(ix.range_search(x, radius), w)
               for w, ix in enumerate(self.indexes)]
        nq = per[0][0][0].shape[0] - 1
        largest = self.metric is MetricType.INNER_PRODUCT
        lims = np.zeros(nq + 1, np.int64)
        for (sl, _, _), _w in per:
            lims[1:] += np.diff(sl)
        np.cumsum(lims[1:], out=lims[1:])
        D = np.empty(lims[-1], np.float32)
        I = np.empty(lims[-1], np.int64)
        for qi in range(nq):
            pos = lims[qi]
            for (sl, sd, si), w in per:
                seg = slice(sl[qi], sl[qi + 1])
                n = sl[qi + 1] - sl[qi]
                D[pos:pos + n] = sd[seg]
                I[pos:pos + n] = self._globalize(w, si[seg])
                pos += n
            seg = slice(lims[qi], lims[qi + 1])
            order = np.lexsort((I[seg], -D[seg] if largest else D[seg]))
            D[seg], I[seg] = D[seg][order], I[seg][order]
        return lims, D, I

    def reset(self) -> None:
        for ix in self.indexes:
            ix.reset()
        self._extents = [[] for _ in self.indexes]
        self.ntotal = 0
