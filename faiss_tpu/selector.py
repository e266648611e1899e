"""ID selectors + search parameters — filtered search, faiss-style.

faiss's ``SearchParameters{sel}`` restricts a search to a subset of the
stored vectors (faiss/impl/IDSelector.h). The reference ACCEPTS the params
argument and silently ignores it (src/MetalIndexFlat.mm:313-319 — ``params``
is never read), so a faiss user who passes a selector gets unfiltered
results with no error. Here the selector is honored exactly: excluded rows
are masked to −inf score inside the jitted scan, so they can never be
nominated, and fewer-than-k admissible rows sentinel-fill like a small
index (faiss semantics).

TPU shape discipline: the selector becomes ONE device bool stream of
capacity length. The plain paths apply it per column block in
`_masked_scores_block`; the fused kernels fold it into the SAME pre-masked
norm stream that already masks padding rows (+inf norm → −inf score in the
sweep AND the rescore — ops/pallas_fused._premask_norms), so filtered
search keeps the fused QPS (VERDICT r3 #3) and the filtered/unfiltered
criteria cannot drift. The exactness certificate is unchanged: its
threshold is the max masked group-max over non-nominated groups, and its ε
bounds per-row sweep-vs-rescore error — excluded rows are −inf on both
sides, so certified results are the exact top-k of the admitted subset.

Selectors evaluate on the host over an int64 id vector (`is_member(ids)`),
which lets TpuIndexIDMap translate them: positional indexes evaluate
selectors over arange(ntotal), the IDMap evaluates them over its CUSTOM id
map (faiss's IDSelectorTranslated discipline, faiss/IndexIDMap.cpp).
"""

from typing import Optional

import numpy as np

__all__ = [
    "IDSelector",
    "IDSelectorRange",
    "IDSelectorBatch",
    "IDSelectorMask",
    "IDSelectorNot",
    "IDSelectorAnd",
    "IDSelectorOr",
    "SearchParams",
    "SearchParameters",
    "SearchParametersIVF",
    "reject_ivf_params",
]


class IDSelector:
    """Membership predicate over int64 ids (vectorized, host-side)."""

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __invert__(self) -> "IDSelector":
        return IDSelectorNot(self)

    def __and__(self, other: "IDSelector") -> "IDSelector":
        return IDSelectorAnd(self, other)

    def __or__(self, other: "IDSelector") -> "IDSelector":
        return IDSelectorOr(self, other)


class IDSelectorRange(IDSelector):
    """ids in [imin, imax) — faiss::IDSelectorRange."""

    def __init__(self, imin: int, imax: int):
        self.imin, self.imax = int(imin), int(imax)

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        return (ids >= self.imin) & (ids < self.imax)


class IDSelectorBatch(IDSelector):
    """ids in an explicit set — faiss::IDSelectorBatch."""

    def __init__(self, ids):
        self.ids = np.unique(np.asarray(ids, dtype=np.int64).ravel())

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        return np.isin(ids, self.ids, assume_unique=False)


class IDSelectorMask(IDSelector):
    """Positional bool mask (mask[i] admits the vector at position/id i);
    ids past the mask are excluded. The escape hatch for precomputed
    masks — also what TpuIndexIDMap hands the inner index after
    translating a custom-id selector."""

    def __init__(self, mask):
        self.mask = np.asarray(mask, dtype=bool).ravel()

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        ok = (ids >= 0) & (ids < self.mask.size)
        out = np.zeros(ids.shape, dtype=bool)
        out[ok] = self.mask[ids[ok]]
        return out


class IDSelectorNot(IDSelector):
    def __init__(self, sel: IDSelector):
        self.sel = sel

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        return ~self.sel.is_member(ids)


class IDSelectorAnd(IDSelector):
    def __init__(self, *sels: IDSelector):
        self.sels = sels

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        m = self.sels[0].is_member(ids)
        for s in self.sels[1:]:
            m &= s.is_member(ids)
        return m


class IDSelectorOr(IDSelector):
    def __init__(self, *sels: IDSelector):
        self.sels = sels

    def is_member(self, ids: np.ndarray) -> np.ndarray:
        m = self.sels[0].is_member(ids)
        for s in self.sels[1:]:
            m |= s.is_member(ids)
        return m


class SearchParams:
    """≈ faiss::SearchParameters: optional selector restricting the search.
    Accepted by search / search_async / range_search. ``nprobe`` is the
    faiss::SearchParametersIVF per-query probe-width override — honored by
    TpuIndexIVFFlat, REJECTED loudly by flat indexes (faiss dynamic_casts
    its params and throws on a type mismatch; silent ignore is the
    reference's trap, see module docstring)."""

    def __init__(self, sel: Optional[IDSelector] = None,
                 nprobe: Optional[int] = None):
        if sel is not None and not isinstance(sel, IDSelector):
            raise TypeError(
                f"SearchParams.sel must be an IDSelector, got {type(sel)}")
        if nprobe is not None:
            nprobe = int(nprobe)
            if nprobe < 1:
                raise ValueError(f"nprobe must be >= 1, got {nprobe}")
        self.sel = sel
        self.nprobe = nprobe


def reject_ivf_params(params) -> None:
    """Flat-index guard: a params.nprobe override on a non-IVF index is a
    caller bug (faiss::IndexFlat would throw 'invalid search params')."""
    if isinstance(params, SearchParams) and params.nprobe is not None:
        raise ValueError(
            "params.nprobe is an IVF parameter; this index has no coarse "
            "quantizer (use TpuIndexIVFFlat, or drop nprobe)")


def selector_mask(params, ids: np.ndarray) -> Optional[np.ndarray]:
    """Evaluate ``params``' selector over ``ids`` → bool mask, or None when
    there is nothing to filter. Rejects unknown params objects LOUDLY — the
    reference's silent ignore is exactly the trap this avoids."""
    if params is None:
        return None
    if not isinstance(params, SearchParams):
        raise TypeError(
            f"params must be a faiss_tpu SearchParams, got {type(params)}")
    if params.sel is None:
        return None
    return params.sel.is_member(ids).astype(bool)


# faiss spelling aliases (faiss::SearchParameters / SearchParametersIVF):
# one params class serves both — flat indexes reject the IVF-only fields
# via reject_ivf_params rather than by type, so a selector written for a
# flat index works unchanged on an IVF index (faiss allows the same).
SearchParameters = SearchParams
SearchParametersIVF = SearchParams
