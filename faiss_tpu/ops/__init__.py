"""Compute ops: distance stage, L2 norms, top-k selection, Pallas kernels.

≈ the reference's L3 op modules + L2 Metal kernels
(src/MetalDistance.*, src/MetalSelect.*, src/MetalL2Norm.*, shaders/*.metal).
"""

from . import l2norm, distance, topk  # noqa: F401
