"""Utilities: profiling/QPS harness, observability helpers."""

from .profiling import BenchResult, bench_grid, measure_search, trace  # noqa: F401
