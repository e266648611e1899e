# Developer entry points (≈ the reference's devenv scripts build/test/bench,
# devenv.nix:44-82). The native lib builds itself on first import; `make
# native` forces a rebuild.

PY ?= python

.PHONY: test bench native clean lint

test:
	# 64 MB stack: the XLA CPU compile of the biggest interpret-mode
	# shard_map programs recurses near the default 8 MB limit (full-suite
	# segfaults in sharded-IVF compile, 2026-08-21; standalone passed)
	bash -c 'ulimit -s 65536 2>/dev/null; exec $(PY) -m pytest tests/ -x -q'

bench:
	$(PY) bench.py

grid:
	$(PY) -c "import faiss_tpu; from faiss_tpu.utils.profiling import bench_grid, DEFAULT_GRID; \
	bench_grid(lambda d, m, s: faiss_tpu.TpuIndexFlat(d, metric=m, storage=s), DEFAULT_GRID)"

native:
	rm -rf faiss_tpu/native/_build
	$(PY) -c "from faiss_tpu import native; assert native.available(), 'native build failed'"

clean:
	rm -rf faiss_tpu/native/_build **/__pycache__ .pytest_cache
