#!/bin/bash
# Full-suite runner with bounded memory: one pytest process per shard.
#
# The suite compiles hundreds of large interpret-mode Pallas programs;
# even with the per-module jax.clear_caches() teardown (tests/conftest.py)
# a single process accumulates allocator/thread state, and r4's single
# run segfaulted ~75% in at >11 GB RSS. Three processes keep the
# high-water mark low and lose nothing: shard boundaries are module
# boundaries, and the persistent on-disk compile cache is shared.
#
# Usage: tools/run_tests.sh [extra pytest args, e.g. -m "not slow"]
set -u
cd "$(dirname "$0")/.."
rc=0
# Shard 1: the two heaviest end-to-end modules (full-frame renders).
python -m pytest tests/test_trace_kernel.py tests/test_render.py \
  -q "$@" || rc=1
# Shard 2: remaining render-adjacent integration modules.
python -m pytest tests/test_fused.py tests/test_golden.py \
  tests/test_parallel.py tests/test_wavefront.py tests/test_bvh.py \
  tests/test_orchestration.py -q "$@" || rc=1
# Shard 3: everything else (unit-level, fast).
python -m pytest tests/ -q \
  --ignore tests/test_trace_kernel.py --ignore tests/test_render.py \
  --ignore tests/test_fused.py --ignore tests/test_golden.py \
  --ignore tests/test_parallel.py --ignore tests/test_wavefront.py \
  --ignore tests/test_bvh.py --ignore tests/test_orchestration.py \
  "$@" || rc=1
exit $rc
