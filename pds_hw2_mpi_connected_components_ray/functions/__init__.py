"""Pure, deterministic per-row/per-batch functions (no Ray imports).

Everything here is a pure function of its inputs so that Ray Data
parallelism can never change results -- the engine-wide determinism
invariant mirroring the reference's trial-consistency check
(/root/reference/src/benchmark.c:275-284).
"""
