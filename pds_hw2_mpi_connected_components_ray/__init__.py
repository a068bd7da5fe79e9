"""Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of the MPI+OpenMP
connected-components solver ``dimgerasimou/pds-hw2-mpi-connected-components``
(reference, read-only at /root/reference) as idiomatic ``ray.data``
pipelines: Parquet web-page tables -> deterministic link extraction ->
hash-partitioned edge table -> iterative graph analytics (connected
components via hash-min label propagation, PageRank, label-propagation
communities, triangle counting) over zero-copy Arrow batches, plus the
training-data operators a web-scale pipeline needs (dedup families,
similarity search, text analysis, multimodal plumbing).

Reference semantics anchored (file:line cites are into /root/reference):
  - undirected symmetric edge closure   src/converter/mtx_to_bin.c:199-213
  - binary (unweighted) adjacency       src/matrix.c:8-9
  - canonical min-vertex-id CC labels   src/connected_components.c:94-123
  - determinism across parallelism      src/benchmark.c:275-284

Design rules (see SURVEY.md):
  - Dataset + map_batches over Arrow, never per-row Python in hot paths.
  - Labels/state live in Datasets (hash-partitioned), never replicated
    O(n) per worker (the reference's MPI_Allgatherv failure mode).
  - Shuffle volume proportional to the change frontier per superstep.
  - Stateful stages are actor pools; broadcast small sides via ray.put.
"""

__version__ = "0.1.0"


def _tune_numpy_hugepage() -> None:
    """Disable numpy's MADV_HUGEPAGE on large allocations (>=4 MiB).

    Measured on this host (virtualized, THP=madvise): a 2 MiB
    transparent-huge-page fault costs 1-8 ms vs ~2 us for a 4 KiB
    fault -- so every fresh numpy temporary paid ~1000x in kernel
    time. The shard-load leg (16 actors building CSCs concurrently)
    spent 368 cpu-s in stime vs 37 cpu-s in utime; with the madvise
    off, the identical 32 GiB alloc-touch wave dropped 9.5 s -> 1.4 s.
    Runs at import so every Ray worker that loads this package is
    tuned, with no dependence on env-var inheritance. Re-enable on
    hosts with healthy THP via GRAFT_NUMPY_HUGEPAGE=1.
    """
    import os

    if os.environ.get("GRAFT_NUMPY_HUGEPAGE") == "1":
        return
    try:
        from numpy.core import multiarray as _m

        _m._set_madvise_hugepage(False)
    except (ImportError, AttributeError):  # numpy >=2 moved/renamed it
        try:
            from numpy._core import multiarray as _m

            _m._set_madvise_hugepage(False)
        except (ImportError, AttributeError):
            pass


_tune_numpy_hugepage()
