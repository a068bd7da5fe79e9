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
