"""Edge-table sources.

`derive_raw_edges` plants a deterministic directed link graph over the
driver's TPC-H-ish `lineitem` table so every graph query has a
DuckDB-expressible oracle (the SQL mirror lives in __ray_entry__ and
must stay in lockstep with this code):

    ngroups = max(64, nrows // 128)         -- graph grows with sf
    grp     = l_orderkey % ngroups
    src     = grp*8 + (l_partkey % 8)
    dst     = grp*8 + (l_suppkey % 8)       -- intra-community edges
  plus, for rows with l_linenumber == 1 and grp % 32 != 31:
    bridge  (grp*8, (grp+1)*8)              -- chains 32 groups into a
                                               diameter-~256 component

This yields many small communities chained into medium-diameter
components: small enough for a recursive-CTE SQL oracle at sf0.01,
large enough to exercise multi-superstep convergence and shuffles at
sf0.1+ (vertices ~ nrows/16).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

GROUP_SIZE = 8
CHAIN = 32


def ngroups_for(nrows: int) -> int:
    return max(64, nrows // 128)


def derive_raw_edges(sf_dir: str, scale_rep: int = 1) -> Dataset:
    """Directed raw edges (src, dst) planted over lineitem (see module
    docstring). Column-pruned read; fully vectorized derivation.

    ``scale_rep=R`` replicates the graph R times with disjoint group-id
    offsets (grp + r*ngroups): a deterministic R-fold scale-up of the
    same topology, used by bench.py to make the headline job
    compute-bound. R=1 (default) is the oracle-checked graph.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    )
    ng = ngroups_for(ds.count())

    def derive(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp0 = ok % ng
        srcs, dsts = [], []
        for r in range(scale_rep):
            grp = grp0 + r * ng
            src = grp * GROUP_SIZE + (pk % GROUP_SIZE)
            dst = grp * GROUP_SIZE + (sk % GROUP_SIZE)
            bmask = (ln == 1) & (grp0 % CHAIN != CHAIN - 1)
            srcs.extend([src, grp[bmask] * GROUP_SIZE])
            dsts.extend([dst, (grp[bmask] + 1) * GROUP_SIZE])
        return pa.table(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def from_numpy_edges(edges: np.ndarray, num_blocks: int = 4) -> Dataset:
    """Test helper: directed edge ndarray (m,2) -> Dataset in N blocks."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    t = pa.table({"src": e[:, 0], "dst": e[:, 1]})
    return rd.from_arrow(t).repartition(num_blocks)


def write_edges(edges: Dataset, path: str) -> None:
    """Partitioned Parquet sink for the canonical edge table."""
    edges.write_parquet(path)


def read_edges(path: str) -> Dataset:
    return rd.read_parquet(path, columns=["src", "dst"])
