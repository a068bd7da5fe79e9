"""Join strategies for Dataset pipelines.

Two physical strategies, one logical API:

- ``hash_join``: both sides large -> Ray Data's hash-shuffle
  ``Dataset.join`` (Ray 2.49 experimental). Partition count defaults to
  ~cluster CPUs. This is the scale path: an all-to-all exchange
  partitioned on the key.
- ``broadcast_attach``: small right side -> ``ray.put`` the lookup once,
  read it zero-copy in every map_batches task, attach via vectorized
  numpy searchsorted. No shuffle; right side must fit in worker memory.

The iterative graph kernels pick between them adaptively on the known
row count of the small side (frontier), mirroring the SURVEY.md section 4
guidance: shuffle volume proportional to the change frontier, never a
replicated O(n) snapshot unless n is provably small
(contrast /root/reference/src/connected_components.c:98-101 which always
replicates O(n) per rank).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import default_parallelism


def hash_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> Dataset:
    """Hash-shuffle join; thin wrapper fixing defaults for this engine."""
    npart = num_partitions or default_parallelism()
    return left.join(
        right,
        join_type=join_type,
        num_partitions=npart,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


class _LookupArrays:
    """Sorted-key lookup built once from a (key, value) table."""

    __slots__ = ("keys", "vals")

    def __init__(self, keys: np.ndarray, vals: np.ndarray):
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.vals = vals[order]

    def get(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (mask_found, values_for_found_clipped)."""
        idx = np.searchsorted(self.keys, q)
        idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
        found = (
            (self.keys[idx_c] == q) if len(self.keys) else np.zeros(len(q), dtype=bool)
        )
        return found, self.vals[idx_c] if len(self.keys) else np.zeros(len(q), self.vals.dtype)


def put_lookup(table: pa.Table, key: str, value: str) -> "ray.ObjectRef":
    """Broadcast a small (key, value) table to the object store once."""
    keys = table[key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vals = table[value].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return ray.put(_LookupArrays(keys, vals))


def broadcast_attach(
    left: Dataset,
    lookup_ref: "ray.ObjectRef",
    left_key: str,
    out_col: str,
    keep_missing: bool = False,
    missing_value: int = -1,
    batch_size: int | None = None,
) -> Dataset:
    """Attach lookup[left_key] as ``out_col`` via broadcast (no shuffle).

    Rows whose key is absent are dropped (inner-join semantics) unless
    ``keep_missing``, in which case ``missing_value`` is filled.
    """

    def attach(batch: pa.Table) -> pa.Table:
        lk: _LookupArrays = ray.get(lookup_ref)
        q = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        found, vals = lk.get(q)
        if keep_missing:
            out = np.where(found, vals, missing_value)
            return batch.append_column(out_col, pa.array(out, pa.int64()))
        idx = np.nonzero(found)[0]
        return batch.take(idx).append_column(out_col, pa.array(vals[idx], pa.int64()))

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return left.map_batches(attach, **kwargs)
