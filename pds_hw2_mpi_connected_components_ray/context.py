"""Engine-wide execution defaults.

Centralizes the Ray Data knobs so every entry point (tests, bench, the
driver's ``__ray_entry__``) runs with the same quiet, streaming-friendly
configuration. Never calls ``ray.init`` -- session ownership stays with
the caller (driver / bench.py / tests/conftest.py).
"""

from __future__ import annotations

import os


def configure_ray_data(quiet: bool = True) -> None:
    """Apply engine defaults to the current DataContext (idempotent)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
    # Output order never matters for our relational/graph results (all
    # results are explicitly sorted or aggregated), so let the streaming
    # executor run fully out of order.
    ctx.execution_options.preserve_order = False
    return None


def default_parallelism() -> int:
    """Target partition count for shuffles/joins: ~2 blocks per CPU."""
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        cpus = int(os.environ.get("RAY_GRAFT_CPUS", os.cpu_count() or 8))
    return max(4, cpus)


def exchange_partitions() -> int:
    """Sort-partition count for a bucketed ``groupby("_kb")`` exchange:
    ~cluster parallelism. Ray's default is one sort partition per
    UPSTREAM BLOCK, which on tiny-block inputs (an exchange fed by
    another exchange, a unioned partial table) multiplies fixed
    per-partition costs for no parallelism gain. Pass this as
    ``groupby("_kb", num_partitions=...)`` at every bucketed-exchange
    site (the skew helpers already do)."""
    return max(8, default_parallelism())
