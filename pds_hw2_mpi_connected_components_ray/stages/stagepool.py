"""Stage execution policy: actor pool vs plain tasks.

A callable-class stage (`map_batches(Cls, concurrency=...)`) pays an
actor-pool COLD START per query: Ray spawns fresh actor processes,
each re-importing the stack, before the first batch flows (measured
~1.5-2 s/query at sf0.1 even for stages whose __init__ is
microseconds). Plain TASKS run in Ray's long-lived worker processes,
so a per-worker-process memo gives the same setup-once-per-worker
amortization with zero spawn latency and identical scale-out.

Policy (`stage_map_batches`): ``concurrency=None`` -> plain tasks with
the stage instance memoized per worker process; an explicit int/tuple
-> a dedicated actor pool, the right call for HEAVY setup (model
weights, real codec contexts) or when the stage must own pinned
resources. Every cheap-setup stage in the engine routes through here;
heavy-setup stages (textpipe.quality_classifier) keep their pools.
"""

from __future__ import annotations

from ray.data import Dataset

# per-worker-process stage instances; task workers are long-lived, so
# this survives across tasks AND queries within one Ray session
_STAGE_CACHE: dict = {}


def _autoscale_pool():
    from ..context import default_parallelism

    return (1, max(2, default_parallelism()))


def stage_map_batches(ds: Dataset, cls, kwargs: dict, concurrency, **mb_kwargs):
    """map_batches over a callable-class stage under the policy above.

    `kwargs` values must be hashable (they key the per-worker memo).
    """
    if concurrency is not None:
        return ds.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            concurrency=concurrency,
            **mb_kwargs,
        )
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def fn(batch):
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = cls(**kwargs)
            _STAGE_CACHE[key] = st
        return st(batch)

    return ds.map_batches(fn, **mb_kwargs)
