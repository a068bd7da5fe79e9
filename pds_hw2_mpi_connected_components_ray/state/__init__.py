"""Persistent iteration state: per-superstep Parquet checkpoints with
frontier deltas and per-partition lineage/metrics, enabling
mid-iteration resume of a killed run (north_rule requirement; the
reference has no checkpointing -- a failed rank kills the job)."""
