"""Reusable Dataset -> Dataset stages (symmetrize, dedup, joins, CSR,
skew handling). Each stage is a composition of map_batches / groupby /
sort over Arrow batches; none materializes the full input."""
