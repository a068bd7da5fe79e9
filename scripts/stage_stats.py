"""Per-stage Ray Data stats for the headline pipelines -- the
`ds.stats()` feedback loop the engine is tuned against.

Usage:  python scripts/stage_stats.py [sf_dir]

Prints, for each named pipeline, the Ray Data execution stats of its
final dataset (per-operator wall/cpu/rows/memory) so a perf regression
shows up as a named operator, not a bench delta. Owns its Ray session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from pds_hw2_mpi_connected_components_ray.context import configure_ray_data

    configure_ray_data(quiet=True)

    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import minhash_lsh_pairs
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        extract_link_rows,
        mint_edge_ids,
    )
    from pds_hw2_mpi_connected_components_ray.sources.edges import derive_raw_edges
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_documents
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges, symmetrize

    jobs = {
        "edges_build": lambda: canonical_edges(derive_raw_edges(sf_dir)),
        "etl_pages_to_minted_edges": lambda: symmetrize(
            mint_edge_ids(extract_link_rows(pages_from_documents(sf_dir)))
        ),
        "minhash_pairs": lambda: minhash_lsh_pairs(
            rd.read_parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
        ),
    }
    for name, build in jobs.items():
        ds = build().materialize()
        print(f"\n===== {name} (rows={ds.count()}) =====")
        print(ds.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
