"""`ray job submit` entrypoint: the full link-graph pipeline as a CLI.

    python -m pds_hw2_mpi_connected_components_ray.cli \
        --pages /data/pages_parquet_dir \
        --out /data/labels_out \
        --checkpoint-dir /data/ck [--resume] \
        [--analytics cc,pagerank,labelprop,triangles] [--num-cpus 32]

Reads a Common-Crawl-style pages table, extracts the edge table, runs
the requested analytics, and writes results as resumable partitioned
Parquet. Checkpoints every CC superstep so a killed job resumes
mid-iteration (north_rule). Owns its Ray session (guarded init) --
unlike the library code, which never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages Parquet file/dir")
    src.add_argument(
        "--mtx",
        help="MatrixMarket .mtx graph (the reference converter's input: "
        "mtx_to_bin graph.mtx + mpirun … graph.bin becomes this one flag)",
    )
    src.add_argument(
        "--bin", dest="bin_path", help="reference binary CSC .bin graph"
    )
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--analytics",
        default="cc",
        help="comma list: cc,pagerank,labelprop,triangles",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--mode", default="auto", help="cc execution mode")
    p.add_argument("--out-partitions", type=int, default=64)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from .context import configure_ray_data

    configure_ray_data(quiet=True)

    from .sources.sinks import write_partitioned

    t0 = time.perf_counter()
    if args.pages:
        from .pipelines.extract_pipeline import pages_to_edges
        from .sources.pages import read_pages

        pages = read_pages(args.pages, columns=["url", "html"])
        edges = pages_to_edges(pages).materialize()
    else:
        # the reference workflow verbatim: .mtx (or its converted .bin)
        # in, analytics out — symmetric closure matches the converter
        # (/root/reference/src/converter/mtx_to_bin.c:199-213)
        import ray.data as rd

        from .sources.mtx import read_bin, read_mtx
        from .stages.graph import canonical_edges

        if args.mtx:
            _n, raw = read_mtx(args.mtx)
        else:
            _n, raw = read_bin(args.bin_path)
        import pyarrow as pa

        edges = canonical_edges(
            rd.from_arrow(
                pa.table(
                    {
                        "src": raw[:, 0].astype("int64"),
                        "dst": raw[:, 1].astype("int64"),
                    }
                )
            )
        ).materialize()
    report: dict = {
        "n_edges": edges.count(),
        "etl_sec": round(time.perf_counter() - t0, 3),
        "outputs": {},
    }

    wanted = {a.strip() for a in args.analytics.split(",") if a.strip()}
    if "cc" in wanted:
        from .pipelines.cc import connected_components

        t = time.perf_counter()
        res = connected_components(
            edges,
            mode=args.mode,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        write_partitioned(
            res.labels, f"{args.out}/cc_labels", key="vertex",
            num_partitions=args.out_partitions,
        )
        report["outputs"]["cc"] = {
            "n_components": res.n_components,
            "supersteps": res.supersteps,
            "sec": round(time.perf_counter() - t, 3),
            "resumed_from": res.resumed_from,
        }
    if "pagerank" in wanted:
        from .pipelines.pagerank import pagerank

        t = time.perf_counter()
        pr = pagerank(edges, max_iters=50, tol=1e-9, mode=args.mode)
        write_partitioned(
            pr.ranks, f"{args.out}/pagerank", key="vertex",
            num_partitions=args.out_partitions,
        )
        report["outputs"]["pagerank"] = {
            "iterations": pr.iterations,
            "l1_delta": pr.l1_delta,
            "sec": round(time.perf_counter() - t, 3),
        }
    if "labelprop" in wanted:
        from .pipelines.labelprop import labelprop

        t = time.perf_counter()
        lp = labelprop(edges, iterations=8, mode=args.mode)
        write_partitioned(
            lp.labels, f"{args.out}/communities", key="vertex",
            num_partitions=args.out_partitions,
        )
        report["outputs"]["labelprop"] = {"sec": round(time.perf_counter() - t, 3)}
    if "triangles" in wanted:
        from .pipelines.triangles import triangle_count

        t = time.perf_counter()
        report["outputs"]["triangles"] = {
            "total": triangle_count(edges),
            "sec": round(time.perf_counter() - t, 3),
        }

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
