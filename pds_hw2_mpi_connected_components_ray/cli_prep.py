"""`ray job submit` entrypoint for the training-data prep pipeline.

    python -m pds_hw2_mpi_connected_components_ray.cli_prep \
        --docs /data/documents_parquet \
        --out /data/prep_out \
        [--min-tokens 5] [--max-punct-ratio 0.2] [--jaccard 0.5] \
        [--num-cpus 32] [--out-partitions 64]

Reads a documents table (doc_id, text, ...), runs the corpus-prep
chain (quality gate -> exact dedup -> near-dup collapse), and writes:
  <out>/kept_ids/     surviving doc ids (resumable partitioned parquet)
  <out>/dup_groups/   (doc_id, group_id) near-dup clusters
plus a one-line JSON report on stdout. Owns its Ray session (guarded).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="documents Parquet file/dir")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.2)
    p.add_argument("--jaccard", type=float, default=0.5)
    p.add_argument("--num-cpus", type=int, default=None)
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

    import ray.data as rd

    from .pipelines.dedup import duplicate_groups, exact_dedup_keep, minhash_lsh_pairs
    from .pipelines.prep import quality_gate
    from .sources.sinks import write_partitioned

    t0 = time.perf_counter()
    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    n_in = docs.count()
    q = quality_gate(
        docs, min_tokens=args.min_tokens, max_punct_ratio=args.max_punct_ratio
    )
    kept = exact_dedup_keep(q).materialize()
    n_after_exact = kept.count()
    pairs = minhash_lsh_pairs(kept, threshold=args.jaccard).materialize()
    n_pairs = pairs.count()
    report = {
        "n_input": n_in,
        "n_after_quality_and_exact": n_after_exact,
        "n_near_dup_pairs": n_pairs,
    }
    ids = kept.select_columns(["doc_id"])
    if n_pairs:
        import pyarrow as pa
        import pyarrow.compute as pc

        groups = duplicate_groups(pairs).materialize()
        write_partitioned(
            groups, f"{args.out}/dup_groups", key="doc_id",
            num_partitions=args.out_partitions,
        )

        def mark_drop(t: pa.Table) -> pa.Table:
            import numpy as np

            f = t.filter(pc.not_equal(t["doc_id"], t["group_id"]))
            return pa.table(
                {
                    "doc_id": f["doc_id"],
                    "_drop": pa.array(np.ones(len(f), dtype=np.int64)),
                }
            )

        drop = groups.map_batches(
            mark_drop, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if drop.count():
            from .stages.joins import hash_join

            j = hash_join(ids, drop, on=("doc_id",), join_type="left_outer")
            ids = j.map_batches(
                lambda t: pa.table({"doc_id": t.filter(pc.is_null(t["_drop"]))["doc_id"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    ids = ids.materialize()
    report["n_kept"] = ids.count()
    write_partitioned(
        ids, f"{args.out}/kept_ids", key="doc_id",
        num_partitions=args.out_partitions,
    )
    report["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
