"""Checkpoint/resume: a killed-and-resumed CC run must equal a fresh run
(north_rule requirement; BASELINE.md 'resume' target)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from fixtures.synth_pages import g_path, g_ring_of_cliques
from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
from pds_hw2_mpi_connected_components_ray.pipelines.labelprop import labelprop
from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from pds_hw2_mpi_connected_components_ray.state import checkpoint as ckpt
from tests.oracles import cc_union_find


def _labels(res):
    df = res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    return df["vertex"].to_numpy(), df["label"].to_numpy()


@pytest.mark.parametrize("mode", ["local", "shuffle", "pinned"])
def test_resume_equals_fresh(tmp_path, mode):
    g = g_path(300)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    ckdir = str(tmp_path / f"ck_{mode}")

    # fresh full run (no checkpointing) = golden
    fresh = connected_components(edges, method="hashmin", mode=mode)
    fv, fl = _labels(fresh)

    # "killed" run: stop after 2 supersteps (simulates job death)
    partial = connected_components(
        edges, method="hashmin", mode=mode, max_supersteps=2, checkpoint_dir=ckdir
    )
    assert ckpt.latest_superstep(ckdir) == 1  # supersteps 0,1 checkpointed
    assert partial.supersteps == 2

    # resumed run completes from the checkpoint
    resumed = connected_components(
        edges, method="hashmin", mode=mode, checkpoint_dir=ckdir, resume=True
    )
    assert resumed.resumed_from == 1
    rv, rl = _labels(resumed)
    assert np.array_equal(rv, fv)
    assert np.array_equal(rl, fl)
    # and matches the oracle
    oracle = cc_union_find(g.n, g.edges)
    assert np.array_equal(rl, oracle[rv])
    # strictly fewer supersteps than fresh (work was actually reused)
    assert resumed.supersteps < fresh.supersteps + 2


def test_incomplete_checkpoint_ignored(tmp_path):
    g = g_ring_of_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    ckdir = str(tmp_path / "ck")
    connected_components(
        edges, method="hashmin", mode="local", max_supersteps=2, checkpoint_dir=ckdir
    )
    last = ckpt.latest_superstep(ckdir)
    # corrupt the newest checkpoint: drop its _SUCCESS marker
    os.remove(os.path.join(ckdir, f"superstep_{last:06d}", "_SUCCESS"))
    assert ckpt.latest_superstep(ckdir) == last - 1
    resumed = connected_components(
        edges, method="hashmin", mode="local", checkpoint_dir=ckdir, resume=True
    )
    assert resumed.resumed_from == last - 1
    oracle = cc_union_find(g.n, g.edges)
    rv, rl = _labels(resumed)
    assert np.array_equal(rl, oracle[rv])


def test_lineage_metrics_recorded(tmp_path):
    g = g_ring_of_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    ckdir = str(tmp_path / "ck")
    connected_components(edges, method="hashmin", mode="local", checkpoint_dir=ckdir)
    last = ckpt.latest_superstep(ckdir)
    assert last is not None
    _, _, lineage = ckpt.load_superstep(ckdir, last)
    assert lineage["superstep"] == last
    assert "changed" in lineage and "wall_s" in lineage and lineage["mode"] == "local"
    # final superstep converged
    assert lineage["changed"] == 0


@pytest.mark.parametrize("mode", ["shuffle", "pinned"])
def test_checkpoint_writes_are_distributed(tmp_path, mode):
    """Shuffle-mode checkpoints are written by workers via
    Dataset.write_parquet and pinned-mode ones by the shard actors --
    labels must land as parquet PART files (one per block/shard), never
    a single driver-concatenated table (round-1 regression)."""
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    ckdir = str(tmp_path / f"ckd_{mode}")
    connected_components(edges, mode=mode, max_supersteps=2, checkpoint_dir=ckdir)
    step = ckpt.step_dir(ckdir, ckpt.latest_superstep(ckdir))
    parts = [f for f in os.listdir(os.path.join(step, "labels")) if f.endswith(".parquet")]
    if mode == "pinned":
        # shard actors write one part each
        assert len(parts) >= 2, parts
    else:
        # shuffle state is block-bundled (may be ONE block at toy
        # scale), but every part must carry Ray's write-task naming —
        # written by Dataset.write_parquet workers, never a single
        # driver-concatenated pandas file (round-1 regression)
        assert parts, parts
        assert all("_00000" in f for f in parts), parts
    # and the parts reassemble to a complete label table
    lt, _, _ = ckpt.load_superstep(ckdir, ckpt.latest_superstep(ckdir))
    assert len(lt) == len(np.unique(g.edges.reshape(-1)))


@pytest.mark.parametrize("from_mode,to_mode", [("shuffle", "pinned"), ("pinned", "shuffle"), ("local", "pinned")])
def test_cross_mode_resume(tmp_path, from_mode, to_mode):
    """Checkpoints are a FORMAT contract, not a solver detail: a run
    killed under one execution strategy must resume under another
    (e.g. shrink/grow the cluster and switch modes) with identical
    final labels."""
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    golden = connected_components(edges, mode=from_mode)
    gv, gl = _labels(golden)

    ckdir = str(tmp_path / f"x_{from_mode}_{to_mode}")
    connected_components(edges, mode=from_mode, max_supersteps=1, checkpoint_dir=ckdir)
    res = connected_components(edges, mode=to_mode, checkpoint_dir=ckdir, resume=True)
    rv, rl = _labels(res)
    assert np.array_equal(rv, gv)
    assert np.array_equal(rl, gl)
    assert res.resumed_from == 0


# ------------------------------------------- PageRank / LPA resume
# (the CC layout generalized: generic-state checkpoints under the same
# superstep_%06d + _SUCCESS contract; a 20-iteration PageRank that dies
# at 18 repeats 2 iterations, not 18)


@pytest.mark.parametrize("mode", ["local", "shuffle", "pinned"])
def test_pagerank_resume_equals_fresh(tmp_path, mode):
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4)).materialize()
    fresh = pagerank(edges, max_iters=8, mode=mode)
    fr = fresh.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)

    ckdir = str(tmp_path / f"pr_{mode}")
    partial = pagerank(edges, max_iters=3, mode=mode, checkpoint_dir=ckdir)
    assert partial.iterations == 3
    assert ckpt.latest_superstep(ckdir) == 3

    res = pagerank(edges, max_iters=8, mode=mode, checkpoint_dir=ckdir, resume=True)
    assert res.resumed_from == 3
    rr = res.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(fr["vertex"].to_numpy(), rr["vertex"].to_numpy())
    assert np.allclose(fr["rank"].to_numpy(), rr["rank"].to_numpy(), atol=1e-12)


@pytest.mark.parametrize("mode", ["local", "shuffle", "pinned"])
def test_labelprop_resume_equals_fresh(tmp_path, mode):
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4)).materialize()
    fresh = labelprop(edges, iterations=4, mode=mode)
    fl = fresh.labels.to_pandas().sort_values("vertex").reset_index(drop=True)

    ckdir = str(tmp_path / f"lp_{mode}")
    labelprop(edges, iterations=2, mode=mode, checkpoint_dir=ckdir)
    assert ckpt.latest_superstep(ckdir) == 2

    res = labelprop(edges, iterations=4, mode=mode, checkpoint_dir=ckdir, resume=True)
    assert res.resumed_from == 2
    rl = res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(fl["vertex"].to_numpy(), rl["vertex"].to_numpy())
    assert np.array_equal(fl["label"].to_numpy(), rl["label"].to_numpy())


@pytest.mark.parametrize(
    "from_mode,to_mode", [("shuffle", "pinned"), ("pinned", "local")]
)
def test_pagerank_cross_mode_resume(tmp_path, from_mode, to_mode):
    """The (vertex, rank) state is a FORMAT contract: a run killed under
    one execution strategy resumes under another (shrink/grow the
    cluster, switch modes) with identical trajectories."""
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4)).materialize()
    golden = pagerank(edges, max_iters=8, mode=to_mode)
    gr = golden.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)

    ckdir = str(tmp_path / f"prx_{from_mode}_{to_mode}")
    pagerank(edges, max_iters=3, mode=from_mode, checkpoint_dir=ckdir)
    res = pagerank(edges, max_iters=8, mode=to_mode, checkpoint_dir=ckdir, resume=True)
    assert res.resumed_from == 3
    rr = res.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.allclose(gr["rank"].to_numpy(), rr["rank"].to_numpy(), atol=1e-12)


def test_pagerank_incomplete_checkpoint_ignored(tmp_path):
    g = g_ring_of_cliques(k=8, size=6)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4)).materialize()
    ckdir = str(tmp_path / "pr_inc")
    pagerank(edges, max_iters=3, mode="local", checkpoint_dir=ckdir)
    os.remove(os.path.join(ckdir, "superstep_000003", "_SUCCESS"))
    assert ckpt.latest_superstep(ckdir) == 2
    res = pagerank(edges, max_iters=8, mode="local", checkpoint_dir=ckdir, resume=True)
    assert res.resumed_from == 2
    fresh = pagerank(edges, max_iters=8, mode="local")
    fr = fresh.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    rr = res.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    assert np.allclose(fr, rr, atol=1e-12)


def test_scc_resume_equals_fresh(tmp_path):
    """SCC peel-round checkpoints: a run stopped after round 1 resumes
    to labels identical to the uninterrupted solve."""
    import pyarrow as pa
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.scc import scc_labels

    # chain of 6 directed 5-cycles bridged one-way: peels over 6 rounds
    rows = []
    for c in range(6):
        base = c * 10
        rows += [(base + i, base + (i + 1) % 5) for i in range(5)]
        if c < 5:
            rows.append((base + 1, base + 10))
    arr = np.array(rows, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))

    fresh = scc_labels(ds, nshards=3).to_pandas().sort_values("vertex")
    ckdir = str(tmp_path / "scc_ck")
    info: dict = {}
    partial = scc_labels(
        ds, nshards=3, checkpoint_dir=ckdir, stop_after_rounds=1, info=info
    ).to_pandas()
    assert info["rounds"] == 1
    assert len(partial) < len(fresh)  # genuinely partial
    assert ckpt.latest_superstep(ckdir) == 1

    info2: dict = {}
    res = (
        scc_labels(ds, nshards=3, checkpoint_dir=ckdir, resume=True, info=info2)
        .to_pandas()
        .sort_values("vertex")
    )
    assert info2["resumed_from"] == 1
    assert np.array_equal(fresh["vertex"].to_numpy(), res["vertex"].to_numpy())
    assert np.array_equal(fresh["label"].to_numpy(), res["label"].to_numpy())
