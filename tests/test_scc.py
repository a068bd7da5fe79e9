"""FW-BW coloring SCC vs brute-force Tarjan."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.scc import scc_labels


def _ds(pairs):
    df = pd.DataFrame(sorted(set(pairs)), columns=["src", "dst"]).astype(np.int64)
    return rd.from_pandas(df)


def _tarjan(pairs):
    """Iterative Tarjan; returns {vertex: min-id-of-its-SCC} over the
    self-loop-free directed graph."""
    edges = {}
    verts = set()
    for a, b in pairs:
        if a == b:
            continue
        verts.add(a)
        verts.add(b)
        edges.setdefault(a, []).append(b)
    index = {}
    low = {}
    on = set()
    stack = []
    comp = {}
    counter = [0]
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, iter(edges.get(root, [])))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on.add(w)
                    work.append((w, iter(edges.get(w, []))))
                    advanced = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = min(scc)
                for w in scc:
                    comp[w] = m
    return comp


def _run(pairs, **kw):
    out = scc_labels(_ds(pairs), nshards=kw.pop("nshards", 3), **kw).to_pandas()
    return {int(r.vertex): int(r.label) for r in out.itertuples()}


def test_scc_simple_cycle_and_tail(ray_session):
    # 0->1->2->0 cycle, 2->3->4 tail
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    assert _run(pairs) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}


def test_scc_two_cycles_one_directional_bridge(ray_session):
    pairs = [(0, 1), (1, 0), (5, 6), (6, 5), (1, 5)]
    assert _run(pairs) == {0: 0, 1: 0, 5: 5, 6: 5}


def test_scc_chain_needs_multiple_peels(ray_session):
    # condensation is a path of 4 SCCs: peel order forces 4 rounds
    pairs = []
    for g in range(4):
        a, b = 10 * g, 10 * g + 1
        pairs += [(a, b), (b, a)]
        if g:
            pairs.append((10 * (g - 1), a))
    assert _run(pairs) == _tarjan(pairs)


def test_scc_self_loops_dropped(ray_session):
    pairs = [(7, 7), (1, 2)]
    assert _run(pairs) == {1: 1, 2: 2}


def test_scc_random_vs_tarjan(ray_session):
    rng = np.random.RandomState(23)
    for trial in range(3):
        n = 40
        m = [60, 120, 240][trial]
        pairs = {
            (int(a), int(b))
            for a, b in rng.randint(0, n, size=(m, 2))
            if a != b
        }
        assert _run(pairs) == _tarjan(pairs), f"trial {trial}"


def test_scc_trim_equals_plain(ray_session):
    rng = np.random.RandomState(31)
    # cycle-poor graph with long tails: trim should do most of the work
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 50, size=(70, 2)) if a != b}
    pairs |= {(60, 61), (61, 62), (62, 60)}  # one planted cycle
    pairs |= {(62, 70), (70, 71), (71, 72)}  # pure tail
    a = _run(pairs)
    b = _run(pairs, trim=True)
    assert a == b == _tarjan(pairs)


def test_scc_trim_pure_dag(ray_session):
    # acyclic graph: trim alone must finish it (every SCC singleton)
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10) if (i + j) % 3 == 0]
    out = _run(pairs, trim=True)
    assert out == {v: v for v in out}
    assert out == _tarjan(pairs)
