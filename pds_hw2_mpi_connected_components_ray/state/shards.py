"""Pinned graph-shard actors: the engine's ST2 state
(/root/reference/src/matrix.c:94-271 loaded-once per-rank CSC, reused
across trials /root/reference/src/benchmark.c:247-252).

One actor owns all edges whose dst hashes to it (the reference's column
partitioning, /root/reference/src/matrix.c:127-135), stored as a
dst-sorted CSC view with dense local src indices. Because shards are
dst-disjoint, per-dst aggregates (min for CC, sum for PageRank, mode
for label propagation) are COMPLETE within one shard -- no cross-shard
combine is needed and driver merges are O(n) total.

Per-iteration input is a compact (ids, values) broadcast via one
ray.put; at web scale this is the frontier (CC) or the rank vector
partition -- never a replicated O(n)-per-worker snapshot rebuilt
collectively like the reference's MPI_Allgatherv
(/root/reference/src/connected_components.c:98-101).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

_I64MAX = np.iinfo(np.int64).max


def _as_arrow(table) -> pa.Table:
    """Coerce a block to Arrow (datasets that went through a pandas
    map_groups stage carry pandas blocks)."""
    if isinstance(table, pa.Table):
        return table
    return pa.Table.from_pandas(table, preserve_index=False)


_EMPTY_EDGES = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


@ray.remote
def split_block_by_dst(table, nshards: int):
    """Bucket one edge block by hash(dst) into nshards sub-tables (one
    object per shard via num_returns) -- the load-time exchange that
    replaces a full shuffle."""
    table = _as_arrow(table)
    if table.num_rows == 0 or "dst" not in table.column_names:
        # groupby stages occasionally emit schema-less empty blocks
        return tuple([_EMPTY_EDGES] * nshards) if nshards > 1 else _EMPTY_EDGES
    dst = table["dst"].to_numpy(zero_copy_only=False)
    # O(E) bucketing INDEPENDENT of nshards: radix-argsort the uint16
    # bucket keys (numpy uses radix for stable integer sorts -- ~2
    # passes) and take contiguous index ranges. The earlier per-shard
    # boolean-scan form was O(E x nshards) total: with the shard count
    # tracking the parallelism level, split work grew linearly with the
    # level and exactly cancelled the added cores (round-3 probe: the
    # load leg measured FLAT, 84.8 s at 4 cpus vs 76.3 s at 16).
    # take() per shard (not zero-copy slices of one sorted table --
    # pickling a sliced Arrow table ships the ENTIRE backing buffer per
    # slice, nshards x the bytes through plasma).
    b16 = (dst % nshards).astype(np.uint16)  # nshards << 65536
    order = np.argsort(b16, kind="stable")
    counts = np.bincount(b16, minlength=nshards)
    offs = np.concatenate([[0], np.cumsum(counts)])
    if set(table.column_names) == {"src", "dst"}:
        # plain edge tables: emit int32 columns when every id fits --
        # halves the bytes this load-time exchange pushes through plasma
        # and the bytes each shard's build pass then faults in (the load
        # wave is kernel-fault-bound at 32 concurrent actors; the shard
        # build accepts any integer width and re-widens only the
        # vertex-sized id arrays). take() with pre-gathered numpy slices
        # also skips Arrow's per-shard take overhead.
        src = table["src"].to_numpy(zero_copy_only=False)
        hi = max(
            int(src.max()) if len(src) else 0, int(dst.max()) if len(dst) else 0
        )
        lo = min(
            int(src.min()) if len(src) else 0, int(dst.min()) if len(dst) else 0
        )
        narrow = np.int32 if (0 <= lo and hi < 2**31) else np.int64
        # cast BEFORE the gather: the fancy-index then runs at the
        # narrow width (cast 4B + gather 4B per edge, vs gather 8B +
        # cast 4B the other way round)
        ss = src.astype(narrow, copy=False)[order]
        ds = dst.astype(narrow, copy=False)[order]
        out = []
        for s in range(nshards):
            a, b = offs[s], offs[s + 1]
            out.append(pa.table({"src": ss[a:b], "dst": ds[a:b]}))
        return tuple(out) if nshards > 1 else out[0]
    out = []
    for s in range(nshards):
        idx = order[offs[s] : offs[s + 1]]
        out.append(table.take(idx) if len(idx) else table.slice(0, 0))
    return tuple(out) if nshards > 1 else out[0]


@ray.remote
class GraphShardActor:
    def __init__(self, block_refs: list | None = None):
        self._loaded = False
        if block_refs is not None:
            self.load(block_refs)

    def assigned_resources(self) -> dict:
        """Custom/CPU resources this actor was scheduled with -- lets
        tests assert that placement constraints (simulated multi-node
        vnodes, placement-group bundles) were actually honored."""
        return dict(ray.get_runtime_context().get_assigned_resources())

    def node_id(self) -> str:
        return ray.get_runtime_context().get_node_id()

    def load(self, block_refs: list, nshards: int | None = None) -> int:
        """Build the dst-sorted CSC from this shard's edge blocks. Split
        from __init__ so pools can be SPAWNED early (actor processes
        start while upstream ETL is still streaming) and fed later."""
        import time as _time

        self.load_phases = {}
        _t = _time.perf_counter()
        tables = [_as_arrow(t) for t in ray.get(list(block_refs))]
        tables = [t for t in tables if t.num_rows]
        self.load_phases["get"] = _time.perf_counter() - _t
        _t = _time.perf_counter()
        # Concatenate straight out of the plasma-backed Arrow buffers
        # into ONE pre-sized allocation per column -- the per-table
        # to_numpy + np.concatenate form copied every edge twice, and on
        # this wave (32 actors faulting fresh pages concurrently) the
        # kernel fault path is the wall, not the copy itself. When every
        # id fits int32 the destination is allocated half-width and
        # np.copyto downcasts during the same pass: per-edge bytes
        # touched in the whole load drop ~2x (ids here are bench/compact
        # spaces; minted 63-bit url ids keep the int64 path).
        total = sum(t.num_rows for t in tables)
        import pyarrow.compute as _pc

        vmax = 0
        for t in tables:
            for name in ("src", "dst"):
                m = _pc.max(t[name]).as_py()
                mn = _pc.min(t[name]).as_py()
                if m is not None:
                    vmax = max(vmax, int(m))
                if mn is not None and mn < 0:
                    vmax = 2**62  # negative ids: stay int64
        narrow = np.int32 if vmax < 2**31 else np.int64
        src = np.empty(total, dtype=narrow)
        dst = np.empty(total, dtype=narrow)
        off = 0
        for t in tables:
            for name, out in (("src", src), ("dst", dst)):
                o = off
                for ch in t[name].chunks:
                    v = ch.to_numpy(zero_copy_only=False)
                    np.copyto(out[o : o + len(v)], v, casting="unsafe")
                    o += len(v)
            off += t.num_rows
        # every dst in this shard shares the residue class dst % nshards,
        # so ordering by dst//nshards equals ordering by dst; on the
        # int32 path dst itself is already half-width, on the int64 path
        # the quotient usually fits int32, turning the stable argsort
        # into a half-width radix (fewer passes = directly less wall)
        key = dst
        if narrow is np.int64 and nshards and len(dst):
            q = dst // nshards
            if int(q.max()) < 2**31:
                key = q.astype(np.int32)
        order = np.argsort(key, kind="stable")
        src = src[order]
        dst = dst[order]
        usrc, src_local = np.unique(src, return_inverse=True)
        # global-id arrays keep the int64 contract downstream (labels,
        # ingest maps); they are vertex-sized, so the upcast is cheap
        self.usrc = usrc.astype(np.int64, copy=False)
        # local index space always fits int32 (a shard holds E/n edges);
        # the load/contract wave is memory-bandwidth-bound on one box,
        # so halving per-edge index bytes is a direct wall-time cut
        self.src_local = src_local.astype(np.int32)
        # dst is ALREADY sorted: derive (udst, run starts) with one
        # boundary scan instead of np.unique's internal re-sort (the
        # load leg is bandwidth-bound; round-2 per-leg efficiency 0.4)
        if len(dst):
            flags = np.r_[True, dst[1:] != dst[:-1]]
            self.udst = dst[flags].astype(np.int64, copy=False)
            starts = np.flatnonzero(flags)
        else:
            self.udst = dst.astype(np.int64, copy=False)
            starts = np.array([], dtype=np.int64)
        self.offsets = np.concatenate([starts, [len(dst)]]).astype(np.int64)
        # per-edge dst column index (for grouped ops beyond reduceat)
        self.edge_col = np.repeat(
            np.arange(len(self.udst), dtype=np.int32), np.diff(self.offsets)
        )
        # dense global-id -> local-src-index map for O(f) value ingestion
        # (vs O(f log u) binary search); only for compact id spaces --
        # sparse (hashed-url) spaces fall back to search.
        self.vmax_local = int(self.usrc[-1]) if len(self.usrc) else -1
        if len(self.usrc) and self.vmax_local < 8 * len(self.usrc) + 1024:
            self.gid2local = np.full(self.vmax_local + 1, -1, dtype=np.int64)
            self.gid2local[self.usrc] = np.arange(len(self.usrc), dtype=np.int64)
        else:
            self.gid2local = None
        self.load_phases["csc"] = _time.perf_counter() - _t
        _t = _time.perf_counter()
        # one-time LOCAL component contraction (vectorized hash-min over
        # this shard's edge set, both directions): labels initialized
        # from it start whole local components pre-merged, so the
        # cross-shard solve needs only ~shard-graph-diameter supersteps
        # instead of ~graph-diameter (measured 11 -> ~4 on the bench
        # pages graph). Valid initialization: the label assigned to v is
        # the min vertex id of a set of vertices all connected to v.
        self._local_contract()
        self.load_phases["contract"] = _time.perf_counter() - _t
        self._loaded = True
        return len(self.src_local)

    def load_timing(self) -> dict:
        """Per-phase wall times of the last load() (diagnostics)."""
        return dict(getattr(self, "load_phases", {}))

    def proc_stat(self) -> tuple:
        """(pid, utime, stime, minflt, majflt) of this actor process --
        lets perf probes separate CPU starvation from slow kernels."""
        import os
        import resource

        r = resource.getrusage(resource.RUSAGE_SELF)
        return (os.getpid(), r.ru_utime, r.ru_stime, r.ru_minflt, r.ru_majflt)

    def _local_contract(self) -> None:
        # Specialized contraction reusing the shard's ALREADY-UNIQUE
        # usrc/udst arrays and local edge indices -- the generic
        # local_min_labels (stages.graph) re-uniques the 2x-expanded
        # per-edge arrays, which measured 3.6x slower at 2M-edge shards.
        # Two-direction Gauss-Seidel form: the incoming sweep reuses the
        # CSC's dst grouping (offsets) as-is and the outgoing sweep
        # radix-sorts src_local ONCE (n rows, small-int keys) -- vs the
        # previous single combined sweep over a concatenated 2n edge
        # list (one more radix over 2n + 4 n-sized temporaries).
        # Measured at a 4M-edge shard: 2.33s -> 1.05s, and the
        # mid-pass label reuse contracts strictly harder per pass
        # (119 -> 2 residual labels on the random-graph microbench).
        # Budget shrinks for big shards: each pass streams the whole
        # local edge set, and partial contraction is still a valid
        # hash-min state.
        if len(self.udst) == 0:
            self.init_labels_own = self.udst.copy()
            return
        vs = np.union1d(self.usrc, self.udst)
        # int32 throughout the local index space (halves the bytes of a
        # bandwidth-bound wave; every array here is a LOCAL index)
        a = np.searchsorted(vs, self.usrc).astype(np.int32)[self.src_local]
        b = np.searchsorted(vs, self.udst).astype(np.int32)[self.edge_col]
        so = np.argsort(self.src_local, kind="stable")  # radix (int keys)
        src_sorted = self.src_local[so]
        sb = np.flatnonzero(np.r_[True, src_sorted[1:] != src_sorted[:-1]])
        b_by_src = b[so]
        s_targets = a[so][sb]  # one vs-index per distinct src
        d_targets = b[self.offsets[:-1]]  # one vs-index per distinct dst
        lab = np.arange(len(vs), dtype=np.int32)
        # Budget adapts to local density: a fragmented shard (high shard
        # count => its edge set is a thin random sample whose components
        # are shallow) contracts in 2 passes; deeper budgets only pay
        # more O(V_local) sweeps for labels the cross-shard solve fixes
        # anyway (any partial contraction is a valid hash-min state).
        density = len(a) / max(len(vs), 1)
        if len(a) < 1_000_000:
            budget = 12
        elif density < 4.0:
            budget = 2
        else:
            budget = 4
        for _ in range(budget):
            new = lab.copy()
            # incoming: min src label per dst group (dst-grouped already)
            cand_d = np.minimum.reduceat(lab[a], self.offsets[:-1])
            new[d_targets] = np.minimum(new[d_targets], cand_d)
            # outgoing: min dst label per src group, seeing this pass's
            # dst updates (Gauss-Seidel -- still a valid relaxation:
            # every label propagated is of a connected vertex)
            cand_s = np.minimum.reduceat(new[b_by_src], sb)
            new[s_targets] = np.minimum(new[s_targets], cand_s)
            # two unconditional pointer jumps: cheaper than
            # compare-then-jump (each equality check is its own O(V)
            # sweep), and partial closure is still a valid state
            new = np.minimum(new, new[new])
            new = np.minimum(new, new[new])
            if np.array_equal(new, lab):
                break
            lab = new
        own_pos = np.searchsorted(vs, self.udst)
        self.init_labels_own = vs[lab[own_pos]]

    # ---------------------------------------------------------- loading

    def local_vertices(self) -> np.ndarray:
        return np.unique(np.concatenate([self.usrc, self.udst]))

    def local_out_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """(usrc, out_edge_count) of this shard -- summed across shards
        by the driver to obtain global out-degrees."""
        counts = np.bincount(self.src_local, minlength=len(self.usrc)).astype(np.int64)
        return self.usrc, counts

    def _ingest(self, ids: np.ndarray, vals: np.ndarray, fill) -> np.ndarray:
        """Map (ids, vals) onto the local src universe; absent -> fill."""
        out = np.full(len(self.usrc), fill, dtype=vals.dtype)
        self._ingest_into(out, ids, vals)
        return out

    def _ingest_into(self, out: np.ndarray, ids: np.ndarray, vals: np.ndarray) -> None:
        """Scatter (ids, vals) into a pre-allocated local-src array."""
        if self.gid2local is not None:
            inrange = ids <= self.vmax_local
            loc = self.gid2local[ids[inrange]]
            valid = loc >= 0
            out[loc[valid]] = vals[inrange][valid]
        else:
            pos = np.searchsorted(self.usrc, ids)
            posc = np.minimum(pos, max(len(self.usrc) - 1, 0))
            present = (
                self.usrc[posc] == ids if len(self.usrc) else np.zeros(len(ids), bool)
            )
            out[posc[present]] = vals[present]

    # --------------------------------------------------------------- CC

    def relax_min(self, frontier) -> tuple[np.ndarray, np.ndarray]:
        """(fv sorted, fl) -> (dst, min frontier label) per shard dst."""
        fv, fl = frontier
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
        if len(fv) == 0 or len(self.usrc) == 0:
            return empty
        labmap = self._ingest(fv, fl, _I64MAX)
        per_edge = labmap[self.src_local]
        mins = np.minimum.reduceat(per_edge, self.offsets[:-1])
        hit = mins != _I64MAX
        return self.udst[hit], mins[hit]

    # ------------------------------------------------- decentralized BFS
    # The CC hash-min loop with the (min, +1) semiring: hop distances
    # instead of labels (the reference's relaxation,
    # /root/reference/src/connected_components.c:109-128, is the same
    # shape). Each shard owns the dist slice of its dst-partition; per
    # round the driver moves ObjectRefs + scalar changed counts ONLY --
    # no O(n) driver vertex/dist arrays (round-2 VERDICT's last
    # driver-state kernel). In level-synchronous unit-weight BFS a
    # vertex's first-assigned dist is already optimal, so each vertex
    # enters the frontier exactly once and total exchange volume is
    # O(V) across all rounds.

    def min_owned_vertex(self):
        """Smallest owned vertex id (None if the shard is empty)."""
        return int(self.udst[0]) if len(self.udst) else None

    def bfs_init(self, sid: int, nshards: int, source) -> tuple:
        """Reset BFS state; returns (#sources owned, subscriptions-
        cached). `source` may be a scalar or an ARRAY of seeds (all
        start at distance 0 — the multi-seed wave used for disjoint
        per-component BFS, e.g. bipartiteness). Shares the CC
        subscription exchange (sub_pos/req_pos are a property of the
        edge partitioning alone)."""
        self.sid = sid
        self.cc_nshards = nshards
        self.own = self.udst  # sorted unique owned vertices
        self.bfs_dist = np.full(len(self.udst), _I64MAX, dtype=np.int64)
        self.bfs_fr_mask = np.zeros(len(self.udst), dtype=bool)
        e = np.array([], dtype=np.int64)
        self.bfs_fr_v, self.bfs_fr_d = e, e
        owns = 0
        srcs = np.atleast_1d(np.asarray(source, dtype=np.int64))
        if len(self.udst) and len(srcs):
            pos = np.searchsorted(self.udst, srcs)
            posc = np.minimum(pos, len(self.udst) - 1)
            ok = self.udst[posc] == srcs
            self.bfs_dist[posc[ok]] = 0
            self.bfs_fr_mask[posc[ok]] = True
            self.bfs_fr_v = srcs[ok]
            self.bfs_fr_d = np.zeros(int(ok.sum()), dtype=np.int64)
            owns = int(ok.sum())
        return owns, getattr(self, "_subs_ns", None) == nshards

    def bfs_frontier_slices(self):
        """Improved (request-index, dist) rows PER SUBSCRIBER shard --
        same edge-cut-proportional push as cc_frontier_slices."""
        ns = self.cc_nshards
        m = self.bfs_fr_mask
        d = self.bfs_dist
        e = np.array([], dtype=np.int64)
        out = []
        for pos in self.sub_pos:
            if len(pos) == 0 or len(m) == 0:
                out.append((e.astype(np.int32), e))
                continue
            idx = np.flatnonzero(m[pos])
            if len(pos) < 2**31:
                idx = idx.astype(np.int32)
            out.append((idx, d[pos[idx]]))
        return tuple(out) if ns > 1 else out[0]

    def bfs_frontier(self):
        """Owned (vertex, dist) rows improved in the previous round."""
        return self.bfs_fr_v, self.bfs_fr_d

    def bfs_relax(self, frontier_refs: list) -> int:
        """Pull the per-subscriber frontier slices addressed to this
        shard (request-index form, resolved via req_pos -- no id
        lookup), relax dist[dst] <- min(dist[dst], frontier_dist[src]
        + 1) over the local CSC, stage newly-improved vertices as the
        next frontier. Returns the improved-vertex count."""
        e = np.array([], dtype=np.int64)
        self.bfs_fr_v, self.bfs_fr_d = e, e
        self.bfs_fr_mask = np.zeros(len(self.udst), dtype=bool)
        if len(self.udst) == 0 or len(self.usrc) == 0:
            return 0
        dmap = np.full(len(self.usrc), _I64MAX, dtype=np.int64)
        any_seen = False
        for o, r in enumerate(frontier_refs):
            idx, fd = ray.get(r)
            if len(idx) == 0:
                continue
            any_seen = True
            dmap[self.req_pos[o][idx]] = fd
        if not any_seen:
            return 0
        per_edge = dmap[self.src_local]
        mins = np.minimum.reduceat(per_edge, self.offsets[:-1])
        hit = mins != _I64MAX
        cand = np.full(len(self.udst), _I64MAX, dtype=np.int64)
        cand[hit] = mins[hit] + 1
        imp = cand < self.bfs_dist
        if imp.any():
            self.bfs_dist[imp] = cand[imp]
            self.bfs_fr_mask = imp
            self.bfs_fr_v = self.udst[imp]
            self.bfs_fr_d = cand[imp]
        return int(imp.sum())

    def bfs_table(self) -> pa.Table:
        """Owned (vertex, hops) rows for REACHED vertices."""
        reached = self.bfs_dist != _I64MAX
        return pa.table(
            {
                "vertex": pa.array(self.udst[reached]),
                "hops": pa.array(self.bfs_dist[reached]),
            }
        )

    # ------------------------------------------- decentralized SSSP
    # The (min, +w) generalization of the BFS loop: positive integer
    # edge weights derived per shard from the endpoint ids ((src + dst)
    # % wmod + wadd -- the engine's planted-weight convention, same as
    # pagerank_weighted), so no weight column crosses the wire. Unlike
    # unit BFS a vertex can re-enter the frontier (a cheaper multi-hop
    # path can arrive after a direct expensive one); the push/ingest
    # machinery is the BFS one (state shares its attribute names),
    # monotone under min so always safe.

    def sssp_init(
        self, sid: int, nshards: int, source: int, wmod: int = 5, wadd: int = 1
    ) -> tuple:
        out = self.bfs_init(sid, nshards, source)
        if len(self.usrc):
            src_ids = self.usrc[self.src_local]
            dst_ids = np.repeat(self.udst, np.diff(self.offsets))
            self.sssp_w = (src_ids + dst_ids) % wmod + wadd
        else:
            self.sssp_w = np.array([], dtype=np.int64)
        return out

    def sssp_relax(self, frontier_refs: list) -> int:
        """dist[dst] <- min(dist[dst], frontier_dist[src] + w(src,dst));
        same wire shape as bfs_relax."""
        e = np.array([], dtype=np.int64)
        self.bfs_fr_v, self.bfs_fr_d = e, e
        self.bfs_fr_mask = np.zeros(len(self.udst), dtype=bool)
        if len(self.udst) == 0 or len(self.usrc) == 0:
            return 0
        dmap = np.full(len(self.usrc), _I64MAX, dtype=np.int64)
        any_seen = False
        for o, r in enumerate(frontier_refs):
            idx, fd = ray.get(r)
            if len(idx) == 0:
                continue
            any_seen = True
            dmap[self.req_pos[o][idx]] = fd
        if not any_seen:
            return 0
        per_edge = dmap[self.src_local]
        # the +w lane wraps for unreached srcs (I64MAX + w); the where
        # mask discards those lanes before they can win a min
        with np.errstate(over="ignore"):
            pe = np.where(per_edge == _I64MAX, _I64MAX, per_edge + self.sssp_w)
        mins = np.minimum.reduceat(pe, self.offsets[:-1])
        imp = mins < self.bfs_dist
        if imp.any():
            self.bfs_dist[imp] = mins[imp]
            self.bfs_fr_mask = imp
            self.bfs_fr_v = self.udst[imp]
            self.bfs_fr_d = mins[imp]
        return int(imp.sum())

    def sssp_table(self) -> pa.Table:
        """Owned (vertex, dist) rows for REACHED vertices."""
        reached = self.bfs_dist != _I64MAX
        return pa.table(
            {
                "vertex": pa.array(self.udst[reached]),
                "dist": pa.array(self.bfs_dist[reached]),
            }
        )

    # --------------------------------------------- multi-source BFS
    # k simultaneous BFS waves in ONE relaxation loop: dist is an
    # (owned, k) matrix and every superstep relaxes all k sources at
    # once over the same CSC pass (landmark distances / harmonic-
    # centrality input). Unlike single-source unit BFS, a vertex can
    # re-enter the frontier (it may improve on source j after source i
    # settled), so a frontier push ships the vertex's FULL k-row --
    # monotone under the (min, +1) semiring, hence always safe. Total
    # exchange is O(V * k) worst case; k is meant to be small (4..64
    # landmarks). Memory: the relax pass materializes an (E_shard, k)
    # gather, so size k against shard edge counts.

    def smallest_owned(self, k: int) -> np.ndarray:
        """k smallest owned vertex ids (udst is sorted)."""
        return self.udst[: int(k)]

    def msbfs_init(self, sid: int, nshards: int, sources) -> tuple:
        """Reset multi-source state; returns (#sources owned here,
        subscriptions-cached). Shares the CC/BFS subscription exchange."""
        self.sid = sid
        self.cc_nshards = nshards
        self.own = self.udst
        srcs = np.asarray(sources, dtype=np.int64)
        self.ms_sources = srcs
        self.ms_dist = np.full((len(self.udst), len(srcs)), _I64MAX, dtype=np.int64)
        self.ms_fr_mask = np.zeros(len(self.udst), dtype=bool)
        owns = 0
        if len(self.udst) and len(srcs):
            pos = np.searchsorted(self.udst, srcs)
            posc = np.minimum(pos, len(self.udst) - 1)
            ok = self.udst[posc] == srcs
            self.ms_dist[posc[ok], np.flatnonzero(ok)] = 0
            self.ms_fr_mask[posc[ok]] = True
            owns = int(ok.sum())
        return owns, getattr(self, "_subs_ns", None) == nshards

    def msbfs_frontier_slices(self):
        """Improved (request-index, k-dist-row) blocks PER SUBSCRIBER --
        the cc/bfs edge-cut-proportional push with a matrix payload."""
        ns = self.cc_nshards
        m = self.ms_fr_mask
        d = self.ms_dist
        kk = d.shape[1]
        e32 = np.array([], dtype=np.int32)
        out = []
        for pos in self.sub_pos:
            if len(pos) == 0 or len(m) == 0:
                out.append((e32, np.empty((0, kk), dtype=np.int64)))
                continue
            idx = np.flatnonzero(m[pos])
            if len(pos) < 2**31:
                idx = idx.astype(np.int32)
            out.append((idx, d[pos[idx]]))
        return tuple(out) if ns > 1 else out[0]

    def msbfs_relax(self, frontier_refs: list) -> int:
        """dist[dst, :] <- min(dist[dst, :], frontier[src, :] + 1) over
        the local CSC for all k sources in one reduceat pass. Returns
        the count of owned vertices improved on ANY source."""
        kk = len(self.ms_sources)
        self.ms_fr_mask = np.zeros(len(self.udst), dtype=bool)
        if len(self.udst) == 0 or len(self.usrc) == 0 or kk == 0:
            return 0
        dmap = np.full((len(self.usrc), kk), _I64MAX, dtype=np.int64)
        any_seen = False
        for o, r in enumerate(frontier_refs):
            idx, fd = ray.get(r)
            if len(idx) == 0:
                continue
            any_seen = True
            # owners partition the vertex space -> targets disjoint per o
            dmap[self.req_pos[o][idx]] = fd
        if not any_seen:
            return 0
        per_edge = dmap[self.src_local]  # (E_shard, k)
        mins = np.minimum.reduceat(per_edge, self.offsets[:-1], axis=0)
        cand = np.where(mins == _I64MAX, _I64MAX, mins + 1)
        imp_rows = (cand < self.ms_dist).any(axis=1)
        if imp_rows.any():
            np.minimum(self.ms_dist, cand, out=self.ms_dist)
            self.ms_fr_mask = imp_rows
        return int(imp_rows.sum())

    def msbfs_table(self) -> pa.Table:
        """(source, vertex, hops) rows for every reached (seed, vertex)."""
        rr, cc_ = np.nonzero(self.ms_dist != _I64MAX)
        return pa.table(
            {
                "source": pa.array(self.ms_sources[cc_]),
                "vertex": pa.array(self.udst[rr]),
                "hops": pa.array(self.ms_dist[rr, cc_]),
            }
        )

    # --------------------------------------------------------- PageRank

    def push_sum(self, weights) -> tuple[np.ndarray, np.ndarray]:
        """(wv sorted, w) -> (dst, sum of w over in-edges) per shard dst.
        w is typically rank/outdeg of each src."""
        wv, w = weights
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
        if len(wv) == 0 or len(self.usrc) == 0:
            return empty
        wmap = self._ingest(wv, w, 0.0)
        per_edge = wmap[self.src_local]
        sums = np.add.reduceat(per_edge, self.offsets[:-1])
        return self.udst, sums

    # ------------------------------------------------- label propagation

    def mode_label(self, labels) -> tuple[np.ndarray, np.ndarray]:
        """(lv sorted, lab) -> (dst, mode of neighbor labels) per shard
        dst; ties -> smallest label. Complete within the shard because
        shards are dst-disjoint."""
        lv, lab = labels
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
        if len(lv) == 0 or len(self.usrc) == 0:
            return empty
        labmap = self._ingest(lv, lab, _I64MAX)
        return self._mode_from_labmap(labmap)

    def _mode_from_labmap(self, labmap: np.ndarray):
        """Per-dst neighbor-label mode from a usrc-aligned label map
        (ties -> smallest label; _I64MAX marks absent srcs)."""
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
        per_edge = labmap[self.src_local]
        # sort edges by (column, label); runs = (col,label) count groups
        order = np.lexsort((per_edge, self.edge_col))
        col_s = self.edge_col[order]
        lab_s = per_edge[order]
        run_start = np.flatnonzero(
            np.r_[True, (col_s[1:] != col_s[:-1]) | (lab_s[1:] != lab_s[:-1])]
        )
        run_col = col_s[run_start]
        run_lab = lab_s[run_start]
        run_cnt = np.diff(np.r_[run_start, len(col_s)])
        keep = run_lab != _I64MAX  # srcs absent from the label map
        run_col, run_lab, run_cnt = run_col[keep], run_lab[keep], run_cnt[keep]
        if len(run_col) == 0:
            return empty
        # per column: max count, tie -> min label
        pick = np.lexsort((run_lab, -run_cnt, run_col))
        pc, pl = run_col[pick], run_lab[pick]
        first = np.r_[True, pc[1:] != pc[:-1]]
        return self.udst[pc[first]], pl[first]

    # ------------------------------------------- decentralized CC state
    # Each shard OWNS the label slice of its dst-partition (shards are
    # dst-disjoint, so udst sets partition the vertex set). Per
    # superstep the driver moves ONLY ObjectRefs and scalar counts --
    # frontier slices and pointer-jump lookups travel shard<->shard
    # through the object store (VERDICT next-round #6: no O(n) driver
    # merge; the reference's allgather sin stays dead).
    # Safety: hash-min labels are monotone non-increasing, so any
    # interleaving of relax/jump min-updates converges to the same
    # fixpoint.

    def cc_init(self, sid: int, nshards: int) -> tuple:
        self.sid = sid
        self.cc_t: dict[str, float] = {}  # per-phase cumulative seconds
        self.cc_nshards = nshards
        self.own = self.udst  # sorted unique owned vertices
        self.cc_labels = self.init_labels_own.copy()  # local pre-contraction
        self.cc_prev = self.own.copy()
        self.fr_v = self.own
        self.fr_l = self.cc_labels.copy()
        self.fr_mask = np.ones(len(self.own), dtype=bool)
        # (size, subscriber-exchange already done for this nshards) --
        # the driver runs the exchange once per pool, not once per solve
        return len(self.own), getattr(self, "_subs_ns", None) == nshards

    def cc_subscribe_queries(self):
        """Distinct srcs this shard's edges READ, grouped by owner shard
        (one return object per shard via num_returns -- each owner pulls
        only its slice). One-time exchange at pool init; the owner uses
        it to push each superstep's changed labels only to shards that
        actually have an edge reading them.

        Also records req_pos[o]: positions in local usrc of the ids
        requested from owner o, IN REQUEST ORDER -- the owner later
        addresses its pushes by index into that shared order, so the
        per-superstep ingest is a pure gather with NO id lookup (the
        id-based ingest pays a searchsorted per row on the sparse
        63-bit minted id space of the real pipeline)."""
        ns = self.cc_nshards
        owner = self.usrc % ns
        self.req_pos = [np.flatnonzero(owner == o) for o in range(ns)]
        groups = tuple(self.usrc[p] for p in self.req_pos)
        return groups if ns > 1 else groups[0]

    def cc_set_subscribers(self, need_refs: list) -> int:
        """need_refs[s] = sorted owned-vertex ids shard s reads (its
        usrc slice for my modulo class). Stored as positions into `own`
        so per-superstep slice extraction is one boolean gather. Every
        id must be an owned dst -- holds for symmetrized input only
        (same invariant as _owned_positions)."""
        self.sub_pos = []
        total = 0
        for r in need_refs:
            ids = ray.get(r)
            if len(ids) == 0:
                self.sub_pos.append(np.array([], dtype=np.int64))
                continue
            pos = self._owned_positions(ids)
            self.sub_pos.append(pos)
            total += len(pos)
        self._subs_ns = self.cc_nshards
        return total

    def cc_frontier(self):
        """Changed (vertex, label) slice of the previous superstep --
        fetched by PEERS via its ObjectRef, never by the driver.
        (Broadcast form -- superseded by cc_frontier_slices for the
        solve loop; kept for diagnostics/back-compat.)"""
        return self.fr_v, self.fr_l

    def cc_frontier_slices(self):
        """Changed (vertex, label) rows PER SUBSCRIBER shard
        (num_returns=nshards): each peer pulls only rows its edges
        read. Per-superstep exchange volume is edge-cut-proportional --
        the broadcast form's ingest rows grew linearly with the shard
        count (probe: 30.3M rows at 4 shards vs 124.4M at 16 on the
        same graph), which capped the solve leg's scaling at ~0.3."""
        ns = self.cc_nshards
        m = self.fr_mask
        l = self.cc_labels
        e = np.array([], dtype=np.int64)
        out = []
        for pos in self.sub_pos:
            if len(pos) == 0 or len(m) == 0:
                out.append((e.astype(np.int32), e))
                continue
            # indices INTO THE SUBSCRIBER'S REQUEST ORDER (not vertex
            # ids): the subscriber resolves them against its req_pos
            # gather map -- no per-row id lookup on ingest
            idx = np.flatnonzero(m[pos])
            if len(pos) < 2**31:  # halve index bytes on the wire
                idx = idx.astype(np.int32)
            out.append((idx, l[pos[idx]]))
        return tuple(out) if ns > 1 else out[0]

    def _cc_local_close(self) -> None:
        """Pointer-jump through labels OWNED by this shard (no network):
        label <- label(label) while the referenced vertex is local."""
        ns = self.cc_nshards
        l = self.cc_labels
        if len(l) == 0:
            return
        while True:
            idx = np.nonzero((l % ns == self.sid) & (l != self.own))[0]
            if len(idx) == 0:
                return
            pos = np.searchsorted(self.own, l[idx])
            jumped = l[pos]
            imp = jumped < l[idx]
            if not imp.any():
                return
            l[idx[imp]] = jumped[imp]

    def cc_relax(self, frontier_refs: list) -> None:
        """Pull all shards' frontier slices, relax local edges, fold the
        per-dst minima into the owned labels (aligned with udst).
        Also opens the superstep (prev snapshot) -- fused here to save
        one driver barrier per superstep. Slices are ingested one at a
        time straight from their (zero-copy) plasma buffers -- no
        concatenation copy of the full frontier per actor."""
        import time as _time

        t = self.cc_t
        self.cc_prev = self.cc_labels.copy()
        if len(self.usrc) == 0:
            self._cc_local_close()
            improved = int((self.cc_labels < self.cc_prev).sum())
            return improved, (
                np.unique(self.cc_labels) if len(self.cc_labels) else self.cc_labels
            )
        _t0 = _time.perf_counter()
        labmap = np.full(len(self.usrc), _I64MAX, dtype=np.int64)
        any_seen = False
        n_in = 0
        for o, r in enumerate(frontier_refs):
            idx, fl = ray.get(r)
            if len(idx) == 0:
                continue
            any_seen = True
            n_in += len(idx)
            # idx addresses producer o's push in request order; req_pos
            # maps it to local usrc positions -- pure gather, no lookup
            labmap[self.req_pos[o][idx]] = fl
        _t1 = _time.perf_counter()
        if any_seen:
            per_edge = labmap[self.src_local]
            mins = np.minimum.reduceat(per_edge, self.offsets[:-1])
            np.minimum(self.cc_labels, mins, out=self.cc_labels)
        _t2 = _time.perf_counter()
        self._cc_local_close()
        _t3 = _time.perf_counter()
        t["ingest"] = t.get("ingest", 0.0) + (_t1 - _t0)
        t["fold"] = t.get("fold", 0.0) + (_t2 - _t1)
        t["close"] = t.get("close", 0.0) + (_t3 - _t2)
        t["frontier_rows_in"] = t.get("frontier_rows_in", 0.0) + n_in
        # fused per-superstep summary (saves two driver barriers): the
        # relax-improved count (0 everywhere => globally converged: after
        # a fully CLOSED jump apply, label(label(v)) == label(v) holds
        # globally, so a no-improvement relax implies the jump phase
        # would be a no-op too) and this shard's distinct-label summary
        # (input of the driver-assembled jump map)
        improved = int((self.cc_labels < self.cc_prev).sum())
        return improved, (
            np.unique(self.cc_labels) if len(self.cc_labels) else self.cc_labels
        )

    def cc_jump_queries(self):
        """Distinct FOREIGN label values, grouped by owner shard (one
        return object per shard via num_returns -- peers pull only their
        slice)."""
        ns = self.cc_nshards
        l = self.cc_labels
        foreign = np.unique(l[l % ns != self.sid]) if len(l) else l
        groups = tuple(foreign[foreign % ns == s] for s in range(ns))
        return groups if ns > 1 else groups[0]

    def cc_lookup(self, query_refs: list):
        """Serve label lookups for OWNED vertex ids (every label value
        is an existing vertex id, so it is present in its owner)."""
        qs = [ray.get(r) for r in query_refs]
        qs = [q for q in qs if len(q)]
        if not qs:
            e = np.array([], dtype=np.int64)
            return e, e
        ids = np.unique(np.concatenate(qs))
        pos = self._owned_positions(ids)
        return ids, self.cc_labels[pos]

    def _owned_positions(self, ids: np.ndarray) -> np.ndarray:
        """Positions of `ids` in self.own, asserting the ownership
        invariant: every queried label value must be a dst this shard
        owns. That holds only for SYMMETRIZED edge input (a vertex
        appearing only as src never materializes as an owned dst but can
        become a component-min label); without the check a directed
        table silently returns a wrong vertex's label or IndexErrors
        (ADVICE r2)."""
        pos = np.minimum(np.searchsorted(self.own, ids), len(self.own) - 1)
        if len(ids) and not (self.own[pos] == ids).all():
            missing = ids[self.own[pos] != ids][:5]
            raise ValueError(
                f"shard {self.sid}: label values {missing.tolist()} are not "
                "owned vertices -- pinned CC requires symmetrized edge input "
                "(every vertex must appear as a dst); pass the edge table "
                "through stages.graph.symmetrize first"
            )
        return pos

    def cc_apply_jump(self, map_refs: list) -> bool:
        """Apply the merged lookup maps: label <- min(label, map[label])."""
        parts = [ray.get(r) for r in map_refs]
        parts = [p for p in parts if len(p[0])]
        l = self.cc_labels
        if not parts or len(l) == 0:
            return False
        mv = np.concatenate([p[0] for p in parts])
        ml = np.concatenate([p[1] for p in parts])
        order = np.argsort(mv, kind="stable")
        mv, ml = mv[order], ml[order]
        # transitively close the merged map first: entries chain
        # (l1 -> l2, l2 -> l3), and closing the SMALL map collapses whole
        # chains in one exchange round instead of one round per hop
        while True:
            p2 = np.minimum(np.searchsorted(mv, ml), len(mv) - 1)
            h2 = mv[p2] == ml
            nl = np.where(h2, np.minimum(ml, ml[p2]), ml)
            if not (nl < ml).any():
                break
            ml = nl
        pos = np.minimum(np.searchsorted(mv, l), len(mv) - 1)
        hit = mv[pos] == l
        jumped = np.where(hit, ml[pos], l)
        imp = jumped < l
        if not imp.any():
            return False
        l[imp] = jumped[imp]
        self._cc_local_close()
        return True

    def cc_distinct_labels(self) -> np.ndarray:
        """Distinct label values held by this shard (the per-shard
        frontier SUMMARY -- small after local contraction)."""
        return np.unique(self.cc_labels) if len(self.cc_labels) else self.cc_labels

    def cc_lookup_direct(self, ids: np.ndarray):
        """Labels of OWNED ids, returned directly (driver-mediated
        small-map path)."""
        if len(ids) == 0 or len(self.own) == 0:
            return np.array([], dtype=np.int64)
        return self.cc_labels[self._owned_positions(ids)]

    def cc_apply_map_and_finalize(self, jump_map) -> tuple:
        """Apply a driver-assembled, transitively CLOSED jump map (one
        ray.put; passed as a top-level arg so Ray resolves it zero-copy)
        and finalize the superstep."""
        import time as _time

        _t0 = _time.perf_counter()
        mv, ml = jump_map
        l = self.cc_labels
        if len(mv) and len(l):
            pos = np.minimum(np.searchsorted(mv, l), len(mv) - 1)
            hit = mv[pos] == l
            jumped = np.where(hit, ml[pos], l)
            imp = jumped < l
            if imp.any():
                l[imp] = jumped[imp]
                self._cc_local_close()
        out = self.cc_finalize()
        t = self.cc_t
        t["apply"] = t.get("apply", 0.0) + (_time.perf_counter() - _t0)
        return out

    def cc_apply_jump_and_finalize(self, map_refs: list) -> tuple:
        """Fused tail of a superstep: apply the (transitively closed)
        jump map, then finalize -- one driver barrier instead of three.
        One closed-map round per superstep is sufficient: jumping is an
        accelerator, not a correctness requirement (hash-min converges
        without it), and the closed map collapses whole chains."""
        self.cc_apply_jump(map_refs)
        return self.cc_finalize()

    def cc_finalize(self) -> tuple:
        """Close the superstep: record the changed slice as the next
        frontier; return ONLY scalars -- (changed count, root count).
        The root count rides along so the driver never needs a separate
        end-of-solve barrier for n_components."""
        changed = self.cc_labels < self.cc_prev
        self.fr_mask = changed
        self.fr_v = self.own[changed]
        self.fr_l = self.cc_labels[changed]
        roots = int(np.sum(self.cc_labels == self.own)) if len(self.own) else 0
        return int(changed.sum()), roots

    def cc_timing(self) -> dict:
        """Per-phase cumulative solve-wall diagnostics since cc_init."""
        return dict(getattr(self, "cc_t", {}))

    def cc_labels_table(self) -> pa.Table:
        return pa.table({"vertex": self.own, "label": self.cc_labels})

    def cc_root_count(self) -> int:
        return int(np.sum(self.cc_labels == self.own)) if len(self.own) else 0

    def cc_write_checkpoint(self, tmp_dir: str) -> None:
        """Write this shard's label/frontier parts into a checkpoint tmp
        dir (distributed write; the driver only commits the rename)."""
        import os

        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"vertex": self.own, "label": self.cc_labels}),
            os.path.join(tmp_dir, "labels", f"part-{self.sid}.parquet"),
        )
        pq.write_table(
            pa.table({"vertex": self.fr_v, "label": self.fr_l}),
            os.path.join(tmp_dir, "frontier", f"part-{self.sid}.parquet"),
        )

    def cc_load_checkpoint(self, step_dir: str) -> None:
        """Restore owned labels + frontier slice from a checkpoint dir
        (each shard reads and filters its own partition)."""
        import os

        import pyarrow.parquet as pq

        ns = self.cc_nshards
        lt = pq.read_table(os.path.join(step_dir, "labels"))
        lv = lt["vertex"].to_numpy(zero_copy_only=False)
        ll = lt["label"].to_numpy(zero_copy_only=False)
        mine = lv % ns == self.sid
        pos = np.searchsorted(self.own, lv[mine])
        self.cc_labels[pos] = ll[mine]
        self.cc_prev = self.cc_labels.copy()
        ft = pq.read_table(os.path.join(step_dir, "frontier"))
        fv = ft["vertex"].to_numpy(zero_copy_only=False)
        fl = ft["label"].to_numpy(zero_copy_only=False)
        fmine = fv % ns == self.sid
        self.fr_v = fv[fmine].copy()
        self.fr_l = fl[fmine].copy()
        self.fr_mask = np.zeros(len(self.own), dtype=bool)
        if len(self.fr_v):
            self.fr_mask[np.searchsorted(self.own, self.fr_v)] = True


    # --------------------------------------- decentralized vertex state
    # Generic ownership for iterative kernels beyond CC (PageRank, label
    # propagation): vertex v is owned by shard v % nshards. Unlike the
    # CC path (which only needs dst labels), ownership here covers the
    # FULL local vertex set (src-only vertices of directed graphs too),
    # established by a one-time peer exchange. Per iteration the driver
    # again moves only ObjectRefs and scalars.

    def own_candidates(self, sid: int, nshards: int):
        """Local vertices grouped by owner shard (one object per shard)."""
        self.sid = sid
        self.vx_nshards = nshards
        lv = self.local_vertices()
        groups = tuple(lv[lv % nshards == s] for s in range(nshards))
        return groups if nshards > 1 else groups[0]

    def set_own_vertices(self, refs: list) -> int:
        """Union the peers' candidate slices for my modulo class."""
        parts = [ray.get(r) for r in refs]
        parts = [p for p in parts if len(p)]
        self.vx_own = (
            np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
        )
        # positions of my udst inside my owned set (contrib scatter map)
        self.vx_dst_pos = np.searchsorted(self.vx_own, self.udst)
        return len(self.vx_own)

    def outdeg_parts(self):
        """Local (src, out_count) pairs grouped by owner shard."""
        ns = self.vx_nshards
        ids, cnt = self.local_out_counts()
        groups = tuple(
            (ids[ids % ns == s], cnt[ids % ns == s]) for s in range(ns)
        )
        return groups if ns > 1 else groups[0]

    def set_outdeg(self, refs: list) -> None:
        """Sum the peers' out-count slices onto my owned vertices."""
        deg = np.zeros(len(self.vx_own), dtype=np.int64)
        for r in refs:
            ids, cnt = ray.get(r)
            if len(ids):
                np.add.at(deg, np.searchsorted(self.vx_own, ids), cnt)
        self.vx_deg = deg

    # -------------------------------------- vx frontier subscriptions
    # Same edge-cut-proportional push as the CC path, over the FULL
    # vertex ownership (vx_own): owners send per-subscriber value
    # slices IN REQUEST ORDER, so the dense iterative kernels
    # (PageRank, LPA) ship exactly the values each shard's edges read
    # -- the emit-to-all form made every shard ingest the whole O(n)
    # vector per iteration, total work O(n x shards) per step.

    def vx_subscribe_queries(self):
        """Distinct srcs this shard's edges read, grouped by owner
        (num_returns fan-out); records req_pos, the gather map that
        resolves owners' request-order pushes locally."""
        ns = self.vx_nshards
        owner = self.usrc % ns
        self.req_pos = [np.flatnonzero(owner == o) for o in range(ns)]
        groups = tuple(self.usrc[p] for p in self.req_pos)
        return groups if ns > 1 else groups[0]

    def vx_set_subscribers(self, need_refs: list) -> int:
        """Store, per subscriber, the positions in vx_own of the ids it
        requested (request order). Every requested id is in vx_own by
        construction: own_candidates unions each shard's full local
        vertex set into its owner."""
        self.vx_sub_pos = []
        total = 0
        for r in need_refs:
            ids = ray.get(r)
            if len(ids) == 0:
                self.vx_sub_pos.append(np.array([], dtype=np.int64))
                continue
            pos = np.minimum(
                np.searchsorted(self.vx_own, ids), max(len(self.vx_own) - 1, 0)
            )
            if not len(self.vx_own) or not (self.vx_own[pos] == ids).all():
                missing = (
                    ids[self.vx_own[pos] != ids][:5] if len(self.vx_own) else ids[:5]
                )
                raise ValueError(
                    f"shard {self.sid}: requested vertices {missing.tolist()} "
                    "not in vx ownership -- run init_vertex_ownership first"
                )
            self.vx_sub_pos.append(pos)
            total += len(pos)
        self._vx_subs_ns = self.vx_nshards
        return total

    def vx_subs_ready(self) -> bool:
        return getattr(self, "_vx_subs_ns", None) == getattr(
            self, "vx_nshards", -1
        )

    # --------------------------------------------- decentralized PageRank

    def pr_start(self, n_global: int) -> None:
        self.pr_n = n_global
        self.pr_p = None  # uniform preference (classic PageRank)
        self.pr_r = np.full(len(self.vx_own), 1.0 / n_global, dtype=np.float64)

    def pr_seed_count(self, seed_mod: int) -> int:
        """Personalized-PageRank seed discovery: cache my owned seed
        mask, return its size (the driver sums one scalar per shard —
        no seed vector ever crosses the wire)."""
        self._pr_seed_mask = self.vx_own % seed_mod == 0
        return int(self._pr_seed_mask.sum())

    def pr_start_personalized(self, n_seeds_global: int) -> None:
        """r0 = p, p = seed_mask/|S|; teleport and dangling mass both
        land on p (see pipelines.pagerank.personalized_pagerank)."""
        self.pr_p = self._pr_seed_mask.astype(np.float64) / n_seeds_global
        self.pr_r = self.pr_p.copy()

    def pr_emit(self):
        """(own vertices, rank/outdeg weights) -- pulled by peers."""
        w = np.where(
            self.vx_deg == 0, 0.0, self.pr_r / np.maximum(self.vx_deg, 1)
        )
        return self.vx_own, w

    def pr_emit_slices(self):
        """Per-subscriber weight slices in request order (PageRank is
        dense: every requested vertex emits every iteration, so the
        push is VALUES ONLY -- no ids, no indices on the wire)."""
        ns = self.vx_nshards
        w = np.where(
            self.vx_deg == 0, 0.0, self.pr_r / np.maximum(self.vx_deg, 1)
        )
        out = [w[pos] for pos in self.vx_sub_pos]
        return tuple(out) if ns > 1 else out[0]

    def pr_dangling(self) -> float:
        return float(self.pr_r[self.vx_deg == 0].sum())

    def pr_step(self, weight_refs: list, dangling_total: float, damping: float) -> float:
        """One power-iteration step for my owned vertices; returns the
        local L1 delta (a scalar). weight_refs are request-order value
        slices from pr_emit_slices, resolved via req_pos (pure gather,
        no id lookup)."""
        contrib = np.zeros(len(self.vx_own), dtype=np.float64)
        if len(self.usrc):
            wmap = np.zeros(len(self.usrc), dtype=np.float64)
            for o, r in enumerate(weight_refs):
                w = ray.get(r)
                if len(w):
                    wmap[self.req_pos[o]] = w
            per_edge = wmap[self.src_local]
            sums = np.add.reduceat(per_edge, self.offsets[:-1])
            contrib[self.vx_dst_pos] += sums
        # preference term: uniform 1/n (classic) or the seed slice (PPR)
        if self.pr_p is None:
            p = 1.0 / self.pr_n
        else:
            p = self.pr_p
        r_new = (1 - damping) * p + damping * (contrib + dangling_total * p)
        l1 = float(np.abs(r_new - self.pr_r).sum())
        self.pr_r = r_new
        return l1

    def pr_table(self) -> pa.Table:
        return pa.table({"vertex": self.vx_own, "rank": self.pr_r})

    def pr_write_checkpoint(self, tmp_dir: str) -> None:
        """Write this shard's rank slice into a generic-state checkpoint
        tmp dir (distributed write; driver only commits the rename)."""
        import os

        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"vertex": self.vx_own, "rank": self.pr_r}),
            os.path.join(tmp_dir, "state", f"part-{self.sid}.parquet"),
        )

    def pr_load_checkpoint(self, step_dir: str) -> None:
        """Restore my owned rank slice from a checkpoint dir (each shard
        reads and filters its own v % nshards partition; degrees/
        preference come from init_vertex_ownership / pr_start, which
        must already have run)."""
        import os

        import pyarrow.parquet as pq

        st = pq.read_table(os.path.join(step_dir, "state"))
        v = st["vertex"].to_numpy(zero_copy_only=False)
        r = st["rank"].to_numpy(zero_copy_only=False)
        mine = v % self.vx_nshards == self.sid
        self.pr_r[np.searchsorted(self.vx_own, v[mine])] = r[mine]

    # --------------------------------------- decentralized label propagation

    def lp_start(self) -> None:
        self.lp_labels = self.vx_own.copy()

    def lp_emit(self):
        return self.vx_own, self.lp_labels

    def lp_emit_slices(self):
        """Per-subscriber label slices in request order (dense push,
        values only -- same wire shape as pr_emit_slices)."""
        ns = self.vx_nshards
        out = [self.lp_labels[pos] for pos in self.vx_sub_pos]
        return tuple(out) if ns > 1 else out[0]

    def lp_step(self, label_refs: list) -> int:
        """One synchronous LPA step for my owned vertices (dst-disjoint
        shards make the local neighbor-mode complete); returns the local
        changed count (a scalar) for the convergence check. label_refs
        are request-order value slices from lp_emit_slices."""
        if not len(self.usrc):
            return 0
        labmap = np.full(len(self.usrc), _I64MAX, dtype=np.int64)
        for o, r in enumerate(label_refs):
            lab = ray.get(r)
            if len(lab):
                labmap[self.req_pos[o]] = lab
        win_v, win_l = self._mode_from_labmap(labmap)
        if not len(win_v):
            return 0
        pos = np.searchsorted(self.vx_own, win_v)
        changed = int(np.count_nonzero(self.lp_labels[pos] != win_l))
        self.lp_labels[pos] = win_l
        return changed

    def lp_table(self) -> pa.Table:
        return pa.table({"vertex": self.vx_own, "label": self.lp_labels})

    def lp_write_checkpoint(self, tmp_dir: str) -> None:
        """Write this shard's LPA label slice into a generic-state
        checkpoint tmp dir (same shape as pr_write_checkpoint)."""
        import os

        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"vertex": self.vx_own, "label": self.lp_labels}),
            os.path.join(tmp_dir, "state", f"part-{self.sid}.parquet"),
        )

    def lp_load_checkpoint(self, step_dir: str) -> None:
        """Restore my owned LPA labels from a checkpoint dir."""
        import os

        import pyarrow.parquet as pq

        st = pq.read_table(os.path.join(step_dir, "state"))
        v = st["vertex"].to_numpy(zero_copy_only=False)
        lab = st["label"].to_numpy(zero_copy_only=False)
        mine = v % self.vx_nshards == self.sid
        self.lp_labels[np.searchsorted(self.vx_own, v[mine])] = lab[mine]

    # ------------------------------------------- decentralized SCC (FW-BW
    # coloring). Two pools hold the DIRECTED graph (this pool = one
    # direction; its twin holds the reverse), both padded with (v, v)
    # self-loops so every vertex is an owned dst in BOTH pools (the
    # ownership invariant pinned solves require; a self-loop is a no-op
    # under strict-min relax). Per peel round each pool runs a min-label
    # fixpoint restricted to ACTIVE vertices; a vertex with equal
    # forward/backward fixpoint labels F(v) == B(v) = q is mutually
    # reachable with q, so SCC(v) = q (and q is SCC(v)'s min id: the
    # min m of the SCC is active and reaches v, forcing F(v) <= m).
    # The round always peels at least the SCC of the globally smallest
    # active vertex, so the loop terminates. Driver moves only refs and
    # scalar counts; active masks and labels live shard-side.

    def scc_init(self, sid: int, nshards: int) -> tuple:
        self.sid = sid
        self.cc_nshards = nshards
        self.own = self.udst
        self.scc_active = np.ones(len(self.udst), dtype=bool)
        self.scc_label = np.full(len(self.udst), -1, dtype=np.int64)
        return len(self.own), getattr(self, "_subs_ns", None) == nshards

    def scc_phase_init(self) -> int:
        """Start a min-label fixpoint over the active subgraph:
        lab = v for active vertices (all of them form the first
        frontier), +inf for peeled ones (their label never ships and
        their in-edges contribute +inf)."""
        self.ph_lab = np.where(self.scc_active, self.udst, _I64MAX)
        self.ph_mask = self.scc_active.copy()
        return int(self.scc_active.sum())

    def scc_frontier_slices(self):
        """Improved (request-index, label) rows per subscriber shard --
        the bfs_frontier_slices shape over the phase state."""
        ns = self.cc_nshards
        m = self.ph_mask
        d = self.ph_lab
        e = np.array([], dtype=np.int64)
        out = []
        for pos in self.sub_pos:
            if len(pos) == 0 or len(m) == 0:
                out.append((e.astype(np.int32), e))
                continue
            idx = np.flatnonzero(m[pos])
            if len(pos) < 2**31:
                idx = idx.astype(np.int32)
            out.append((idx, d[pos[idx]]))
        return tuple(out) if ns > 1 else out[0]

    def scc_relax(self, frontier_refs: list) -> int:
        """lab[dst] <- min(lab[dst], min over in-neighbor labels) for
        ACTIVE dsts (min over THIS pool's edge direction: the forward
        pool computes min-reaching, the reversed pool min-reachable)."""
        self.ph_mask = np.zeros(len(self.udst), dtype=bool)
        if len(self.udst) == 0 or len(self.usrc) == 0:
            return 0
        dmap = np.full(len(self.usrc), _I64MAX, dtype=np.int64)
        any_seen = False
        for o, r in enumerate(frontier_refs):
            idx, fl = ray.get(r)
            if len(idx) == 0:
                continue
            any_seen = True
            dmap[self.req_pos[o][idx]] = fl
        if not any_seen:
            return 0
        per_edge = dmap[self.src_local]
        mins = np.minimum.reduceat(per_edge, self.offsets[:-1])
        imp = (mins < self.ph_lab) & self.scc_active
        if imp.any():
            self.ph_lab[imp] = mins[imp]
            self.ph_mask = imp
        return int(imp.sum())

    def scc_store_f(self) -> None:
        """Forward pool only: stash the F fixpoint before B runs."""
        self.scc_F = self.ph_lab.copy()

    def scc_take_phase(self):
        """(vertex, label) fixpoint slice for active owned vertices --
        fetched by the TWIN pool's peer, never by the driver."""
        a = self.scc_active
        return self.udst[a], self.ph_lab[a]

    def scc_merge_and_peel(self, b_slice) -> np.ndarray:
        """Forward-pool side of the peel: compare stored F with the
        twin's B slice (identical active vertex order -- both pools own
        the full padded residue class and deactivate in lockstep),
        assign scc labels where F == B, deactivate, and return the
        peeled ids (shipped BY REF to the twin's scc_deactivate)."""
        bv, bl = b_slice
        a = self.scc_active
        fv = self.udst[a]
        fl = self.scc_F[a]
        if len(fv) != len(bv) or (len(fv) and not (fv == bv).all()):
            raise ValueError(
                f"shard {self.sid}: forward/backward active sets diverged "
                "(pools must be loaded from the same padded edge table)"
            )
        done = fl == bl
        ids = fv[done]
        if len(ids):
            pos = self._owned_positions(ids)
            self.scc_label[pos] = fl[done]
            self.scc_active[pos] = False
        return ids

    def scc_deactivate(self, ids: np.ndarray) -> int:
        if len(ids):
            self.scc_active[self._owned_positions(ids)] = False
        return len(ids)

    def scc_active_count(self) -> int:
        return int(self.scc_active.sum())

    def scc_write_checkpoint(self, tmp_dir: str) -> None:
        """Write this FORWARD shard's peel state (owned vertex, assigned
        label or -1, active flag) into a generic-state checkpoint tmp
        dir; the driver commits the rename after every peel round."""
        import os

        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "vertex": self.udst,
                    "label": self.scc_label,
                    "active": self.scc_active,
                }
            ),
            os.path.join(tmp_dir, "state", f"part-{self.sid}.parquet"),
        )

    def scc_load_checkpoint(self, step_dir: str, with_labels: bool) -> int:
        """Restore my owned peel state from a checkpoint dir (forward
        pool: labels + active mask; backward pool: active mask only --
        its labels are phase-local). Returns my active count."""
        import os

        import pyarrow.parquet as pq

        st = pq.read_table(os.path.join(step_dir, "state"))
        v = st["vertex"].to_numpy(zero_copy_only=False)
        act = st["active"].to_numpy(zero_copy_only=False)
        mine = v % self.cc_nshards == self.sid
        pos = np.searchsorted(self.udst, v[mine])
        self.scc_active[pos] = act[mine]
        if with_labels:
            lab = st["label"].to_numpy(zero_copy_only=False)
            self.scc_label[pos] = lab[mine]
        return int(self.scc_active.sum())

    def scc_result_table(self) -> pa.Table:
        assigned = self.scc_label >= 0
        return pa.table(
            {
                "vertex": pa.array(self.udst[assigned]),
                "label": pa.array(self.scc_label[assigned]),
            }
        )

    # --- SCC trim phase (Multistep's first step: vertices not on any
    # cycle peel as singleton SCCs before the FW-BW rounds). A vertex
    # with zero ACTIVE non-self in-edges on this pool's direction
    # cannot be on a cycle; trimming it may expose more, so the driver
    # iterates to fixpoint. The forward pool trims by in-degree, the
    # reversed pool by out-degree; each round's death lists broadcast
    # once (death-list-proportional traffic) and every shard decrements
    # the counters of the affected dsts with one reduceat pass.

    def scc_trim_init(self) -> int:
        if len(self.usrc):
            src_ids = self.usrc[self.src_local]
            dst_ids = np.repeat(self.udst, np.diff(self.offsets))
            self._scc_nonself = src_ids != dst_ids
            self.scc_src_alive = np.ones(len(self.usrc), dtype=bool)
            self.scc_incnt = np.add.reduceat(
                self._scc_nonself.astype(np.int64), self.offsets[:-1]
            )
        else:
            self._scc_nonself = np.array([], dtype=bool)
            self.scc_src_alive = np.ones(0, dtype=bool)
            self.scc_incnt = np.zeros(len(self.udst), dtype=np.int64)
        return int((self.scc_active & (self.scc_incnt == 0)).sum())

    def scc_trim_take(self, assign: bool) -> np.ndarray:
        """Deactivate zero-in-degree actives; the FORWARD pool
        (assign=True) also writes their singleton labels (= self)."""
        z = self.scc_active & (self.scc_incnt == 0)
        ids = self.udst[z]
        if len(ids):
            if assign:
                self.scc_label[z] = self.udst[z]
            self.scc_active[z] = False
        return ids

    def scc_apply_deaths(self, refs: list, assign_self: bool) -> int:
        """Apply a trim round's death lists (from BOTH pools):
        deactivate owned ids (labeling them self on the forward pool —
        a trimmed vertex is its own SCC), kill them as srcs, decrement
        the in-counters of their out-neighbors. Returns the total
        death-list length (the driver's fixpoint check)."""
        parts = [ray.get(r) for r in refs]
        parts = [p for p in parts if len(p)]
        total = sum(len(p) for p in parts)
        if total == 0:
            return 0
        dead = np.unique(np.concatenate(parts))
        if len(self.udst):
            pos = np.minimum(np.searchsorted(self.udst, dead), len(self.udst) - 1)
            mine = (self.udst[pos] == dead) & self.scc_active[pos]
            if mine.any():
                p = pos[mine]
                if assign_self:
                    self.scc_label[p] = self.udst[p]
                self.scc_active[p] = False
        if len(self.usrc):
            spos = np.minimum(np.searchsorted(self.usrc, dead), len(self.usrc) - 1)
            hit = (self.usrc[spos] == dead) & self.scc_src_alive[spos]
            if hit.any():
                sp = spos[hit]
                self.scc_src_alive[sp] = False
                mark = np.zeros(len(self.usrc), dtype=bool)
                mark[sp] = True
                edge_dead = mark[self.src_local] & self._scc_nonself
                if edge_dead.any():
                    self.scc_incnt -= np.add.reduceat(
                        edge_dead.astype(np.int64), self.offsets[:-1]
                    )
        return total


def establish_subscriptions(actors: list) -> None:
    """One-time peer exchange of frontier subscriptions on a pool whose
    actors already have sid/cc_nshards set (cc_init or bfs_init): owner
    o learns, per peer, which of its owned vertices that peer's edges
    read, and each peer records the gather map resolving the owner's
    index-addressed pushes. Driver moves refs only."""
    ns = len(actors)
    if ns > 1:
        q = [a.cc_subscribe_queries.options(num_returns=ns).remote() for a in actors]
        ray.get(
            [
                actors[o].cc_set_subscribers.remote([q[s][o] for s in range(ns)])
                for o in range(ns)
            ]
        )
    else:
        q0 = [a.cc_subscribe_queries.remote() for a in actors]
        ray.get([actors[0].cc_set_subscribers.remote(q0)])


def init_vertex_ownership(actors: list) -> int:
    """One-time peer exchange establishing full vertex ownership and
    global out-degrees on a shard pool (driver moves only refs and the
    per-shard owned counts). Returns the GLOBAL vertex count."""
    ns = len(actors)
    if ns > 1:
        cands = [
            a.own_candidates.options(num_returns=ns).remote(i, ns)
            for i, a in enumerate(actors)
        ]
        counts = ray.get(
            [
                actors[s].set_own_vertices.remote([cands[i][s] for i in range(ns)])
                for s in range(ns)
            ]
        )
        degp = [a.outdeg_parts.options(num_returns=ns).remote() for a in actors]
        ray.get(
            [
                actors[s].set_outdeg.remote([degp[i][s] for i in range(ns)])
                for s in range(ns)
            ]
        )
        subq = [
            a.vx_subscribe_queries.options(num_returns=ns).remote() for a in actors
        ]
        ray.get(
            [
                actors[s].vx_set_subscribers.remote([subq[i][s] for i in range(ns)])
                for s in range(ns)
            ]
        )
    else:
        c = [a.own_candidates.remote(0, 1) for a in actors]
        counts = ray.get([actors[0].set_own_vertices.remote(c)])
        d = [a.outdeg_parts.remote() for a in actors]
        ray.get([actors[0].set_outdeg.remote(d)])
        sq = [a.vx_subscribe_queries.remote() for a in actors]
        ray.get([actors[0].vx_set_subscribers.remote(sq)])
    return int(sum(counts))


def spawn_shard_pool(
    nshards: int,
    placement: str | None = None,
    resources_per_shard: list[dict] | None = None,
) -> list:
    """Spawn empty shard actors (worker processes start immediately);
    feed them later with load_shard_pool -- lets actor startup overlap
    the upstream ETL.

    Multi-node placement (the reference runs one rank per node slot via
    SLURM, /root/reference/run_slurm.sh): by default Ray places actors
    wherever CPUs are free, which on a multi-node cluster can pack all
    shards on one host and turn the peer exchange into a single-NIC
    hotspot.  Two knobs spread them:

    - ``placement="spread"`` (or env GRAFT_SHARD_PLACEMENT=spread):
      create a best-effort SPREAD placement group with one 1-CPU bundle
      per shard and pin actor i to bundle i.  On a real cluster the
      bundles land round-robin across nodes; on this single-node sandbox
      the PG is still created and honored (all bundles on the one node),
      so the scheduling path itself is exercised by tests.
    - ``resources_per_shard=[{...}, ...]``: explicit per-actor custom
      resource constraints (one dict per shard).  Tests use this to
      SIMULATE a two-node cluster on one box: ray.init with custom
      resources vnode0/vnode1 and pin half the shards to each, then
      assert labels are identical to the unconstrained pool (the
      reference's cross-configuration consistency check,
      /root/reference/src/benchmark.c:275-284).

    The solver's correctness is placement-independent by construction --
    every peer exchange goes through the object store by ObjectRef, never
    via node-local paths -- so these knobs affect WHERE shards run, not
    WHAT they compute.
    """
    if placement is None:
        placement = os.environ.get("GRAFT_SHARD_PLACEMENT") or None
    if resources_per_shard is not None:
        if len(resources_per_shard) != nshards:
            raise ValueError("resources_per_shard must have one dict per shard")
        # num_cpus=0 explicitly: once ANY resource is specified in
        # .options(), Ray's actor default flips from "1 CPU to schedule,
        # 0 held" to "1 CPU held for the actor's lifetime" -- nshards
        # actors would then pin every core and deadlock the Dataset
        # tasks that feed them (observed: load_shard_pool blocked
        # forever at 4 actors on a 4-CPU session).
        return [
            GraphShardActor.options(num_cpus=0, resources=res or None).remote()
            for res in resources_per_shard
        ]
    if placement == "spread":
        from ray.util.placement_group import placement_group
        from ray.util.scheduling_strategies import PlacementGroupSchedulingStrategy

        # fractional-CPU bundles: SPREAD round-robins BUNDLES across
        # nodes regardless of their size, and a full-CPU bundle per
        # shard would reserve every core on the cluster away from the
        # Dataset tasks that feed the pool (deadlock at nshards ==
        # ncpus). The shard actors themselves hold ~0 CPU (peer
        # exchange work runs as actor tasks inside them).
        pg = placement_group([{"CPU": 0.01}] * nshards, strategy="SPREAD")
        ray.get(pg.ready())
        actors = [
            GraphShardActor.options(
                num_cpus=0.01,
                scheduling_strategy=PlacementGroupSchedulingStrategy(
                    placement_group=pg,
                    placement_group_bundle_index=i,
                    placement_group_capture_child_tasks=False,
                ),
            ).remote()
            for i in range(nshards)
        ]
        # keep the PG alive as long as its actors are (and removable by
        # callers that kill the pool -- a leaked PG reserves CPUs).
        # Registered under every actor's id in a module-level map so
        # release works even if callers copy/rebuild the handle list;
        # the handle attribute is kept as a convenience mirror.
        for a in actors:
            _POOL_PLACEMENT_GROUPS[a._actor_id.hex()] = pg
        actors[0]._graft_pg = pg  # type: ignore[attr-defined]
        return actors
    return [GraphShardActor.remote() for _ in range(nshards)]


# actor-id -> placement group backing its spread-spawned pool (all
# actors of one pool map to the same PG); survives handle copies.
_POOL_PLACEMENT_GROUPS: dict = {}


def release_pool_placement(actors: list) -> None:
    """Remove the placement group backing a spread-spawned pool (no-op
    for pools spawned without one). Call AFTER killing the actors --
    a live PG reserves its bundles' CPUs from the rest of the job."""
    if not actors:
        return
    pg = None
    for a in actors:
        pg = _POOL_PLACEMENT_GROUPS.pop(getattr(a, "_actor_id").hex(), None) or pg
    if pg is None:
        pg = getattr(actors[0], "_graft_pg", None)
    if pg is not None:
        from ray.util.placement_group import remove_placement_group

        remove_placement_group(pg)


# Conservative per-edge-row heap peak of GraphShardActor.load (copy-in
# columns + argsort indices + reorder copies + np.unique temporaries,
# int64-path worst case, measured from the 20x single-box OOM: 32
# concurrent builds over 1.31B rows exhausted a 126 GB host).
_LOAD_PEAK_BYTES_PER_ROW = 72


def _available_bytes() -> int | None:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except Exception:
        pass
    return None


def _load_wave(
    n_rows: int | None, nshards: int, budget_frac: float = 0.5
) -> int:
    """How many shard CSC builds may run concurrently. All of them,
    unless the estimated simultaneous heap peak would blow the host
    budget -- then loads are gated in waves sized to `budget_frac` of
    available memory (the rest stays for the object store + peers;
    callers loading SEVERAL pools at once, like SCC's fwd/bwd twins,
    must split the fraction between them). Keeps the single-box
    envelope graceful: a graph 20x the comfortable size loads slower
    instead of OOM-killing the pool. Multi-node runs see per-node
    MemAvailable, which is exactly the right budget there. Override
    with GRAFT_LOAD_WAVE=<int> (malformed values are ignored)."""
    env = os.environ.get("GRAFT_LOAD_WAVE")
    if env:
        try:
            return max(1, min(nshards, int(env)))
        except ValueError:
            pass
    if not n_rows or nshards <= 1:
        return nshards
    avail = _available_bytes()
    if avail is None:
        return nshards
    per_shard_peak = max(1, n_rows // nshards) * _LOAD_PEAK_BYTES_PER_ROW
    wave = int((avail * budget_frac) // per_shard_peak)
    return max(1, min(nshards, wave))


def _submit_loads(actors: list, groups: list, nshards: int, wave: int) -> list:
    """Submit one load per actor, at most `wave` in flight (ray.wait
    gates submission; all refs are returned for the caller's get)."""
    refs: list = []
    pending: list = []
    for a, g in zip(actors, groups):
        if wave < nshards and len(pending) >= wave:
            _, pending = ray.wait(pending, num_returns=1)
        r = a.load.remote(g, nshards)
        refs.append(r)
        pending.append(r)
    return refs


def load_shard_pool(actors: list, edges, budget_frac: float = 0.5) -> list:
    """Split a materialized edge Dataset into dst-hash shards and load
    one shard per (pre-spawned) actor. Returns the load ObjectRefs.
    Loads are wave-gated when the concurrent CSC-build peak would
    exceed the host's memory budget (see _load_wave); callers loading
    multiple pools at once pass a smaller `budget_frac` each."""
    nshards = len(actors)
    block_refs = [
        ref for bundle in edges.iter_internal_ref_bundles() for ref in bundle.block_refs
    ]
    if not block_refs:
        raise ValueError("empty edge dataset")
    if nshards > 1:
        splits = [
            split_block_by_dst.options(num_returns=nshards).remote(ref, nshards)
            for ref in block_refs
        ]
        groups = [[s[i] for s in splits] for i in range(nshards)]
    else:
        groups = [list(block_refs)]
    wave = _load_wave(edges.count(), nshards, budget_frac)
    return _submit_loads(actors, groups, nshards, wave)


def load_shard_pool_streaming(actors: list, lazy_edges) -> list:
    """Feed a LAZY edge dataset into the shard pool: blocks stream out
    of the upstream pipeline and are split by dst-hash AS THEY ARRIVE,
    overlapping the exchange with the tail of the ETL (no materialize
    barrier). Returns the load ObjectRefs. Same memory-budget wave
    gating as load_shard_pool (row count taken from block metadata as
    the stream drains; unknown counts skip gating)."""
    nshards = len(actors)
    splits = []
    n_rows: int | None = 0
    for bundle in lazy_edges.iter_internal_ref_bundles():
        if n_rows is not None:
            b_rows = bundle.num_rows()
            n_rows = None if b_rows is None else n_rows + b_rows
        for ref in bundle.block_refs:
            if nshards > 1:
                splits.append(
                    split_block_by_dst.options(num_returns=nshards).remote(
                        ref, nshards
                    )
                )
            else:
                splits.append([ref])
    if not splits:
        raise ValueError("empty edge dataset")
    groups = [[s[i] for s in splits] for i in range(nshards)]
    wave = _load_wave(n_rows, nshards)
    return _submit_loads(actors, groups, nshards, wave)


def default_shard_count(
    edges, ncpus: int | None = None, edges_per_shard: int = 200_000
) -> int:
    """Data-size clamp for iterative pinned pools. Per-superstep driver
    coordination and the ns^2 peer slice exchange dominate below
    ~200k edges/shard (a 700k-edge graph on 32 shards spends its
    iterations shipping 1024 near-empty slices), so small graphs get
    small pools; min(ncpus, ...) keeps one-shard-per-core at scale.
    `edges` must be MATERIALIZED (same contract as load_shard_pool) so
    the count is a metadata read, not an execution."""
    if ncpus is None:
        ncpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(ncpus, edges.count() // edges_per_shard + 2))


def build_shard_pool(
    edges,
    nshards: int,
    placement: str | None = None,
    resources_per_shard: list[dict] | None = None,
) -> list:
    """Spawn + load in one call (the common path)."""
    actors = spawn_shard_pool(
        nshards, placement=placement, resources_per_shard=resources_per_shard
    )
    ray.get(load_shard_pool(actors, edges))
    return actors

