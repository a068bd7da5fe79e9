"""Driver contract for the Ray-Data link-graph engine.

``queries()`` exposes every implemented operator/pipeline (SURVEY.md
section 2 + the training-data extensions); ``oracle_sql()`` mirrors each
SQL-expressible one with ANSI SQL DuckDB runs on the same parquet views.
The planted-graph derivation over ``lineitem`` (see
pds_hw2_mpi_connected_components_ray/sources/edges.py) keeps the graph
queries oracle-checkable: the SQL strings below MUST stay in lockstep
with that module's arithmetic.

Ray is initialised by the caller (driver / bench / tests); nothing here
calls ray.init/shutdown.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd


def _configure():
    from pds_hw2_mpi_connected_components_ray.context import configure_ray_data

    configure_ray_data(quiet=True)


# --------------------------------------------------------------------------
# shared SQL fragments (lockstep with sources/edges.py and sources/pages.py)
# --------------------------------------------------------------------------

# NOTE: inside a WITH RECURSIVE list DuckDB 1.0 does NOT apply set
# semantics to a bare UNION in a non-self-referencing CTE, so dedup is
# an explicit SELECT DISTINCT over UNION ALL. MATERIALIZED stops the
# unrolled iterative oracles from re-opening the parquet file per
# CTE reference (fd exhaustion).
_EDGES_CTES = """
par AS MATERIALIZED (SELECT greatest(64, count(*) // 128) AS ng FROM lineitem),
raw AS MATERIALIZED (
  SELECT ((l_orderkey % ng) * 8 + (l_partkey % 8))::BIGINT AS src,
         ((l_orderkey % ng) * 8 + (l_suppkey % 8))::BIGINT AS dst
  FROM lineitem, par
  UNION ALL
  SELECT ((l_orderkey % ng) * 8)::BIGINT AS src,
         (((l_orderkey % ng) + 1) * 8)::BIGINT AS dst
  FROM lineitem, par
  WHERE l_linenumber = 1 AND (l_orderkey % ng) % 32 <> 31
),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges)
"""

_CC_SQL = f"""
WITH RECURSIVE {_EDGES_CTES},
walk AS (
  SELECT v, v AS l FROM verts
  UNION
  SELECT e.dst AS v, w.l AS l FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.l < e.dst
)
SELECT v AS vertex, min(l) AS label FROM walk GROUP BY v
"""


def _pagerank_sql(iters: int = 20) -> str:
    # plain WITH (not RECURSIVE): DuckDB honors MATERIALIZED here, so the
    # 20-iteration chain evaluates each r{k} exactly once instead of
    # exponentially inlining the CTE chain.
    parts = [
        f"WITH {_EDGES_CTES},",
        "deg AS MATERIALIZED (SELECT src AS v, count(*)::DOUBLE AS d FROM edges GROUP BY src),",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts),",
        "r0 AS MATERIALIZED (SELECT v, 1.0/nn.n AS r FROM verts, nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT coalesce(sum(r.r), 0.0) AS m
         FROM r{k-1} r LEFT JOIN deg ON deg.v = r.v WHERE deg.v IS NULL),
r{k} AS MATERIALIZED (
  SELECT verts.v AS v,
         (1 - 0.85)/nn.n + 0.85 * (coalesce(inc.s, 0.0) + d{k}.m/nn.n) AS r
  FROM verts CROSS JOIN nn CROSS JOIN d{k}
  LEFT JOIN (
    SELECT e.dst AS v, sum(r.r / deg.d) AS s
    FROM r{k-1} r JOIN deg ON deg.v = r.v JOIN edges e ON e.src = r.v
    GROUP BY e.dst
  ) inc ON inc.v = verts.v
)"""
        )
    parts.append(f"\nSELECT v AS vertex, round(r, 6) AS pr FROM r{iters}")
    return "".join(parts)


def _pagerank_weighted_sql(iters: int = 10) -> str:
    """Weighted PageRank unroll: surfer follows (u,v) with probability
    w(u,v)/W(u); planted deterministic weight w = (src+dst) % 5 + 1."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "we AS MATERIALIZED (SELECT src, dst, ((src + dst) % 5 + 1)::DOUBLE AS w FROM edges),",
        "wd AS MATERIALIZED (SELECT src AS v, sum(w) AS W FROM we GROUP BY src),",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts),",
        "r0 AS MATERIALIZED (SELECT v, 1.0/nn.n AS r FROM verts, nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT coalesce(sum(r.r), 0.0) AS m
         FROM r{k-1} r LEFT JOIN wd ON wd.v = r.v WHERE wd.v IS NULL),
r{k} AS MATERIALIZED (
  SELECT verts.v AS v,
         (1 - 0.85)/nn.n + 0.85 * (coalesce(inc.s, 0.0) + d{k}.m/nn.n) AS r
  FROM verts CROSS JOIN nn CROSS JOIN d{k}
  LEFT JOIN (
    SELECT e.dst AS v, sum(r.r * e.w / wd.W) AS s
    FROM r{k-1} r JOIN wd ON wd.v = r.v JOIN we e ON e.src = r.v
    GROUP BY e.dst
  ) inc ON inc.v = verts.v
)"""
        )
    parts.append(f"\nSELECT v AS vertex, round(r, 6) AS pr FROM r{iters}")
    return "".join(parts)


def _ppr_sql(iters: int, seed_mod: int) -> str:
    """Personalized PageRank unroll: teleport AND dangling mass land on
    p = uniform over the planted seed set {v : v % seed_mod = 0}; r0 = p
    (lockstep with pipelines.pagerank.personalized_pagerank). On the
    symmetric canonical graph the dangling term is exactly 0 — kept so
    the oracle mirrors the engine's formulation, not a simplification."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "deg AS MATERIALIZED (SELECT src AS v, count(*)::DOUBLE AS d FROM edges GROUP BY src),",
        f"sc AS MATERIALIZED (SELECT count(*)::DOUBLE AS ns FROM verts WHERE v % {seed_mod} = 0),",
        f"pv AS MATERIALIZED (SELECT v, (CASE WHEN v % {seed_mod} = 0 "
        "THEN 1.0/sc.ns ELSE 0.0 END) AS p FROM verts, sc),",
        "r0 AS MATERIALIZED (SELECT v, p AS r FROM pv)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT coalesce(sum(r.r), 0.0) AS m
         FROM r{k-1} r LEFT JOIN deg ON deg.v = r.v WHERE deg.v IS NULL),
r{k} AS MATERIALIZED (
  SELECT pv.v AS v,
         (1 - 0.85) * pv.p + 0.85 * (coalesce(inc.s, 0.0) + d{k}.m * pv.p) AS r
  FROM pv CROSS JOIN d{k}
  LEFT JOIN (
    SELECT e.dst AS v, sum(r.r / deg.d) AS s
    FROM r{k-1} r JOIN deg ON deg.v = r.v JOIN edges e ON e.src = r.v
    GROUP BY e.dst
  ) inc ON inc.v = pv.v
)"""
        )
    parts.append(f"\nSELECT v AS vertex, round(r, 6) AS pr FROM r{iters}")
    return "".join(parts)


def _hits_sql(iters: int) -> str:
    """HITS unroll over the DIRECTED distinct edge set (no symmetrize —
    that would force hub == authority). L1-normalized synchronous
    updates, lockstep with pipelines.hits. `verts` covers all endpoints
    (the symmetric closure's src set = src ∪ dst of raw)."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),",
        "h0 AS MATERIALIZED (SELECT v, 1.0 AS h FROM verts)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (SELECT e.dst AS v, sum(h.h) AS s
        FROM h{k-1} h JOIN dedges e ON e.src = h.v GROUP BY e.dst),
an{k} AS MATERIALIZED (SELECT sum(s) AS t FROM ar{k}),
a{k} AS MATERIALIZED (SELECT verts.v, coalesce(r.s, 0.0) / n.t AS a
        FROM verts CROSS JOIN an{k} n LEFT JOIN ar{k} r ON r.v = verts.v),
hr{k} AS MATERIALIZED (SELECT e.src AS v, sum(a.a) AS s
        FROM a{k} a JOIN dedges e ON e.dst = a.v GROUP BY e.src),
hn{k} AS MATERIALIZED (SELECT sum(s) AS t FROM hr{k}),
h{k} AS MATERIALIZED (SELECT verts.v, coalesce(r.s, 0.0) / n.t AS h
        FROM verts CROSS JOIN hn{k} n LEFT JOIN hr{k} r ON r.v = verts.v)"""
        )
    parts.append(
        f"\nSELECT a.v AS vertex, round(a.a, 6) AS auth, round(h.h, 6) AS hub "
        f"FROM a{iters} a JOIN h{iters} h ON h.v = a.v"
    )
    return "".join(parts)


_ADAMIC_ADAR_SQL = f"""
WITH {_EDGES_CTES},
simp AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS v, count(*)::DOUBLE AS d FROM simp GROUP BY src),
w AS MATERIALIZED (SELECT v, 1.0 / ln(d) AS w FROM deg WHERE d >= 2),
wedge AS (SELECT e1.dst AS b, e2.dst AS c, w.w AS w
          FROM simp e1 JOIN simp e2 ON e2.src = e1.src
          JOIN w ON w.v = e1.src WHERE e1.dst < e2.dst),
sc AS MATERIALIZED (SELECT b, c, round(sum(w), 6) AS aa_score FROM wedge GROUP BY b, c),
adj AS (SELECT src AS b, dst AS c FROM simp WHERE src < dst)
SELECT sc.b, sc.c, sc.aa_score FROM sc
LEFT JOIN adj ON adj.b = sc.b AND adj.c = sc.c
WHERE adj.b IS NULL AND sc.aa_score > 0
ORDER BY sc.aa_score DESC, sc.b, sc.c LIMIT 20
"""


# floor(x*1e6 + 0.5)/1e6 on BOTH sides: these fractions are rational,
# so exact ties like 1/128 = 0.0078125 are reachable and np.round
# (half-to-even) vs DuckDB round() (half-away) would diverge there.
_REPETITION_SQL = """
WITH L AS (SELECT doc_id, string_split(coalesce(text,''), chr(10)) AS ls FROM documents),
lf AS (SELECT doc_id,
       floor(((len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls)) * 1e6 + 0.5) / 1e6
         AS dup_line_frac FROM L),
toks AS (SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                            i -> w[i] || ' ' || w[i+1])) AS g
       FROM toks WHERE len(w) >= 2),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bm AS (SELECT doc_id, max(c)::DOUBLE AS mx, sum(c)::DOUBLE AS tot FROM bc GROUP BY doc_id)
SELECT lf.doc_id, lf.dup_line_frac,
       floor(coalesce(bm.mx / bm.tot, 0.0) * 1e6 + 0.5) / 1e6 AS top_bigram_frac
FROM lf LEFT JOIN bm ON bm.doc_id = lf.doc_id
"""


_STRATIFIED_SQL = """
WITH h AS (SELECT doc_id, source,
           ('0x' || substr(md5(concat(7, ':', doc_id)), 1, 15))::BIGINT AS h
           FROM documents),
r AS (SELECT doc_id, source,
      row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rnk FROM h)
SELECT source, doc_id, rnk FROM r WHERE rnk <= 10
"""


def _kcore_sql(k: int, rounds: int = 8) -> str:
    """Unrolled k-core peel: N rounds of (degree filter -> induce).
    Extra rounds beyond convergence are no-ops, so the unrolled result
    equals the engine's fixpoint (convergence depth 4 at sf0.01)."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "e0 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
v{r} AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM e{r-1}
        GROUP BY src HAVING count(*) >= {k}),
e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r-1} e
        JOIN v{r} a ON a.v = e.src JOIN v{r} b ON b.v = e.dst)"""
        )
    parts.append(
        f"\nSELECT v AS vertex, d::BIGINT AS degree FROM v{rounds}"
    )
    return "".join(parts)


def _coreness_sql(kmax: int = 10, rounds: int = 6) -> str:
    """Full core-number decomposition, unrolled: for each k the peel
    chains from the (k-1)-core's fixpoint (the k-core is a subgraph of
    it), and coreness = max k whose fixpoint still contains the vertex.
    Fixture peel depth is <= 4 per k and kmax = 7 at sf0.01 (measured),
    so (kmax=10, rounds=6) is past convergence; extra rounds/ks are
    no-ops on an already-stable or empty edge set."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "ce1_0 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst)",
    ]
    survivors = []
    for k in range(1, kmax + 1):
        if k > 1:
            parts.append(
                f""",
ce{k}_0 AS MATERIALIZED (SELECT src, dst FROM ce{k-1}_{rounds})"""
            )
        for r in range(1, rounds + 1):
            parts.append(
                f""",
cv{k}_{r} AS MATERIALIZED (SELECT src AS v FROM ce{k}_{r-1}
        GROUP BY src HAVING count(*) >= {k}),
ce{k}_{r} AS MATERIALIZED (SELECT e.src, e.dst FROM ce{k}_{r-1} e
        JOIN cv{k}_{r} a ON a.v = e.src JOIN cv{k}_{r} b ON b.v = e.dst)"""
            )
        survivors.append(f"SELECT DISTINCT src AS v, {k} AS k FROM ce{k}_{rounds}")
    union = " UNION ALL ".join(survivors)
    parts.append(
        f"\nSELECT v AS vertex, max(k)::BIGINT AS coreness FROM ({union}) GROUP BY v"
    )
    return "".join(parts)


def _labelprop_chain(iters: int = 4) -> str:
    """The l0..l{iters} sync-LPA CTE fragment (appends to _EDGES_CTES);
    shared by the labelprop4 / modularity / community_graph oracles."""
    parts = ["l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)"]
    for k in range(1, iters + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (SELECT e.dst AS v, l.lab AS nl, count(*) AS c
         FROM l{k-1} l JOIN edges e ON e.src = l.v GROUP BY e.dst, l.lab),
w{k} AS MATERIALIZED (SELECT v, nl FROM (
           SELECT v, nl, row_number() OVER (PARTITION BY v ORDER BY c DESC, nl ASC) AS rn
           FROM c{k}) WHERE rn = 1),
l{k} AS MATERIALIZED (SELECT p.v, coalesce(w.nl, p.lab) AS lab
         FROM l{k-1} p LEFT JOIN w{k} w ON w.v = p.v)"""
        )
    return "".join(parts)


def _labelprop_sql(iters: int = 4) -> str:
    return (
        f"WITH {_EDGES_CTES},"
        + _labelprop_chain(iters)
        + f"\nSELECT v AS vertex, lab AS label FROM l{iters}"
    )


# endpoint-community rows of the simple symmetric graph under the
# 4-iteration LPA labeling (shared by modularity / community_graph)
_COMM_EDGE_CTES = (
    f"WITH {_EDGES_CTES},"
    + _labelprop_chain(4)
    + """,
simp AS (SELECT src, dst FROM edges WHERE src <> dst),
le AS MATERIALIZED (
  SELECT ls.lab AS ca, ld.lab AS cb
  FROM simp e JOIN l4 ls ON ls.v = e.src JOIN l4 ld ON ld.v = e.dst)
"""
)


_TRI_CTES = f"""
{_EDGES_CTES},
simp AS (SELECT src, dst FROM edges WHERE src <> dst),
o AS (SELECT src AS a, dst AS b FROM simp WHERE src < dst),
tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM o e1 JOIN o e2 ON e2.a = e1.b JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b)
"""


def _truss_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous k-truss peel: per round, triangle support
    over the surviving a<b edge set, keep edges with support >= k-2
    (support-0 edges have no s-row, so the inner join drops them)."""
    parts = [
        f"WITH {_EDGES_CTES},",
        "simp AS (SELECT src, dst FROM edges WHERE src <> dst),",
        "e0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM simp WHERE src < dst)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
t{r} AS MATERIALIZED (SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e{r} e1 JOIN e{r} e2 ON e2.a = e1.b JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b),
s{r} AS MATERIALIZED (SELECT x, y, count(*) AS sup FROM (
  SELECT a AS x, b AS y FROM t{r} UNION ALL SELECT b, c FROM t{r}
  UNION ALL SELECT a, c FROM t{r}) GROUP BY x, y),
e{r+1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e
  JOIN s{r} s ON s.x = e.a AND s.y = e.b WHERE s.sup >= {k - 2})"""
        )
    parts.append(f"\nSELECT a, b FROM e{rounds}")
    return "".join(parts)


# Exact-similarity pair CTEs over `documents` (lockstep with the engine's
# shingle semantics in functions/hashing.py: char k-shingles are the
# substring windows; word n-grams are whitespace-token windows; docs
# shorter than the window contribute the whole text as one element;
# empty docs contribute nothing). The dedup operators' LSH stage only
# CHOOSES candidates -- their output filter is this exact Jaccard, which
# is why an all-pairs SQL formulation reproduces them exactly.
def _char5_pair_ctes(source: str = "documents") -> str:
    """Char-5-shingle exact-Jaccard pair CTEs over an arbitrary source
    relation (the corpus_prep oracle applies them to the gated/deduped
    survivor set instead of raw documents)."""
    return f"""
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(length(coalesce(text,'')) - 3, 2)),
           i -> substr(coalesce(text,''), i, 5)))) AS g
  FROM {source} WHERE length(coalesce(text,'')) > 0
),
cnt AS MATERIALIZED (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM sh x JOIN sh y USING (g) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
),
jpairs AS (
  SELECT inter.a, inter.b, i / (ca.n + cb.n - i) AS j
  FROM inter JOIN cnt ca ON ca.doc_id = inter.a
             JOIN cnt cb ON cb.doc_id = inter.b
)
"""


_CHAR5_PAIR_CTES = """
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(length(coalesce(text,'')) - 3, 2)),
           i -> substr(coalesce(text,''), i, 5)))) AS g
  FROM documents WHERE length(coalesce(text,'')) > 0
),
cnt AS MATERIALIZED (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM sh x JOIN sh y USING (g) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
),
jpairs AS (
  SELECT inter.a, inter.b, i / (ca.n + cb.n - i) AS j
  FROM inter JOIN cnt ca ON ca.doc_id = inter.a
             JOIN cnt cb ON cb.doc_id = inter.b
)
"""

def _split_sql(
    source: str,
    *,
    key_expr: str,
    id_expr: str = "doc_id",
    seed: int = 42,
    train: float = 0.8,
    val: float = 0.1,
) -> str:
    """SQL mirror of pipelines.split: int60 from md5 hex[0:15] against
    EXACT integer thresholds (computed here in Python, no float math in
    SQL) -- bit-identical to the Ray side."""
    from pds_hw2_mpi_connected_components_ray.pipelines.split import split_bounds

    b1, b2 = split_bounds(train, val)
    inner = (
        f"SELECT {id_expr} AS doc_id, ('0x' || substr(md5(concat({seed}, ':', "
        f"{key_expr})), 1, 15))::BIGINT AS h FROM {source}"
    )
    case = (
        f"CASE WHEN h < {b1} THEN 'train' WHEN h < {b2} THEN 'val' "
        "ELSE 'test' END AS split"
    )
    return f"SELECT doc_id, {case} FROM ({inner})"


_WORD3_PAIR_CTES = """
toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents
),
gr AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS g
  FROM toks WHERE len(w) > 0
),
cnt AS MATERIALIZED (SELECT doc_id, count(*)::DOUBLE AS n FROM gr GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM gr x JOIN gr y USING (g) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
),
jpairs AS (
  SELECT inter.a, inter.b, i / (ca.n + cb.n - i) AS j
  FROM inter JOIN cnt ca ON ca.doc_id = inter.a
             JOIN cnt cb ON cb.doc_id = inter.b
)
"""

_STOP_EN = "'the','and','of','to','a','in','is','that','it','for','with','on','as'"
_STOP_DE = "'der','die','das','und','ist','nicht','mit','ein','eine','zu','den','von'"
_STOP_EL = "'και','το','της','των','του','στο','με','για','από','είναι','την','ότι'"

_KNN_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
    "           ORDER BY vec_id LIMIT 8), "
    "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
    "         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS cs "
    "         FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), "
    "r AS (SELECT query_id, neighbor_id, cs, row_number() OVER ("
    "      PARTITION BY query_id ORDER BY cs DESC, neighbor_id ASC) AS rnk FROM sims) "
    "SELECT query_id, neighbor_id, rnk::BIGINT AS rnk, round(cs, 6) AS cosine "
    "FROM r WHERE rnk <= 5"
)


# --------------------------------------------------------------------------
# Ray-side helpers
# --------------------------------------------------------------------------


_CANON_CACHE: dict[str, object] = {}


def _canon_edges(sf_dir: str):
    """Canonical symmetric edge table for `sf_dir`, MEMOIZED per process
    as a materialized Dataset: every graph query shares one derivation
    (pages -> links -> mint -> symmetrize -> dedup, ~5 s at sf0.1)
    instead of re-paying it — materialized-view reuse, the exact
    behavior a resident engine gives a session. bench.py times the
    derivation itself separately as `edges_build`; the driver's
    correctness gate is unaffected (the cached Dataset is immutable
    and deterministic)."""
    import ray

    # key by Ray job id too: a shutdown/re-init in the same process
    # invalidates cached object refs, so a fresh session re-derives
    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _CANON_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.sources.edges import derive_raw_edges
        from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

        ds = canonical_edges(derive_raw_edges(sf_dir)).materialize()
        _CANON_CACHE.clear()
        _CANON_CACHE[key] = ds
    return ds


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _query_vectors(sf_dir: str, nq: int = 8):
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = tab.to_pandas().sort_values("vec_id").head(nq)
    qids = df["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return qids, qmat


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_edges_build(sf_dir: str):
    _configure()
    return _canon_edges(sf_dir)


def _q_degree(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import degrees

    return degrees(_canon_edges(sf_dir))


_CC_LABELS_CACHE: dict = {}


def _cc_labels_memo(sf_dir: str):
    """Default-mode (pinned) CC label table, MEMOIZED per process like
    _canon_edges: cc_labels / cc_count / component_sizes and the
    profile/bipartite compositions share ONE solve. Mode-variant
    queries (shuffle / unionfind) still solve independently — that is
    what they exist to exercise."""
    import ray

    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _CC_LABELS_CACHE.get(key)
    if ds is None:
        ds = connected_components(_canon_edges(sf_dir)).labels.materialize()
        _CC_LABELS_CACHE[key] = ds
    return ds


def _q_cc_labels(sf_dir: str, **kw):
    _configure()
    if not kw:
        return _cc_labels_memo(sf_dir)
    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components

    return connected_components(_canon_edges(sf_dir), **kw).labels


def _q_cc_incremental(sf_dir: str):
    """Incremental CC: the edge table is split ~90/10 by an unordered-
    pair hash (both directions of an undirected edge stay together, so
    each side remains a symmetric table); the engine solves the base,
    then folds the delta via pipelines.incremental at O(delta) exchange
    cost. The oracle is the FULL-graph CC SQL -- asserting incremental
    == from-scratch, per-vertex."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
    from pds_hw2_mpi_connected_components_ray.pipelines.incremental import (
        cc_incremental,
    )

    edges = _canon_edges(sf_dir).materialize()

    def side(keep_delta: bool):
        def fn(t):
            import pyarrow as pa

            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            lo, hi = np.minimum(s, d), np.maximum(s, d)
            k = (lo * 1000003 + hi) % 10
            mask = (k == 0) if keep_delta else (k != 0)
            idx = np.nonzero(mask)[0]
            return pa.table({"src": s[idx], "dst": d[idx]})

        return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    base = side(False).materialize()
    delta = side(True).materialize()
    res_base = connected_components(base, mode="auto")
    return cc_incremental(res_base.labels, delta).labels


def _q_link_prediction(sf_dir: str):
    """Common-neighbor link prediction: top-20 non-adjacent pairs by
    |N(b) ∩ N(c)| via wedge join + groupby count + anti-join; total
    (count desc, b, c) order makes the top-k deterministic."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.linkpred import (
        common_neighbor_candidates,
    )

    return common_neighbor_candidates(_canon_edges(sf_dir), k=20)


def _q_pagerank_weighted(sf_dir: str, mode: str = "auto", iters: int = 10):
    """Weighted PageRank (10 iterations): deterministic planted weight
    (src+dst)%5+1 on the canonical edge table; surfer transition
    p = w/W(src) precomputed once."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank_weighted import (
        pagerank_weighted,
    )

    def add_w(t):
        import pyarrow as pa

        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": s, "dst": d, "weight": ((s + d) % 5 + 1).astype(np.float64)}
        )

    wedges = _canon_edges(sf_dir).map_batches(
        add_w, batch_format="pyarrow", zero_copy_batch=True
    )
    return pagerank_weighted(wedges, iters=iters, mode=mode)


def _q_walks(sf_dir: str):
    """DeepWalk-style corpus generation, deterministic: 3-hop walks
    from every vertex; each hop joins the frontier with the edge table
    and picks the neighbor minimizing a seeded multiply-mod hash
    (exactly mirrored in SQL) -- candidate volume edge-proportional."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.walks import (
        deterministic_walks,
    )

    return deterministic_walks(_canon_edges(sf_dir), length=3, seed=42)


def _q_degree_histogram(sf_dir: str):
    _configure()
    from ray.data.aggregate import Count

    from pds_hw2_mpi_connected_components_ray.stages.graph import degrees

    agg = degrees(_canon_edges(sf_dir)).groupby("degree").aggregate(
        Count(alias_name="n_vertices")
    )
    return agg


def _q_component_sizes(sf_dir: str):
    _configure()
    from ray.data.aggregate import Count

    return (
        _cc_labels_memo(sf_dir)
        .groupby("label")
        .aggregate(Count(alias_name="csize"))
    )


def _q_cc_count(sf_dir: str):
    _configure()
    from ray.data.aggregate import Count

    n = (
        _cc_labels_memo(sf_dir)
        .groupby("label")
        .aggregate(Count(alias_name="_n"))
        .count()
    )
    return pd.DataFrame({"n_components": np.array([n], dtype=np.int64)})


def _q_pagerank(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank

    res = pagerank(_canon_edges(sf_dir), max_iters=20, tol=None, mode="pinned")
    df = res.ranks.to_pandas()
    return pd.DataFrame({"vertex": df["vertex"], "pr": np.round(df["rank"].to_numpy(), 6)})


def _q_pagerank_personalized(sf_dir: str, mode: str = "local"):
    """Personalized PageRank (10 iters): teleport/dangling mass on the
    planted seed set {v : v % 16 == 0}; local and pinned modes share
    one kernel with classic PageRank (p = 1/n is the special case)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import (
        personalized_pagerank,
    )

    res = personalized_pagerank(
        _canon_edges(sf_dir), seed_mod=16, max_iters=10, mode=mode
    )

    def round6(t):
        import pyarrow as pa

        return pa.table(
            {
                "vertex": t["vertex"],
                "pr": np.round(t["rank"].to_numpy(zero_copy_only=False), 6),
            }
        )

    return res.ranks.map_batches(round6, batch_format="pyarrow", zero_copy_batch=True)


_DIRECTED_CACHE: dict = {}


def _directed_edges_memo(sf_dir: str):
    """Distinct DIRECTED raw edge table, MEMOIZED per process like
    _canon_edges: hits / reciprocity / the SCC family share one
    derive+dedup pass (~2 s at sf0.1) instead of each paying it."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _DIRECTED_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.sources.edges import derive_raw_edges
        from pds_hw2_mpi_connected_components_ray.stages.graph import dedup_edges

        ds = dedup_edges(derive_raw_edges(sf_dir)).materialize()
        _DIRECTED_CACHE.clear()
        _DIRECTED_CACHE[key] = ds
    return ds


def _q_hits(sf_dir: str, mode: str = "local", iters: int = 8):
    """HITS hubs/authorities over the DIRECTED distinct edge table
    (symmetrizing would collapse hub == authority by construction)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.hits import hits

    return hits(_directed_edges_memo(sf_dir), iters=iters, mode=mode).scores


def _q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction: top-20 non-adjacent pairs by
    Σ 1/ln(deg(a)) over shared neighbors a (hub centers discounted)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.linkpred import (
        adamic_adar_candidates,
    )

    return adamic_adar_candidates(_canon_edges(sf_dir), k=20)


def _q_pagerank_top10(sf_dir: str):
    """Top-10 vertices by PageRank -- exercises sort + limit with a
    deterministic (pr desc, vertex asc) tie-break."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank

    res = pagerank(_canon_edges(sf_dir), max_iters=20, tol=None, mode="pinned")
    import ray.data as rd

    ranks = res.ranks.map_batches(
        lambda df: pd.DataFrame(
            {"vertex": df["vertex"], "pr": np.round(df["rank"].to_numpy(), 6)}
        ),
        batch_format="pandas",
    )
    top = ranks.sort(["pr", "vertex"], descending=[True, False]).limit(10)
    return top


def _q_labelprop(sf_dir: str):
    _configure()
    return _lpa_labels(sf_dir)


def _q_triangle_total(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import triangle_count

    n = triangle_count(_canon_edges(sf_dir))
    return pd.DataFrame({"n_triangles": np.array([n], dtype=np.int64)})


_TRI_CACHE: dict = {}


def _tri_per_vertex_memo(sf_dir: str):
    """(vertex, triangles) table, MEMOIZED per process like
    _canon_edges: the triangles_per_vertex query and clustering_coeff
    share one oriented-wedge count."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _TRI_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
            triangles_per_vertex,
        )

        ds = triangles_per_vertex(_canon_edges(sf_dir)).materialize()
        _TRI_CACHE.clear()
        _TRI_CACHE[key] = ds
    return ds


def _q_triangles_by_vertex(sf_dir: str):
    _configure()
    return _tri_per_vertex_memo(sf_dir)


def _q_kcore(sf_dir: str, k: int = 7):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.kcore import kcore

    return kcore(_canon_edges(sf_dir), k)


def _q_coreness(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.kcore import coreness

    return coreness(_canon_edges(sf_dir))


def _q_bfs_hops(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops

    return bfs_hops(_canon_edges(sf_dir), mode="broadcast")


def _q_multi_bfs_hops(sf_dir: str):
    """k=4 landmark BFS waves batched into ONE pinned relaxation loop
    (sources = the 4 smallest vertex ids, mirrored in the oracle)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import multi_bfs_hops

    return multi_bfs_hops(_canon_edges(sf_dir), k=4)


def _q_bfs_hops_pinned(sf_dir: str):
    # the web-scale mode: decentralized (min,+1) relaxation over the
    # pinned dst-sharded pool; no O(n) driver state
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops

    return bfs_hops(_canon_edges(sf_dir), mode="pinned")


def _q_sssp(sf_dir: str):
    """Weighted SSSP from the min vertex: (min,+w) relaxation over the
    pinned pool; planted weights (src+dst)%5+1 (pagerank_weighted's
    convention), mirrored by a cumulative-cost recursive oracle."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import sssp_dist_pinned

    return sssp_dist_pinned(_canon_edges(sf_dir))


def _q_harmonic_centrality(sf_dir: str):
    """Landmark harmonic centrality: Σ 1/hops over the 4 smallest-id
    landmarks' BFS waves (one pinned relaxation loop) + groupby-sum."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import (
        landmark_harmonic_centrality,
    )

    return landmark_harmonic_centrality(_canon_edges(sf_dir), k=4)


def _q_diameter(sf_dir: str):
    """Double-sweep diameter lower bound: two pinned BFS runs over one
    shared shard pool (load once, solve twice)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import (
        double_sweep_diameter,
    )

    return double_sweep_diameter(_canon_edges(sf_dir))


def _q_reciprocity(sf_dir: str):
    """Link reciprocity of the DIRECTED distinct edge table (the
    symmetric table would be 1.0 by construction)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import reciprocity

    return reciprocity(_directed_edges_memo(sf_dir))


def _q_assortativity(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import degree_assortativity

    r = degree_assortativity(_canon_edges(sf_dir))
    return pd.DataFrame({"assortativity": [np.round(r, 6)]})


def _q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient: 2*triangles / (d*(d-1)) per vertex
    (0 when d < 2), composed from the oracle-checked triangle and degree
    operators via a left-outer hash join."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
        triangles_per_vertex,
    )
    from pds_hw2_mpi_connected_components_ray.stages.graph import (
        degrees,
        drop_self_loops,
    )
    from pds_hw2_mpi_connected_components_ray.stages.joins import hash_join

    edges = _canon_edges(sf_dir).materialize()
    deg = degrees(drop_self_loops(edges).materialize())
    tri = _tri_per_vertex_memo(sf_dir).map_batches(
        lambda t: t.rename_columns(["vertex", "tri"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # triangle side is <= |V| rows: broadcast attach (no shuffle) below
    # the engine-wide threshold, left-outer hash join beyond it
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
        BROADCAST_DEGREE_THRESHOLD,
    )

    if tri.count() <= BROADCAST_DEGREE_THRESHOLD:
        import pyarrow as pa

        from pds_hw2_mpi_connected_components_ray.stages.joins import (
            broadcast_attach,
            put_lookup,
        )

        tri_tab = pa.concat_tables(
            list(tri.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ref = put_lookup(tri_tab, "vertex", "tri")
        j = broadcast_attach(
            deg, ref, "vertex", "tri", keep_missing=True, missing_value=0
        )
    else:
        j = hash_join(deg, tri, on=("vertex",), join_type="left_outer")

    def coeff(df: pd.DataFrame) -> pd.DataFrame:
        d = df["degree"].to_numpy(dtype=np.float64)
        t = df["tri"].fillna(0).to_numpy(dtype=np.float64)
        denom = d * (d - 1)
        cc = np.where(denom > 0, 2.0 * t / np.maximum(denom, 1.0), 0.0)
        return pd.DataFrame(
            {"vertex": df["vertex"].to_numpy(dtype=np.int64), "coeff": np.round(cc, 6)}
        )

    return j.map_batches(coeff, batch_format="pandas")


def _q_extract_text(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        extract_text_stage,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_documents

    return extract_text_stage(pages_from_documents(sf_dir))


def _q_extract_links(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        doc_id_edges,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_documents

    return doc_id_edges(pages_from_documents(sf_dir))


def _q_doc_stats(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import doc_stats

    return doc_stats(_docs(sf_dir))


def _q_exact_dedup(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_knn(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import knn_brute

    qids, qmat = _query_vectors(sf_dir)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_brute(emb, qids, qmat, k=5)
    return pd.DataFrame(
        {
            "query_id": out["query_id"],
            "neighbor_id": out["neighbor_id"],
            "rnk": out["rank"].astype(np.int64),
            "cosine": np.round(out["cosine"].to_numpy(), 6),
        }
    )


def _q_events_windowed(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import windowed_counts

    return windowed_counts(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_events_hopping(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import hopping_counts

    return hopping_counts(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_top_tokens(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import top_tokens

    return top_tokens(_docs(sf_dir), k=50)


def _q_tfidf_top_terms(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(_docs(sf_dir), k=3)


def _q_event_transitions(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import event_transitions

    return event_transitions(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_out_of_order(sf_dir: str):
    """Per-user stream-disorder profile (late events vs running max in
    arrival order — the watermark-sizing statistic)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        out_of_order_stats,
    )

    return out_of_order_stats(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_session_hist(sf_dir: str):
    """Session-length distribution (events per 30-min-gap session),
    histogram-reduced inside each user bucket."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        session_length_hist,
    )

    return session_length_hist(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_new_users(sf_dir: str):
    """First-seen users per tumbling window (one user-keyed min, then
    a window-keyed count — the acquisition-curve metric)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        new_users_per_window,
    )

    return new_users_per_window(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_running_totals(sf_dir: str):
    """Per-user running total of value (cumulative window function via
    bucketed sort + vectorized run-boundary reset; exact cents)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import running_totals

    return running_totals(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_events_asof(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import asof_prev

    return asof_prev(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_events_sessionize(sf_dir: str):
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import sessionize

    return sessionize(rd.read_parquet(f"{sf_dir}/events.parquet"))


# ---- dedup / text / media (planted-ground-truth oracles) ----
#
# The dedup operators emit EXACT similarities (LSH only picks
# candidates; see pipelines/dedup.py), and the driver's documents
# fixture plants near-duplicate pairs far above every threshold (at
# sf0.01: 25 pairs with char-5 Jaccard >= 0.9, next-highest pair 0.31),
# so an all-pairs exact-similarity SQL query is a true oracle: LSH
# recall at those similarities is 1 - eps with eps < 1e-7 under the
# fixed seeds, i.e. deterministic on the fixture.


def _round_cols(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    df = df.copy()
    for c in cols:
        df[c] = np.round(df[c].to_numpy(dtype=np.float64), 6)
    return df


_MINHASH_PAIRS_CACHE: dict = {}


def _minhash_pairs_memo(sf_dir: str):
    """Verified MinHash near-dup pair set (threshold 0.5 over the raw
    documents table), MEMOIZED per process like _canon_edges:
    minhash_pairs / dup_groups / dup_family_sizes share ONE
    shingle→LSH→verify run instead of each paying it (~4 s at sf0.1)."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _MINHASH_PAIRS_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
            minhash_lsh_pairs,
        )

        ds = minhash_lsh_pairs(_docs(sf_dir), threshold=0.5).materialize()
        _MINHASH_PAIRS_CACHE.clear()
        _MINHASH_PAIRS_CACHE[key] = ds
    return ds


def _q_minhash_pairs(sf_dir: str):
    _configure()
    out = _minhash_pairs_memo(sf_dir).to_pandas()
    return _round_cols(out, ["jaccard"])


def _q_simhash_pairs(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import simhash_pairs

    out = simhash_pairs(
        _docs(sf_dir), hamming_threshold=8, verify_threshold=0.5
    ).to_pandas()
    # hamming is not SQL-expressible; the oracle checks the verified
    # (a, b, jaccard) pair set
    return _round_cols(out[["a", "b", "jaccard"]], ["jaccard"])


def _q_ngram_pairs(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(sf_dir), n=3, threshold=0.6).to_pandas()
    return _round_cols(out, ["jaccard"])


def _augmented_embeddings(sf_dir: str):
    """embeddings plus planted exact duplicates: every 20th vector is
    copied under vec_id + 1_000_000 (mirrored by UNION ALL in the
    oracle). The fixture's natural max pairwise cosine is ~0.51, so at
    threshold 0.9 the expected pair set is exactly the planted copies."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def plant(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch[["vec_id", "embedding"]]
        dup = base[base["vec_id"] % 20 == 0].copy()
        dup["vec_id"] = dup["vec_id"] + 1_000_000
        return pd.concat([base, dup], ignore_index=True)

    return emb.map_batches(plant, batch_format="pandas")


def _q_embedding_pairs(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        embedding_cosine_pairs,
    )

    out = embedding_cosine_pairs(
        _augmented_embeddings(sf_dir), threshold=0.9, num_tables=8, num_planes=8
    ).to_pandas()
    return _round_cols(out, ["cosine"])


def _q_dup_groups(sf_dir: str):
    """MinHash near-dup pairs clustered into groups via the engine's own
    connected components. Oracle: recursive min-label walk over the SQL
    exact-Jaccard pair set."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import duplicate_groups

    pairs = _minhash_pairs_memo(sf_dir)
    if pairs.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "group_id": pd.Series([], dtype="int64")})
    return duplicate_groups(pairs)


def _q_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate rate (hash-keyed distinct, bodies
    never shuffled; the boilerplate dashboard row)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        dup_rate_by_source,
    )

    return dup_rate_by_source(_docs(sf_dir))


def _q_dup_family_sizes(sf_dir: str):
    """Near-dup family-size histogram (how duplicated is the corpus?):
    minhash pairs → engine CC groups → size counts → tiny histogram."""
    _configure()
    from ray.data.aggregate import Count, Sum

    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import duplicate_groups

    pairs = _minhash_pairs_memo(sf_dir)
    if pairs.count() == 0:
        return pd.DataFrame(
            {
                "family_size": pd.Series([], dtype="int64"),
                "n_families": pd.Series([], dtype="int64"),
            }
        )
    sizes = (
        duplicate_groups(pairs)
        .groupby("group_id")
        .aggregate(Count(alias_name="family_size"))
    )

    def hist(t):
        import pyarrow as pa

        s = t["family_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"family_size": u, "c": c.astype(np.int64)})

    return (
        sizes.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("family_size")
        .aggregate(Sum("c", alias_name="n_families"))
    )


def _q_lang_id(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import lang_id_stage

    return lang_id_stage(_docs(sf_dir))


def _q_fingerprints(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import doc_fingerprints

    return doc_fingerprints(_docs(sf_dir))


def _q_doc_quality(sf_dir: str):
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import doc_quality

    out = doc_quality(_docs(sf_dir)).to_pandas()
    return _round_cols(
        out, ["avg_token_len", "punct_ratio", "stopword_ratio", "upper_ratio"]
    )


def _q_knn_ivf(sf_dir: str):
    """IVF ANN in its FULL-PROBE configuration (nprobe == nlist): every
    inverted list is scanned, so the output provably equals exact brute
    force -- the oracle-checkable config exercising the whole IVF path
    (k-means train, assignment, probing, merge). Partial-probe recall
    (nprobe < nlist) is covered by tests/test_dedup_similarity.py."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import knn_ivf

    qids, qmat = _query_vectors(sf_dir)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_ivf(emb, qids, qmat, k=5, nlist=16, nprobe=16)
    return pd.DataFrame(
        {
            "query_id": out["query_id"],
            "neighbor_id": out["neighbor_id"],
            "rnk": out["rank"].astype(np.int64),
            "cosine": np.round(out["cosine"].to_numpy(), 6),
        }
    )


def _q_knn_ivf_indexed(sf_dir: str):
    """Persisted-partitioned IVF (build index -> probe from disk) in its
    full-probe configuration (nprobe == nlist -> provably exact; the
    partition-pruned partial-probe path is pytest-covered)."""
    _configure()
    import shutil
    import tempfile

    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        ivf_build,
        knn_ivf_indexed,
    )

    qids, qmat = _query_vectors(sf_dir)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        idx = ivf_build(emb, tmp, nlist=16, fit_iters=4)
        out = knn_ivf_indexed(idx, qids, qmat, k=5, nprobe=16)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return pd.DataFrame(
        {
            "query_id": out["query_id"],
            "neighbor_id": out["neighbor_id"],
            "rnk": out["rank"].astype(np.int64),
            "cosine": np.round(out["cosine"].to_numpy(), 6),
        }
    )


def _q_media_decode(sf_dir: str):
    """Decode plumbing over the deterministic fake-image format; the
    oracle mirrors the header arithmetic (width/height/n_bytes are pure
    functions of the text length). The crc32 checksum column is dropped
    here (not SQL-expressible); it is pytest-covered."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        decode_media,
        media_from_documents,
    )

    out = decode_media(media_from_documents(_docs(sf_dir)), batch_size=64)
    return out.select_columns(["media_id", "width", "height", "n_bytes"])


def _q_media_decode_png(sf_dir: str):
    """REAL-format decode: deterministic grayscale PNGs (scanline
    filters cycling 0-4, so the corpus exercises every unfilter path)
    decoded by the pure-Python PNG codec (chunk CRCs, zlib inflate,
    filter reconstruction). width/height/pixel_sum are closed-form in
    len(text), so the oracle verifies the DECODED PIXELS, not just
    headers. The crc32 checksum and encoded n_bytes columns are dropped
    (not SQL-expressible); pytest covers them."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        decode_png_media,
        png_from_documents,
    )

    out = decode_png_media(png_from_documents(_docs(sf_dir)), batch_size=64)
    return out.select_columns(["media_id", "width", "height", "pixel_sum"])


def _q_media_decode_wav(sf_dir: str):
    """REAL-format audio decode: deterministic mono PCM WAVs parsed by
    the pure-Python RIFF codec (chunk walk, fmt validation, 16-bit
    samples). n_samples/amp_sum/peak are closed-form in len(text), so
    the oracle verifies the DECODED SAMPLES, not just headers."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        decode_wav_media,
        wav_from_documents,
    )

    out = decode_wav_media(wav_from_documents(_docs(sf_dir)), batch_size=64)
    return out.select_columns(
        ["media_id", "sample_rate", "n_samples", "amp_sum", "peak"]
    )


def _q_dataset_split(sf_dir: str):
    """Deterministic hash split (train/val/test): assignment depends
    only on (seed, doc_id) -- stable under re-runs, repartitioning and
    row order; mirrored bit-exactly in SQL via integer thresholds."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.split import dataset_split

    return dataset_split(_docs(sf_dir), train=0.8, val=0.1, seed=42)


def _q_group_safe_split(sf_dir: str):
    """Leakage-safe split: near-dup families (minhash pairs -> engine
    CC groups) are assigned as one unit via the group representative,
    so eval never holds a near-copy of a train doc."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import minhash_lsh_pairs
    from pds_hw2_mpi_connected_components_ray.pipelines.split import group_safe_split

    docs = _docs(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.5).materialize()
    return group_safe_split(docs, pairs, train=0.8, val=0.1, seed=42)


_CORPUS_PREP_CACHE: dict = {}


def _corpus_prep_memo(sf_dir: str):
    """corpus_prep result (default gate parameters), MEMOIZED per
    process like _cc_labels_memo: corpus_prep and prep_sink_roundtrip
    share ONE run of the ~20s prep chain (VERDICT r3 #2); the sink
    round-trip still writes + reads back its own copy, which is the
    part it exists to exercise."""
    import ray

    from pds_hw2_mpi_connected_components_ray.pipelines.prep import corpus_prep

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _CORPUS_PREP_CACHE.get(key)
    if ds is None:
        ds = corpus_prep(
            _docs(sf_dir), min_tokens=5, max_punct_ratio=0.2, jaccard_threshold=0.5
        ).materialize()
        _CORPUS_PREP_CACHE[key] = ds
    return ds


def _q_corpus_prep(sf_dir: str):
    """Flagship training-data prep chain: quality gate -> exact dedup ->
    near-dup collapse (minhash + exact-Jaccard verify + CC) -> surviving
    doc ids. Every stage is itself oracle-checked; the composition's SQL
    mirror chains the same predicates and the recursive group walk."""
    _configure()
    return _corpus_prep_memo(sf_dir)


def _q_prep_sink_roundtrip(sf_dir: str):
    """corpus_prep written through the resumable hash-partitioned sink
    (atomic per-partition dirs, _SUCCESS markers) and read back — the
    sink exercised INSIDE the correctness gate; oracle = corpus_prep's
    own SQL (a lossy sink would hash-mismatch)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.sources.sinks import (
        read_partitioned,
        write_partitioned,
    )

    out = _corpus_prep_memo(sf_dir)
    root = tempfile.mkdtemp(prefix="prep_sink_", dir="/tmp")
    write_partitioned(out, root, key="doc_id", num_partitions=8)
    # read_parquet hive-infers a `part` column from the directory
    # layout; project back to the logical schema
    return read_partitioned(root).select_columns(["doc_id"])


def _q_pages_to_edges(sf_dir: str):
    """The PRODUCTION front-end end to end: pages with messy hrefs ->
    extract -> normalize_url -> mint_id -> canonical undirected edge
    table -> join ids back to urls. The url->id mint round-trips out of
    the comparison, but a mint collision or normalization bug would
    corrupt the edge set / join-back, so the whole path is verified."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        pages_to_edges,
        url_id_table,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_documents
    from pds_hw2_mpi_connected_components_ray.stages.joins import hash_join

    pages = pages_from_documents(sf_dir, messy_links=True).materialize()
    edges = pages_to_edges(pages)
    urls = url_id_table(pages).materialize()
    if urls.count() <= 2_000_000:
        # broadcast attach: the url dimension is pages-sized; below the
        # gate one ray.put'd sorted lookup replaces TWO string hash
        # joins (measured 8 s of join fixed cost at sf0.1 for a
        # 5k-row dimension)
        import pyarrow as pa
        import ray

        from pds_hw2_mpi_connected_components_ray.stages.joins import _LookupArrays

        tab = pa.concat_tables(
            list(urls.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        keys = tab["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(tab["url"].to_pandas(), dtype=object)
        ref = ray.put(_LookupArrays(keys, vals))

        def attach(t: "pa.Table") -> "pa.Table":
            import ray as _ray

            lk = _ray.get(ref)
            _, su = lk.get(t["src"].to_numpy(zero_copy_only=False))
            _, du = lk.get(t["dst"].to_numpy(zero_copy_only=False))
            return pa.table(
                {"src_url": pa.array(list(su)), "dst_url": pa.array(list(du))}
            )

        return edges.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    ua = urls.map_batches(
        lambda df: pd.DataFrame({"src": df["vertex"], "src_url": df["url"]}),
        batch_format="pandas",
    )
    ub = urls.map_batches(
        lambda df: pd.DataFrame({"dst": df["vertex"], "dst_url": df["url"]}),
        batch_format="pandas",
    )
    out = hash_join(hash_join(edges, ua, on=("src",)), ub, on=("dst",))
    return out.select_columns(["src_url", "dst_url"])


def _q_media_resize(sf_dir: str):
    """Resize plumbing over the fake-image format: header dims halve
    (floor), payload truncates; the oracle mirrors the arithmetic."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        media_from_documents,
        resize_media,
    )

    out = resize_media(media_from_documents(_docs(sf_dir)), factor=2, batch_size=64)
    return out.select_columns(["media_id", "width", "height"])


def _q_media_frames(sf_dir: str):
    """Frame sampling over the fake-video format (every 4th frame)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        sample_frames,
        videos_from_documents,
    )

    return sample_frames(videos_from_documents(_docs(sf_dir)), every_k=4, batch_size=64)


def _q_events_asof_enrich(sf_dir: str):
    """Cross-type as-of enrichment: every purchase annotated with the
    most recent strictly-prior click of the same user (segmented
    max-accumulate carry, one vectorized pass per bucket)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import asof_enrich

    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    return asof_enrich(ev, target_type="purchase", ref_type="click")


def _q_top_bigrams(sf_dir: str):
    """Corpus-wide top-30 word bigrams: per-batch distinct-bigram
    combiner -> groupby-sum -> deterministic sort/limit."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import top_bigrams

    return top_bigrams(_docs(sf_dir), k=30)


def _q_duplicate_ngram_stats(sf_dir: str):
    """Per-doc repeated-span stats: fraction of distinct word 3-grams
    shared with at least one other document (gram-keyed groupby+join)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        duplicate_ngram_stats,
    )

    return duplicate_ngram_stats(_docs(sf_dir))


def _q_neardup_contamination(sf_dir: str):
    """Near-dup benchmark contamination: cross-set (test id%20==0 vs
    train) pairs at exact char-5 Jaccard >= 0.5, LSH candidates."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        neardup_contamination,
    )

    out = neardup_contamination(_docs(sf_dir)).to_pandas()
    return _round_cols(out, ["jaccard"])


def _q_window_join(sf_dir: str):
    """Range join: per purchase event, count + cent-sum of the same
    user's events in the preceding hour (bucketed run-offset axis)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import window_join

    return window_join(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_lang_confusion(sf_dir: str):
    """Language-id confusion matrix: heuristic predictions vs the
    table's lang column, counted per (actual, predicted) pair."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import lang_confusion

    return lang_confusion(_docs(sf_dir))


def _q_props_stats(sf_dir: str):
    """Semi-structured extraction: per-JSON-property rollup over props
    (vectorized regexp extract, integer-cent sums)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import props_key_stats

    return props_key_stats(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_copurchase(sf_dir: str):
    """Co-purchase part pairs (>=2 shared orders): order-bucketed pair
    generation + packed-pair bucket sums — the relational->graph bridge."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        copurchase_pairs,
    )

    return copurchase_pairs(rd.read_parquet(f"{sf_dir}/lineitem.parquet"))


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shape pricing summary (integer-unit money, exact sums)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        pricing_summary,
    )

    return pricing_summary(rd.read_parquet(f"{sf_dir}/lineitem.parquet"))


def _q_top_orders(sf_dir: str):
    """TPC-H Q3-shape: top-10 BUILDING-segment orders by discounted
    revenue (two key-hash joins + order rollup)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        top_orders_by_revenue,
    )

    return top_orders_by_revenue(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
    )


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shape revenue rollup to the customer nation (broadcast
    nation lookup + two key-hash joins)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        revenue_by_nation,
    )

    return revenue_by_nation(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/nation.parquet"),
    )


def _q_orders_by_month(sf_dir: str):
    """Monthly order volume/value (calendar bucketing, exact cents)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        orders_by_month,
    )

    return orders_by_month(rd.read_parquet(f"{sf_dir}/orders.parquet"))


def _q_order_priority(sf_dir: str):
    """TPC-H Q4-shape: orders with >=1 returned line per priority
    (distinct-keys semi-join, never duplicating an order)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_priority_counts,
    )

    return order_priority_counts(
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
    )


def _q_cust_order_dist(sf_dir: str):
    """TPC-H Q13-shape: customers-per-order-count distribution with the
    zero bucket computed from two scalar counts (no outer join)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        customer_order_distribution,
    )

    return customer_order_distribution(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
    )


def _q_returned_top_customers(sf_dir: str):
    """TPC-H Q10-shape: top-20 customers by returned-line revenue,
    names attached via a k-row broadcast filter."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        returned_top_customers,
    )

    return returned_top_customers(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
    )


def _q_neighbor_sample(sf_dir: str):
    """Deterministic ≤k-neighbor sample per vertex (GraphSAGE fan-out
    cap; SQL-expressible integer mix as the sample order)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.window import neighbor_sample

    return neighbor_sample(_canon_edges(sf_dir), k=3)


def _q_revenue_rollup(sf_dir: str):
    """ROLLUP(nation, priority) revenue: fine cells + subtotals + grand
    total in one fact scan; coarser levels derive from the fine cells."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        revenue_rollup,
    )

    return revenue_rollup(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/nation.parquet"),
    )


def _q_inactive_customers(sf_dir: str):
    """Distributed anti-join: customers with no orders (distinct-key
    broadcast filter below threshold, left-outer null-probe beyond)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        inactive_customers,
    )

    ds = inactive_customers(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
    ).materialize()
    if ds.count() == 0:
        # Ray's to_pandas drops the schema when every block is empty;
        # an empty anti-join result is by definition tiny, so a typed
        # empty table keeps the driver's column compare honest
        import pyarrow as pa

        return pa.table({"c_custkey": pa.array([], pa.int64())})
    return ds


def _q_winsorized(sf_dir: str):
    """Winsorized per-type value means (exact integer-cent histograms,
    p05/p95 clamp, integer-ratio mean)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        winsorized_value_mean,
    )

    return winsorized_value_mean(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_quality_classifier(sf_dir: str):
    """Actor-pool linear quality classifier (planted weights, batched
    inference; weights load once per actor)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        quality_classifier,
    )

    return quality_classifier(_docs(sf_dir))


def _q_weighted_sample(sf_dir: str):
    """Length-weighted deterministic sampling (Efraimidis-Spirakis keys
    from seeded md5 uniforms, quantized before rank)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.split import weighted_sample

    return weighted_sample(_docs(sf_dir), k=100, seed=11)


def _q_active_users(sf_dir: str):
    """Distinct active users per hourly window (combiner + two keyed
    groupbys)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import active_users

    return active_users(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_scc_counts(sf_dir: str):
    """Strongly-connected-component size distribution (labels shared
    with scc_labels via the per-process memo, one label-keyed count)."""
    _configure()
    from ray.data.aggregate import Count

    return (
        _scc_labels_memo(sf_dir)
        .groupby("label")
        .aggregate(Count(alias_name="size"))
    )


def _q_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel per user (stage k strictly
    after stage k-1's first completion; bucketed one-sort formulation)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import funnel_stages

    return funnel_stages(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_cohort_retention(sf_dir: str):
    """Retention triangle: first-signup-week cohorts x active-week
    offsets, distinct users counted once per (cohort, offset)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import cohort_retention

    return cohort_retention(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_pmi(sf_dir: str):
    """Top-30 PMI collocations (min bigram count 5): bucketed c2 counts,
    marginals attached inside w1-/w2-bucketed passes, round-before-rank."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        pmi_collocations,
    )

    return pmi_collocations(_docs(sf_dir), k=30, min_count=5)


_SCC_CACHE: dict = {}


def _scc_labels_memo(sf_dir: str):
    """SCC label table of the planted DIRECTED graph, MEMOIZED per
    process like _canon_edges: scc_labels and scc_counts share ONE
    FW-BW solve (twin pinned pools, the most expensive spawn in the
    suite) instead of each paying it."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _SCC_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.pipelines.scc import scc_labels

        # trim pre-phase on: cycle-free vertices peel as singletons
        # before FW-BW (equality vs plain is pytest-asserted; ~16%
        # faster at sf0.1)
        ds = scc_labels(_scc_directed_edges(sf_dir), trim=True).materialize()
        _SCC_CACHE[key] = ds
    return ds


def _scc_directed_edges(sf_dir: str):
    """The planted DIRECTED graph for the SCC family: distinct raw
    edges plus a reverse chain edge inside each 4-group run — lockstep
    with the rv CTE in oracle_sql()['scc_labels']."""
    import pyarrow as pa

    d0 = _directed_edges_memo(sf_dir)

    def with_reverse_chain(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        # chain edges are exactly src%8==0 and dst==src+8 (intra-
        # group edges never cross a group boundary)
        ch = (s % 8 == 0) & (d == s + 8) & ((s // 8) % 4 != 3)
        return pa.table(
            {
                "src": np.concatenate([s, d[ch]]),
                "dst": np.concatenate([d, s[ch]]),
            }
        )

    return d0.map_batches(
        with_reverse_chain, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_scc(sf_dir: str):
    """Strongly connected components of the planted DIRECTED graph
    (distinct raw edges + a reverse chain edge inside each 4-group run,
    so SCCs span group boundaries) via FW-BW coloring over twin pinned
    shard pools. Oracle: recursive mutual-reachability closure."""
    _configure()
    return _scc_labels_memo(sf_dir)


def _q_scc_checkpointed(sf_dir: str):
    """SCC with per-peel-round checkpointing + resume in one call: run
    ONE FW-BW round with the checkpoint writer, 'die', resume from the
    round-1 state to convergence. Labels must equal the uninterrupted
    solve (the scc_labels oracle)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.pipelines.scc import scc_labels

    de = _scc_directed_edges(sf_dir)
    with tempfile.TemporaryDirectory(prefix="scc_ck_") as ck:
        scc_labels(de, checkpoint_dir=ck, stop_after_rounds=1)
        info: dict = {}
        res = scc_labels(de, checkpoint_dir=ck, resume=True, info=info)
        assert info.get("resumed_from") == 1
        return res


def _q_median_tokens(sf_dir: str):
    """Exact per-source median token count from integer histograms
    (no per-group sort, no sampling)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        median_tokens_by_source,
    )

    return median_tokens_by_source(_docs(sf_dir))


def _q_lang_by_source(sf_dir: str):
    """Predicted-language × source cross-tab (per-language routing)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import lang_by_source

    return lang_by_source(_docs(sf_dir))


def _q_vocab_uniqueness(sf_dir: str):
    """Per-source vocabulary uniqueness (tokens seen in no other
    source; token-bucketed holder counts)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        vocab_uniqueness,
    )

    return vocab_uniqueness(_docs(sf_dir))


def _q_hour_profile(sf_dir: str):
    """Diurnal activity profile per event type (hour-of-day folds)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        hour_of_day_profile,
    )

    return hour_of_day_profile(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_source_similarity(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources (crawl-slice overlap
    matrix; token-bucketed intersections, |sources|²-row finalize)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        source_similarity,
    )

    return source_similarity(_docs(sf_dir))


def _q_zipf_slope(sf_dir: str):
    """Zipf exponent of the corpus token-frequency curve (top-100 fit,
    µnat-quantized ln terms, exact integer regression sums)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import zipf_slope

    return zipf_slope(_docs(sf_dir), k=100)


def _q_quality_by_source(sf_dir: str):
    """Per-source curation report (kept docs + mean quality score per
    crawl slice; actor-pool scoring, |sources|-bounded aggregate)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        quality_by_source,
    )

    return quality_by_source(_docs(sf_dir))


def _q_length_rank_by_source(sf_dir: str):
    """Per-source percent_rank of doc length — the partitioned window
    computed from broadcast cumulative histograms, no per-group sort."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        length_rank_by_source,
    )

    return length_rank_by_source(_docs(sf_dir))


def _q_gap_hist(sf_dir: str):
    """Inter-event gap log2 histogram (arrival-process profile)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import gap_hist

    return gap_hist(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_first_touch(sf_dir: str):
    """First-touch attribution (type of each user's first event)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        first_touch_counts,
    )

    return first_touch_counts(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_token_length_hist(sf_dir: str):
    """Whitespace-token length distribution (tokenizer-budget profile)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        token_length_hist,
    )

    return token_length_hist(_docs(sf_dir))


def _q_charset_profile(sf_dir: str):
    """One-row corpus character-class fingerprint (exact integer sums,
    1e-6-quantized rational ratios)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        charset_profile,
    )

    return charset_profile(_docs(sf_dir))


def _q_doc_unigram_xent(sf_dir: str):
    """Per-doc mean unigram cross-entropy under the corpus MLE unigram
    model (µnat-quantized terms; the cheapest perplexity-bucket signal)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        doc_unigram_xent,
    )

    return doc_unigram_xent(_docs(sf_dir))


def _q_bigram_surprisal(sf_dir: str):
    """Per-doc mean bigram surprisal under the corpus MLE bigram model
    (integer-µnat quantized terms keep the sum order-independent)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        bigram_surprisal,
    )

    return bigram_surprisal(_docs(sf_dir))


def _q_edge_support(sf_dir: str):
    """Per-edge triangle support (common-neighbor count per undirected
    edge, support-0 edges included) — the k-truss peel quantity."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import edge_support

    return edge_support(_canon_edges(sf_dir))


def _q_mean_hops(sf_dir: str):
    """Landmark mean-distance estimate (avg path length proxy; two
    exact integer scalars from the k batched BFS waves)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import mean_hops_sampled

    return mean_hops_sampled(_canon_edges(sf_dir), k=4)


def _q_degree_gini(sf_dir: str):
    """Gini coefficient of the degree distribution (exact rank-sum
    arithmetic over the degree histogram, never per-vertex rows)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import degree_gini

    return degree_gini(_canon_edges(sf_dir))


def _q_landmark_features(sf_dir: str):
    """Landmark distance features (k=4 multi-BFS pivoted to one row
    per reached vertex; -1 per unreached landmark)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import landmark_features

    return landmark_features(_canon_edges(sf_dir), k=4)


def _q_bipartite(sf_dir: str):
    """Per-component bipartiteness: multi-seed pinned BFS parity + one
    conflict-count pass over the simple edges."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.bipartite import (
        bipartite_check,
    )

    return bipartite_check(_canon_edges(sf_dir), labels=_cc_labels_memo(sf_dir))


def _q_negative_edges(sf_dir: str):
    """Deterministic negative-edge sampling (SQL-expressible mix,
    broadcast packed-key rejection) for link-prediction training."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.linkpred import negative_edges

    return negative_edges(_canon_edges(sf_dir), k=2)


def _q_degree_powerlaw(sf_dir: str):
    """Power-law tail exponent of the degree distribution (CSN MLE,
    µnat-quantized ln terms, two exact integer reduces)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import degree_powerlaw

    return degree_powerlaw(_canon_edges(sf_dir), dmin=5)


def _q_graph_summary(sf_dir: str):
    """One-row graph profile (counts, degree stats, density, triangles,
    component stats) — composition of oracle-checked primitives."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.profile import graph_summary

    return graph_summary(_canon_edges(sf_dir), labels=_cc_labels_memo(sf_dir))


def _q_component_profiles(sf_dir: str):
    """Per-component structural profile (vertices, degree mass, avg
    degree, density) — label-keyed stats over the shared CC solve."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.profile import (
        component_profiles,
    )

    return component_profiles(_canon_edges(sf_dir), labels=_cc_labels_memo(sf_dir))


def _q_jaccard_links(sf_dir: str):
    """Per-edge neighborhood Jaccard (intersection = edge support,
    union by inclusion-exclusion; rational → exact 1e-6 quantize)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import jaccard_links

    return jaccard_links(_canon_edges(sf_dir))


def _q_sampled_triangles(sf_dir: str):
    """DOULION triangle estimate from a deterministic p=0.5 unordered-
    edge sample (count/p³; md5-int60 threshold mirrored in SQL)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
        sampled_triangle_estimate,
    )

    return sampled_triangle_estimate(_canon_edges(sf_dir), p=0.5, seed=7)


def _q_rich_club(sf_dir: str):
    """Rich-club coefficients φ(k) over degree thresholds — hub
    interconnection vs chance; |ks| scalars via per-batch partials."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import rich_club

    return rich_club(_canon_edges(sf_dir))


def _q_ktruss(sf_dir: str):
    """3 five-truss peel rounds (bounded-round contract) via the
    INCREMENTAL sharded support index (pipelines/truss.py): one triangle
    closure up front, then change-proportional decrement rounds --
    round-for-round identical to the synchronous recompute (equality
    test in tests/test_truss.py)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.truss import (
        truss_peel_incremental,
    )

    return truss_peel_incremental(_canon_edges(sf_dir), k=5, rounds=3)


def _q_ktruss_sync(sf_dir: str):
    """Same 3 bounded 5-truss rounds via the synchronous per-round
    support recompute (the O(m'^1.5)-per-round formulation) -- kept as
    its own driver-checkable query so both peel engines stay green."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import truss_peel

    return truss_peel(_canon_edges(sf_dir), k=5, rounds=3)


_LPA_CACHE: dict = {}


def _lpa_labels(sf_dir: str):
    """4-iteration pinned sync-LPA labels, MEMOIZED per process like
    _canon_edges: labelprop4 / modularity / community_graph /
    conductance share ONE solve (a pinned pool spawn each) instead of
    each paying it."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""
    key = f"{job}:{sf_dir}"
    ds = _LPA_CACHE.get(key)
    if ds is None:
        from pds_hw2_mpi_connected_components_ray.pipelines.labelprop import labelprop

        ds = labelprop(_canon_edges(sf_dir), iterations=4, mode="pinned").labels.materialize()
        _LPA_CACHE.clear()
        _LPA_CACHE[key] = ds
    return ds


def _q_modularity(sf_dir: str):
    """Newman modularity of the 4-iteration sync-LPA communities:
    integer-exact A/E - B/E^2 reduction over a label-keyed groupby of
    per-batch pre-aggregated endpoint-community partials."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.communities import modularity

    return modularity(_canon_edges(sf_dir), _lpa_labels(sf_dir))


def _q_community_graph(sf_dir: str):
    """Community quotient graph of the LPA labeling: unordered
    community pair -> directed simple-edge row count (graph
    contraction, the coarsening step of multilevel partitioners)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.communities import (
        community_graph,
    )

    return community_graph(_canon_edges(sf_dir), _lpa_labels(sf_dir))


def _q_degree_quantiles(sf_dir: str):
    """Exact degree-distribution quantiles (p25/p50/p75/p90/p99) via the
    distributed histogram quantile (quantile_disc semantics)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import (
        length_quantiles,
    )
    from pds_hw2_mpi_connected_components_ray.stages.graph import degrees

    out = length_quantiles(
        degrees(_canon_edges(sf_dir)),
        qs=(0.25, 0.5, 0.75, 0.9, 0.99),
        col="degree",
    )
    return out


def _q_corpus_vocab_stats(sf_dir: str):
    """Corpus-level vocabulary stats: total tokens, distinct tokens,
    corpus type-token ratio (bucketed distinct count)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        corpus_vocab_stats,
    )

    return corpus_vocab_stats(_docs(sf_dir))


def _q_order_line_stats(sf_dir: str):
    """Order fan-out histogram (lines per order → order counts)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_line_stats,
    )

    return order_line_stats(rd.read_parquet(f"{sf_dir}/lineitem.parquet"))


def _q_embedding_project(sf_dir: str):
    """Deterministic random projection (JL primitive; zero shuffle,
    per-term integer quantization)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_project,
    )

    return embedding_project(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


def _q_embedding_quantize(sf_dir: str):
    """Per-dimension min-max int8-range quantization (exact order-free
    range reduce + broadcast scale + pure-map quantize)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_quantize,
    )

    return embedding_quantize(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


def _q_embedding_covariance(sf_dir: str):
    """Covariance matrix of the embedding column (distributed X^T·X,
    summary-proportional exchange, integer-quantized terms)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroid norms (integer-µunit quantized
    coordinate sums; sqrt of an exact integer sum of squares)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.kmeans import label_centroids

    return label_centroids(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


def _q_avg_neighbor_degree(sf_dir: str):
    """Mean neighbor degree per vertex (adaptive degree attach +
    per-batch integer partials)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import avg_neighbor_degree

    return avg_neighbor_degree(_canon_edges(sf_dir))


def _q_doc_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy (shuffle-free, quantized µnats)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import doc_entropy

    return doc_entropy(_docs(sf_dir))


def _q_two_hop(sf_dir: str):
    """Distinct two-hop neighborhood sizes (friend-of-friend reach):
    edge self-join + packed-pair bucketed distinct + vertex groupby."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.stages.graph import two_hop_counts

    return two_hop_counts(_canon_edges(sf_dir))


def _q_conductance(sf_dir: str):
    """Per-community conductance of the LPA labeling (integer-exact
    cut/vol partials; one float division at the end)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.communities import conductance

    return conductance(_canon_edges(sf_dir), _lpa_labels(sf_dir))


def _q_dedup_lines(sf_dir: str):
    """CCNet-style line scrub: lines appearing verbatim in >=2 distinct
    documents are removed everywhere; docs reassembled in order
    (bucketed shared-line vocabulary + adaptive broadcast membership)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import dedup_lines

    return dedup_lines(_docs(sf_dir))


def _q_length_percentile_filter(sf_dir: str):
    """Corpus-relative length gate: docs at/above the exact 25th
    percentile of n_chars (distributed histogram quantile + filter)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        length_percentile_filter,
    )

    return length_percentile_filter(_docs(sf_dir), q=0.25)


def _q_rate_anomalies(sf_dir: str):
    """Per-user windowed-count z-score anomalies (|z| >= 2, sample
    stddev over the user's own windows)."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import rate_anomalies

    return rate_anomalies(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_lexical_diversity(sf_dir: str):
    """Type-token ratio per document (shuffle-free vectorized pass)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        lexical_diversity,
    )

    return lexical_diversity(_docs(sf_dir))


def _q_repetition_signals(sf_dir: str):
    """Gopher-style repetition quality signals: duplicate-line fraction
    + top-bigram mass per document, one shuffle-free vectorized pass."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        repetition_signals,
    )

    return repetition_signals(_docs(sf_dir))


def _q_stratified_sample(sf_dir: str):
    """Deterministic 10-per-source stratified sample: seeded md5-int60
    rank + the bucket-per-group window top-k."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.split import stratified_sample

    return stratified_sample(_docs(sf_dir), key="source", n_per_group=10, seed=7)


def _q_top_docs_per_source(sf_dir: str):
    """Per-key windowed rank (Ray Data has no window functions): top-3
    docs per source by (n_chars desc, doc_id) via the bucket-per-group
    sort + vectorized run-boundary head-k."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.window import top_k_per_group

    return top_k_per_group(
        _docs(sf_dir),
        key="source",
        order_cols=["n_chars", "doc_id"],
        descending=[True, False],
        k=3,
    )


def _q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (k=4, one update step) over the
    embeddings: combiner ships k (count, sum-vector) rows per block;
    deterministic init (4 lowest vec_ids) and tie-break mirror the
    unrolled SQL exactly."""
    _configure()
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.kmeans import kmeans_assign

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_assign(emb, k=4, iters=1)


def _q_ntile(sf_dir: str):
    """Exact decile bucketing by document length (stratified-sampling
    primitive): global rank from the distributed prefix scan, SQL-ntile
    sizing; no driver-side sort."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import ntile_buckets

    return ntile_buckets(_docs(sf_dir), n=10, order_col="n_chars")


def _q_contamination_check(sf_dir: str):
    """Benchmark-contamination: train docs sharing a word 3-gram with
    the held-out slice (doc_id % 20 == 0)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        contamination_check,
    )

    return contamination_check(_docs(sf_dir), test_mod=20)


def _q_mixture_sample(sf_dir: str):
    """Source-equalizing deterministic subsample (integer md5-uniform
    thresholds; the data-mixing step of a training recipe)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.split import mixture_sample

    return mixture_sample(_docs(sf_dir), seed=17)


def _q_mixture_upsample(sf_dir: str):
    """Epoch-style repetition toward the equal share (floor(rate)
    copies + md5-uniform fractional copy; flat_map-shaped, no shuffle)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.split import mixture_upsample

    return mixture_upsample(_docs(sf_dir), seed=19)


def _q_jsonl_roundtrip(sf_dir: str):
    """documents → sharded JSONL → schema-gated distributed read; the
    oracle is the parquet source itself (identity contract)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.sources.text_formats import (
        read_jsonl_docs,
        write_jsonl_docs,
    )

    tmp = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    write_jsonl_docs(_docs(sf_dir), tmp)
    return read_jsonl_docs(tmp)


def _q_csv_roundtrip(sf_dir: str):
    """documents → sharded CSV → schema-gated distributed read (quoted
    newlines/commas must survive); oracle = the parquet source."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.sources.text_formats import (
        read_csv_docs,
        write_csv_docs,
    )

    tmp = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    write_csv_docs(_docs(sf_dir), tmp)
    return read_csv_docs(tmp)


def _q_contamination_bloom(sf_dir: str):
    """Bloom-filter contamination flags for the held-out split (128 KiB
    corpus-size-independent broadcast; deterministic SQL-mirrored bits)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        contamination_bloom,
    )

    return contamination_bloom(_docs(sf_dir), test_mod=20)


def _q_scrub_pii(sf_dir: str):
    """PII scrubbing with PLANTED ground truth: emails/phones are
    appended deterministically (doc_id % 3 / % 5) so real redactions are
    exercised and hash-checked; the SQL oracle plants the identical text
    and mirrors the two-pass regexp_replace order (emails first)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import scrub_pii

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        t = df["text"].fillna("").astype(str)
        email = np.where(
            ids % 3 == 0, " contact user" + ids.astype(str) + "@example.com now", ""
        )
        phone = np.where(ids % 5 == 0, " call 555-867-5309 today", "")
        return pd.DataFrame({"doc_id": ids, "text": t + email + phone})

    planted = _docs(sf_dir).map_batches(plant, batch_format="pandas")
    return scrub_pii(planted)


def _q_source_stats(sf_dir: str):
    """Per-source (domain-level) corpus profile: doc counts, token
    totals, mean length -- the aggregation behind domain blocklist /
    quality decisions."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import source_stats

    return source_stats(_docs(sf_dir))


def _q_training_shuffle(sf_dir: str):
    """Deterministic global shuffle for training: 0-based position by
    rank of md5-int60(seed:doc_id) (doc_id tiebreak) -- a seeded
    permutation independent of row order / block splits, computed by the
    distributed two-pass prefix scan (never a driver-side sort)."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import (
        training_shuffle,
    )

    return training_shuffle(_docs(sf_dir), seed=42)


def _q_pack_sequences(sf_dir: str):
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    layout): docs concatenated in doc_id order, token stream cut every
    2048 tokens; each doc's pack_id/offset come from the EXACT
    distributed exclusive prefix sum of its token counts."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import (
        pack_sequences,
    )

    return pack_sequences(_docs(sf_dir), window=2048)


def _q_length_quantiles(sf_dir: str):
    """Exact distributed quantiles (p50/p90/p99 of n_chars) via a
    value-histogram groupby + driver cumulative walk; matches DuckDB
    quantile_disc bit-exactly."""
    _configure()
    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import (
        length_quantiles,
    )

    return length_quantiles(_docs(sf_dir), qs=(0.5, 0.9, 0.99))


def _q_cc_checkpointed(sf_dir: str):
    """CC with per-superstep checkpointing + resume exercised in one call
    (run 2 supersteps, 'die', resume to convergence)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components

    edges = _canon_edges(sf_dir)
    with tempfile.TemporaryDirectory(prefix="cc_ck_") as ck:
        connected_components(edges, max_supersteps=2, checkpoint_dir=ck)
        res = connected_components(edges, checkpoint_dir=ck, resume=True)
        return res.labels


def _q_pagerank_checkpointed(sf_dir: str):
    """PageRank with per-iteration checkpointing + resume in one call:
    run 2 iterations under the distributed shuffle writer, 'die', then
    resume the remaining 18 under local mode — the checkpoint state
    (vertex, rank) is a format contract across execution modes. Final
    ranks must equal an uninterrupted 20-iteration run (the pagerank20
    oracle)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank

    edges = _canon_edges(sf_dir)
    with tempfile.TemporaryDirectory(prefix="pr_ck_") as ck:
        pagerank(edges, max_iters=2, mode="shuffle", checkpoint_dir=ck)
        res = pagerank(edges, max_iters=20, mode="local", checkpoint_dir=ck, resume=True)
        assert res.resumed_from == 2
        df = res.ranks.to_pandas()
        return pd.DataFrame(
            {"vertex": df["vertex"], "pr": np.round(df["rank"].to_numpy(), 6)}
        )


def _q_labelprop_checkpointed(sf_dir: str):
    """Sync LPA with per-iteration checkpointing + resume in one call
    (2 iterations checkpointed under shuffle, resumed to 4 under local;
    deterministic tie-break makes resumed == fresh == the labelprop4
    oracle)."""
    _configure()
    import tempfile

    from pds_hw2_mpi_connected_components_ray.pipelines.labelprop import labelprop

    edges = _canon_edges(sf_dir)
    with tempfile.TemporaryDirectory(prefix="lp_ck_") as ck:
        labelprop(edges, iterations=2, mode="shuffle", checkpoint_dir=ck)
        res = labelprop(edges, iterations=4, mode="local", checkpoint_dir=ck, resume=True)
        assert res.resumed_from == 2
        return res.labels


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages -> link extraction -> canonical
    edge table -> connected components -> labels with component sizes."""
    _configure()
    sf_dir = "/root/testdata/sf0.001"
    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        doc_id_edges,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_documents
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    from ray.data.aggregate import Count

    from pds_hw2_mpi_connected_components_ray.stages.joins import hash_join

    pages = pages_from_documents(sf_dir)
    raw = doc_id_edges(pages).map_batches(
        lambda df: df.rename(columns={"src_doc": "src", "dst_doc": "dst"}),
        batch_format="pandas",
    )
    edges = canonical_edges(raw)
    res = connected_components(edges)
    # stay a Dataset end to end: engine groupby + hash join, no
    # driver-side pandas merge (VERDICT wrong #1)
    sizes = res.labels.groupby("label").aggregate(Count(alias_name="component_size"))
    return hash_join(res.labels, sizes, on=("label",)).sort("vertex")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # graph engine (SURVEY.md section 2) -- planted lineitem graph
        "edges_build": _q_edges_build,
        "pricing_summary": _q_pricing_summary,
        "top_orders_by_revenue": _q_top_orders,
        "revenue_by_nation": _q_revenue_by_nation,
        "order_priority_counts": _q_order_priority,
        "orders_by_month": _q_orders_by_month,
        "customer_order_distribution": _q_cust_order_dist,
        "inactive_customers": _q_inactive_customers,
        "neighbor_sample": _q_neighbor_sample,
        "revenue_rollup": _q_revenue_rollup,
        "returned_top_customers": _q_returned_top_customers,
        "copurchase_pairs": _q_copurchase,
        "degree": _q_degree,
        "cc_labels": _q_cc_labels,
        "cc_labels_shuffle": lambda sf: _q_cc_labels(sf, mode="shuffle"),
        "cc_labels_unionfind": lambda sf: _q_cc_labels(sf, method="unionfind"),
        "cc_checkpoint_resume": _q_cc_checkpointed,
        "pagerank_checkpoint_resume": _q_pagerank_checkpointed,
        "labelprop_checkpoint_resume": _q_labelprop_checkpointed,
        "cc_incremental": _q_cc_incremental,
        "scc_labels": _q_scc,
        "scc_counts": _q_scc_counts,
        "scc_checkpoint_resume": _q_scc_checkpointed,
        "link_prediction": _q_link_prediction,
        "random_walks": _q_walks,
        "pagerank_weighted": _q_pagerank_weighted,
        # shuffle mode at 4 iters: verifies the scale path's semantics
        # while keeping the gate wall bounded (per-iteration hash-join
        # fixed costs dominate at 500-doc scale)
        "pagerank_weighted_shuffle": lambda sf: _q_pagerank_weighted(
            sf, mode="shuffle", iters=4
        ),
        "cc_count": _q_cc_count,
        "component_sizes": _q_component_sizes,
        "degree_histogram": _q_degree_histogram,
        "degree_quantiles": _q_degree_quantiles,
        "two_hop_counts": _q_two_hop,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "pagerank20": _q_pagerank,
        "pagerank_top10": _q_pagerank_top10,
        "pagerank_personalized": _q_pagerank_personalized,
        "pagerank_personalized_pinned": lambda sf: _q_pagerank_personalized(
            sf, mode="pinned"
        ),
        "hits": _q_hits,
        # shuffle mode at 3 iters: verifies the scale path's semantics
        # while keeping the gate wall bounded (4 joins/iteration)
        "hits_shuffle": lambda sf: _q_hits(sf, mode="shuffle", iters=3),
        "adamic_adar": _q_adamic_adar,
        "labelprop4": _q_labelprop,
        "modularity": _q_modularity,
        "community_graph": _q_community_graph,
        "conductance": _q_conductance,
        "triangle_total": _q_triangle_total,
        "triangles_by_vertex": _q_triangles_by_vertex,
        "edge_support": _q_edge_support,
        "jaccard_links": _q_jaccard_links,
        "graph_summary": _q_graph_summary,
        "component_profiles": _q_component_profiles,
        "negative_edges": _q_negative_edges,
        "bipartite_check": _q_bipartite,
        "landmark_features": _q_landmark_features,
        "mean_hops_sampled": _q_mean_hops,
        "degree_gini": _q_degree_gini,
        "degree_powerlaw": _q_degree_powerlaw,
        "rich_club": _q_rich_club,
        "sampled_triangle_estimate": _q_sampled_triangles,
        "ktruss5_r3": _q_ktruss,
        "ktruss5_sync": _q_ktruss_sync,
        "kcore7": _q_kcore,
        "coreness": _q_coreness,
        "clustering_coeff": _q_clustering_coeff,
        "degree_assortativity": _q_assortativity,
        "bfs_hops": _q_bfs_hops,
        "bfs_hops_pinned": _q_bfs_hops_pinned,
        "multi_bfs_hops": _q_multi_bfs_hops,
        "sssp_weighted": _q_sssp,
        "harmonic_centrality": _q_harmonic_centrality,
        "diameter_lb": _q_diameter,
        "reciprocity": _q_reciprocity,
        # extraction front-end
        "extract_text_roundtrip": _q_extract_text,
        "extract_links_planted": _q_extract_links,
        "pages_to_edges_planted": _q_pages_to_edges,
        # text analysis
        "doc_stats": _q_doc_stats,
        "doc_quality": _q_doc_quality,
        "quality_classifier": _q_quality_classifier,
        "lang_id": _q_lang_id,
        "lang_confusion": _q_lang_confusion,
        "doc_fingerprints": _q_fingerprints,
        # dedup families
        "exact_dedup": _q_exact_dedup,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_pairs,
        "embedding_dup_pairs": _q_embedding_pairs,
        "dup_groups": _q_dup_groups,
        "dup_family_sizes": _q_dup_family_sizes,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "corpus_prep": _q_corpus_prep,
        "prep_sink_roundtrip": _q_prep_sink_roundtrip,
        # similarity search
        "knn_cosine": _q_knn,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_indexed": _q_knn_ivf_indexed,
        # events (streaming-shaped)
        "events_windowed": _q_events_windowed,
        "events_active_users": _q_active_users,
        "events_props_stats": _q_props_stats,
        "events_hopping": _q_events_hopping,
        "events_asof_prev": _q_events_asof,
        "event_transitions": _q_event_transitions,
        "events_running_total": _q_running_totals,
        "events_new_users": _q_new_users,
        "session_length_hist": _q_session_hist,
        "events_out_of_order": _q_out_of_order,
        "events_asof_enrich": _q_events_asof_enrich,
        "events_sessionize": _q_events_sessionize,
        "events_funnel": _q_funnel,
        "events_window_join": _q_window_join,
        "cohort_retention": _q_cohort_retention,
        "top_tokens": _q_top_tokens,
        "corpus_vocab_stats": _q_corpus_vocab_stats,
        "tfidf_top_terms": _q_tfidf_top_terms,
        # multimodal plumbing
        "media_decode": _q_media_decode,
        "media_decode_png": _q_media_decode_png,
        "media_decode_wav": _q_media_decode_wav,
        "dataset_split": _q_dataset_split,
        "group_safe_split": _q_group_safe_split,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        # ordering / packing (distributed prefix scan)
        "training_shuffle": _q_training_shuffle,
        "pack_sequences": _q_pack_sequences,
        "length_quantiles": _q_length_quantiles,
        "ntile_deciles": _q_ntile,
        # cleaning / curation
        "scrub_pii": _q_scrub_pii,
        "contamination_check": _q_contamination_check,
        "contamination_bloom": _q_contamination_bloom,
        "mixture_sample": _q_mixture_sample,
        "mixture_upsample": _q_mixture_upsample,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "neardup_contamination": _q_neardup_contamination,
        "source_stats": _q_source_stats,
        "kmeans_clusters": _q_kmeans,
        "label_centroids": _q_label_centroids,
        "embedding_covariance": _q_embedding_covariance,
        "embedding_project": _q_embedding_project,
        "embedding_quantize": _q_embedding_quantize,
        "order_line_stats": _q_order_line_stats,
        "top_bigrams": _q_top_bigrams,
        "bigram_surprisal": _q_bigram_surprisal,
        "doc_unigram_xent": _q_doc_unigram_xent,
        "token_length_hist": _q_token_length_hist,
        "length_rank_by_source": _q_length_rank_by_source,
        "quality_by_source": _q_quality_by_source,
        "zipf_slope": _q_zipf_slope,
        "source_similarity": _q_source_similarity,
        "lang_by_source": _q_lang_by_source,
        "median_tokens_by_source": _q_median_tokens,
        "vocab_uniqueness": _q_vocab_uniqueness,
        "events_hour_profile": _q_hour_profile,
        "events_first_touch": _q_first_touch,
        "events_gap_hist": _q_gap_hist,
        "charset_profile": _q_charset_profile,
        "pmi_collocations": _q_pmi,
        "top_docs_per_source": _q_top_docs_per_source,
        "repetition_signals": _q_repetition_signals,
        "stratified_sample": _q_stratified_sample,
        "weighted_sample": _q_weighted_sample,
        "duplicate_ngram_stats": _q_duplicate_ngram_stats,
        "dedup_lines": _q_dedup_lines,
        "length_percentile_filter": _q_length_percentile_filter,
        "events_rate_anomalies": _q_rate_anomalies,
        "events_winsorized_mean": _q_winsorized,
        "lexical_diversity": _q_lexical_diversity,
        "doc_entropy": _q_doc_entropy,
    }


def oracle_sql() -> dict[str, str]:
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        EMAIL_RE as _EMAIL_RE,
        PHONE_RE as _PHONE_RE,
    )

    _LANG_SQL = (
        "WITH w AS (SELECT doc_id, list_distinct(regexp_extract_all("
        "lower(coalesce(text,'')), '[a-z]+')) AS ws "
        "FROM documents), "
        "v AS (SELECT doc_id, "
        f"  len(list_filter(ws, x -> x IN ({_STOP_DE}))) AS n_de, "
        f"  len(list_filter(ws, x -> x IN ({_STOP_EL}))) AS n_el, "
        f"  len(list_filter(ws, x -> x IN ({_STOP_EN}))) AS n_en FROM w) "
        "SELECT doc_id, CASE WHEN greatest(n_de, n_el, n_en) = 0 THEN 'und' "
        "WHEN n_de >= n_el AND n_de >= n_en THEN 'de' "
        "WHEN n_el >= n_en THEN 'el' ELSE 'en' END AS lang_pred FROM v"
    )
    cc_sql = _CC_SQL
    out = {
        "edges_build": f"WITH {_EDGES_CTES} SELECT src, dst FROM edges",
        "degree": (
            f"WITH {_EDGES_CTES} "
            "SELECT src AS vertex, count(*)::BIGINT AS degree FROM edges GROUP BY src"
        ),
        "cc_labels": cc_sql,
        "cc_labels_shuffle": cc_sql,
        "cc_labels_unionfind": cc_sql,
        "cc_checkpoint_resume": cc_sql,
        "pagerank_checkpoint_resume": _pagerank_sql(20),
        "labelprop_checkpoint_resume": _labelprop_sql(4),
        "cc_incremental": cc_sql,
        "pagerank_weighted": _pagerank_weighted_sql(10),
        "pagerank_weighted_shuffle": _pagerank_weighted_sql(4),
        "random_walks": (
            f"WITH {_EDGES_CTES}, "
            "s0 AS (SELECT v AS walk_id, v AS vertex FROM verts)"
            + "".join(
                f", c{k} AS (SELECT s{k-1}.walk_id, "
                f"(((e.dst + 42) % 1000000007) * 2654435761 + (s{k-1}.walk_id % 1000000007) * 97 "
                f"+ {k} * 1000003) % 1000000007 AS h, e.dst AS u "
                f"FROM s{k-1} JOIN edges e ON e.src = s{k-1}.vertex), "
                f"s{k} AS (SELECT walk_id, (min(h * 4294967296 + u) % 4294967296)::BIGINT "
                f"AS vertex FROM c{k} GROUP BY walk_id)"
                for k in range(1, 4)
            )
            + " SELECT walk_id, 0::BIGINT AS step, vertex FROM s0"
            + "".join(
                f" UNION ALL SELECT walk_id, {k}::BIGINT AS step, vertex FROM s{k}"
                for k in range(1, 4)
            )
        ),
        "scc_counts": f"""
WITH x AS (
WITH RECURSIVE {_EDGES_CTES},
d0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
rv AS (SELECT dst AS src, src AS dst FROM d0
       WHERE src % 8 = 0 AND dst = src + 8 AND (src // 8) % 4 <> 3),
de AS MATERIALIZED (SELECT src, dst FROM d0 UNION ALL SELECT src, dst FROM rv),
dv AS MATERIALIZED (SELECT src AS v FROM de UNION SELECT dst FROM de),
reach AS (SELECT src AS u, dst AS v FROM de
          UNION
          SELECT r.u, e.dst FROM reach r JOIN de e ON e.src = r.v),
mut AS (SELECT a.u, a.v FROM reach a JOIN reach b ON b.u = a.v AND b.v = a.u)
SELECT dv.v AS vertex, least(dv.v, coalesce(min(m.u), dv.v))::BIGINT AS label
FROM dv LEFT JOIN mut m ON m.v = dv.v
GROUP BY dv.v
)
SELECT label, count(*)::BIGINT AS size FROM x GROUP BY label
""",
        "scc_labels": f"""
WITH RECURSIVE {_EDGES_CTES},
d0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
rv AS (SELECT dst AS src, src AS dst FROM d0
       WHERE src % 8 = 0 AND dst = src + 8 AND (src // 8) % 4 <> 3),
de AS MATERIALIZED (SELECT src, dst FROM d0 UNION ALL SELECT src, dst FROM rv),
dv AS MATERIALIZED (SELECT src AS v FROM de UNION SELECT dst FROM de),
reach AS (SELECT src AS u, dst AS v FROM de
          UNION
          SELECT r.u, e.dst FROM reach r JOIN de e ON e.src = r.v),
mut AS (SELECT a.u, a.v FROM reach a JOIN reach b ON b.u = a.v AND b.v = a.u)
SELECT dv.v AS vertex, least(dv.v, coalesce(min(m.u), dv.v))::BIGINT AS label
FROM dv LEFT JOIN mut m ON m.v = dv.v
GROUP BY dv.v
""",
        # a killed-and-resumed SCC run must equal the uninterrupted one
        "scc_checkpoint_resume": f"""
WITH RECURSIVE {_EDGES_CTES},
d0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
rv AS (SELECT dst AS src, src AS dst FROM d0
       WHERE src % 8 = 0 AND dst = src + 8 AND (src // 8) % 4 <> 3),
de AS MATERIALIZED (SELECT src, dst FROM d0 UNION ALL SELECT src, dst FROM rv),
dv AS MATERIALIZED (SELECT src AS v FROM de UNION SELECT dst FROM de),
reach AS (SELECT src AS u, dst AS v FROM de
          UNION
          SELECT r.u, e.dst FROM reach r JOIN de e ON e.src = r.v),
mut AS (SELECT a.u, a.v FROM reach a JOIN reach b ON b.u = a.v AND b.v = a.u)
SELECT dv.v AS vertex, least(dv.v, coalesce(min(m.u), dv.v))::BIGINT AS label
FROM dv LEFT JOIN mut m ON m.v = dv.v
GROUP BY dv.v
""",
        "link_prediction": (
            f"WITH {_EDGES_CTES}, "
            "simple AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "w AS (SELECT e1.dst AS b, e2.dst AS c, count(*)::BIGINT AS cn "
            "  FROM simple e1 JOIN simple e2 "
            "  ON e1.src = e2.src AND e1.dst < e2.dst GROUP BY b, c) "
            "SELECT w.b, w.c, w.cn AS common_neighbors FROM w "
            "LEFT JOIN simple s ON s.src = w.b AND s.dst = w.c "
            "WHERE s.src IS NULL "
            "ORDER BY w.cn DESC, w.b ASC, w.c ASC LIMIT 20"
        ),
        "cc_count": f"SELECT count(DISTINCT label)::BIGINT AS n_components FROM ({cc_sql})",
        "component_sizes": (
            f"SELECT label, count(*)::BIGINT AS csize FROM ({cc_sql}) GROUP BY label"
        ),
        "degree_histogram": (
            f"WITH {_EDGES_CTES}, "
            "deg AS (SELECT src, count(*)::BIGINT AS degree FROM edges GROUP BY src) "
            "SELECT degree, count(*)::BIGINT AS n_vertices FROM deg GROUP BY degree"
        ),
        "degree_quantiles": (
            f"WITH {_EDGES_CTES}, "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM edges GROUP BY src) "
            "SELECT 0.25 AS q, quantile_disc(d, 0.25)::BIGINT AS value FROM deg UNION ALL SELECT 0.5 AS q, quantile_disc(d, 0.5)::BIGINT AS value FROM deg UNION ALL SELECT 0.75 AS q, quantile_disc(d, 0.75)::BIGINT AS value FROM deg UNION ALL SELECT 0.9 AS q, quantile_disc(d, 0.9)::BIGINT AS value FROM deg UNION ALL SELECT 0.99 AS q, quantile_disc(d, 0.99)::BIGINT AS value FROM deg"
        ),
        "corpus_vocab_stats": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(coalesce(text,''), "
            "  '\\S+')) AS tok FROM documents) "
            "SELECT count(*)::BIGINT AS n_tokens, "
            "count(DISTINCT tok)::BIGINT AS n_types, "
            "floor(count(DISTINCT tok)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 "
            "  AS corpus_ttr FROM toks"
        ),
        "avg_neighbor_degree": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src) "
            "SELECT e.src AS vertex, "
            "floor(sum(deg.d)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS avg_ndeg "
            "FROM simp e JOIN deg ON deg.v = e.dst GROUP BY e.src"
        ),
        "order_line_stats": (
            "WITH p AS (SELECT l_orderkey, count(*)::BIGINT AS n_lines "
            "FROM lineitem GROUP BY l_orderkey) "
            "SELECT n_lines, count(*)::BIGINT AS n_orders FROM p GROUP BY n_lines"
        ),
        "embedding_project": (
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            "u AS (SELECT vec_id, unnest(range(1, len(v) + 1))::BIGINT AS i, "
            "  unnest(v)::DOUBLE AS x FROM e), "
            "jj AS (SELECT unnest([0, 1]::BIGINT[]) AS dim), "
            "t AS (SELECT u.vec_id, jj.dim, "
            "  CAST(floor(u.x * ((((u.i) * 2654435761 + (jj.dim + 1) * 40503) "
            "  % 2147483647)::DOUBLE / 2147483647.0 - 0.5) * 1e9 + 0.5) AS BIGINT) AS q "
            "  FROM u CROSS JOIN jj) "
            "SELECT vec_id, dim, floor(sum(q)::DOUBLE / 1e9 * 1e6 + 0.5) / 1e6 AS y "
            "FROM t GROUP BY vec_id, dim"
        ),
        "embedding_quantize": (
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            "u AS (SELECT vec_id, unnest(range(1, len(v) + 1))::BIGINT - 1 AS dim, "
            "  unnest(v)::DOUBLE AS x FROM e), "
            "r AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM u GROUP BY dim) "
            "SELECT u.vec_id, u.dim, "
            "CASE WHEN r.mx > r.mn THEN least(255, "
            "CAST(floor((u.x - r.mn) / ((r.mx - r.mn) / 255.0)) AS BIGINT)) "
            "ELSE 0 END::BIGINT AS q "
            "FROM u JOIN r USING (dim)"
        ),
        "embedding_covariance": (
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            "n AS (SELECT count(*)::BIGINT AS n FROM e), "
            "u AS (SELECT vec_id, unnest(range(1, len(v) + 1))::BIGINT AS i, "
            "  unnest(v)::DOUBLE AS x FROM e), "
            "p AS (SELECT a.i AS i, b.i AS j, "
            "  CAST(floor(a.x * b.x * 1e9 + 0.5) AS BIGINT) AS q "
            "  FROM u a JOIN u b ON b.vec_id = a.vec_id AND b.i >= a.i), "
            "s AS (SELECT i, j, sum(q)::BIGINT AS sij FROM p GROUP BY i, j), "
            "m AS (SELECT i, sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT))::BIGINT AS si "
            "  FROM u GROUP BY i) "
            "SELECT (s.i - 1)::BIGINT AS i, (s.j - 1)::BIGINT AS j, "
            "floor((s.sij::DOUBLE / n.n / 1e9 "
            "- (mi.si::DOUBLE / n.n / 1e9) * (mj.si::DOUBLE / n.n / 1e9)) "
            "* 1e6 + 0.5) / 1e6 AS cov "
            "FROM s JOIN m mi ON mi.i = s.i JOIN m mj ON mj.i = s.j CROSS JOIN n"
        ),
        "label_centroids": (
            "WITH e AS (SELECT label::BIGINT AS label, embedding::DOUBLE[] AS v "
            "  FROM embeddings), "
            "u AS (SELECT label, g.ord, "
            "  CAST(floor(v[g.ord] * 1e6 + 0.5) AS BIGINT) AS q "
            "  FROM e, (SELECT unnest(range(1, 65))::BIGINT AS ord) g), "
            "s AS (SELECT label, ord, sum(q)::BIGINT AS s FROM u GROUP BY label, ord), "
            "n AS (SELECT label, count(*)::BIGINT AS n FROM e GROUP BY label), "
            "m AS (SELECT s.label, "
            "  CAST(floor((s.s::DOUBLE / (n.n * 1e6)) * 1e6 + 0.5) AS BIGINT) AS mq "
            "  FROM s JOIN n USING (label)) "
            "SELECT m.label, any_value(n.n) AS n_vecs, "
            "round(sqrt(sum(mq * mq)::DOUBLE) / 1e6, 6) AS centroid_norm "
            "FROM m JOIN n USING (label) GROUP BY m.label"
        ),
        "doc_entropy": (
            "WITH toks AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(coalesce(text,''), '\\S+')) AS tok "
            "  FROM documents), "
            "c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2), "
            "t AS (SELECT doc_id, sum(c)::BIGINT AS tot FROM c GROUP BY doc_id), "
            "q AS (SELECT c.doc_id, c.c * CAST(floor(ln(t.tot::DOUBLE / c.c::DOUBLE) "
            "  * 1e6 + 0.5) AS BIGINT) AS s FROM c JOIN t USING (doc_id)) "
            "SELECT q.doc_id, any_value(t.tot) AS n_tokens, "
            "floor(sum(q.s)::DOUBLE / any_value(t.tot) + 0.5) / 1e6 AS entropy "
            "FROM q JOIN t USING (doc_id) GROUP BY q.doc_id"
        ),
        "two_hop_counts": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "pairs AS (SELECT e1.src AS v, e2.dst AS u "
            "  FROM simp e1 JOIN simp e2 ON e2.src = e1.dst "
            "  UNION SELECT src, dst FROM simp) "
            "SELECT v AS vertex, count(*)::BIGINT AS n_two_hop "
            "FROM pairs WHERE u <> v GROUP BY v"
        ),
        "pagerank20": _pagerank_sql(20),
        "pagerank_top10": (
            f"SELECT vertex, pr FROM ({_pagerank_sql(20)}) "
            "ORDER BY pr DESC, vertex ASC LIMIT 10"
        ),
        "pagerank_personalized": _ppr_sql(10, 16),
        "pagerank_personalized_pinned": _ppr_sql(10, 16),
        "hits": _hits_sql(8),
        "hits_shuffle": _hits_sql(3),
        "adamic_adar": _ADAMIC_ADAR_SQL,
        "repetition_signals": _REPETITION_SQL,
        "stratified_sample": _STRATIFIED_SQL,
        "labelprop4": _labelprop_sql(4),
        "modularity": (
            _COMM_EDGE_CTES
            + """,
d AS MATERIALIZED (SELECT ca, count(*)::BIGINT AS dc FROM le GROUP BY ca),
s AS (SELECT sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)::DOUBLE AS a,
             count(*)::DOUBLE AS e FROM le),
b AS (SELECT sum(dc * dc)::DOUBLE AS b, count(*)::BIGINT AS n FROM d)
SELECT floor((s.a / s.e - b.b / (s.e * s.e)) * 1e6 + 0.5) / 1e6 AS modularity,
       b.n AS n_communities
FROM s, b"""
        ),
        "conductance": (
            _COMM_EDGE_CTES
            + """,
d AS MATERIALIZED (SELECT ca, count(*)::BIGINT AS vol,
  sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)::BIGINT AS same FROM le GROUP BY ca),
t AS (SELECT sum(vol)::DOUBLE AS e FROM d)
SELECT ca AS community, (vol - same)::BIGINT AS cut, vol,
  CASE WHEN least(vol::DOUBLE, t.e - vol) > 0
       THEN floor(((vol - same)::DOUBLE / least(vol::DOUBLE, t.e - vol)) * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS conductance
FROM d, t"""
        ),
        "community_graph": (
            _COMM_EDGE_CTES
            + """
SELECT least(ca, cb) AS ca, greatest(ca, cb) AS cb, count(*)::BIGINT AS weight
FROM le GROUP BY 1, 2"""
        ),
        "triangle_total": (
            f"WITH {_TRI_CTES} SELECT count(*)::BIGINT AS n_triangles FROM tri"
        ),
        "triangles_by_vertex": (
            f"WITH {_TRI_CTES}, corners AS ("
            "  SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri"
            "  UNION ALL SELECT c FROM tri) "
            "SELECT vertex, count(*)::BIGINT AS triangles FROM corners GROUP BY vertex"
        ),
        "edge_support": (
            f"WITH {_TRI_CTES}, cr AS ("
            "  SELECT a AS x, b AS y FROM tri UNION ALL SELECT b, c FROM tri"
            "  UNION ALL SELECT a, c FROM tri), "
            "s AS (SELECT x, y, count(*) AS sup FROM cr GROUP BY x, y) "
            "SELECT o.a, o.b, coalesce(s.sup, 0)::BIGINT AS support "
            "FROM o LEFT JOIN s ON s.x = o.a AND s.y = o.b"
        ),
        "mean_hops_sampled": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "seeds AS MATERIALIZED (SELECT v AS s FROM verts ORDER BY v LIMIT 4), "
            "walk AS (SELECT s AS source, s AS v, 0 AS h FROM seeds "
            "  UNION SELECT w.source, e.dst AS v, w.h + 1 AS h "
            "  FROM walk w JOIN edges e ON e.src = w.v WHERE w.h < 64), "
            "d AS (SELECT source, v, min(h)::BIGINT AS hops "
            "  FROM walk GROUP BY source, v) "
            "SELECT count(*)::BIGINT AS n_pairs, "
            "floor(sum(hops)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS mean_hops "
            "FROM d"
        ),
        "degree_gini": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src), "
            "r AS (SELECT d, row_number() OVER (ORDER BY d, v)::BIGINT AS rk FROM deg) "
            "SELECT count(*)::BIGINT AS n_vertices, "
            "floor((2.0 * sum(rk * d) / (count(*) * sum(d)::DOUBLE) "
            "- (count(*) + 1.0) / count(*)) * 1e6 + 0.5) / 1e6 AS gini "
            "FROM r"
        ),
        "landmark_features": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "seeds AS MATERIALIZED (SELECT v AS s, "
            "  (row_number() OVER (ORDER BY v) - 1)::BIGINT AS r "
            "  FROM (SELECT v FROM verts ORDER BY v LIMIT 4)), "
            "walk AS (SELECT s AS source, s AS v, 0 AS h FROM seeds "
            "  UNION SELECT w.source, e.dst AS v, w.h + 1 AS h "
            "  FROM walk w JOIN edges e ON e.src = w.v WHERE w.h < 64), "
            "d AS (SELECT source, v AS vertex, min(h)::BIGINT AS hops "
            "  FROM walk GROUP BY source, v) "
            "SELECT d.vertex, "
            "coalesce(max(CASE WHEN sd.r = 0 THEN d.hops END), -1)::BIGINT AS d0, "
            "coalesce(max(CASE WHEN sd.r = 1 THEN d.hops END), -1)::BIGINT AS d1, "
            "coalesce(max(CASE WHEN sd.r = 2 THEN d.hops END), -1)::BIGINT AS d2, "
            "coalesce(max(CASE WHEN sd.r = 3 THEN d.hops END), -1)::BIGINT AS d3 "
            "FROM d JOIN seeds sd ON sd.s = d.source GROUP BY d.vertex"
        ),
        "bipartite_check": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "cwalk AS (SELECT v, v AS l FROM verts "
            "  UNION SELECT e.dst AS v, w.l AS l FROM cwalk w "
            "  JOIN edges e ON e.src = w.v WHERE w.l < e.dst), "
            "lab AS (SELECT v, min(l) AS label FROM cwalk GROUP BY v), "
            "roots AS (SELECT DISTINCT label AS s FROM lab), "
            "hwalk AS (SELECT s AS v, 0 AS h FROM roots "
            "  UNION SELECT e.dst AS v, w.h + 1 AS h FROM hwalk w "
            "  JOIN edges e ON e.src = w.v WHERE w.h < 64), "
            "dist AS (SELECT v, min(h) AS h FROM hwalk GROUP BY v), "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "o AS (SELECT src AS a, dst AS b FROM simp WHERE src < dst), "
            "sizes AS (SELECT label, count(*)::BIGINT AS n_vertices "
            "  FROM lab GROUP BY label), "
            "confl AS (SELECT l1.label, count(*)::BIGINT AS c FROM o "
            "  JOIN dist da ON da.v = o.a JOIN dist db ON db.v = o.b "
            "  JOIN lab l1 ON l1.v = o.a "
            "  WHERE (da.h + db.h) % 2 = 0 GROUP BY l1.label) "
            "SELECT s.label, s.n_vertices, coalesce(c.c, 0)::BIGINT AS n_conflicts, "
            "(CASE WHEN coalesce(c.c, 0) = 0 THEN 1 ELSE 0 END)::BIGINT AS is_bipartite "
            "FROM sizes s LEFT JOIN confl c USING (label)"
        ),
        "negative_edges": (
            f"WITH {_EDGES_CTES}, "
            "vr AS (SELECT v, (row_number() OVER (ORDER BY v) - 1)::BIGINT AS rn "
            "  FROM verts), "
            "nn AS (SELECT count(*)::BIGINT AS n FROM verts), "
            "ii AS (SELECT unnest([1, 2]::BIGINT[]) AS i), "
            "cand AS (SELECT vr.v AS src, ii.i AS i, "
            "  ((vr.v % 2147483647) * 2654435761 + ii.i * 40503) % 2147483647 AS h "
            "  FROM vr CROSS JOIN ii), "
            "c2 AS (SELECT c.src, c.i, m.v AS dst "
            "  FROM cand c CROSS JOIN nn JOIN vr m ON m.rn = c.h % nn.n) "
            "SELECT c2.src, c2.dst, c2.i FROM c2 "
            "LEFT JOIN edges e ON e.src = c2.src AND e.dst = c2.dst "
            "WHERE e.src IS NULL AND c2.dst <> c2.src"
        ),
        "degree_powerlaw": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src), "
            "t AS (SELECT floor(ln(d::DOUBLE / 4.5) * 1e6 + 0.5)::BIGINT AS mu "
            "  FROM deg WHERE d >= 5) "
            "SELECT 5::BIGINT AS dmin, count(*)::BIGINT AS n_tail, "
            "CASE WHEN sum(mu) > 0 THEN "
            "floor((1.0 + count(*)::DOUBLE / (sum(mu)::DOUBLE / 1e6)) * 1e6 + 0.5) / 1e6 "
            "ELSE 0.0 END AS alpha FROM t"
        ),
        "component_profiles": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "walk AS (SELECT v, v AS l FROM verts "
            "  UNION SELECT e.dst AS v, w.l AS l FROM walk w "
            "  JOIN edges e ON e.src = w.v WHERE w.l < e.dst), "
            "lab AS (SELECT v, min(l) AS label FROM walk GROUP BY v), "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src), "
            "a AS (SELECT lab.label, coalesce(deg.d, 0)::BIGINT AS d "
            "  FROM lab LEFT JOIN deg ON deg.v = lab.v) "
            "SELECT label, count(*)::BIGINT AS n_vertices, "
            "sum(d)::BIGINT AS sum_degree, "
            "floor(sum(d)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS avg_degree, "
            "CASE WHEN count(*) >= 2 THEN floor(sum(d)::DOUBLE "
            "/ (count(*)::DOUBLE * (count(*) - 1.0)) * 1e6 + 0.5) / 1e6 "
            "ELSE 0.0 END AS density "
            "FROM a GROUP BY label"
        ),
        "graph_summary": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "walk AS (SELECT v, v AS l FROM verts "
            "  UNION SELECT e.dst AS v, w.l AS l FROM walk w "
            "  JOIN edges e ON e.src = w.v WHERE w.l < e.dst), "
            "lab AS (SELECT v, min(l) AS label FROM walk GROUP BY v), "
            "comp AS (SELECT label, count(*)::BIGINT AS sz FROM lab GROUP BY label), "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src), "
            "o AS (SELECT src AS a, dst AS b FROM simp WHERE src < dst), "
            "tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c "
            "  FROM o e1 JOIN o e2 ON e2.a = e1.b "
            "  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "nn AS (SELECT count(*)::BIGINT AS n FROM verts), "
            "mm AS (SELECT count(*)::BIGINT AS m FROM o) "
            "SELECT nn.n AS n_vertices, mm.m AS n_edges, "
            "(SELECT max(d) FROM deg)::BIGINT AS max_degree, "
            "floor(2.0 * mm.m / nn.n * 1e6 + 0.5) / 1e6 AS avg_degree, "
            "floor(2.0 * mm.m / (nn.n * (nn.n - 1.0)) * 1e6 + 0.5) / 1e6 AS density, "
            "(SELECT count(*) FROM tri)::BIGINT AS n_triangles, "
            "(SELECT count(*) FROM comp)::BIGINT AS n_components, "
            "(SELECT max(sz) FROM comp)::BIGINT AS largest_component "
            "FROM nn CROSS JOIN mm"
        ),
        "jaccard_links": (
            f"WITH {_TRI_CTES}, cr AS ("
            "  SELECT a AS x, b AS y FROM tri UNION ALL SELECT b, c FROM tri"
            "  UNION ALL SELECT a, c FROM tri), "
            "s AS (SELECT x, y, count(*) AS sup FROM cr GROUP BY x, y), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src) "
            "SELECT o.a, o.b, coalesce(s.sup, 0)::BIGINT AS support, "
            "floor(coalesce(s.sup, 0)::DOUBLE / (da.d + db.d - coalesce(s.sup, 0)) "
            "* 1e6 + 0.5) / 1e6 AS jaccard "
            "FROM o LEFT JOIN s ON s.x = o.a AND s.y = o.b "
            "JOIN deg da ON da.v = o.a JOIN deg db ON db.v = o.b"
        ),
        "sampled_triangle_estimate": (
            f"WITH {_EDGES_CTES}, "
            "samp AS (SELECT src, dst FROM edges WHERE src <> dst AND "
            "  ('0x' || substr(md5(concat(7, ':', least(src, dst), ':', "
            "  greatest(src, dst))), 1, 15))::BIGINT < 576460752303423488), "
            "o AS (SELECT src AS a, dst AS b FROM samp WHERE src < dst), "
            "tri AS (SELECT e1.a, e1.b, e2.b AS c FROM o e1 "
            "  JOIN o e2 ON e2.a = e1.b "
            "  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b) "
            "SELECT count(*)::BIGINT AS sampled_triangles, "
            "CAST(floor(count(*)::DOUBLE / 0.125 + 0.5) AS BIGINT) AS estimate "
            "FROM tri"
        ),
        "rich_club": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM simp GROUP BY src), "
            "ks AS (SELECT unnest([1, 2, 4, 8, 16]::BIGINT[]) AS k), "
            "o AS (SELECT src AS a, dst AS b FROM simp WHERE src < dst), "
            "nk AS (SELECT k, count(*)::BIGINT AS n FROM ks JOIN deg ON deg.d > ks.k "
            "  GROUP BY k), "
            "ek AS (SELECT k, count(*)::BIGINT AS e FROM ks JOIN o ON true "
            "  JOIN deg da ON da.v = o.a JOIN deg db ON db.v = o.b "
            "  WHERE least(da.d, db.d) > ks.k GROUP BY k) "
            "SELECT ks.k, coalesce(nk.n, 0)::BIGINT AS n_nodes, "
            "coalesce(ek.e, 0)::BIGINT AS n_edges, "
            "CASE WHEN coalesce(nk.n, 0) >= 2 THEN "
            "floor(2.0 * coalesce(ek.e, 0) / (nk.n * (nk.n - 1)) * 1e6 + 0.5) / 1e6 "
            "ELSE 0.0 END AS phi "
            "FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)"
        ),
        "ktruss5_r3": _truss_sql(5, rounds=3),
        "ktruss5_sync": _truss_sql(5, rounds=3),
        "kcore7": _kcore_sql(7, rounds=8),
        "coreness": _coreness_sql(),
        "bfs_hops": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "s AS (SELECT min(v) AS sv FROM verts), "
            "walk AS (SELECT sv AS v, 0 AS h FROM s "
            "  UNION "
            "  SELECT e.dst AS v, w.h + 1 AS h FROM walk w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64) "
            "SELECT v AS vertex, min(h)::BIGINT AS hops FROM walk GROUP BY v"
        ),
        "bfs_hops_pinned": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "s AS (SELECT min(v) AS sv FROM verts), "
            "walk AS (SELECT sv AS v, 0 AS h FROM s "
            "  UNION "
            "  SELECT e.dst AS v, w.h + 1 AS h FROM walk w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64) "
            "SELECT v AS vertex, min(h)::BIGINT AS hops FROM walk GROUP BY v"
        ),
        "multi_bfs_hops": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "seeds AS MATERIALIZED (SELECT v AS s FROM verts ORDER BY v LIMIT 4), "
            "walk AS (SELECT s AS source, s AS v, 0 AS h FROM seeds "
            "  UNION "
            "  SELECT w.source, e.dst AS v, w.h + 1 AS h "
            "  FROM walk w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64) "
            "SELECT source, v AS vertex, min(h)::BIGINT AS hops "
            "FROM walk GROUP BY source, v"
        ),
        "sssp_weighted": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "we AS MATERIALIZED (SELECT src, dst, ((src + dst) % 5 + 1)::BIGINT AS w "
            "  FROM edges), "
            "s AS (SELECT min(v) AS sv FROM verts), "
            "walk AS (SELECT sv AS v, 0::BIGINT AS d FROM s "
            "  UNION "
            "  SELECT e.dst AS v, w.d + e.w AS d FROM walk w JOIN we e ON e.src = w.v "
            "  WHERE w.d + e.w < 320) "
            "SELECT v AS vertex, min(d)::BIGINT AS dist FROM walk GROUP BY v"
        ),
        "harmonic_centrality": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "seeds AS MATERIALIZED (SELECT v AS s FROM verts ORDER BY v LIMIT 4), "
            "walk AS (SELECT s AS source, s AS v, 0 AS h FROM seeds "
            "  UNION "
            "  SELECT w.source, e.dst AS v, w.h + 1 AS h "
            "  FROM walk w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64), "
            "mh AS (SELECT source, v, min(h) AS h FROM walk GROUP BY source, v) "
            "SELECT v AS vertex, round(sum(1.0 / h), 6) AS harmonic "
            "FROM mh WHERE h > 0 GROUP BY v"
        ),
        "diameter_lb": (
            f"WITH RECURSIVE {_EDGES_CTES}, "
            "s1 AS (SELECT min(v) AS sv FROM verts), "
            "w1 AS (SELECT sv AS v, 0 AS h FROM s1 "
            "  UNION SELECT e.dst, w.h + 1 FROM w1 w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64), "
            "h1 AS (SELECT v, min(h) AS h FROM w1 GROUP BY v), "
            "far AS (SELECT v AS fv FROM h1 ORDER BY h DESC, v ASC LIMIT 1), "
            "w2 AS (SELECT fv AS v, 0 AS h FROM far "
            "  UNION SELECT e.dst, w.h + 1 FROM w2 w JOIN edges e ON e.src = w.v "
            "  WHERE w.h < 64) "
            "SELECT max(mh)::BIGINT AS diameter_lb "
            "FROM (SELECT v, min(h) AS mh FROM w2 GROUP BY v)"
        ),
        "reciprocity": (
            f"WITH {_EDGES_CTES}, "
            "dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst), "
            "m AS (SELECT count(*)::DOUBLE AS c FROM dedges a "
            "  JOIN dedges b ON b.src = a.dst AND b.dst = a.src WHERE a.src < a.dst), "
            "t AS (SELECT count(*)::DOUBLE AS c FROM dedges) "
            "SELECT floor((2.0 * m.c / t.c) * 1e6 + 0.5) / 1e6 AS reciprocity FROM m, t"
        ),
        "duplicate_ngram_stats": """
WITH toks AS (SELECT doc_id, regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents),
gr AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS g
  FROM toks WHERE len(w) > 0),
gc AS MATERIALIZED (SELECT g, count(*) AS nd FROM gr GROUP BY g),
per AS (SELECT gr.doc_id, count(*) AS n_grams,
        sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS shared_grams
        FROM gr JOIN gc USING (g) GROUP BY gr.doc_id)
SELECT doc_id, n_grams::BIGINT AS n_grams, shared_grams::BIGINT AS shared_grams,
       floor((shared_grams::DOUBLE / n_grams) * 1e6 + 0.5) / 1e6 AS dup_gram_frac
FROM per
""",
        "dedup_lines": """
WITH ls AS MATERIALIZED (
  SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS lns FROM documents),
ex AS MATERIALIZED (
  SELECT doc_id, unnest(lns) AS line, unnest(range(1, len(lns) + 1)) AS pos FROM ls),
dup AS MATERIALIZED (
  SELECT line FROM (SELECT DISTINCT doc_id, line FROM ex) GROUP BY line
  HAVING count(*) >= 2),
kept AS (
  SELECT e.doc_id, e.pos, e.line FROM ex e LEFT JOIN dup d ON d.line = e.line
  WHERE d.line IS NULL)
SELECT l.doc_id,
       coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text,
       count(k.line)::BIGINT AS kept_lines,
       any_value(len(l.lns))::BIGINT AS total_lines
FROM ls l LEFT JOIN kept k ON k.doc_id = l.doc_id
GROUP BY l.doc_id
""",
        "length_percentile_filter": (
            "WITH t AS (SELECT quantile_disc(n_chars, 0.25) AS th FROM documents) "
            "SELECT doc_id, n_chars FROM documents, t WHERE n_chars >= t.th"
        ),
        "events_rate_anomalies": (
            "WITH c AS (SELECT user_id, (epoch_us(ts) // 3600000000)::BIGINT AS win, "
            "  count(*)::BIGINT AS n FROM events GROUP BY 1, 2), "
            "s AS (SELECT user_id, avg(n::DOUBLE) AS m, stddev(n::DOUBLE) AS sd, "
            "  count(*) AS nw FROM c GROUP BY user_id) "
            "SELECT c.user_id, c.win, c.n, round((c.n - s.m) / s.sd, 6) AS z "
            "FROM c JOIN s USING (user_id) "
            "WHERE s.nw >= 2 AND s.sd > 0 AND abs((c.n - s.m) / s.sd) >= 2.0"
        ),
        "lexical_diversity": (
            "WITH t AS (SELECT doc_id, "
            "  regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents) "
            "SELECT doc_id, len(w)::BIGINT AS n_tokens, "
            "  len(list_distinct(w))::BIGINT AS n_types, "
            "  CASE WHEN len(w) > 0 THEN "
            "    floor((len(list_distinct(w))::DOUBLE / len(w)) * 1e6 + 0.5) / 1e6 "
            "  ELSE 0.0 END AS ttr FROM t"
        ),
        "degree_assortativity": (
            f"WITH {_EDGES_CTES}, "
            "simp AS (SELECT src, dst FROM edges WHERE src <> dst), "
            "deg AS (SELECT src AS v, count(*)::DOUBLE AS d FROM simp GROUP BY src) "
            "SELECT round(corr(da.d, db.d), 6) AS assortativity "
            "FROM simp JOIN deg da ON da.v = simp.src JOIN deg db ON db.v = simp.dst"
        ),
        "clustering_coeff": (
            f"WITH {_TRI_CTES}, corners AS ("
            "  SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri"
            "  UNION ALL SELECT c FROM tri), "
            "tc AS (SELECT vertex, count(*)::DOUBLE AS t FROM corners GROUP BY vertex), "
            "deg AS (SELECT src AS vertex, count(*)::DOUBLE AS d FROM simp GROUP BY src) "
            "SELECT deg.vertex, round(CASE WHEN deg.d >= 2 "
            "THEN 2.0 * coalesce(tc.t, 0.0) / (deg.d * (deg.d - 1)) ELSE 0.0 END, 6) "
            "AS coeff FROM deg LEFT JOIN tc ON tc.vertex = deg.vertex"
        ),
        "extract_text_roundtrip": (
            "SELECT 'https://docs.example/' || doc_id::VARCHAR AS url, "
            "coalesce(text, '') AS text FROM documents"
        ),
        "extract_links_planted": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "j AS (SELECT unnest([1, 2, 3]) AS jj) "
            "SELECT d.doc_id AS src_doc, ((d.doc_id * 31 + j.jj) % nn.n)::BIGINT AS dst_doc "
            "FROM documents d CROSS JOIN j CROSS JOIN nn"
        ),
        "pages_to_edges_planted": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "j AS (SELECT unnest([1, 2, 3]) AS jj), "
            "lk AS (SELECT d.doc_id AS s, ((d.doc_id * 31 + j.jj) % nn.n)::BIGINT AS t "
            "       FROM documents d CROSS JOIN j CROSS JOIN nn), "
            "sym AS (SELECT s, t FROM lk UNION SELECT t, s FROM lk) "
            "SELECT DISTINCT 'https://docs.example/' || s::VARCHAR AS src_url, "
            "'https://docs.example/' || t::VARCHAR AS dst_url FROM sym"
        ),
        "doc_stats": (
            "SELECT doc_id, length(coalesce(text, ''))::BIGINT AS n_chars, "
            "length(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS n_tokens, "
            "length(regexp_extract_all(coalesce(text, ''), "
            "'[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS n_bpeish "
            "FROM documents"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups "
            "FROM documents GROUP BY text"
        ),
        "doc_quality": (
            "WITH b AS (SELECT doc_id, coalesce(text,'') AS t FROM documents), "
            "m AS (SELECT doc_id, length(t)::BIGINT AS n_chars, "
            "  len(regexp_extract_all(t, '\\S+'))::BIGINT AS n_tokens, "
            "  len(regexp_extract_all(t, '[^\\w\\s]'))::BIGINT AS n_punct, "
            "  len(regexp_extract_all(t, '[A-Z]'))::BIGINT AS n_upper, "
            "  regexp_extract_all(lower(t), '[a-z]+') AS words FROM b) "
            "SELECT doc_id, n_chars, n_tokens, "
            "round((n_chars - greatest(n_tokens - 1, 0))::DOUBLE / greatest(n_tokens, 1), 6) AS avg_token_len, "
            "round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio, "
            f"round(len(list_filter(words, x -> x IN ({_STOP_EN})))::DOUBLE "
            "/ greatest(len(words), 1), 6) AS stopword_ratio, "
            "round(n_upper::DOUBLE / greatest(n_chars, 1), 6) AS upper_ratio FROM m"
        ),
        # NOTE: the engine's word regex is unicode ([^\W\d_]+); the SQL
        # mirror uses [a-z]+, exact on this ASCII fixture corpus.
        "lang_id": _LANG_SQL,
        "lang_confusion": (
            f"WITH p AS ({_LANG_SQL}) "
            "SELECT coalesce(d.lang, 'und') AS lang, p.lang_pred, "
            "count(*)::BIGINT AS n "
            "FROM p JOIN documents d USING (doc_id) GROUP BY 1, 2"
        ),
        "doc_fingerprints": (
            "SELECT doc_id, ('0x' || substr(md5(coalesce(text,'')), 1, 15))::BIGINT AS fp "
            "FROM documents"
        ),
        "mixture_sample": (
            "WITH t AS (SELECT source, sum(n_chars)::BIGINT AS mass "
            "  FROM documents GROUP BY source), "
            "g AS (SELECT count(*)::BIGINT AS k, sum(mass)::DOUBLE AS T FROM t), "
            "thr AS (SELECT source, least(1152921504606846976, "
            "  CAST(floor(g.T / g.k / greatest(t.mass, 1)::DOUBLE "
            "  * 1152921504606846976.0) AS BIGINT)) AS thr "
            "  FROM t CROSS JOIN g) "
            "SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source) "
            "WHERE ('0x' || substr(md5(concat(17, ':', d.doc_id)), 1, 15))::BIGINT "
            "< thr.thr"
        ),
        "mixture_upsample": (
            "WITH t AS (SELECT source, sum(n_chars)::BIGINT AS mass "
            "  FROM documents GROUP BY source), "
            "g AS (SELECT count(*)::BIGINT AS k, sum(mass)::DOUBLE AS T FROM t), "
            "r AS (SELECT source, "
            "  greatest(g.T / g.k / greatest(t.mass, 1)::DOUBLE, 1.0) AS rate "
            "  FROM t CROSS JOIN g), "
            "thr AS (SELECT source, CAST(floor(rate) AS BIGINT) AS n_full, "
            "  CAST(floor((rate - floor(rate)) * 1152921504606846976.0) AS BIGINT) "
            "  AS ft FROM r), "
            "c AS (SELECT d.doc_id, d.source, thr.n_full + "
            "  (CASE WHEN ('0x' || substr(md5(concat(19, ':', d.doc_id)), 1, 15))::BIGINT "
            "  < thr.ft THEN 1 ELSE 0 END) AS n "
            "  FROM documents d JOIN thr USING (source)) "
            "SELECT doc_id, source, unnest(range(0, n))::BIGINT AS copy FROM c"
        ),
        "jsonl_roundtrip": (
            "SELECT doc_id, coalesce(text, '') AS text FROM documents"
        ),
        "csv_roundtrip": (
            "SELECT doc_id, coalesce(text, '') AS text FROM documents"
        ),
        "contamination_bloom": (
            "WITH f AS (SELECT doc_id, "
            "  ('0x' || substr(md5(coalesce(text,'')), 1, 15))::BIGINT AS fp "
            "  FROM documents), "
            "pos AS (SELECT DISTINCT "
            "  ((fp % 2147483647) * 2654435761 + 17) % 2147483647 % 1048576 AS p "
            "  FROM f WHERE doc_id % 20 <> 0 "
            "  UNION SELECT DISTINCT "
            "  ((fp % 2147483647) * 40503 + 29) % 2147483647 % 1048576 "
            "  FROM f WHERE doc_id % 20 <> 0), "
            "te AS (SELECT doc_id, "
            "  ((fp % 2147483647) * 2654435761 + 17) % 2147483647 % 1048576 AS p1, "
            "  ((fp % 2147483647) * 40503 + 29) % 2147483647 % 1048576 AS p2 "
            "  FROM f WHERE doc_id % 20 = 0) "
            "SELECT doc_id, (CASE WHEN p1 IN (SELECT p FROM pos) "
            "AND p2 IN (SELECT p FROM pos) THEN 1 ELSE 0 END)::BIGINT AS flagged "
            "FROM te"
        ),
        "neardup_contamination": (
            f"WITH {_CHAR5_PAIR_CTES} "
            "SELECT CASE WHEN a % 20 = 0 THEN a ELSE b END AS test_doc_id, "
            "CASE WHEN a % 20 = 0 THEN b ELSE a END AS train_doc_id, "
            "round(j, 6) AS jaccard FROM jpairs "
            "WHERE j >= 0.5 AND ((a % 20 = 0) <> (b % 20 = 0))"
        ),
        "minhash_pairs": (
            f"WITH {_CHAR5_PAIR_CTES} "
            "SELECT a, b, round(j, 6) AS jaccard FROM jpairs WHERE j >= 0.5"
        ),
        "simhash_pairs": (
            f"WITH {_CHAR5_PAIR_CTES} "
            "SELECT a, b, round(j, 6) AS jaccard FROM jpairs WHERE j >= 0.5"
        ),
        "ngram_jaccard_pairs": (
            f"WITH {_WORD3_PAIR_CTES} "
            "SELECT a, b, round(j, 6) AS jaccard FROM jpairs WHERE j >= 0.6"
        ),
        "embedding_dup_pairs": (
            "WITH aug AS (SELECT vec_id, embedding FROM embeddings "
            "  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings "
            "  WHERE vec_id % 20 = 0), "
            "p AS (SELECT x.vec_id AS a, y.vec_id AS b, "
            "  list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cs "
            "  FROM aug x JOIN aug y ON x.vec_id < y.vec_id) "
            "SELECT a, b, round(cs, 6) AS cosine FROM p WHERE cs >= 0.9"
        ),
        "dup_groups": (
            f"WITH RECURSIVE {_CHAR5_PAIR_CTES}, "
            "pr AS MATERIALIZED (SELECT a, b FROM jpairs WHERE j >= 0.5), "
            "de AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr), "
            "dv AS (SELECT DISTINCT src AS v FROM de), "
            "walk AS (SELECT v, v AS l FROM dv UNION "
            "  SELECT e.dst AS v, w.l AS l FROM walk w JOIN de e ON e.src = w.v "
            "  WHERE w.l < e.dst) "
            "SELECT v AS doc_id, min(l) AS group_id FROM walk GROUP BY v"
        ),
        "dup_rate_by_source": (
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "count(DISTINCT coalesce(text, ''))::BIGINT AS n_distinct, "
            "floor((1.0 - count(DISTINCT coalesce(text, ''))::DOUBLE / count(*)) "
            "* 1e6 + 0.5) / 1e6 AS dup_ratio "
            "FROM documents GROUP BY source"
        ),
        "dup_family_sizes": (
            f"WITH RECURSIVE {_CHAR5_PAIR_CTES}, "
            "pr AS MATERIALIZED (SELECT a, b FROM jpairs WHERE j >= 0.5), "
            "de AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr), "
            "dv AS (SELECT DISTINCT src AS v FROM de), "
            "walk AS (SELECT v, v AS l FROM dv UNION "
            "  SELECT e.dst AS v, w.l AS l FROM walk w JOIN de e ON e.src = w.v "
            "  WHERE w.l < e.dst), "
            "lab AS (SELECT v, min(l) AS g FROM walk GROUP BY v), "
            "sz AS (SELECT g, count(*)::BIGINT AS family_size FROM lab GROUP BY g) "
            "SELECT family_size, count(*)::BIGINT AS n_families "
            "FROM sz GROUP BY family_size"
        ),
        "corpus_prep": (
            "WITH RECURSIVE "
            "q AS MATERIALIZED (SELECT doc_id, coalesce(text,'') AS text FROM documents "
            "  WHERE len(regexp_extract_all(coalesce(text,''), '\\S+')) >= 5 "
            "  AND len(regexp_extract_all(coalesce(text,''), '[^\\w\\s]'))::DOUBLE "
            "      / greatest(length(coalesce(text,'')), 1) <= 0.2), "
            "e AS MATERIALIZED (SELECT doc_id, text FROM q "
            "  WHERE doc_id = (SELECT min(q2.doc_id) FROM q q2 WHERE q2.text = q.text)), "
            f"{_char5_pair_ctes('e')}, "
            "pr AS MATERIALIZED (SELECT a, b FROM jpairs WHERE j >= 0.5), "
            "de AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr), "
            "dv AS (SELECT DISTINCT src AS v FROM de), "
            "walk AS (SELECT v, v AS l FROM dv UNION "
            "  SELECT de.dst AS v, w.l AS l FROM walk w JOIN de ON de.src = w.v "
            "  WHERE w.l < de.dst), "
            "grp AS (SELECT v, min(l) AS g FROM walk GROUP BY v) "
            "SELECT e.doc_id FROM e LEFT JOIN grp ON grp.v = e.doc_id "
            "WHERE grp.v IS NULL OR grp.g = e.doc_id"
        ),
        "media_decode": (
            "SELECT doc_id AS media_id, "
            "(length(coalesce(text,'')) % 96 + 8)::BIGINT AS width, "
            "((length(coalesce(text,'')) // 7) % 96 + 8)::BIGINT AS height, "
            "(11 + least(length(coalesce(text,'')), 256))::BIGINT AS n_bytes "
            "FROM documents"
        ),
        "media_decode_png": (
            "WITH m AS (SELECT doc_id AS media_id, length(coalesce(text,'')) AS L "
            "FROM documents), "
            "d AS (SELECT media_id, L, (L % 48 + 8)::BIGINT AS width, "
            "((L // 7) % 48 + 8)::BIGINT AS height FROM m), "
            "gx AS (SELECT media_id, L, height, unnest(range(0, width)) AS x FROM d), "
            "px AS (SELECT media_id, L, x, unnest(range(0, height)) AS y FROM gx), "
            "s AS (SELECT media_id, sum((7*x + 13*y + L) % 256)::BIGINT AS pixel_sum "
            "FROM px GROUP BY media_id) "
            "SELECT d.media_id, d.width, d.height, s.pixel_sum "
            "FROM d JOIN s USING (media_id)"
        ),
        "dataset_split": _split_sql("documents", key_expr="doc_id"),
        "group_safe_split": (
            f"WITH RECURSIVE {_CHAR5_PAIR_CTES}, "
            "pr AS MATERIALIZED (SELECT a, b FROM jpairs WHERE j >= 0.5), "
            "de AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr), "
            "dv AS (SELECT DISTINCT src AS v FROM de), "
            "walk AS (SELECT v, v AS l FROM dv UNION "
            "  SELECT e.dst AS v, w.l AS l FROM walk w JOIN de e ON e.src = w.v "
            "  WHERE w.l < e.dst), "
            "grp AS (SELECT v, min(l) AS g FROM walk GROUP BY v), "
            "keyed AS (SELECT d.doc_id, coalesce(grp.g, d.doc_id) AS k "
            "FROM documents d LEFT JOIN grp ON grp.v = d.doc_id) "
            + _split_sql("keyed", key_expr="k", id_expr="doc_id")
        ),
        "media_decode_wav": (
            "WITH m AS (SELECT doc_id AS media_id, length(coalesce(text,'')) AS L "
            "FROM documents), "
            "d AS (SELECT media_id, L, ((L % 977) + 32)::BIGINT AS n_samples, "
            "(8000 + (L % 2) * 8000)::BIGINT AS sample_rate FROM m), "
            "sx AS (SELECT media_id, L, unnest(range(0, n_samples)) AS i FROM d), "
            "s AS (SELECT media_id, "
            "sum((31*i + L) % 4096 - 2048)::BIGINT AS amp_sum, "
            "max(abs((31*i + L) % 4096 - 2048))::BIGINT AS peak "
            "FROM sx GROUP BY media_id) "
            "SELECT d.media_id, d.sample_rate, d.n_samples, s.amp_sum, s.peak "
            "FROM d JOIN s USING (media_id)"
        ),
        "media_resize": (
            "SELECT doc_id AS media_id, "
            "greatest(1, (length(coalesce(text,'')) % 96 + 8) // 2)::BIGINT AS width, "
            "greatest(1, ((length(coalesce(text,'')) // 7) % 96 + 8) // 2)::BIGINT AS height "
            "FROM documents"
        ),
        "media_frames": (
            "WITH v AS (SELECT doc_id, length(coalesce(text,'')) AS n FROM documents), "
            "f AS (SELECT doc_id, n, unnest(range(0, (n % 31) + 2, 4)) AS frame FROM v) "
            "SELECT doc_id AS media_id, frame::BIGINT AS frame, "
            "(n % 64 + 16)::BIGINT AS width, ((n // 3) % 64 + 16)::BIGINT AS height FROM f"
        ),
        "knn_cosine": _KNN_SQL,
        "knn_ivf": _KNN_SQL,
        "knn_ivf_indexed": _KNN_SQL,
        "events_windowed": (
            "SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS win, "
            "count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value "
            "FROM events GROUP BY event_type, win"
        ),
        "events_hopping": (
            "WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS base, value "
            "FROM events), "
            "x AS (SELECT event_type, base - k.kk AS win_start, value "
            "      FROM e CROSS JOIN (SELECT unnest([0, 1]) AS kk) k) "
            "SELECT event_type, win_start::BIGINT AS win_start, count(*)::BIGINT AS n, "
            "round(sum(value), 6) AS sum_value FROM x GROUP BY event_type, win_start"
        ),
        "top_tokens": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(coalesce(text,''), '\\S+')) "
            "AS token FROM documents) "
            "SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY token "
            "ORDER BY n DESC, token ASC LIMIT 50"
        ),
        "tfidf_top_terms": (
            "WITH nn AS (SELECT count(*)::DOUBLE AS n FROM documents), "
            "toks AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(coalesce(text,''), '\\S+')) AS token "
            "  FROM documents), "
            "tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks "
            "  GROUP BY doc_id, token), "
            "df AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
            "  GROUP BY token), "
            "sc AS (SELECT tf.doc_id, tf.token, "
            "  round(tf.tf * ln(nn.n / df.df), 6) AS score "
            "  FROM tf JOIN df USING (token) CROSS JOIN nn), "
            "rk AS (SELECT doc_id, token, score, row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rnk FROM sc) "
            "SELECT doc_id, token, score, rnk::BIGINT AS rnk FROM rk WHERE rnk <= 3"
        ),
        "events_window_join": (
            "WITH b AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type, "
            "  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events), "
            "p AS (SELECT * FROM b WHERE event_type = 'purchase') "
            "SELECT p.event_id, count(x.t)::BIGINT AS n_prior, "
            "coalesce(sum(x.cents), 0)::BIGINT AS prior_value_cents "
            "FROM p LEFT JOIN b x ON x.user_id = p.user_id "
            "AND x.t < p.t AND x.t >= p.t - 3600000000 "
            "GROUP BY p.event_id"
        ),
        "copurchase_pairs": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM lp a "
            "  JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey) "
            "SELECT p1, p2, count(*)::BIGINT AS n_orders FROM pr "
            "GROUP BY p1, p2 HAVING count(*) >= 2"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT AS sum_qty, "
            "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS sum_base_cents, "
            "sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5) AS BIGINT))::BIGINT AS sum_disc_e4, "
            "sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6 + 0.5) AS BIGINT))::BIGINT AS sum_charge_e6, "
            "count(*)::BIGINT AS n, "
            "floor(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS avg_qty "
            "FROM lineitem WHERE epoch_us(l_shipdate) <= epoch_us(TIMESTAMP '2000-12-31') "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "top_orders_by_revenue": (
            "SELECT o.o_orderkey, "
            "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5) AS BIGINT))::BIGINT AS revenue_e4 "
            "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "GROUP BY o.o_orderkey ORDER BY revenue_e4 DESC, o.o_orderkey ASC LIMIT 10"
        ),
        "revenue_by_nation": (
            "SELECT n.n_name, "
            "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5) AS BIGINT))::BIGINT AS revenue_e4 "
            "FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "JOIN orders o ON o.o_custkey = c.c_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "GROUP BY n.n_name"
        ),
        "orders_by_month": (
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "count(*)::BIGINT AS n_orders, "
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT "
            "AS total_cents FROM orders GROUP BY month"
        ),
        "order_priority_counts": (
            "SELECT o_orderpriority, count(*)::BIGINT AS order_count "
            "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
            "GROUP BY o_orderpriority"
        ),
        "customer_order_distribution": (
            "WITH pc AS (SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count "
            "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_custkey) "
            "SELECT c_count, count(*)::BIGINT AS custdist FROM pc GROUP BY c_count"
        ),
        "inactive_customers": (
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "neighbor_sample": (
            f"WITH {_EDGES_CTES}, "
            "h AS (SELECT src, dst, ((src % 2147483647) * 2654435761 "
            "  + (dst % 2147483647) * 40503) % 2147483647 AS h FROM edges), "
            "r AS (SELECT src, dst, row_number() OVER ("
            "  PARTITION BY src ORDER BY h, dst)::BIGINT AS rnk FROM h) "
            "SELECT src, dst, rnk FROM r WHERE rnk <= 3"
        ),
        "revenue_rollup": (
            "SELECT coalesce(n.n_name, 'ALL') AS n_name, "
            "coalesce(o.o_orderpriority, 'ALL') AS o_orderpriority, "
            "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5) AS BIGINT))::BIGINT AS revenue_e4 "
            "FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "JOIN orders o ON o.o_custkey = c.c_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "GROUP BY ROLLUP (n.n_name, o.o_orderpriority)"
        ),
        "returned_top_customers": (
            "SELECT c.c_custkey, any_value(c.c_name) AS c_name, "
            "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5) AS BIGINT))::BIGINT AS revenue_e4 "
            "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "GROUP BY c.c_custkey ORDER BY revenue_e4 DESC, c.c_custkey ASC LIMIT 20"
        ),
        "events_props_stats": (
            "SELECT coalesce(CAST(regexp_extract(coalesce(props, ''), "
            "'\"k\": (\\d+)', 1) AS BIGINT), -1) AS k, count(*)::BIGINT AS n, "
            "sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents "
            "FROM events GROUP BY k"
        ),
        "events_winsorized_mean": (
            "WITH b AS (SELECT event_type, "
            "  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events), "
            "q AS (SELECT event_type, quantile_disc(c, 0.05) AS lo, "
            "  quantile_disc(c, 0.95) AS hi, count(*)::BIGINT AS n "
            "  FROM b GROUP BY event_type) "
            "SELECT b.event_type, any_value(q.n) AS n, "
            "floor(sum(least(greatest(b.c, q.lo), q.hi))::DOUBLE / any_value(q.n) "
            "  * 1e6 + 0.5) / 1e6 AS mean_cents "
            "FROM b JOIN q USING (event_type) GROUP BY b.event_type"
        ),
        "quality_classifier": (
            "WITH f AS (SELECT doc_id, "
            "  length(coalesce(text, ''))::DOUBLE AS L, "
            "  len(regexp_extract_all(coalesce(text, ''), '\\S+'))::DOUBLE AS T, "
            "  len(list_distinct(regexp_extract_all(coalesce(text, ''), '\\S+')))::DOUBLE AS Y "
            "  FROM documents), "
            "z AS (SELECT doc_id, -2.0 + 0.3 * ln(1.0 + L) + 0.4 * ln(1.0 + T) "
            "  + 1.5 * (CASE WHEN T > 0 THEN Y / greatest(T, 1.0) ELSE 0.0 END) AS z "
            "  FROM f) "
            "SELECT doc_id, floor(1.0 / (1.0 + exp(-z)) * 1e6 + 0.5) / 1e6 AS score, "
            "(CASE WHEN floor(1.0 / (1.0 + exp(-z)) * 1e6 + 0.5) / 1e6 >= 0.5 "
            "  THEN 1 ELSE 0 END)::BIGINT AS keep FROM z"
        ),
        "median_tokens_by_source": (
            "WITH l AS (SELECT source, "
            "  len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS k "
            "  FROM documents) "
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "quantile_disc(k, 0.5)::BIGINT AS median_tokens "
            "FROM l GROUP BY source"
        ),
        "lang_by_source": (
            f"WITH p AS ({_LANG_SQL}) "
            "SELECT d.source, p.lang_pred, count(*)::BIGINT AS n "
            "FROM p JOIN documents d USING (doc_id) GROUP BY 1, 2"
        ),
        "vocab_uniqueness": (
            "WITH st AS (SELECT DISTINCT source, "
            "  unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok "
            "  FROM documents), "
            "h AS (SELECT tok, count(*)::BIGINT AS nh FROM st GROUP BY tok) "
            "SELECT st.source, count(*)::BIGINT AS n_vocab, "
            "sum(CASE WHEN h.nh = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique, "
            "floor(sum(CASE WHEN h.nh = 1 THEN 1 ELSE 0 END)::DOUBLE "
            "/ greatest(count(*), 1) * 1e6 + 0.5) / 1e6 AS uniqueness "
            "FROM st JOIN h USING (tok) GROUP BY st.source"
        ),
        "events_hour_profile": (
            "SELECT event_type, "
            "((epoch_us(ts) // 3600000000) % 24)::BIGINT AS hour, "
            "count(*)::BIGINT AS n FROM events GROUP BY event_type, hour"
        ),
        "source_similarity": (
            "WITH st AS (SELECT DISTINCT source, "
            "  unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok "
            "  FROM documents), "
            "sz AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source), "
            "i AS (SELECT x.source AS a, y.source AS b, count(*)::BIGINT AS c "
            "  FROM st x JOIN st y USING (tok) WHERE x.source < y.source "
            "  GROUP BY 1, 2) "
            "SELECT sa.source AS source_a, sb.source AS source_b, "
            "coalesce(i.c, 0)::BIGINT AS n_common, "
            "floor(coalesce(i.c, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.c, 0)) "
            "* 1e6 + 0.5) / 1e6 AS jaccard "
            "FROM sz sa JOIN sz sb ON sa.source < sb.source "
            "LEFT JOIN i ON i.a = sa.source AND i.b = sb.source"
        ),
        "zipf_slope": (
            "WITH tk AS (SELECT unnest(regexp_extract_all(coalesce(text, ''), "
            "'\\S+')) AS token FROM documents), "
            "c AS (SELECT token, count(*)::BIGINT AS n FROM tk GROUP BY token), "
            "t AS (SELECT n, row_number() OVER (ORDER BY n DESC, token ASC)::BIGINT "
            "  AS r FROM c ORDER BY n DESC, token LIMIT 100), "
            "q AS (SELECT CAST(floor(ln(r::DOUBLE) * 1e6 + 0.5) AS BIGINT) AS x, "
            "  CAST(floor(ln(n::DOUBLE) * 1e6 + 0.5) AS BIGINT) AS y FROM t) "
            "SELECT count(*)::BIGINT AS n_terms, "
            "floor((count(*)::DOUBLE * sum(x * y) - sum(x)::DOUBLE * sum(y)) "
            "/ (count(*)::DOUBLE * sum(x * x) - sum(x)::DOUBLE * sum(x)) "
            "* 1e6 + 0.5) / 1e6 AS slope FROM q"
        ),
        "quality_by_source": (
            "WITH f AS (SELECT doc_id, "
            "  length(coalesce(text, ''))::DOUBLE AS L, "
            "  len(regexp_extract_all(coalesce(text, ''), '\\S+'))::DOUBLE AS T, "
            "  len(list_distinct(regexp_extract_all(coalesce(text, ''), '\\S+')))::DOUBLE AS Y "
            "  FROM documents), "
            "z AS (SELECT doc_id, -2.0 + 0.3 * ln(1.0 + L) + 0.4 * ln(1.0 + T) "
            "  + 1.5 * (CASE WHEN T > 0 THEN Y / greatest(T, 1.0) ELSE 0.0 END) AS z "
            "  FROM f), "
            "m AS (SELECT d.source, "
            "  CAST(floor(1.0 / (1.0 + exp(-z.z)) * 1e6 + 0.5) AS BIGINT) AS mu "
            "  FROM z JOIN documents d USING (doc_id)) "
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "sum(CASE WHEN mu >= 500000 THEN 1 ELSE 0 END)::BIGINT AS n_keep, "
            "floor(sum(mu)::DOUBLE / count(*) + 0.5) / 1e6 AS mean_score "
            "FROM m GROUP BY source"
        ),
        "weighted_sample": (
            "WITH h AS (SELECT doc_id, n_chars, "
            "  greatest(('0x' || substr(md5(concat(11, ':', doc_id)), 1, 15))::BIGINT, 1) AS hh "
            "  FROM documents), "
            "s AS (SELECT doc_id, n_chars, CAST(floor(ln(hh::DOUBLE / 1152921504606846976) "
            "  / greatest(n_chars, 1)::DOUBLE * 1e6 + 0.5) AS BIGINT) AS s FROM h) "
            "SELECT doc_id, n_chars, s FROM s ORDER BY s DESC, doc_id ASC LIMIT 100"
        ),
        "events_active_users": (
            "SELECT epoch_us(ts) // 3600000000 AS win, "
            "count(DISTINCT user_id)::BIGINT AS n_users FROM events GROUP BY win"
        ),
        "events_funnel": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "v AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
            "  WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "  JOIN v ON v.user_id = e.user_id "
            "  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "  JOIN c ON c.user_id = e.user_id "
            "  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t GROUP BY e.user_id) "
            "SELECT u.user_id, "
            "(CASE WHEN p.t IS NOT NULL THEN 3 WHEN c.t IS NOT NULL THEN 2 "
            "  WHEN v.t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS funnel_stage, "
            "coalesce(v.t, -1)::BIGINT AS t_view, "
            "coalesce(c.t, -1)::BIGINT AS t_click, "
            "coalesce(p.t, -1)::BIGINT AS t_purchase "
            "FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) "
            "LEFT JOIN p USING (user_id)"
        ),
        "cohort_retention": (
            "WITH s AS (SELECT user_id, "
            "  min(epoch_us(ts)) // 604800000000 AS cw FROM events "
            "  WHERE event_type = 'signup' GROUP BY user_id), "
            "a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w "
            "  FROM events) "
            "SELECT s.cw AS cohort_week, (a.w - s.cw)::BIGINT AS week_offset, "
            "count(*)::BIGINT AS n_users "
            "FROM a JOIN s USING (user_id) WHERE a.w >= s.cw GROUP BY 1, 2"
        ),
        "events_out_of_order": (
            "WITH o AS (SELECT user_id, epoch_us(ts) AS t, "
            "  max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id "
            "    ROWS UNBOUNDED PRECEDING) AS cm FROM events) "
            "SELECT user_id, count(*)::BIGINT AS n_events, "
            "sum(CASE WHEN cm > t THEN 1 ELSE 0 END)::BIGINT AS n_late, "
            "max(cm - t)::BIGINT AS max_disorder_us "
            "FROM o GROUP BY user_id"
        ),
        "session_length_hist": (
            "WITH o AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
            "  lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "    ORDER BY epoch_us(ts), event_id) AS pt FROM events), "
            "s AS (SELECT user_id, "
            "  sum(CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END) "
            "  OVER (PARTITION BY user_id ORDER BY t, event_id "
            "    ROWS UNBOUNDED PRECEDING) AS sess FROM o), "
            "c AS (SELECT user_id, sess, count(*)::BIGINT AS n_events "
            "  FROM s GROUP BY user_id, sess) "
            "SELECT n_events, count(*)::BIGINT AS n_sessions "
            "FROM c GROUP BY n_events"
        ),
        "events_new_users": (
            "WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t0 "
            "FROM events GROUP BY user_id) "
            "SELECT t0 // 3600000000 AS win, count(*)::BIGINT AS n_new_users "
            "FROM f GROUP BY win"
        ),
        "events_running_total": (
            "SELECT event_id, user_id, "
            "sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts), event_id "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS running_cents "
            "FROM events"
        ),
        "event_transitions": (
            "WITH o AS (SELECT event_type, "
            "  lag(event_type) OVER (PARTITION BY user_id "
            "    ORDER BY epoch_us(ts), event_id) AS prev_type "
            "  FROM events) "
            "SELECT prev_type, event_type, count(*)::BIGINT AS transitions "
            "FROM o WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
        ),
        "events_asof_prev": (
            "WITH o AS (SELECT event_id, epoch_us(ts) AS t, "
            "  lag(event_id, 1, -1) OVER w AS prev_event_id, "
            "  lag(epoch_us(ts)) OVER w AS pt "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) "
            "SELECT event_id, prev_event_id, "
            "coalesce(t - pt, -1)::BIGINT AS gap_us FROM o"
        ),
        "events_asof_enrich": (
            "WITH o AS (SELECT event_id, event_type, epoch_us(ts) AS t, "
            "last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) "
            "OVER w AS rid, "
            "last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS) "
            "OVER w AS rt "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT event_id, coalesce(rid, -1)::BIGINT AS ref_event_id, "
            "coalesce(t - rt, -1)::BIGINT AS ref_gap_us FROM o "
            "WHERE event_type = 'purchase'"
        ),
        "events_sessionize": (
            "WITH o AS (SELECT user_id, epoch_us(ts) AS t, "
            "  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pt "
            "  FROM events) "
            "SELECT user_id, sum(CASE WHEN pt IS NULL OR t - pt > 1800000000 "
            "THEN 1 ELSE 0 END)::BIGINT AS n_sessions FROM o GROUP BY user_id"
        ),
        "training_shuffle": (
            "SELECT doc_id, (row_number() OVER (ORDER BY "
            "('0x' || substr(md5(concat(42, ':', doc_id)), 1, 15))::BIGINT, doc_id) "
            "- 1)::BIGINT AS pos FROM documents"
        ),
        "pack_sequences": (
            "WITH t AS (SELECT doc_id, "
            "len(regexp_extract_all(coalesce(text,''), '\\S+'))::BIGINT AS n_tokens "
            "FROM documents), "
            "s AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER "
            "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT "
            "AS cp FROM t) "
            "SELECT doc_id, n_tokens, (cp // 2048)::BIGINT AS pack_id, "
            "(cp % 2048)::BIGINT AS pack_offset FROM s"
        ),
        "length_quantiles": (
            "WITH v AS (SELECT quantile_disc(n_chars, [0.5, 0.9, 0.99]) AS l "
            "FROM documents) "
            "SELECT round(q, 6) AS q, v::BIGINT AS value FROM "
            "(SELECT unnest([0.5, 0.9, 0.99]) AS q, unnest((SELECT l FROM v)) AS v)"
        ),
        "ntile_deciles": (
            "SELECT doc_id, ntile(10) OVER (ORDER BY n_chars, doc_id)::BIGINT "
            "AS tile FROM documents"
        ),
        "scrub_pii": (
            "WITH p AS (SELECT doc_id, coalesce(text, '') "
            "|| CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id "
            "|| '@example.com now' ELSE '' END "
            "|| CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309 today' "
            "ELSE '' END AS t FROM documents), "
            "e AS (SELECT doc_id, "
            f"len(regexp_extract_all(t, '{_EMAIL_RE}'))::BIGINT AS n_emails, "
            f"regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t2 FROM p) "
            "SELECT doc_id, "
            f"regexp_replace(t2, '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text, "
            "n_emails, "
            f"len(regexp_extract_all(t2, '{_PHONE_RE}'))::BIGINT AS n_phones FROM e"
        ),
        "contamination_check": (
            "WITH toks AS (SELECT doc_id, "
            "  regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents), "
            "gr AS MATERIALIZED ("
            "  SELECT doc_id, unnest(list_distinct("
            "    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "         ELSE list_transform(range(1, len(w) - 1), "
            "              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS g "
            "  FROM toks WHERE len(w) > 0), "
            "tg AS (SELECT DISTINCT g FROM gr WHERE doc_id % 20 = 0) "
            "SELECT gr.doc_id, count(*)::BIGINT AS n_shared "
            "FROM gr JOIN tg USING (g) WHERE gr.doc_id % 20 <> 0 "
            "GROUP BY gr.doc_id"
        ),
        "top_bigrams": (
            "WITH toks AS (SELECT regexp_extract_all(coalesce(text, ''), '\\S+') AS w "
            "FROM documents), "
            "u AS (SELECT w, unnest(range(1, len(w))) AS i FROM toks) "
            "SELECT w[i] || ' ' || w[i+1] AS bigram, count(*)::BIGINT AS n "
            "FROM u GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 30"
        ),
        "pmi_collocations": (
            "WITH toks AS (SELECT doc_id, "
            "  regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents), "
            "u AS (SELECT w[i] AS w1, w[i+1] AS w2, w[i] || ' ' || w[i+1] AS bg "
            "  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks) q), "
            "c2 AS (SELECT bg, any_value(w1) AS w1, any_value(w2) AS w2, "
            "  count(*)::BIGINT AS n FROM u GROUP BY bg), "
            "l AS (SELECT w1, sum(n)::BIGINT AS c1l FROM c2 GROUP BY w1), "
            "r AS (SELECT w2, sum(n)::BIGINT AS c1r FROM c2 GROUP BY w2), "
            "t AS (SELECT sum(n)::DOUBLE AS tt FROM c2) "
            "SELECT c2.bg AS bigram, c2.n AS n, "
            "floor(ln((c2.n::DOUBLE * t.tt) / (l.c1l::DOUBLE * r.c1r::DOUBLE)) "
            "  * 1e6 + 0.5) / 1e6 AS pmi "
            "FROM c2 JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t "
            "WHERE c2.n >= 5 ORDER BY pmi DESC, bigram ASC LIMIT 30"
        ),
        "length_rank_by_source": (
            "WITH l AS (SELECT doc_id, source, "
            "  length(coalesce(text, ''))::BIGINT AS L FROM documents) "
            "SELECT doc_id, source, "
            "floor(percent_rank() OVER (PARTITION BY source ORDER BY L) "
            "* 1e6 + 0.5) / 1e6 AS pct FROM l"
        ),
        "events_gap_hist": (
            "WITH o AS (SELECT user_id, epoch_us(ts) AS t, "
            "  lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "    ORDER BY epoch_us(ts), event_id) AS pt FROM events), "
            "g AS (SELECT t - pt AS gap FROM o WHERE pt IS NOT NULL) "
            "SELECT (CASE WHEN gap > 0 THEN "
            "CAST(floor(ln(gap::DOUBLE) / ln(2.0)) AS BIGINT) ELSE -1 END) AS bucket, "
            "count(*)::BIGINT AS n_gaps FROM g GROUP BY bucket"
        ),
        "events_first_touch": (
            "WITH r AS (SELECT event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn "
            "FROM events) "
            "SELECT event_type, count(*)::BIGINT AS n_users "
            "FROM r WHERE rn = 1 GROUP BY event_type"
        ),
        "token_length_hist": (
            "WITH tk AS (SELECT unnest(regexp_extract_all(coalesce(text, ''), "
            "'\\S+')) AS tok FROM documents) "
            "SELECT length(tok)::BIGINT AS token_len, count(*)::BIGINT AS n_tokens "
            "FROM tk GROUP BY token_len"
        ),
        # NOTE: \\w/\\s are RE2-ASCII in DuckDB vs unicode in Python —
        # exact on this ASCII fixture corpus (the doc_quality caveat)
        "charset_profile": (
            "WITH s AS (SELECT coalesce(text, '') AS t FROM documents), "
            "a AS (SELECT sum(length(t))::BIGINT AS n, "
            "  sum(len(regexp_extract_all(t, '[\\x00-\\x7F]')))::BIGINT AS a, "
            "  sum(len(regexp_extract_all(t, '[A-Za-z]')))::BIGINT AS l, "
            "  sum(len(regexp_extract_all(t, '[0-9]')))::BIGINT AS d, "
            "  sum(len(regexp_extract_all(t, '\\s')))::BIGINT AS sp, "
            "  sum(len(regexp_extract_all(t, '[^\\w\\s]')))::BIGINT AS p FROM s) "
            "SELECT n AS n_chars, "
            "floor(a::DOUBLE / greatest(n, 1) * 1e6 + 0.5) / 1e6 AS ascii_ratio, "
            "floor(l::DOUBLE / greatest(n, 1) * 1e6 + 0.5) / 1e6 AS letter_ratio, "
            "floor(d::DOUBLE / greatest(n, 1) * 1e6 + 0.5) / 1e6 AS digit_ratio, "
            "floor(sp::DOUBLE / greatest(n, 1) * 1e6 + 0.5) / 1e6 AS space_ratio, "
            "floor(p::DOUBLE / greatest(n, 1) * 1e6 + 0.5) / 1e6 AS punct_ratio "
            "FROM a"
        ),
        "doc_unigram_xent": (
            "WITH tk AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(coalesce(text,''), '\\S+')) AS tok "
            "  FROM documents), "
            "c AS (SELECT tok, count(*)::BIGINT AS c FROM tk GROUP BY tok), "
            "tt AS (SELECT count(*)::DOUBLE AS T FROM tk), "
            "t AS (SELECT tk.doc_id, "
            "  floor(ln(tt.T / c.c::DOUBLE) * 1e6 + 0.5)::BIGINT AS t "
            "  FROM tk JOIN c USING (tok) CROSS JOIN tt) "
            "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "floor(sum(t)::DOUBLE / count(*) + 0.5) / 1e6 AS xent "
            "FROM t GROUP BY doc_id"
        ),
        "bigram_surprisal": (
            "WITH toks AS (SELECT doc_id, "
            "  regexp_extract_all(coalesce(text,''), '\\S+') AS w FROM documents), "
            "u AS (SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bg "
            "  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks) q), "
            "c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM u GROUP BY bg), "
            "c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM u GROUP BY w1), "
            "t AS (SELECT u.doc_id, "
            "  floor(ln(c1.c1::DOUBLE / c2.c2::DOUBLE) * 1e6 + 0.5)::BIGINT AS t "
            "  FROM u JOIN c2 USING (bg) JOIN c1 USING (w1)) "
            "SELECT doc_id, count(*)::BIGINT AS n_bigrams, "
            "floor(sum(t)::DOUBLE / count(*) + 0.5) / 1e6 AS surprisal "
            "FROM t GROUP BY doc_id"
        ),
        "top_docs_per_source": (
            "WITH r AS (SELECT source, n_chars, doc_id, "
            "row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rnk FROM documents) "
            "SELECT source, n_chars, doc_id, rnk FROM r WHERE rnk <= 3"
        ),
        "kmeans_clusters": (
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            "c0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid, v "
            "  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)), "
            "a1 AS (SELECT e.vec_id, e.v, (SELECT c.cid FROM c0 c "
            "  ORDER BY list_distance(e.v, c.v) ASC, c.cid ASC LIMIT 1) AS cl FROM e), "
            "u AS (SELECT a1.cl, g.ord, a1.v[g.ord] AS val "
            "  FROM a1, (SELECT unnest(range(1, 65))::BIGINT AS ord) g), "
            "m2 AS (SELECT cl AS cid, list(mv ORDER BY ord) AS v FROM "
            "  (SELECT cl, ord, avg(val) AS mv FROM u GROUP BY cl, ord) GROUP BY cl), "
            "c1 AS (SELECT c0.cid, coalesce(m2.v, c0.v) AS v "
            "  FROM c0 LEFT JOIN m2 USING (cid)) "
            "SELECT e.vec_id, (SELECT c.cid FROM c1 c "
            "ORDER BY list_distance(e.v, c.v) ASC, c.cid ASC LIMIT 1) AS cluster FROM e"
        ),
        "source_stats": (
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "sum(len(regexp_extract_all(coalesce(text, ''), '\\S+')))::BIGINT "
            "AS total_tokens, "
            "round(avg(n_chars), 6) AS avg_chars FROM documents GROUP BY source"
        ),
    }
    # the sink round-trip must reproduce corpus_prep exactly
    out["prep_sink_roundtrip"] = out["corpus_prep"]
    return out
