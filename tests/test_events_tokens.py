"""Events windowing + corpus token stats vs in-memory brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.events import (
    US_PER_HOUR,
    hopping_counts,
    windowed_counts,
)
from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import top_tokens


def _events_table(n=500, seed=3):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2025-06-01T00:00:00", "us")
    ts = base + rng.randint(0, 48 * 3600, size=n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.randint(0, 20, n).astype(np.int64)),
            "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
            "ts": pa.array(ts),
            "value": pa.array(rng.rand(n)),
        }
    )


def test_hopping_counts_brute():
    tab = _events_table()
    ds = rd.from_arrow(tab).repartition(4)
    out = hopping_counts(ds).to_pandas()
    df = tab.to_pandas()
    t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    base = t // US_PER_HOUR
    rows = []
    for k in (0, 1):
        rows.append(
            pd.DataFrame(
                {"event_type": df["event_type"], "win_start": base - k, "value": df["value"]}
            )
        )
    brute = (
        pd.concat(rows)
        .groupby(["event_type", "win_start"], as_index=False)
        .agg(n=("value", "size"), sum_value=("value", "sum"))
    )
    brute["sum_value"] = np.round(brute["sum_value"], 6)
    got = out.sort_values(["event_type", "win_start"]).reset_index(drop=True)
    want = brute.sort_values(["event_type", "win_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "win_start", "n", "sum_value"]],
        want[["event_type", "win_start", "n", "sum_value"]],
        check_dtype=False,
    )
    # every event is in exactly window_us/hop_us windows
    assert out["n"].sum() == 2 * len(df)


def test_hopping_vs_tumbling_consistency():
    tab = _events_table()
    ds = rd.from_arrow(tab).repartition(3)
    hop = hopping_counts(ds, window_us=US_PER_HOUR, hop_us=US_PER_HOUR).to_pandas()
    tum = windowed_counts(ds, window_us=US_PER_HOUR).to_pandas()
    # window == hop -> hopping degenerates to tumbling
    hop = hop.rename(columns={"win_start": "win"}).sort_values(
        ["event_type", "win"]
    ).reset_index(drop=True)
    tum = tum.sort_values(["event_type", "win"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(hop, tum, check_dtype=False)


def test_top_tokens_brute():
    texts = ["b a a", "c b a", "", "d d d d b", None, "a"]
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)
    out = top_tokens(ds, k=3).to_pandas()
    # counts: a=4, b=3, d=4, c=1 -> top3 by (n desc, token asc): a(4), d(4), b(3)
    assert list(out["token"]) == ["a", "d", "b"]
    assert list(out["n"]) == [4, 4, 3]


def test_asof_prev_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.events import asof_prev

    tab = _events_table(n=300, seed=5)
    ds = rd.from_arrow(tab).repartition(4)
    out = asof_prev(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df = df.sort_values(["user_id", "t", "event_id"])
    df["prev"] = df.groupby("user_id")["event_id"].shift(1).fillna(-1).astype(np.int64)
    df["gap"] = df.groupby("user_id")["t"].diff().fillna(-1).astype(np.int64)
    want = df.sort_values("event_id")
    assert np.array_equal(out["prev_event_id"].to_numpy(), want["prev"].to_numpy())
    assert np.array_equal(out["gap_us"].to_numpy(), want["gap"].to_numpy())


def test_event_transitions_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.events import event_transitions

    tab = _events_table(n=400, seed=9)
    ds = rd.from_arrow(tab).repartition(4)
    out = (
        event_transitions(ds)
        .to_pandas()
        .sort_values(["prev_type", "event_type"])
        .reset_index(drop=True)
    )
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df = df.sort_values(["user_id", "t", "event_id"])
    df["prev"] = df.groupby("user_id")["event_type"].shift(1)
    want = (
        df.dropna(subset=["prev"])
        .groupby(["prev", "event_type"])
        .size()
        .reset_index(name="transitions")
        .rename(columns={"prev": "prev_type"})
        .sort_values(["prev_type", "event_type"])
        .reset_index(drop=True)
    )
    assert np.array_equal(out["transitions"].to_numpy(), want["transitions"].to_numpy())
    assert list(out["prev_type"]) == list(want["prev_type"])
    assert list(out["event_type"]) == list(want["event_type"])
    # every transition has a same-user predecessor: totals = n - n_users
    n_users = df["user_id"].nunique()
    assert out["transitions"].sum() == len(df) - n_users


def test_asof_enrich_no_prior_ref(ray_session):
    import pandas as pd

    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import asof_enrich

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 8, 8],
            "event_type": ["purchase", "click", "purchase", "click", "purchase"],
            "ts": pd.to_datetime(
                ["2025-01-01 10:00", "2025-01-01 10:05", "2025-01-01 10:10",
                 "2025-01-01 09:00", "2025-01-01 09:30"]
            ),
        }
    )
    out = (
        asof_enrich(rd.from_pandas(ev), target_type="purchase", ref_type="click")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1: no prior click -> -1; event 3: click id 2, gap 5 min;
    # event 5 (user 8): click id 4, gap 30 min -- user 7's clicks invisible
    assert list(out["event_id"]) == [1, 3, 5]
    assert list(out["ref_event_id"]) == [-1, 2, 4]
    assert list(out["ref_gap_us"]) == [-1, 300000000, 1800000000]


def test_tfidf_top_terms_brute():
    """Engine tf-idf == brute-force numpy tf-idf on a hand corpus,
    including the rank tie-break (score desc, token asc) and empty/null
    text handling."""
    import math

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        tfidf_top_terms,
    )

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "cherry date date apple",
        "",  # no tokens -> absent from output
        None,
        "elephant elephant elephant",
    ]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    out = (
        tfidf_top_terms(docs, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )

    n = float(len(texts))
    tf: dict[tuple[int, str], int] = {}
    df: dict[str, set] = {}
    for i, t in enumerate(texts):
        for tok in (t or "").split():
            tf[(i, tok)] = tf.get((i, tok), 0) + 1
            df.setdefault(tok, set()).add(i)
    rows = []
    for (i, tok), c in tf.items():
        rows.append((i, tok, round(c * math.log(n / len(df[tok])), 6)))
    want = []
    for i in sorted({r[0] for r in rows}):
        mine = sorted(
            [r for r in rows if r[0] == i], key=lambda r: (-r[2], r[1])
        )[:2]
        want.extend((i, t, s, j + 1) for j, (_, t, s) in enumerate(mine))
    want_df = pd.DataFrame(want, columns=["doc_id", "token", "score", "rnk"])
    assert out[["doc_id", "token", "score", "rnk"]].astype(
        {"rnk": np.int64}
    ).equals(want_df.astype({"doc_id": np.int64, "rnk": np.int64}))


# ---------------------------------------------------------------------------
# bigram_surprisal
# ---------------------------------------------------------------------------


def _surprisal_brute(texts):
    import math

    toks = [t.split() for t in texts]
    c2: dict = {}
    c1: dict = {}
    for ws in toks:
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    out = {}
    for i, ws in enumerate(toks):
        terms = [
            math.floor(math.log(float(c1[a]) / float(c2[(a, b)])) * 1e6 + 0.5)
            for a, b in zip(ws, ws[1:])
        ]
        if terms:
            out[i] = (len(terms), math.floor(sum(terms) / len(terms) + 0.5) / 1e6)
    return out


def test_bigram_surprisal_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        bigram_surprisal,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "the dog sat on the mat",
        "one",  # no bigrams -> absent
        "",
        "repeat repeat repeat repeat",
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    got = {
        int(r.doc_id): (int(r.n_bigrams), float(r.surprisal))
        for r in bigram_surprisal(docs).to_pandas().itertuples()
    }
    assert got == _surprisal_brute(texts)
    # scale fallback (hash joins + doc groupby) must agree exactly
    got_j = {
        int(r.doc_id): (int(r.n_bigrams), float(r.surprisal))
        for r in bigram_surprisal(docs, force_join=True).to_pandas().itertuples()
    }
    assert got_j == got


def test_doc_unigram_xent_brute(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        doc_unigram_xent,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "rare tokens zyx wvu",
        "",  # no tokens -> absent
        "the the the",
    ]
    toks = [t.split() for t in texts]
    c: dict = {}
    for ws in toks:
        for w in ws:
            c[w] = c.get(w, 0) + 1
    total = float(sum(c.values()))
    want = {}
    for i, ws in enumerate(toks):
        terms = [math.floor(math.log(total / float(c[w])) * 1e6 + 0.5) for w in ws]
        if terms:
            want[i] = (len(terms), math.floor(sum(terms) / len(terms) + 0.5) / 1e6)

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(3)
    got = {
        int(r.doc_id): (int(r.n_tokens), float(r.xent))
        for r in doc_unigram_xent(docs).to_pandas().itertuples()
    }
    assert got == want
    # the common-word doc must score strictly lower than the rare-token doc
    assert got[4][1] < got[2][1]
    # scale fallback (hash join + doc groupby) must agree exactly
    got_j = {
        int(r.doc_id): (int(r.n_tokens), float(r.xent))
        for r in doc_unigram_xent(docs, force_join=True).to_pandas().itertuples()
    }
    assert got_j == got


# ---------------------------------------------------------------------------
# funnel / cohort retention
# ---------------------------------------------------------------------------


def _mk_events(rows):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "t"])
    df["ts"] = pd.to_datetime(df.pop("t"), unit="us")
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    return rd.from_pandas(df)


def test_funnel_requires_order(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import funnel_stages

    ev = _mk_events(
        [
            # user 1: full ordered funnel
            (0, 1, "view", 100), (1, 1, "click", 200), (2, 1, "purchase", 300),
            # user 2: purchase BEFORE click -> stage stops at 2
            (3, 2, "view", 100), (4, 2, "purchase", 150), (5, 2, "click", 200),
            # user 3: click only, no view -> stage 0
            (6, 3, "click", 100),
            # user 4: view at same ts as click -> strict > fails, stage 1
            (7, 4, "view", 500), (8, 4, "click", 500),
            # user 5: second view opens no new chain (first-view contract)
            (9, 5, "click", 50), (10, 5, "view", 100), (11, 5, "click", 80),
        ]
    )
    out = funnel_stages(ev).to_pandas().set_index("user_id").sort_index()
    assert list(out["funnel_stage"]) == [3, 2, 0, 1, 1]
    assert out.loc[1, "t_purchase"] == 300
    assert out.loc[2, "t_click"] == 200 and out.loc[2, "t_purchase"] == -1
    assert out.loc[4, "t_click"] == -1


def test_cohort_retention_triangle(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import cohort_retention

    WK = 7 * 24 * 3600 * 10**6
    ev = _mk_events(
        [
            (0, 1, "signup", 0), (1, 1, "click", 1 * WK + 5), (2, 1, "view", 2 * WK + 5),
            (3, 2, "signup", 10), (4, 2, "click", 1 * WK + 6),
            # user 3 active BEFORE signup: pre-signup week excluded
            (5, 3, "view", 10), (6, 3, "signup", 1 * WK + 1), (7, 3, "view", 2 * WK + 2),
            # user 4 never signs up: absent
            (8, 4, "click", 20),
        ]
    )
    out = cohort_retention(ev).to_pandas()
    got = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {(0, 0): 2, (0, 1): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


def test_pmi_collocations_brute(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        pmi_collocations,
    )

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(12)] + ["york", "new"]
    texts = []
    for _ in range(60):
        toks = list(rng.choice(vocab[:12], size=rng.randint(3, 12)))
        if rng.rand() < 0.5:
            toks += ["new", "york"]  # planted collocation
        texts.append(" ".join(toks))
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    out = pmi_collocations(docs, k=10, min_count=3).to_pandas()

    # brute force
    c2, c1l, c1r = {}, {}, {}
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1l[a] = c1l.get(a, 0) + 1
            c1r[b] = c1r.get(b, 0) + 1
    T = float(sum(c2.values()))
    rows = [
        (
            f"{a} {b}",
            n,
            math.floor(math.log((n * T) / (float(c1l[a]) * float(c1r[b]))) * 1e6 + 0.5)
            / 1e6,
        )
        for (a, b), n in c2.items()
        if n >= 3
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    exp = pd.DataFrame(rows[:10], columns=["bigram", "n", "pmi"])
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.astype({"n": got["n"].dtype}), check_like=True
    )
    assert got.loc[0, "bigram"] == "new york"


def test_window_join_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import window_join

    rng = np.random.RandomState(9)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase"], n),
            "value": np.round(rng.uniform(0, 50, n), 2),
            "t": rng.randint(0, 10**10, n),
        }
    )
    df["ts"] = pd.to_datetime(df["t"], unit="us")
    ev = rd.from_pandas(df.drop(columns=["t"]).assign(ts=df["ts"]))
    W = 3_600_000_000
    out = window_join(ev, window_us=W).to_pandas()
    got = {
        int(r.event_id): (int(r.n_prior), int(r.prior_value_cents))
        for r in out.itertuples()
    }

    t = df["t"].to_numpy()  # original microsecond ints (ts is ns-based)
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    exp = {}
    for i in range(n):
        if df.loc[i, "event_type"] != "purchase":
            continue
        m = (
            (df["user_id"].to_numpy() == df.loc[i, "user_id"])
            & (t < t[i])
            & (t >= t[i] - W)
        )
        exp[int(df.loc[i, "event_id"])] = (int(m.sum()), int(cents[m].sum()))
    assert got == exp


def test_two_hop_counts_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.stages.graph import two_hop_counts

    rng = np.random.RandomState(4)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 25, size=(60, 2)) if a != b}
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    e = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]).astype(np.int64))
    out = {
        int(r.vertex): int(r.n_two_hop)
        for r in two_hop_counts(e).to_pandas().itertuples()
    }
    adj = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
    exp = {}
    for v, ns in adj.items():
        reach = set(ns)
        for u in ns:
            reach |= adj[u]
        reach.discard(v)
        exp[v] = len(reach)
    assert out == exp


def test_doc_entropy_brute(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import doc_entropy

    texts = ["a a a a", "a b c d", "x x y", "", "solo"]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    out = {
        int(r.doc_id): (int(r.n_tokens), float(r.entropy))
        for r in doc_entropy(docs).to_pandas().itertuples()
    }
    exp = {}
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            continue
        tot = len(ws)
        s = 0
        for c in pd.Series(ws).value_counts():
            s += int(c) * math.floor(math.log(tot / c) * 1e6 + 0.5)
        exp[i] = (tot, math.floor(s / tot + 0.5) / 1e6)
    assert out == exp
    assert out[0][1] == 0.0  # all-same tokens -> zero entropy


def test_avg_neighbor_degree_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.stages.graph import avg_neighbor_degree

    # star: center 0 with leaves 1..4; center's neighbors all deg 1,
    # each leaf's sole neighbor has deg 4
    pairs = [(0, i) for i in range(1, 5)]
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    e = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]).astype(np.int64))
    out = {
        int(r.vertex): float(r.avg_ndeg)
        for r in avg_neighbor_degree(e).to_pandas().itertuples()
    }
    assert out == {0: 1.0, 1: 4.0, 2: 4.0, 3: 4.0, 4: 4.0}


def test_active_users_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import active_users

    tab = _events_table(n=400, seed=8)
    ds = rd.from_arrow(tab).repartition(5)
    out = {
        int(r.win): int(r.n_users) for r in active_users(ds).to_pandas().itertuples()
    }
    df = tab.to_pandas()
    t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    win = t // US_PER_HOUR
    exp = (
        pd.DataFrame({"win": win, "u": df["user_id"]})
        .drop_duplicates()
        .groupby("win")["u"]
        .size()
        .to_dict()
    )
    assert out == {int(k): int(v) for k, v in exp.items()}


def test_winsorized_mean_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        winsorized_value_mean,
    )

    rng = np.random.RandomState(6)
    n = 500
    vals = np.round(rng.uniform(0, 40, n), 2)
    vals[:5] = 9999.99  # outliers that winsorization must tame
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": ["a"] * (n // 2) + ["b"] * (n - n // 2),
            "value": vals,
            "ts": pd.to_datetime(np.arange(n, dtype=np.int64), unit="us"),
        }
    )
    out = winsorized_value_mean(rd.from_pandas(df)).to_pandas().set_index("event_type")

    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    for et, sel in (("a", slice(0, n // 2)), ("b", slice(n // 2, n))):
        c = np.sort(cents[sel])
        m = len(c)
        lo = c[max(0, int(np.ceil(0.05 * m)) - 1)]
        hi = c[max(0, int(np.ceil(0.95 * m)) - 1)]
        mean = np.floor(np.clip(c, lo, hi).sum() / m * 1e6 + 0.5) / 1e6
        assert out.loc[et, "mean_cents"] == mean
        assert out.loc[et, "n"] == m
    # outlier damping sanity: winsorized mean far below raw mean for 'a'
    assert out.loc["a", "mean_cents"] < cents[: n // 2].mean()


def test_session_length_hist_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        session_length_hist,
    )

    tab = _events_table(n=500, seed=15)
    ds = rd.from_arrow(tab).repartition(4)
    out = (
        session_length_hist(ds, gap_us=1800 * 10**6)
        .to_pandas()
        .sort_values("n_events")
        .reset_index(drop=True)
    )
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df = df.sort_values(["user_id", "t", "event_id"])
    gaps = df.groupby("user_id")["t"].diff()
    df["brk"] = gaps.isna() | (gaps > 1800 * 10**6)
    df["sess"] = df["brk"].cumsum()
    sizes = df.groupby("sess").size()
    want = (
        sizes.value_counts()
        .rename_axis("n_events")
        .reset_index(name="n_sessions")
        .sort_values("n_events")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["n_events"].to_numpy(), want["n_events"].to_numpy())
    assert np.array_equal(
        out["n_sessions"].to_numpy(), want["n_sessions"].to_numpy()
    )
    # total events conserved across the histogram
    assert (out["n_events"] * out["n_sessions"]).sum() == len(df)


def test_out_of_order_stats_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        out_of_order_stats,
    )

    tab = _events_table(n=400, seed=21)
    ds = rd.from_arrow(tab).repartition(4)
    out = (
        out_of_order_stats(ds)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df = df.sort_values(["user_id", "event_id"])
    df["cm"] = df.groupby("user_id")["t"].cummax()
    want = (
        df.assign(late=(df["cm"] > df["t"]), d=(df["cm"] - df["t"]))
        .groupby("user_id")
        .agg(
            n_events=("late", "size"),
            n_late=("late", "sum"),
            max_disorder_us=("d", "max"),
        )
        .reset_index()
    )
    assert np.array_equal(out["user_id"].to_numpy(), want["user_id"].to_numpy())
    assert np.array_equal(out["n_events"].to_numpy(), want["n_events"].to_numpy())
    assert np.array_equal(out["n_late"].to_numpy(), want["n_late"].to_numpy())
    assert np.array_equal(
        out["max_disorder_us"].to_numpy(), want["max_disorder_us"].to_numpy()
    )
    # random ts vs sequential ids -> disorder must actually occur
    assert out["n_late"].sum() > 0


def test_token_length_hist_and_charset_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        charset_profile,
        token_length_hist,
    )

    texts = ["ab cde f", "hello world 42", "", None, "x!  yz."]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
    ).repartition(3)

    out = (
        token_length_hist(docs)
        .to_pandas()
        .sort_values("token_len")
        .reset_index(drop=True)
    )
    lens: dict[int, int] = {}
    for t in texts:
        for tok in (t or "").split():
            lens[len(tok)] = lens.get(len(tok), 0) + 1
    assert dict(zip(out["token_len"], out["n_tokens"])) == lens

    prof = charset_profile(docs)
    all_text = "".join(t or "" for t in texts)
    n = len(all_text)
    assert prof["n_chars"].iloc[0] == n
    import re as _re

    def q(x):
        return np.floor(x / n * 1e6 + 0.5) / 1e6

    assert prof["letter_ratio"].iloc[0] == q(len(_re.findall(r"[A-Za-z]", all_text)))
    assert prof["digit_ratio"].iloc[0] == q(len(_re.findall(r"[0-9]", all_text)))
    assert prof["space_ratio"].iloc[0] == q(len(_re.findall(r"\s", all_text)))
    assert prof["punct_ratio"].iloc[0] == q(len(_re.findall(r"[^\w\s]", all_text)))
    assert prof["ascii_ratio"].iloc[0] == 1.0


def test_first_touch_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        first_touch_counts,
    )

    tab = _events_table(n=300, seed=27)
    ds = rd.from_arrow(tab).repartition(4)
    out = (
        first_touch_counts(ds)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    first = df.sort_values(["user_id", "t", "event_id"]).groupby("user_id").head(1)
    want = (
        first.groupby("event_type")
        .size()
        .reset_index(name="n_users")
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert list(out["event_type"]) == list(want["event_type"])
    assert np.array_equal(out["n_users"].to_numpy(), want["n_users"].to_numpy())
    assert out["n_users"].sum() == df["user_id"].nunique()


def test_length_rank_by_source_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        length_rank_by_source,
    )

    rng = np.random.default_rng(63)
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "solo"], n, p=[0.5, 0.495, 0.005]),
            "text": ["x" * int(k) for k in rng.integers(0, 40, n)],
        }
    )
    ds = rd.from_pandas([df.iloc[i::4] for i in range(4)])
    out = length_rank_by_source(ds).to_pandas().set_index("doc_id")
    df["L"] = df["text"].str.len()
    for src, g in df.groupby("source"):
        ls = g["L"].to_numpy()
        nn = len(ls)
        for _, row in g.iterrows():
            if nn > 1:
                want = np.floor((ls < row["L"]).sum() / (nn - 1) * 1e6 + 0.5) / 1e6
            else:
                want = 0.0
            assert out.loc[row["doc_id"], "pct"] == want


def test_zipf_slope_planted():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import zipf_slope

    # plant an exact Zipf corpus: token_r appears floor(1200/r) times
    rng = np.random.default_rng(73)
    toks = []
    for r in range(1, 31):
        toks += [f"tok{r:02d}"] * (1200 // r)
    rng.shuffle(toks)
    # split into docs of ~40 tokens
    texts = [" ".join(toks[i : i + 40]) for i in range(0, len(toks), 40)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
    ).repartition(4)
    out = zipf_slope(docs, k=30)
    assert out["n_terms"].iloc[0] == 30
    slope = out["slope"].iloc[0]
    # true exponent is -1 (floor() quantization of counts bends it a little)
    assert -1.05 < slope < -0.95
    # determinism under repartitioning
    docs2 = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
    ).repartition(7)
    assert zipf_slope(docs2, k=30)["slope"].iloc[0] == slope


def test_gap_hist_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import gap_hist

    tab = _events_table(n=400, seed=33)
    ds = rd.from_arrow(tab).repartition(4)
    out = (
        gap_hist(ds).to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    df = tab.to_pandas()
    df["t"] = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df = df.sort_values(["user_id", "t", "event_id"])
    gaps = df.groupby("user_id")["t"].diff().dropna().astype(np.int64)
    want: dict[int, int] = {}
    for g in gaps:
        b = int(np.floor(np.log(float(g)) / np.log(2.0))) if g > 0 else -1
        want[b] = want.get(b, 0) + 1
    assert dict(zip(out["bucket"], out["n_gaps"])) == want
    # total gaps = events - users
    assert out["n_gaps"].sum() == len(df) - df["user_id"].nunique()


def test_source_similarity_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        source_similarity,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["a", "a", "b", "b", "c", "c"],
            "text": [
                "cat dog bird",
                "dog fish",
                "cat dog",
                "dog horse",
                "zebra",
                "yak zebra",
            ],
        }
    )
    ds = rd.from_pandas([docs.iloc[i::3] for i in range(3)])
    out = (
        source_similarity(ds)
        .to_pandas()
        .set_index(["source_a", "source_b"])
    )
    vocab = {
        s: set(" ".join(g["text"]).split()) for s, g in docs.groupby("source")
    }
    import itertools

    for a, b in itertools.combinations(sorted(vocab), 2):
        i = len(vocab[a] & vocab[b])
        u = len(vocab[a] | vocab[b])
        assert out.loc[(a, b), "n_common"] == i
        assert out.loc[(a, b), "jaccard"] == np.floor(i / u * 1e6 + 0.5) / 1e6
    # disjoint sources score 0
    assert out.loc[("a", "c"), "jaccard"] == 0.0


def test_vocab_uniqueness_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        vocab_uniqueness,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "source": ["a", "a", "b", "c"],
            "text": ["cat dog bird", "dog emu", "cat dog", "zebra cat"],
        }
    )
    ds = rd.from_pandas([docs.iloc[i::2] for i in range(2)])
    out = vocab_uniqueness(ds).to_pandas().set_index("source")
    vocab = {s: set(" ".join(g["text"]).split()) for s, g in docs.groupby("source")}
    for s in vocab:
        others = set().union(*(vocab[o] for o in vocab if o != s))
        uniq = vocab[s] - others
        assert out.loc[s, "n_vocab"] == len(vocab[s])
        assert out.loc[s, "n_unique"] == len(uniq)
        want = np.floor(len(uniq) / len(vocab[s]) * 1e6 + 0.5) / 1e6
        assert out.loc[s, "uniqueness"] == want


def test_hour_of_day_profile_brute():
    import numpy as np
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        hour_of_day_profile,
    )

    tab = _events_table(n=400, seed=39)
    ds = rd.from_arrow(tab).repartition(4)
    out = hour_of_day_profile(ds).to_pandas()
    df = tab.to_pandas()
    t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    df["hour"] = (t // 3_600_000_000) % 24
    want = df.groupby(["event_type", "hour"]).size()
    got = out.set_index(["event_type", "hour"])["n"]
    assert got.sort_index().equals(want.sort_index().astype(np.int64))
    assert out["n"].sum() == len(df)


def test_median_tokens_by_source_brute():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        median_tokens_by_source,
    )

    rng = np.random.default_rng(81)
    n = 250
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b"], n),
            "text": [" ".join(["w"] * int(k)) for k in rng.integers(0, 25, n)],
        }
    )
    ds = rd.from_pandas([df.iloc[i::4] for i in range(4)])
    out = median_tokens_by_source(ds).to_pandas().set_index("source")
    df["k"] = df["text"].str.split().str.len()
    for s, g in df.groupby("source"):
        ks = np.sort(g["k"].to_numpy())
        want = int(ks[(len(ks) + 1) // 2 - 1])  # quantile_disc(0.5)
        assert out.loc[s, "n_docs"] == len(g)
        assert out.loc[s, "median_tokens"] == want


def test_two_hop_local_fastpath_equals_distributed(ray_session, monkeypatch):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.stages import graph
    from pds_hw2_mpi_connected_components_ray.stages.graph import two_hop_counts

    rng = np.random.RandomState(11)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 40, size=(150, 2)) if a != b}
    rows = sorted(pairs | {(b, a) for a, b in pairs})
    e = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]).astype(np.int64))
    local = two_hop_counts(e).to_pandas().sort_values("vertex").reset_index(drop=True)
    monkeypatch.setattr(graph, "_TWO_HOP_LOCAL_EDGE_ROWS", -1)
    dist = two_hop_counts(e).to_pandas().sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)


def test_two_hop_asymmetric_falls_back_to_distributed(ray_session):
    """Regression: the local fast path assumes a symmetric table; a
    DIRECTED input must take the distributed plan (0 reaches {1,2} via
    0->1->2), not the per-run cross product (which would say 1)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.stages.graph import two_hop_counts

    e = rd.from_pandas(
        pd.DataFrame({"src": [0, 1], "dst": [1, 2]}).astype(np.int64)
    )
    out = {
        int(r.vertex): int(r.n_two_hop)
        for r in two_hop_counts(e).to_pandas().itertuples()
    }
    assert out[0] == 2  # {1, 2}
