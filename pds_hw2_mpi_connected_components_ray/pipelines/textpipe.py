"""Text-analysis pipelines over the documents table.

All vectorized pandas/numpy inside map_batches; the language-id stage is
an actor pool (regex compilation + stopword tables once per actor)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ray.data import Dataset

from ..context import exchange_partitions

from ..functions.textstats import (
    _STOPWORDS,
    fingerprint64_series,
    quality_metrics,
    token_counts_series,
)


def doc_stats(docs: Dataset) -> Dataset:
    """(doc_id, n_chars, n_tokens, n_bpeish) -- ANSI-SQL-mirrorable.
    n_tokens = whitespace tokens; n_bpeish = BPE-ish pre-tokens (letter
    runs / digit runs / single symbols, the GPT-2-style pre-tokenizer
    shape -- functions.textstats._BPEISH)."""
    from ..functions.textstats import _BPEISH

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_chars": t.str.len().astype("int64"),
                "n_tokens": token_counts_series(t),
                "n_bpeish": t.str.count(_BPEISH.pattern).astype("int64"),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def doc_quality(docs: Dataset) -> Dataset:
    """doc_id + full quality-metric block (heuristic C4/Gopher-style)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_metrics(batch["text"])
        q.insert(0, "doc_id", batch["doc_id"].to_numpy(dtype=np.int64))
        return q

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


class LangIdStage:
    """Actor-pool language id. Per-actor state built once: the compiled
    word regex, the sorted stopword vocabulary as a pd.Index, and a
    (vocab x langs) membership matrix. Per batch the work is one
    explode + drop_duplicates + indexer lookup + scatter-add -- no
    per-row Python loop (round 2 looped rows; VERDICT minor #5).
    Prediction rule (unchanged): the language with the most DISTINCT
    stopword hits; ties -> lexicographically first code; zero hits ->
    'und'."""

    def __init__(self):
        self.word_re = re.compile(r"[^\W\d_]+", re.U)
        self.codes = sorted(_STOPWORDS)
        vocab = sorted(set().union(*_STOPWORDS.values()))
        self.vocab = pd.Index(vocab)
        self.membership = np.zeros((len(vocab), len(self.codes)), dtype=np.int64)
        for j, code in enumerate(self.codes):
            self.membership[self.vocab.get_indexer(sorted(_STOPWORDS[code])), j] = 1
        self.codes_arr = np.array(self.codes, dtype=object)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        votes = np.zeros((n, len(self.codes)), dtype=np.int64)
        t = batch["text"].fillna("").str.lower().reset_index(drop=True)
        ex = t.str.findall(self.word_re).explode().dropna()
        if len(ex):
            pairs = pd.DataFrame(
                {"r": ex.index.to_numpy(dtype=np.int64), "w": ex.to_numpy()}
            ).drop_duplicates()  # DISTINCT words per row, as before
            pos = self.vocab.get_indexer(pairs["w"])
            hit = pos >= 0
            if hit.any():
                np.add.at(
                    votes, pairs["r"].to_numpy(dtype=np.int64)[hit], self.membership[pos[hit]]
                )
        best = votes.argmax(axis=1)  # first max = sorted-code tiebreak
        preds = np.where(votes.max(axis=1) > 0, self.codes_arr[best], "und")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64), "lang_pred": preds}
        )


def lang_id_stage(docs: Dataset, concurrency=None) -> Dataset:
    # setup (regex compile + stopword matrix) is ~ms: plain tasks with
    # the per-worker memo beat a per-query actor pool (stagepool.py)
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        docs.select_columns(["doc_id", "text"]),
        LangIdStage,
        {},
        concurrency,
        batch_format="pandas",
    )


def _bucketed_str_sum(ds: Dataset, key: str, val: str) -> Dataset:
    """Exact (string key -> SUM(val)) via the token-hash bucketed
    exchange: groups = VOCABULARY entries, so Ray's keyed aggregate
    (~ms per group) is data-proportional and unusable at corpus scale;
    buckets are ~parallelism-many and each reduces with one pandas
    hash groupby."""
    from .events import _bucket_by_key

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, sort=False)[val].sum().reset_index()
        out[val] = out[val].astype(np.int64)
        return out

    return (
        _bucket_by_key(ds, key, [key, val])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_sum, batch_format="pandas")
    )


def top_tokens(docs: Dataset, k: int = 50) -> Dataset:
    """Corpus-wide top-k tokens by frequency: per-batch token counts (a
    combiner -- each batch ships at most its distinct tokens, not its
    token stream) -> groupby-sum -> sort(count desc, token asc) -> limit.
    Deterministic tie-break makes the result oracle-exact."""
    from ray.data.aggregate import Sum

    def explode_count(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split().explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy(dtype=np.int64)}
        )

    agg = _bucketed_str_sum(
        docs.select_columns(["text"]).map_batches(
            explode_count, batch_format="pandas"
        ),
        "token",
        "n",
    )
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def top_bigrams(docs: Dataset, k: int = 30) -> Dataset:
    """Corpus-wide top-k word bigrams (language-model corpus stats).
    Same combiner shape as top_tokens: each batch ships its DISTINCT
    bigram counts; bigrams never cross document boundaries. Bigram
    construction is one numpy pass over the flattened token stream with
    boundary positions masked out — no per-row python loop."""
    from ray.data.aggregate import Sum

    def bigram_count(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        lists = toks.to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    "bigram": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        flat = np.concatenate([np.asarray(x, dtype=object) for x in lists]).astype(str)
        if len(flat) < 2:
            return pd.DataFrame(
                {
                    "bigram": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        starts = np.cumsum(lens)[:-1]  # first token index of docs 1..
        valid = np.ones(len(flat) - 1, dtype=bool)
        # mask cross-document positions; a start of 0 (leading empty
        # docs) has no preceding token, nothing to mask
        bnd = starts[(starts > 0) & (starts <= len(flat) - 1)]
        valid[bnd - 1] = False
        big = np.char.add(np.char.add(flat[:-1], " "), flat[1:])[valid]
        vc = pd.Series(big).value_counts()
        return pd.DataFrame(
            {"bigram": vc.index.astype(str), "n": vc.to_numpy(dtype=np.int64)}
        )

    agg = _bucketed_str_sum(
        docs.select_columns(["text"]).map_batches(
            bigram_count, batch_format="pandas"
        ),
        "bigram",
        "n",
    )
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def tfidf_top_terms(docs: Dataset, k: int = 3) -> Dataset:
    """(doc_id, token, score, rnk): top-k tf-idf terms per document.

    Distributed plan (two corpus passes, both column-pruned to
    (doc_id, text)):
      1. tf -- each Ray row IS a whole document, so per-(doc, token)
         counts are exact within one vectorized pandas groupby per
         batch; no shuffle.
      2. df -- per-batch DISTINCT (doc, token) -> per-token partial doc
         counts (a combiner: each batch ships its vocabulary, not its
         token stream) -> one token-keyed groupby-sum.
      3. tf x df hash-shuffle join on token (both sides can be large:
         tf is corpus-sized, df is vocabulary-sized), then
         score = round(tf * ln(N/df), 6) vectorized.
      4. per-doc top-k via the bucket-per-group window (one keyed
         all-to-all whose fan-in scales with the cluster, not with the
         number of documents).

    Rounding BEFORE ranking keeps the (score desc, token asc) order in
    lockstep with the SQL oracle across numpy/DuckDB ln ulp noise.
    Tokenizer = whitespace split, identical to top_tokens / '\\S+'."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join
    from .window import top_k_per_group

    n_docs = float(docs.count())
    base = docs.select_columns(["doc_id", "text"])

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), lens)
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "token": pd.Series([], dtype=str),
                }
            )
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        return pd.DataFrame({"doc_id": ids, "token": flat})

    def tf_count(batch: pd.DataFrame) -> pd.DataFrame:
        e = _explode(batch)
        g = e.groupby(["doc_id", "token"], sort=False).size()
        out = g.reset_index(name="tf")
        out["tf"] = out["tf"].astype(np.int64)
        return out

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        e = _explode(batch).drop_duplicates(["doc_id", "token"])
        vc = e["token"].value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy(dtype=np.int64)}
        )

    tf = base.map_batches(tf_count, batch_format="pandas")
    df = (
        _bucketed_str_sum(
            base.map_batches(df_partial, batch_format="pandas"), "token", "n"
        )
        .map_batches(
            lambda d: d.rename(columns={"n": "df"}), batch_format="pandas"
        )
        .materialize()
    )
    vocab_n = df.count()

    if vocab_n <= 2_000_000:
        # vocabulary-sized side broadcasts (also sidesteps Ray's
        # empty-aggregate-partition blocks, whose schema-less tables
        # crash pyarrow's join when the key vocabulary is smaller than
        # the partition count — the 31-token synthetic corpus hit this)
        import ray as _ray

        ks, vs = [], []
        for b in df.iter_batches(batch_format="pandas", batch_size=None):
            ks.append(b["token"].to_numpy(dtype=str))
            vs.append(b["df"].to_numpy(dtype=np.int64))
        tkey = np.concatenate(ks) if ks else np.array([], dtype=str)
        tval = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
        o = np.argsort(tkey, kind="stable")
        ref = _ray.put((tkey[o], tval[o]))

        def score_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            bk, bv = _ray.get(ref)
            tok = batch["token"].to_numpy(dtype=str)
            dfv = bv[np.searchsorted(bk, tok)].astype(np.float64)
            s = batch["tf"].to_numpy(dtype=np.float64) * np.log(n_docs / dfv)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                    "token": batch["token"].astype(str),
                    "score": np.round(s, 6),
                }
            )

        scored = tf.map_batches(score_bcast, batch_format="pandas")
    else:
        # huge-vocabulary fallback: token-keyed shuffle join (every
        # partition is occupied at this cardinality)
        joined = hash_join(tf, df, on=("token",))

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            s = batch["tf"].to_numpy(dtype=np.float64) * np.log(
                n_docs / batch["df"].to_numpy(dtype=np.float64)
            )
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                    "token": batch["token"].astype(str),
                    "score": np.round(s, 6),
                }
            )

        scored = joined.map_batches(score, batch_format="pandas")
    return top_k_per_group(
        scored,
        key="doc_id",
        order_cols=["score", "token"],
        descending=[True, False],
        k=k,
        cols=["doc_id", "token", "score"],
    )


def repetition_signals(docs: Dataset) -> Dataset:
    """(doc_id, dup_line_frac, top_bigram_frac): Gopher-style repetition
    quality signals — boilerplate/spam pages repeat themselves, and the
    two cheapest detectors are the fraction of repeated lines and the
    mass of the single most frequent word bigram.

        dup_line_frac   = (lines - distinct_lines) / lines
                          (lines = '\\n' split, so every doc has >= 1)
        top_bigram_frac = max bigram count / total bigrams
                          (0.0 for docs with < 2 tokens)

    One pass, embarrassingly parallel: every Ray row IS a whole
    document, so both signals are exact per batch — no shuffle at all.
    Inside the batch everything is one flat exploded stream (row-id
    repeat + boundary mask, the top_bigrams shape) fed to vectorized
    pandas groupbys — no per-row python loop.

    Rounding: fractions here are RATIONAL, so exact decimal ties like
    1/128 = 0.0078125 are reachable — np.round (half-to-even) and
    DuckDB round() (half-away) would disagree on them. Both sides
    therefore round as floor(x*1e6 + 0.5)/1e6 (identical IEEE ops,
    identical result); tfidf's plain round-6 contract is safe only
    because ln() makes its scores irrational."""

    def _round6(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        text = batch["text"].fillna("")
        nrows = len(batch)

        # --- duplicate-line fraction ---------------------------------
        lines = text.str.split("\n")
        nl = lines.str.len().to_numpy(dtype=np.int64)  # >= 1 always
        lrows = np.repeat(np.arange(nrows), nl)
        lflat = np.concatenate(
            [np.asarray(x, dtype=object) for x in lines.to_numpy()]
        )
        dist = (
            pd.DataFrame({"r": lrows, "l": lflat})
            .drop_duplicates()
            .groupby("r", sort=False)
            .size()
        )
        ndist = np.zeros(nrows, dtype=np.int64)
        ndist[dist.index.to_numpy()] = dist.to_numpy()
        dup_line = _round6((nl - ndist) / nl)

        # --- top-bigram fraction -------------------------------------
        toks = text.str.split()
        tl = toks.str.len().to_numpy(dtype=np.int64)
        tot = np.maximum(tl - 1, 0).astype(np.float64)
        mx = np.zeros(nrows, dtype=np.float64)
        if tl.sum() >= 2:
            tflat = np.concatenate(
                [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
            ).astype(str)
            trows = np.repeat(np.arange(nrows), tl)
            same = trows[1:] == trows[:-1]  # mask cross-document pairs
            if same.any():
                big = np.char.add(np.char.add(tflat[:-1], " "), tflat[1:])[same]
                brows = trows[:-1][same]
                per = (
                    pd.DataFrame({"r": brows, "g": big})
                    .groupby(["r", "g"], sort=False)
                    .size()
                    .groupby(level=0)
                    .max()
                )
                mx[per.index.to_numpy()] = per.to_numpy(dtype=np.float64)
        top_bigram = _round6(
            np.divide(mx, tot, out=np.zeros_like(mx), where=tot > 0)
        )

        return pd.DataFrame(
            {
                "doc_id": ids,
                "dup_line_frac": dup_line,
                "top_bigram_frac": top_bigram,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_fingerprints(docs: Dataset) -> Dataset:
    """(doc_id, fp) stable 63-bit content fingerprint per document."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "fp": fingerprint64_series(batch["text"]),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def lexical_diversity(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_types, ttr): type-token ratio per document
    — the classic lexical-diversity quality signal (machine-generated
    and keyword-stuffed pages sit at the extremes). One shuffle-free
    vectorized pass (row == document); distinct-type counting is the
    exploded (row, token) drop_duplicates trick from repetition_signals.
    ttr = types/tokens rounds half-up (rational-ratio tie contract)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        toks = batch["text"].fillna("").str.split()
        tl = toks.str.len().to_numpy(dtype=np.int64)
        nrows = len(batch)
        ntypes = np.zeros(nrows, dtype=np.int64)
        if tl.sum() > 0:
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
            )
            rows = np.repeat(np.arange(nrows), tl)
            per = (
                pd.DataFrame({"r": rows, "t": flat})
                .drop_duplicates()
                .groupby("r", sort=False)
                .size()
            )
            ntypes[per.index.to_numpy()] = per.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.where(
                tl > 0, np.floor((ntypes / np.maximum(tl, 1)) * 1e6 + 0.5) / 1e6, 0.0
            )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": tl,
                "n_types": ntypes,
                "ttr": ttr,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


_BROADCAST_BIGRAM_VOCAB = 2_000_000


def bigram_surprisal(docs: Dataset, *, force_join: bool = False) -> Dataset:
    """(doc_id, n_bigrams, surprisal): per-document mean bigram
    surprisal −ln P(w2|w1) under the corpus's own MLE bigram model
    (P = c2(w1 w2)/c1(w1), c1 summed over non-final token positions) —
    the classic cheap LM-quality signal: boilerplate and templated
    text scores low, token salad scores high. Docs with <2 tokens have
    no bigrams and are absent.

    Determinism contract: each bigram's term is quantized to integer
    µnats t = floor(ln(c1/c2)·1e6 + 0.5) BEFORE aggregation, so the
    per-doc sum is an exact int64 and summation order cannot shift the
    result (summing raw doubles would diverge from the SQL oracle by
    ulps); the final mean rounds half-up on the µnat scale. ln bit-
    equality across numpy/DuckDB holds because both call the same
    libm on the identical c1/c2 double quotient (the tfidf contract).

    Plan — the duplicate_ngram_stats adaptive shape:
      1. per-batch distinct (doc, bigram, multiplicity) combiner
         (bigrams built in one masked pass over the flattened token
         stream, never crossing doc boundaries — top_bigrams
         semantics);
      2. c2/c1 vocab counts via the bucket-per-group pattern (hash the
         string key into ~parallelism int buckets, ONE small-int keyed
         shuffle each — a direct string groupby pays Ray's string-sort
         aggregate, measured 13s vs ~1s on this corpus shape);
      3. attach: below the broadcast threshold both count tables ship
         once via ray.put and each batch searchsorted-attaches,
         quantizes, and — because row==doc — emits the finished per-doc
         stat in the same pass with NO doc-keyed groupby; above it,
         two hash-shuffle joins + one doc-keyed groupby-sum."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join
    from .events import _bucket_by_key

    base = docs.select_columns(["doc_id", "text"])

    def doc_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "bg": pd.Series([], dtype=str),
                "w1": pd.Series([], dtype=str),
                "m": pd.Series([], dtype="int64"),
            }
        )
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() < 2:
            return empty
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), lens)
        starts = np.cumsum(lens)[:-1]
        valid = np.ones(len(flat) - 1, dtype=bool)
        bnd = starts[(starts > 0) & (starts <= len(flat) - 1)]
        valid[bnd - 1] = False
        if not valid.any():
            return empty
        g = pd.DataFrame(
            {
                "doc_id": ids[:-1][valid],
                "bg": np.char.add(np.char.add(flat[:-1], " "), flat[1:])[valid],
                "w1": flat[:-1][valid],
            }
        )
        out = g.groupby(["doc_id", "bg"], sort=False).agg(
            w1=("w1", "first"), m=("w1", "size")
        )
        out = out.reset_index()
        out["m"] = out["m"].astype(np.int64)
        # rows stay doc-contiguous (groups ordered by first occurrence,
        # and the stream is generated doc by doc) — the broadcast path's
        # run-boundary reduction depends on this
        return out[["doc_id", "bg", "w1", "m"]]

    inst = base.map_batches(doc_bigrams, batch_format="pandas").materialize()

    def _bucket_counts(key: str, alias: str) -> Dataset:
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            s = df.groupby(key, sort=False)["m"].sum()
            return pd.DataFrame(
                {key: s.index.astype(str), alias: s.to_numpy(dtype=np.int64)}
            )

        return (
            _bucket_by_key(inst, key, [key, "m"])
            .groupby("_kb", num_partitions=exchange_partitions())
            .map_groups(per_bucket, batch_format="pandas")
        )

    c2 = _bucket_counts("bg", "c2").materialize()

    if c2.count() <= _BROADCAST_BIGRAM_VOCAB and not force_join:
        import ray

        c1 = _bucket_counts("w1", "c1")

        def _sorted_pair(ds: Dataset, key: str, val: str):
            ks, vs = [], []
            for b in ds.iter_batches(batch_format="pandas", batch_size=None):
                ks.append(b[key].to_numpy(dtype=str))
                vs.append(b[val].to_numpy(dtype=np.int64))
            k = np.concatenate(ks) if ks else np.array([], dtype=str)
            v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
            o = np.argsort(k, kind="stable")
            return k[o], v[o]

        ref = ray.put((_sorted_pair(c2, "bg", "c2"), _sorted_pair(c1, "w1", "c1")))

        def stats(batch: pd.DataFrame) -> pd.DataFrame:
            (bgk, bgv), (w1k, w1v) = ray.get(ref)
            e = doc_bigrams(batch)
            if len(e) == 0:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "n_bigrams": pd.Series([], dtype="int64"),
                        "surprisal": pd.Series([], dtype="float64"),
                    }
                )
            bg = e["bg"].to_numpy(dtype=str)
            w1 = e["w1"].to_numpy(dtype=str)
            cc2 = bgv[np.searchsorted(bgk, bg)].astype(np.float64)
            cc1 = w1v[np.searchsorted(w1k, w1)].astype(np.float64)
            t = np.floor(np.log(cc1 / cc2) * 1e6 + 0.5).astype(np.int64)
            m = e["m"].to_numpy(dtype=np.int64)
            ids = e["doc_id"].to_numpy(dtype=np.int64)
            bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            n = np.add.reduceat(m, bounds)
            s = np.add.reduceat(m * t, bounds).astype(np.float64)
            return pd.DataFrame(
                {
                    "doc_id": ids[bounds],
                    "n_bigrams": n,
                    "surprisal": np.floor(s / n + 0.5) / 1e6,
                }
            )

        return base.map_batches(stats, batch_format="pandas")

    # scale fallback: vocab too large to broadcast — two hash joins
    c1 = _bucket_counts("w1", "c1")
    j = hash_join(hash_join(inst, c2, on=("bg",)), c1, on=("w1",))

    def term(df: pd.DataFrame) -> pd.DataFrame:
        cc1 = df["c1"].to_numpy(dtype=np.float64)
        cc2 = df["c2"].to_numpy(dtype=np.float64)
        t = np.floor(np.log(cc1 / cc2) * 1e6 + 0.5).astype(np.int64)
        m = df["m"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "mt": m * t,
                "m": m,
            }
        )

    from ..stages.skew import bucketed_group_sum

    per = bucketed_group_sum(
        j.map_batches(term, batch_format="pandas"), "doc_id", "mt", extra="m"
    ).map_batches(
        lambda d: d.rename(columns={"m": "n_bigrams"}), batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_bigrams"].to_numpy(dtype=np.int64)
        s = df["mt"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_bigrams": n,
                "surprisal": np.floor(s / n + 0.5) / 1e6,
            }
        )

    return per.map_batches(finalize, batch_format="pandas")


def pmi_collocations(docs: Dataset, *, k: int = 30, min_count: int = 5) -> Dataset:
    """(bigram, n, pmi): top-k collocations by pointwise mutual
    information PMI = ln(c2·T / (c1l·c1r)) over the corpus bigram model
    (c1l/c1r = occurrences as bigram left/right; T = total bigrams;
    bigrams never cross doc boundaries — top_bigrams semantics). The
    min_count floor drops one-off pairings, the classic collocation
    extraction (Church & Hanks).

    Everything after the corpus pass is vocabulary-sized: c2 comes from
    the per-batch bigram-count combiner + one bucketed sum, and c1l/c1r
    are derived FROM the c2 table inside w1-/w2-bucketed passes (a
    bucket holds every row of its key, so the marginal attaches with a
    local groupby-transform — zero joins). PMI rounds half-up at 1e-6
    before the (pmi desc, bigram asc) rank, the tfidf round-before-rank
    contract."""
    from .events import _bucket_by_key

    base = docs.select_columns(["text"])

    def bigram_count(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        empty = pd.DataFrame(
            {
                "bg": pd.Series([], dtype=str),
                "w1": pd.Series([], dtype=str),
                "w2": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if lens.sum() < 2:
            return empty
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        starts = np.cumsum(lens)[:-1]
        valid = np.ones(len(flat) - 1, dtype=bool)
        bnd = starts[(starts > 0) & (starts <= len(flat) - 1)]
        valid[bnd - 1] = False
        if not valid.any():
            return empty
        w1 = flat[:-1][valid]
        w2 = flat[1:][valid]
        big = np.char.add(np.char.add(w1, " "), w2)
        vc = pd.Series(big).value_counts()
        bgs = vc.index.to_numpy(dtype=str)
        halves = np.char.partition(bgs, " ")
        return pd.DataFrame(
            {
                "bg": bgs,
                "w1": halves[:, 0],
                "w2": halves[:, 2],
                "n": vc.to_numpy(dtype=np.int64),
            }
        )

    parts = base.map_batches(bigram_count, batch_format="pandas")

    def bucket_c2(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bg", sort=False).agg(
            w1=("w1", "first"), w2=("w2", "first"), n=("n", "sum")
        )
        g = g.reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g[["bg", "w1", "w2", "n"]]

    c2 = (
        _bucket_by_key(parts, "bg", ["bg", "w1", "w2", "n"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_c2, batch_format="pandas")
        .materialize()
    )
    total = float(c2.sum("n") or 0.0)

    def attach_marginal(col: str, out: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[out] = df.groupby(col, sort=False)["n"].transform("sum").astype(np.int64)
            return df

        return fn

    with_l = (
        _bucket_by_key(c2, "w1", ["bg", "w1", "w2", "n"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(attach_marginal("w1", "c1l"), batch_format="pandas")
    )
    with_lr = (
        _bucket_by_key(with_l, "w2", ["bg", "w2", "n", "c1l"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(attach_marginal("w2", "c1r"), batch_format="pandas")
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] >= min_count]
        n = df["n"].to_numpy(dtype=np.float64)
        c1l = df["c1l"].to_numpy(dtype=np.float64)
        c1r = df["c1r"].to_numpy(dtype=np.float64)
        pmi = np.floor(np.log((n * total) / (c1l * c1r)) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "bigram": df["bg"].astype(str),
                "n": df["n"].to_numpy(dtype=np.int64),
                "pmi": pmi,
            }
        )

    scored = with_lr.map_batches(score, batch_format="pandas")
    return scored.sort(["pmi", "bigram"], descending=[True, False]).limit(k)


def doc_entropy(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, entropy): Shannon entropy (nats) of each
    document's own unigram distribution — low entropy flags repetitive
    or templated text, the complement of lexical_diversity's type-token
    ratio. H = Σ (c/T)·ln(T/c) over the doc's token counts.

    Entirely shuffle-free: row==doc, so one lexsorted run-boundary pass
    per batch computes every count. Each ln term quantizes to integer
    µnats before the weighted sum (the bigram_surprisal order-
    independence contract; here sums are per-doc and local anyway, but
    the quantization is what keeps numpy and DuckDB equal). Docs with
    no tokens are absent."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "entropy": pd.Series([], dtype="float64"),
            }
        )
        if lens.sum() == 0:
            return empty
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), lens)
        order = np.lexsort((flat, ids))
        ids_s, flat_s = ids[order], flat[order]
        # (doc, token) run boundaries -> counts per distinct token
        tb = np.flatnonzero(
            np.r_[True, (ids_s[1:] != ids_s[:-1]) | (flat_s[1:] != flat_s[:-1])]
        )
        cnt = np.diff(np.r_[tb, len(ids_s)]).astype(np.int64)
        did = ids_s[tb]
        # per-doc totals over the distinct-token rows
        db = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        tot = np.add.reduceat(cnt, db)
        tot_row = np.repeat(tot, np.diff(np.r_[db, len(did)]))
        q = np.floor(
            np.log(tot_row.astype(np.float64) / cnt.astype(np.float64)) * 1e6 + 0.5
        ).astype(np.int64)
        s = np.add.reduceat(cnt * q, db)
        return pd.DataFrame(
            {
                "doc_id": did[db],
                "n_tokens": tot.astype(np.int64),
                "entropy": np.floor(s.astype(np.float64) / tot + 0.5) / 1e6,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def corpus_vocab_stats(docs: Dataset) -> Dataset:
    """Single row (n_tokens, n_types, corpus_ttr): corpus-level token
    volume, vocabulary size and type-token ratio (the Heaps-law
    inputs). Distinct tokens count via the bucket-per-group pattern:
    per-batch distinct combiner, one small-int keyed shuffle, exact
    per-bucket distinct (all copies of a token share a bucket);
    totals are scalar per-block partials."""
    import pyarrow as pa

    import ray.data as rd

    from .events import _bucket_by_key

    base = docs.select_columns(["text"])

    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"tok": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")}
            )
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        u, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame({"tok": u, "c": cnt.astype(np.int64)})

    parts = base.map_batches(tok_partial, batch_format="pandas")

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", sort=False)["c"].sum()
        return pd.DataFrame(
            {
                "types": [np.int64(len(g))],
                "tokens": [np.int64(g.to_numpy().sum())],
            }
        )

    agg = (
        _bucket_by_key(parts, "tok", ["tok", "c"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()  # one row per bucket -- scalar-sized
    )
    n_tokens = int(agg["tokens"].sum()) if len(agg) else 0
    n_types = int(agg["types"].sum()) if len(agg) else 0
    ttr = np.floor(n_types / n_tokens * 1e6 + 0.5) / 1e6 if n_tokens else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array([n_tokens], pa.int64()),
                "n_types": pa.array([n_types], pa.int64()),
                "corpus_ttr": pa.array([ttr]),
            }
        )
    )


class QualityClassifierStage:
    """Actor-pool linear quality classifier: score = σ(w·f) over cheap
    text features (log length, log token count, type-token ratio) — the
    batched-model-inference shape (fasttext-style quality filters à la
    CCNet/GPT-3): weights load ONCE per actor in __init__, batches
    stream through __call__ vectorized. The planted weight vector is
    deterministic so the whole stage is oracle-checkable; swap
    `self.w` for real learned weights (or a real model) at deployment.

    Determinism: z evaluates in the same fixed expression order both
    sides (w0 + w1·x1 + w2·x2 + w3·x3, left-to-right doubles), features
    are bit-identical (ln, exact ratios), σ is libm exp; score rounds
    half-up at 1e-6."""

    W = (-2.0, 0.3, 0.4, 1.5)

    def __init__(self):
        self.w = np.array(self.W, dtype=np.float64)  # "model load"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        L = text.str.len().to_numpy(dtype=np.float64)
        toks = text.str.split()
        T = toks.str.len().to_numpy(dtype=np.float64)
        Y = np.array([len(set(x)) for x in toks.to_numpy()], dtype=np.float64)
        x1 = np.log(1.0 + L)
        x2 = np.log(1.0 + T)
        x3 = np.where(T > 0, Y / np.maximum(T, 1.0), 0.0)
        w = self.w
        z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
        score = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "score": score,
                "keep": (score >= 0.5).astype(np.int64),
            }
        )


def quality_classifier(docs: Dataset, concurrency: int | None = None) -> Dataset:
    """(doc_id, score, keep): the QualityClassifierStage actor pool over
    the corpus (stateful stage: setup per actor, not per batch)."""
    kwargs = {"batch_format": "pandas"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    else:
        kwargs["concurrency"] = (1, 8)
    return docs.select_columns(["doc_id", "text"]).map_batches(
        QualityClassifierStage, **kwargs
    )


def lang_confusion(docs: Dataset, concurrency: int | None = None) -> Dataset:
    """(lang, lang_pred, n): confusion matrix of the heuristic language
    id against the table's labeled lang column — the eval loop every
    classifier-based curation stage needs. Row==doc keeps it one
    actor-pool pass (predictions + actuals counted per batch) plus a
    tiny (lang, pred)-keyed groupby."""
    from ray.data.aggregate import Sum

    class _ConfusionStage(LangIdStage):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = super().__call__(batch)
            out["lang"] = batch["lang"].fillna("und").astype(str).to_numpy()
            g = (
                out.groupby(["lang", "lang_pred"], sort=False)
                .size()
                .reset_index(name="n")
            )
            g["n"] = g["n"].astype(np.int64)
            return g

    from ..stages.stagepool import stage_map_batches

    return (
        stage_map_batches(
            docs.select_columns(["doc_id", "text", "lang"]),
            _ConfusionStage,
            {},
            concurrency,
            batch_format="pandas",
        )
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
    )


def doc_unigram_xent(docs: Dataset, *, force_join: bool = False) -> Dataset:
    """(doc_id, n_tokens, xent): per-document mean unigram
    cross-entropy −(1/n)·Σ ln P(w) under the corpus's own MLE unigram
    model P(w) = c(w)/T — the cheapest LM-quality signal of all:
    common-word boilerplate scores low, rare-token salad scores high
    (the CCNet/Gopher "perplexity bucket" shape with the corpus itself
    as the LM). Docs with 0 tokens have no terms and are absent.

    Determinism contract (the bigram_surprisal µnat rule): each
    token's term quantizes to integer µnats t = floor(ln(T/c)·1e6+0.5)
    BEFORE aggregation; per-doc sums are exact int64; the mean rounds
    half-up on the µnat scale. ln bit-equality across numpy/DuckDB
    holds because both call libm on the identical T/c double quotient.

    Plan: per-batch (doc, token, multiplicity) combiner (one flattened
    pass, doc-contiguous rows), vocabulary counts via the
    bucket-per-group pattern (ONE small-int keyed shuffle), then:
    below the broadcast threshold the sorted (token, count) table +
    scalar T ship once via ray.put and each batch re-derives its
    unigrams, attaches by searchsorted, and emits FINISHED per-doc
    stats (no doc-keyed groupby at all); above it, one hash join +
    one doc-keyed groupby-sum."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join
    from .events import _bucket_by_key

    base = docs.select_columns(["doc_id", "text"])

    def doc_unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "tok": pd.Series([], dtype=str),
                "m": pd.Series([], dtype="int64"),
            }
        )
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return empty
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), lens)
        g = pd.DataFrame({"doc_id": ids, "tok": flat})
        out = g.groupby(["doc_id", "tok"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype(np.int64)
        # rows stay doc-contiguous (stream generated doc by doc) — the
        # broadcast path's run-boundary reduction depends on this
        return out

    inst = base.map_batches(doc_unigrams, batch_format="pandas").materialize()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("tok", sort=False)["m"].sum()
        return pd.DataFrame(
            {"tok": s.index.astype(str), "c": s.to_numpy(dtype=np.int64)}
        )

    vocab = (
        _bucket_by_key(inst, "tok", ["tok", "m"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
        .materialize()
    )

    if vocab.count() <= _BROADCAST_BIGRAM_VOCAB and not force_join:
        import ray

        ks, vs = [], []
        for b in vocab.iter_batches(batch_format="pandas", batch_size=None):
            ks.append(b["tok"].to_numpy(dtype=str))
            vs.append(b["c"].to_numpy(dtype=np.int64))
        k = np.concatenate(ks) if ks else np.array([], dtype=str)
        v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
        o = np.argsort(k, kind="stable")
        total = float(v.sum())
        ref = ray.put((k[o], v[o], total))

        def stats(batch: pd.DataFrame) -> pd.DataFrame:
            tk, tv, tt = ray.get(ref)
            e = doc_unigrams(batch)
            if len(e) == 0:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "n_tokens": pd.Series([], dtype="int64"),
                        "xent": pd.Series([], dtype="float64"),
                    }
                )
            c = tv[np.searchsorted(tk, e["tok"].to_numpy(dtype=str))].astype(
                np.float64
            )
            t = np.floor(np.log(tt / c) * 1e6 + 0.5).astype(np.int64)
            m = e["m"].to_numpy(dtype=np.int64)
            ids = e["doc_id"].to_numpy(dtype=np.int64)
            bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            n = np.add.reduceat(m, bounds)
            s = np.add.reduceat(m * t, bounds).astype(np.float64)
            return pd.DataFrame(
                {
                    "doc_id": ids[bounds],
                    "n_tokens": n,
                    "xent": np.floor(s / n + 0.5) / 1e6,
                }
            )

        return base.map_batches(stats, batch_format="pandas")

    # scale fallback: vocabulary too large to broadcast — one hash
    # join; the scalar T reduces distributively (never streams the
    # vocab table through the driver)
    total = float(inst.sum("m"))
    j = hash_join(inst, vocab, on=("tok",))

    def term(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype=np.float64)
        t = np.floor(np.log(total / c) * 1e6 + 0.5).astype(np.int64)
        m = df["m"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "mt": m * t,
                "m": m,
            }
        )

    from ..stages.skew import bucketed_group_sum

    per = bucketed_group_sum(
        j.map_batches(term, batch_format="pandas"), "doc_id", "mt", extra="m"
    ).map_batches(
        lambda d: d.rename(columns={"m": "n_tokens"}), batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_tokens"].to_numpy(dtype=np.int64)
        s = df["mt"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_tokens": n,
                "xent": np.floor(s / n + 0.5) / 1e6,
            }
        )

    return per.map_batches(finalize, batch_format="pandas")


def token_length_hist(docs: Dataset) -> Dataset:
    """(token_len, n_tokens): corpus-wide distribution of whitespace-
    token lengths in characters — the tokenizer-budget profile (long-
    token mass predicts BPE blowup; a spike at huge lengths usually
    means base64/URL junk). Per-batch histogram partials (token-length
    vocabulary is tiny) + one keyed sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    "token_len": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        )
        tl = np.fromiter((len(t) for t in flat), dtype=np.int64, count=len(flat))
        u, c = np.unique(tl, return_counts=True)
        return pd.DataFrame({"token_len": u, "c": c.astype(np.int64)})

    return (
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("token_len")
        .aggregate(Sum("c", alias_name="n_tokens"))
    )


def charset_profile(docs: Dataset) -> pd.DataFrame:
    """One row (n_chars, ascii_ratio, letter_ratio, digit_ratio,
    space_ratio, punct_ratio) over the whole corpus — the encoding /
    noise fingerprint (a crawl slice whose ascii_ratio drops or whose
    punct_ratio spikes changed extraction behavior). Six exact integer
    scalar sums via per-batch vectorized class counts; ratios are
    rational → half-up 1e-6 quantization matches SQL."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        n = t.str.len().sum()
        ascii_n = t.str.count(r"[\x00-\x7F]").sum()
        letter = t.str.count(r"[A-Za-z]").sum()
        digit = t.str.count(r"[0-9]").sum()
        space = t.str.count(r"\s").sum()
        punct = t.str.count(r"[^\w\s]").sum()
        return pd.DataFrame(
            {
                "n": [np.int64(n)],
                "a": [np.int64(ascii_n)],
                "l": [np.int64(letter)],
                "d": [np.int64(digit)],
                "s": [np.int64(space)],
                "p": [np.int64(punct)],
            }
        )

    tot = {k: 0 for k in "naldsp"}
    for b in (
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pandas")
        .iter_batches(batch_format="pandas", batch_size=None)
    ):
        for k in tot:
            tot[k] += int(b[k].sum())
    n = max(tot["n"], 1)

    def q(x: int) -> float:
        return float(np.floor(x / n * 1e6 + 0.5) / 1e6)

    return pd.DataFrame(
        {
            "n_chars": np.array([tot["n"]], dtype=np.int64),
            "ascii_ratio": [q(tot["a"])],
            "letter_ratio": [q(tot["l"])],
            "digit_ratio": [q(tot["d"])],
            "space_ratio": [q(tot["s"])],
            "punct_ratio": [q(tot["p"])],
        }
    )


def length_rank_by_source(docs: Dataset) -> Dataset:
    """(doc_id, source, pct): percent_rank of each document's length
    WITHIN its source — the per-group window function computed with NO
    per-group sort: percent_rank is (count-of-smaller)/(n−1), and both
    terms read off the per-source LENGTH HISTOGRAM (bounded by
    |sources|·|distinct lengths|, a per-batch partial + one keyed sum),
    broadcast once as cumulative counts. Low-cardinality partition
    keys are exactly where sort-based windows skew; the histogram
    formulation sidesteps the skew entirely. Ties share a rank (the
    SQL percent_rank contract); single-doc sources get 0."""
    import ray

    from ray.data.aggregate import Sum

    base = docs.select_columns(["doc_id", "source", "text"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": b["source"].astype(str),
                "L": b["text"].fillna("").str.len().astype(np.int64),
            }
        )
        g = df.groupby(["source", "L"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        base.map_batches(hist_partial, batch_format="pandas")
        .groupby(["source", "L"])
        .aggregate(Sum("c", alias_name="n"))
        .materialize()
    )
    hdf = pd.concat(
        list(hist.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).sort_values(["source", "L"], kind="stable")
    lookup: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for src, g in hdf.groupby("source", sort=False):
        ls = g["L"].to_numpy(dtype=np.int64)
        cs = g["n"].to_numpy(dtype=np.int64)
        below = np.r_[0, np.cumsum(cs)[:-1]]  # docs strictly shorter
        lookup[str(src)] = (ls, below, int(cs.sum()))
    ref = ray.put(lookup)

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(ref)
        src = b["source"].astype(str).to_numpy()
        L = b["text"].fillna("").str.len().to_numpy(dtype=np.int64)
        pct = np.zeros(len(b), dtype=np.float64)
        for s in np.unique(src):
            ls, below, n = lk[s]
            m = src == s
            if n > 1:
                idx = np.searchsorted(ls, L[m])
                pct[m] = (
                    np.floor(below[idx] / (n - 1) * 1e6 + 0.5) / 1e6
                )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
                "source": src,
                "pct": pct,
            }
        )

    return base.map_batches(rank, batch_format="pandas")


def quality_by_source(docs: Dataset, concurrency: int | None = None) -> Dataset:
    """(source, n_docs, n_keep, mean_score): the per-source curation
    report — which crawl slices the quality filter keeps and at what
    mean score (the dashboard row behind every mixture decision). One
    actor-pool pass scores each batch (weights load once per actor,
    the QualityClassifierStage contract) and emits per-source PARTIALS
    (n, Σµ, keeps) with the score quantized to integer µ BEFORE
    summation, so the keyed aggregate sees |sources|-bounded rows and
    the mean is exact-integer arithmetic."""
    from ray.data.aggregate import Sum

    class _Stage(QualityClassifierStage):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            text = batch["text"].fillna("")
            L = text.str.len().to_numpy(dtype=np.float64)
            toks = text.str.split()
            T = toks.str.len().to_numpy(dtype=np.float64)
            Y = np.array(
                [len(set(x)) for x in toks.to_numpy()], dtype=np.float64
            )
            x1 = np.log(1.0 + L)
            x2 = np.log(1.0 + T)
            x3 = np.where(T > 0, Y / np.maximum(T, 1.0), 0.0)
            w = self.w
            z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            mu = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6 + 0.5).astype(np.int64)
            df = pd.DataFrame(
                {
                    "source": batch["source"].astype(str),
                    "mu": mu,
                    "k": (mu >= 500_000).astype(np.int64),
                }
            )
            g = df.groupby("source", sort=False).agg(
                n=("mu", "size"), s=("mu", "sum"), k=("k", "sum")
            )
            out = g.reset_index()
            for c in ("n", "s", "k"):
                out[c] = out[c].astype(np.int64)
            return out

    from ..stages.stagepool import stage_map_batches

    agg = (
        stage_map_batches(
            docs.select_columns(["doc_id", "source", "text"]),
            _Stage,
            {},
            concurrency,
            batch_format="pandas",
        )
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("k", alias_name="n_keep"),
            Sum("s", alias_name="s"),
        )
    )

    def finalize(t: pd.DataFrame) -> pd.DataFrame:
        s = t["s"].to_numpy(dtype=np.float64)
        n = t["n_docs"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "source": t["source"].astype(str),
                "n_docs": n,
                "n_keep": t["n_keep"].to_numpy(dtype=np.int64),
                "mean_score": np.floor(s / n + 0.5) / 1e6,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def zipf_slope(docs: Dataset, *, k: int = 100):
    """One row (n_terms, slope): the least-squares slope of
    ln(frequency) vs ln(rank) over the corpus's top-k tokens — the
    Zipf-law exponent (natural text sits near −1; token salad and
    templated spam drift off). Reuses the top_tokens combiner (the
    only corpus pass); the k-row fit runs on the driver with every
    ln term quantized to integer µnats first, so all four regression
    sums are exact int64 and the closed-form slope is the same double
    expression over identical integers in SQL."""
    import pandas as _pd

    top = top_tokens(docs, k=k).materialize()
    tdf = _pd.concat(
        list(top.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    )
    # ranks follow the (n desc, token asc) sort order already applied
    n_terms = len(tdf)
    if n_terms < 2:
        return _pd.DataFrame(
            {
                "n_terms": np.array([n_terms], dtype=np.int64),
                "slope": np.array([0.0], dtype=np.float64),
            }
        )
    r = np.arange(1, n_terms + 1, dtype=np.float64)
    f = tdf["n"].to_numpy(dtype=np.float64)
    x = np.floor(np.log(r) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(f) * 1e6 + 0.5).astype(np.int64)
    n = np.int64(n_terms)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    slope = float(
        np.floor(
            (float(n) * sxy - float(sx) * sy)
            / (float(n) * sxx - float(sx) * sx)
            * 1e6
            + 0.5
        )
        / 1e6
    )
    return _pd.DataFrame(
        {
            "n_terms": np.array([n_terms], dtype=np.int64),
            "slope": np.array([slope], dtype=np.float64),
        }
    )


def source_similarity(docs: Dataset) -> Dataset:
    """(source_a, source_b, n_common, jaccard) for every source pair
    a < b: Jaccard similarity of the sources' DISTINCT token
    vocabularies — the crawl-slice overlap matrix (two slices with
    near-1 vocabulary Jaccard are probably the same site family twice).
    Plan: per-batch distinct (source, token) partials → one keyed
    dedup (vocab-bounded); intersections count inside token-hash
    buckets (every holder of a token shares a bucket, each bucket
    emits ≤|sources|² pair partials); union sizes come from the
    per-source vocab counts; the |sources|²-row finalize runs on the
    driver (documented small). Quotients are rational → exact 1e-6."""
    import itertools

    from .events import _bucket_by_key

    base = docs.select_columns(["source", "text"])

    def pairs_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str), "tok": pd.Series([], dtype=str)}
            )
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        src = np.repeat(b["source"].astype(str).to_numpy(), lens)
        return pd.DataFrame({"source": src, "tok": flat}).drop_duplicates()

    # ONE bucketed exchange does everything: the token-hash bucket is a
    # function of tok alone, so every copy of a (source, tok) pair and
    # every holder of a token land in the same bucket — global distinct
    # + per-source vocab-size partials + pair-intersection partials all
    # come out of a single map_groups pass. (The earlier plan's keyed
    # groupby(source, tok) dedup created one Ray group per vocabulary
    # entry; the sort-aggregate's ~ms-per-group reduce made it the
    # pipeline's wall.)
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["source", "tok"])
        sz = g.groupby("source", sort=False).size().reset_index(name="c")
        # explicit row-kind flag (not a sentinel value in source_y: an
        # empty-string SOURCE NAME is legal and must not be misrouted)
        sz = pd.DataFrame(
            {
                "source_x": sz["source"].astype(str),
                "source_y": "",
                "c": sz["c"].astype(np.int64),
                "_is_size": np.ones(len(sz), dtype=np.int64),
            }
        )
        inter = (
            g.merge(g, on="tok")
            .query("source_x < source_y")
            .groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        inter["c"] = inter["c"].astype(np.int64)
        inter["_is_size"] = np.zeros(len(inter), dtype=np.int64)
        return pd.concat([sz, inter], ignore_index=True)

    parts = (
        _bucket_by_key(
            base.map_batches(pairs_partial, batch_format="pandas"),
            "tok",
            ["source", "tok"],
        )
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )
    sizes: dict[str, int] = {}
    inter_map: dict[tuple[str, str], int] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for a, y, c, is_size in zip(
            b["source_x"], b["source_y"], b["c"], b["_is_size"]
        ):
            if int(is_size):
                sizes[str(a)] = sizes.get(str(a), 0) + int(c)
            else:
                k = (str(a), str(y))
                inter_map[k] = inter_map.get(k, 0) + int(c)
    srcs = sorted(sizes)
    rows = []
    for a, b in itertools.combinations(srcs, 2):
        i = inter_map.get((a, b), 0)
        u = sizes[a] + sizes[b] - i
        j = float(np.floor(i / u * 1e6 + 0.5) / 1e6) if u else 0.0
        rows.append((a, b, i, j))
    import ray.data as rd

    out = pd.DataFrame(
        rows, columns=["source_a", "source_b", "n_common", "jaccard"]
    )
    out["n_common"] = out["n_common"].astype(np.int64)
    return rd.from_pandas(out)


def lang_by_source(docs: Dataset, concurrency: int | None = None) -> Dataset:
    """(source, lang_pred, n): predicted-language × source cross-tab —
    which crawl slices are in which language (the routing table for
    per-language pipelines). One actor-pool lang-id pass emitting
    per-batch (source, pred) count partials; the keyed aggregate sees
    |sources|·|langs| rows."""
    from ray.data.aggregate import Sum

    class _Stage(LangIdStage):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            preds = super().__call__(batch)
            df = pd.DataFrame(
                {
                    "source": batch["source"].astype(str).to_numpy(),
                    "lang_pred": preds["lang_pred"].to_numpy(),
                }
            )
            g = df.groupby(["source", "lang_pred"], sort=False).size()
            out = g.reset_index(name="c")
            out["c"] = out["c"].astype(np.int64)
            return out

    from ..stages.stagepool import stage_map_batches

    return (
        stage_map_batches(
            docs.select_columns(["doc_id", "source", "text"]),
            _Stage,
            {},
            concurrency,
            batch_format="pandas",
        )
        .groupby(["source", "lang_pred"])
        .aggregate(Sum("c", alias_name="n"))
    )


def vocab_uniqueness(docs: Dataset) -> Dataset:
    """(source, n_vocab, n_unique, uniqueness): how much of each
    source's distinct-token vocabulary appears in NO other source —
    near-zero uniqueness across two slices means the same site family
    crawled twice. From the distinct (source, token) table: a token-
    bucketed pass counts each token's holder set once (every holder of
    a token shares its hash bucket), emitting per-source (vocab,
    unique) partials; the quotient is rational → exact 1e-6."""
    from ray.data.aggregate import Sum

    from .events import _bucket_by_key

    base = docs.select_columns(["source", "text"])

    def pairs_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str), "tok": pd.Series([], dtype=str)}
            )
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        src = np.repeat(b["source"].astype(str).to_numpy(), lens)
        return pd.DataFrame({"source": src, "tok": flat}).drop_duplicates()

    # distinct (source, token) happens INSIDE the token-hash bucket (the
    # bucket is a function of tok alone, so all copies co-locate): no
    # keyed dedup aggregate whose ~ms-per-group reduce at vocabulary
    # cardinality would dominate the wall (same fix as source_similarity)
    st = base.map_batches(pairs_partial, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["source", "tok"])
        holders = g.groupby("tok", sort=False)["source"].transform("size")
        df = pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "v": np.ones(len(g), dtype=np.int64),
                "u": (holders.to_numpy() == 1).astype(np.int64),
            }
        )
        out = df.groupby("source", sort=False).agg(v=("v", "sum"), u=("u", "sum"))
        out = out.reset_index()
        out["v"] = out["v"].astype(np.int64)
        out["u"] = out["u"].astype(np.int64)
        return out

    agg = (
        _bucket_by_key(st, "tok", ["source", "tok"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("v", alias_name="n_vocab"), Sum("u", alias_name="n_unique"))
    )

    def finalize(t: pd.DataFrame) -> pd.DataFrame:
        v = t["n_vocab"].to_numpy(dtype=np.int64)
        u = t["n_unique"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "source": t["source"].astype(str),
                "n_vocab": v,
                "n_unique": u,
                "uniqueness": np.floor(u / np.maximum(v, 1) * 1e6 + 0.5) / 1e6,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def median_tokens_by_source(docs: Dataset) -> Dataset:
    """(source, n_docs, median_tokens): exact per-source median
    whitespace-token count via the integer HISTOGRAM (the winsorized-
    means trick: discrete quantiles come from cumulative counts over a
    bounded value vocabulary — no per-group sort, no sampling).
    quantile_disc semantics: the smallest value whose cumulative count
    reaches ceil(n/2)."""
    import ray

    from ray.data.aggregate import Sum

    base = docs.select_columns(["source", "text"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": b["source"].astype(str),
                "k": b["text"].fillna("").str.split().str.len().astype(np.int64),
            }
        )
        g = df.groupby(["source", "k"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        base.map_batches(hist_partial, batch_format="pandas")
        .groupby(["source", "k"])
        .aggregate(Sum("c", alias_name="n"))
        .materialize()
    )
    hdf = pd.concat(
        list(hist.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).sort_values(["source", "k"], kind="stable")
    rows = []
    for src, g in hdf.groupby("source", sort=False):
        ks = g["k"].to_numpy(dtype=np.int64)
        cs = g["n"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        cum = np.cumsum(cs)
        target = (n + 1) // 2  # ceil(n/2): quantile_disc(0.5)
        med = int(ks[np.searchsorted(cum, target)])
        rows.append((str(src), n, med))
    import ray.data as rd

    out = pd.DataFrame(rows, columns=["source", "n_docs", "median_tokens"])
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["median_tokens"] = out["median_tokens"].astype(np.int64)
    return rd.from_pandas(out)
