"""Deterministic hashing primitives for the dedup families.

Everything here is a pure function of the text (fixed seeds, no call-time
randomness), so results are parallelism-invariant. The batch kernels are
fully vectorized: one numpy pass over the concatenated byte/token stream
of a whole Arrow batch -- no per-shingle hashlib calls (the round-1
kernel paid one blake2b per shingle per doc, the dominant minhash cost).

Shingle value spaces:

- char k-shingles (k <= 8): the k UTF-8 bytes PACKED into a uint64
  (big-endian). Injective, so exact Jaccard over these values EQUALS
  exact Jaccard over the substring sets -- which is what the DuckDB
  oracle computes with substr(). Documents shorter than k contribute a
  single whole-text value (tagged with a high bit so it cannot collide
  with a real k-window).
- word n-grams: each distinct word is hashed once per batch (blake2b,
  vocabulary-sized work, not token-sized), then the n consecutive word
  hashes are combined with a fixed odd-constant polynomial in uint64.
  Collision probability across a candidate pair's union (~10^3 values
  from a 2^64 space) is negligible, so exact Jaccard over these values
  matches string n-gram Jaccard (the oracle's formulation).
"""

from __future__ import annotations

import hashlib

import numpy as np

_M61 = (1 << 61) - 1
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY_C = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mixing constant
_SHORT_TAG = np.uint64(1) << np.uint64(63)  # marks sub-k whole-text packs

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hash64(s: str | bytes) -> int:
    """Stable 63-bit hash (blake2b prefix)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big") & (
        (1 << 63) - 1
    )


# ------------------------------------------------------------------ batch
# All batch kernels return (vals, offsets): vals is one uint64 array of
# SORTED UNIQUE shingle values for all docs concatenated; offsets[i] ..
# offsets[i+1] slices doc i. Empty docs have empty slices.


def _window_positions(starts: np.ndarray, n_valid: np.ndarray):
    """(doc_idx, buffer_position) for every valid window: doc d's windows
    start at buffer offsets starts[d] .. starts[d] + n_valid[d] - 1."""
    ndocs = len(n_valid)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), n_valid)
    if len(doc_idx) == 0:
        return doc_idx, np.array([], dtype=np.int64)
    base = np.repeat(starts[:-1], n_valid)
    ramp = np.arange(len(doc_idx), dtype=np.int64)
    seg_start = np.repeat(
        np.concatenate([[0], np.cumsum(n_valid)[:-1]]), n_valid
    )
    return doc_idx, base + (ramp - seg_start)


def _unique_per_doc(doc_idx: np.ndarray, vals: np.ndarray, ndocs: int):
    """Sort (doc, val), drop per-doc duplicates, return (vals, offsets)."""
    if len(vals) == 0:
        return np.array([], dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    order = np.lexsort((vals, doc_idx))
    d = doc_idx[order]
    v = vals[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (v[1:] != v[:-1])]
    d = d[keep]
    v = v[keep]
    counts = np.bincount(d, minlength=ndocs)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return v, offsets


_NONASCII_TAG = np.uint64(1) << np.uint64(62)  # marks poly-hashed windows


def pack_char_shingles_batch(texts, k: int = 5):
    """Char k-shingles (k <= 8) for a whole batch, windowed over CODE
    POINTS (not UTF-8 bytes): one vectorized pass over the concatenated
    UTF-32 buffer. Returns (vals, offsets).

    The oracle's substr() windows over characters; round 2 windowed over
    bytes, silently diverging on any non-ASCII text (ADVICE r2). Now:

    - all-ASCII windows pack their k bytes into a uint64 exactly as
      before (injective; byte-identical values to round 2 on ASCII
      corpora, so fixture hashes are stable);
    - windows containing a non-ASCII code point get a fixed-polynomial
      hash of the k code points, tagged with bit 62 (collision odds
      across a candidate pair's union ~10^3/2^62 -- Jaccard over these
      values matches character-substring Jaccard w.h.p.). The choice
      depends only on the WINDOW's content, so a shingle shared by an
      ASCII doc and a mixed doc maps to the same value in both.
    - short docs (0 < chars < k) contribute one whole-text value,
      bit-63 tagged; ASCII short texts pack bytes (round-2-identical),
      others blake2b.
    """
    if k > 8:
        raise ValueError("packed char shingles support k <= 8")
    strs = [(t or "") for t in texts]
    ndocs = len(strs)
    lens = np.array([len(s) for s in strs], dtype=np.int64)  # code points
    starts = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    buf = np.frombuffer(
        "".join(strs).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    total = len(buf)

    doc_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    if total >= k:
        # one window pass over the whole code-point buffer: packed-byte
        # accumulator, polynomial accumulator, and window max together
        nwin = total - k + 1
        packed = np.zeros(nwin, dtype=np.uint64)
        poly = np.zeros(nwin, dtype=np.uint64)
        wmax = np.zeros(nwin, dtype=np.uint64)
        for j in range(k):
            w = buf[j : j + nwin]
            packed = (packed << np.uint64(8)) | (w & np.uint64(0xFF))
            poly = poly * _POLY_C + w
            np.maximum(wmax, w, out=wmax)
        acc = np.where(
            wmax < np.uint64(128),
            packed,
            (poly >> np.uint64(2)) | _NONASCII_TAG,
        )
        # windows fully inside doc d start in [starts[d], starts[d+1]-k]
        n_valid = np.maximum(lens - k + 1, 0)
        doc_idx, pos = _window_positions(starts, n_valid)
        doc_parts.append(doc_idx)
        val_parts.append(acc[pos])
    # short docs (0 < chars < k): one whole-text value, high-bit tagged
    short = np.nonzero((lens > 0) & (lens < k))[0]
    for d in short:
        e = strs[d].encode("utf-8")
        if len(e) == len(strs[d]):  # pure ASCII: round-2-identical pack
            v = np.uint64(int.from_bytes(e, "big")) | _SHORT_TAG
        else:
            v = np.uint64(hash64(e)) | _SHORT_TAG
        doc_parts.append(np.array([d], dtype=np.int64))
        val_parts.append(np.array([v], dtype=np.uint64))
    if not doc_parts:
        return np.array([], dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    return _unique_per_doc(
        np.concatenate(doc_parts), np.concatenate(val_parts), ndocs
    )


def hash_word_ngrams_batch(texts, n: int = 3):
    """Hashed word n-grams for a whole batch. Distinct words are hashed
    once (vocabulary-sized blake2b work); n-grams combine consecutive
    word hashes with a fixed polynomial. Returns (vals, offsets)."""
    toks = [(t or "").split() for t in texts]
    ndocs = len(toks)
    nt = np.array([len(w) for w in toks], dtype=np.int64)
    all_words = [w for ws in toks for w in ws]
    if not all_words:
        return np.array([], dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    arr = np.array(all_words, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    whash = np.fromiter(
        (hash64(w) for w in uniq), dtype=np.uint64, count=len(uniq)
    )
    th = whash[inv]  # per-token hash, all docs concatenated
    starts = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nt, out=starts[1:])

    doc_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    total = len(th)
    if total >= n:
        nwin = total - n + 1
        acc = np.zeros(nwin, dtype=np.uint64)
        for j in range(n):
            acc = acc * _POLY_C + th[j : j + nwin]
        n_valid = np.maximum(nt - n + 1, 0)
        doc_idx, pos = _window_positions(starts, n_valid)
        doc_parts.append(doc_idx)
        val_parts.append(acc[pos])
    # short docs (0 < tokens < n): single gram = hash of the joined text
    short = np.nonzero((nt > 0) & (nt < n))[0]
    for d in short:
        v = np.uint64(hash64(" ".join(toks[d]))) | _SHORT_TAG
        doc_parts.append(np.array([d], dtype=np.int64))
        val_parts.append(np.array([v], dtype=np.uint64))
    if not doc_parts:
        return np.array([], dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    return _unique_per_doc(
        np.concatenate(doc_parts), np.concatenate(val_parts), ndocs
    )


# --------------------------------------------------------------- minhash


def minhash_params(num_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Fixed universal-hash parameters derived from a seed: every worker
    agrees without shipping state."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _M61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, _M61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_sigs_batch(
    vals: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(ndocs, num_perm) MinHash signatures from a batch shingle table.
    Empty docs get the all-max sentinel (never matches a non-empty doc).
    Vectorized: num_perm reduceat passes over the value stream."""
    ndocs = len(offsets) - 1
    num_perm = len(a)
    out = np.full((ndocs, num_perm), _U64MAX, dtype=np.uint64)
    if len(vals) == 0:
        return out
    nonempty = np.nonzero(np.diff(offsets) > 0)[0]
    red_offsets = offsets[nonempty]
    for p in range(num_perm):
        y = (a[p] * vals + b[p]) % np.uint64(_M61)
        out[nonempty, p] = np.minimum.reduceat(y, red_offsets)
    return out


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Single-doc MinHash signature (kept for tests/property checks)."""
    offs = np.array([0, len(shingles)], dtype=np.int64)
    return minhash_sigs_batch(shingles.astype(np.uint64), offs, a, b)[0]


def band_keys_batch(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(ndocs, num_bands) LSH band keys: polynomial combine of each
    band's signature rows (vectorized across the batch)."""
    ndocs, num_perm = sigs.shape
    rows = num_perm // num_bands
    out = np.zeros((ndocs, num_bands), dtype=np.uint64)
    for i in range(num_bands):
        acc = np.zeros(ndocs, dtype=np.uint64)
        for r in range(rows):
            acc = acc * _POLY_C + sigs[:, i * rows + r]
        out[:, i] = acc
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def jaccard_pairs_from_table(
    vals: np.ndarray, offsets: np.ndarray, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Exact Jaccard for (ia[i], ib[i]) doc-index pairs over a batch
    shingle table (slices are sorted unique, so intersect is a merge)."""
    out = np.empty(len(ia), dtype=np.float64)
    for i in range(len(ia)):
        a = vals[offsets[ia[i]] : offsets[ia[i] + 1]]
        b = vals[offsets[ib[i]] : offsets[ib[i] + 1]]
        if a.size == 0 and b.size == 0:
            out[i] = 1.0
            continue
        if a.size > b.size:
            a, b = b, a
        if b.size == 0:
            out[i] = 0.0
            continue
        # membership count via searchsorted on the (sorted unique)
        # larger side -- cheaper than intersect1d's concat+sort
        pos = np.searchsorted(b, a)
        pos[pos >= b.size] = b.size - 1
        inter = int(np.count_nonzero(b[pos] == a))
        union = a.size + b.size - inter
        out[i] = inter / union if union else 0.0
    return out


# --------------------------------------------------------------- simhash


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spreads structured (e.g. packed-ASCII)
    values over all 64 bits. Vectorized, uint64 wraparound arithmetic."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def simhash64_batch(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """uint64 SimHash per doc over hashed features: per-bit sign of the
    feature-bit vote. Features are splitmix64-mixed first -- packed char
    shingles have heavily biased bit patterns (ASCII), and SimHash needs
    uniform feature bits. Vectorized: 64 reduceat passes."""
    ndocs = len(offsets) - 1
    out = np.zeros(ndocs, dtype=np.uint64)
    if len(vals) == 0:
        return out
    vals = _mix64(vals)
    nonempty = np.nonzero(np.diff(offsets) > 0)[0]
    red_offsets = offsets[nonempty]
    counts = np.diff(offsets)[nonempty].astype(np.int64)
    for bit in range(64):
        ones = ((vals >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        s = np.add.reduceat(ones, red_offsets)
        # score = ones - zeros = 2*ones - count; > 0 sets the bit
        setbit = (2 * s - counts) > 0
        out[nonempty] |= setbit.astype(np.uint64) << np.uint64(bit)
    return out


def simhash64(shingles: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Single-doc SimHash (unweighted batch kernel wrapper)."""
    if weights is not None:
        # weighted variant kept for API compat; small inputs only
        if shingles.size == 0:
            return 0
        bits = (
            (shingles[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        score = ((bits * 2 - 1) * weights.astype(np.int64)[:, None]).sum(axis=0)
        h = np.uint64(0)
        for i in np.nonzero(score > 0)[0]:
            h |= np.uint64(1) << np.uint64(i)
        return int(h)
    offs = np.array([0, len(shingles)], dtype=np.int64)
    return int(simhash64_batch(shingles.astype(np.uint64), offs)[0])


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays: XOR + bytewise
    popcount table (numpy 1.26 has no bitwise_count)."""
    x = (a.astype(np.uint64) ^ b.astype(np.uint64)).view(np.uint8)
    return _POPCNT8[x].reshape(-1, 8).sum(axis=1).astype(np.int64)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ------------------------------------------------- single-doc shingle API
# (kept for property tests and ad-hoc verification)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique packed char k-shingles of one document."""
    vals, _ = pack_char_shingles_batch([text], k)
    return vals


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique hashed word n-grams of one document."""
    vals, _ = hash_word_ngrams_batch([text], n)
    return vals
