"""Deterministic hashing primitives for dedup families.

MinHash / SimHash / shingling implemented with numpy over fixed
derived hash seeds -- no randomness at call time, so results are pure
functions of the text (parallelism-invariant).
"""

from __future__ import annotations

import hashlib

import numpy as np

_M61 = (1 << 61) - 1


def hash64(s: str | bytes) -> int:
    """Stable 63-bit hash (blake2b prefix)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big") & ((1 << 63) - 1)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-char shingles as uint64 array (unique, sorted)."""
    t = text
    if len(t) < k:
        return (
            np.array([hash64(t)], dtype=np.uint64) if t else np.array([], dtype=np.uint64)
        )
    hs = {hash64(t[i : i + k]) for i in range(len(t) - k + 1)}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-grams (unique) as uint64 array."""
    ws = text.split()
    if len(ws) < n:
        return (
            np.array([hash64(" ".join(ws))], dtype=np.uint64)
            if ws
            else np.array([], dtype=np.uint64)
        )
    grams = {hash64(" ".join(ws[i : i + n])) for i in range(len(ws) - n + 1)}
    return np.fromiter(grams, dtype=np.uint64, count=len(grams))


# Fixed MinHash permutation parameters: (a*x + b) mod p, derived
# deterministically from a seed so every worker agrees without shipping
# state.
def minhash_params(num_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _M61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, _M61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set.

    Empty set -> all-max sentinel (never matches a non-empty doc).
    """
    if shingles.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n) universal hashing in uint64 modular arithmetic;
    # python ints avoid overflow subtleties only for tiny inputs, so use
    # object-free numpy: (a*x+b) mod M61 with uint64 wraparound is fine
    # as a hash family for dedup purposes (not a true permutation, but
    # deterministic and well-mixed).
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % np.uint64(_M61)
    return vals.min(axis=1)


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys: hash each band of the signature to one uint64."""
    num_perm = sig.shape[0]
    rows = num_perm // num_bands
    out = np.empty(num_bands, dtype=np.uint64)
    for i in range(num_bands):
        band = sig[i * rows : (i + 1) * rows]
        out[i] = np.uint64(hash64(band.tobytes()))
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64(shingles: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over hashed features: sign of per-bit weighted sums."""
    if shingles.size == 0:
        return 0
    bits = ((shingles[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    w = np.ones(shingles.size, dtype=np.int64) if weights is None else weights.astype(np.int64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    h = np.uint64(0)
    for i in np.nonzero(score > 0)[0]:
        h |= np.uint64(1) << np.uint64(i)
    return int(h)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
