"""URL normalization and stable 64-bit id minting (pure functions).

The reference uses dense uint32 vertex ids minted by its converter
(/root/reference/src/converter/mtx_to_bin.c:199-200). Web-scale url
spaces don't fit u32 and can't be densely pre-assigned, so the engine
mints ids as a stable 63-bit hash of the normalized url (positive
int64, Parquet/Arrow friendly). At 1e12 urls the expected number of
birthday collisions is ~n^2/2^64 ~ 5.4e4 (i.e. ~1 url in 2e7 shares an
id with another) -- acceptable for dedup/link-graph statistics, not for
identity-critical joins; collision-sensitive pipelines should verify
within id-groups (cf. exact_dedup's full-128-bit key).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_MASK63 = (1 << 63) - 1

# Fast-path detector: urls ALREADY in canonical form (lowercase http(s)
# scheme, bare lowercase host, no port/userinfo, non-empty path with no
# trailing slash, no fragment/query-metachars/escapes/whitespace).
# normalize_url() is the identity on exactly these strings, so they can
# skip the ~8us urlsplit/urljoin machinery entirely -- on real link
# corpora the overwhelming majority of hrefs hit this path.
_CANONICAL_RE = re.compile(
    r"^https?://[a-z0-9]([a-z0-9.-]*[a-z0-9])?/(?:[^\s#?%/\\]+(?:/[^\s#?%/\\]+)*)?$"
)


def normalize_url(url: str, base: str | None = None) -> str:
    """Canonical url form: resolve against base, lowercase scheme/host,
    drop fragment, drop default port, strip trailing slash on paths.
    Pure; returns '' for unusable urls (javascript:, mailto:, empty)."""
    u = url.strip()
    if not u:
        return ""
    if base:
        u = urljoin(base, u)
    try:
        parts = urlsplit(u)
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return ""
    host = parts.hostname or ""
    if not host:
        return ""
    port = parts.port
    default_port = 80 if scheme == "http" else 443
    netloc = host if port in (None, default_port) else f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def normalize_urls_batch(hrefs, bases) -> list[str]:
    """Vectorized normalize_url over parallel href/base sequences:
    already-canonical absolute urls (the common case) pass through via
    one compiled-regex check; everything else takes the full per-url
    path. Output is IDENTICAL to [normalize_url(h, b) for h, b] --
    asserted by property tests."""
    match = _CANONICAL_RE.match
    return [
        h if match(h) else normalize_url(h, base=b) for h, b in zip(hrefs, bases)
    ]


def mint_id(url: str) -> int:
    """Stable positive int64 id for a url: first 8 bytes of blake2b,
    masked to 63 bits. Deterministic across processes (unlike hash())."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & _MASK63
