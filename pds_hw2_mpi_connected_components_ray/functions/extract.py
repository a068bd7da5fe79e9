"""Deterministic HTML -> text / links extraction (pure functions).

The per-row invariant (BASELINE.json input_hint): extracted text must be
byte-identical per url across runs and parallelism levels. These are
pure module-level functions with precompiled regexes; they carry no
state and no randomness, mirroring the reference's determinism
discipline (/root/reference/src/benchmark.c:275-284).

The extractors are generic enough for simple real-world HTML (tag
stripping + entity unescape) and exact for the engine's own page
builder (`build_html`), which escapes text/urls on the way in so the
extract round-trips byte-identically.
"""

from __future__ import annotations

import html as _html
import re

# <p ...>content</p> blocks, non-greedy, across newlines.
_P_BLOCK = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.S | re.I)
# any residual tag inside a block
_TAG = re.compile(r"<[^>]+>")
# href extraction: <a ... href="...">
_HREF = re.compile(r"<a\s[^>]*?href=\"([^\"]*)\"", re.S | re.I)
_TITLE = re.compile(r"<title(?:\s[^>]*)?>(.*?)</title>", re.S | re.I)


def build_html(url: str, text: str, link_urls: list[str], title: str | None = None) -> str:
    """Deterministic page template; inverse of extract_text/extract_links.

    Escapes all payload so extraction round-trips byte-identically.
    """
    t = _html.escape(title if title is not None else url, quote=False)
    items = "".join(
        f'<li><a href="{_html.escape(u, quote=True)}">{_html.escape(u, quote=False)}</a></li>'
        for u in link_urls
    )
    return (
        f"<html><head><title>{t}</title></head>"
        f"<body><h1>{t}</h1><p>{_html.escape(text, quote=False)}</p>"
        f"<ul>{items}</ul></body></html>"
    )


def extract_text(html_doc: str | bytes) -> str:
    """Extract visible paragraph text: all <p> blocks, tags stripped,
    entities unescaped, joined with '\\n'. Pure and deterministic."""
    if isinstance(html_doc, (bytes, bytearray)):
        html_doc = html_doc.decode("utf-8", errors="replace")
    blocks = _P_BLOCK.findall(html_doc)
    return "\n".join(_html.unescape(_TAG.sub("", b)) for b in blocks)


def extract_links(html_doc: str | bytes) -> list[str]:
    """Extract href targets of <a> tags in document order (duplicates kept
    -- dedup is a downstream relational stage, cf. the reference keeping
    duplicate edges: /root/reference/src/converter/mtx_to_bin.c:303-317)."""
    if isinstance(html_doc, (bytes, bytearray)):
        html_doc = html_doc.decode("utf-8", errors="replace")
    return [_html.unescape(h) for h in _HREF.findall(html_doc)]


def extract_title(html_doc: str | bytes) -> str:
    if isinstance(html_doc, (bytes, bytearray)):
        html_doc = html_doc.decode("utf-8", errors="replace")
    m = _TITLE.search(html_doc)
    return _html.unescape(_TAG.sub("", m.group(1))) if m else ""
