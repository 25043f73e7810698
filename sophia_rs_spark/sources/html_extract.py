"""Deterministic RDF-payload extraction from HTML.

sophia has no HTML layer (SURVEY.md §2.1 "our additional sources"); this
module defines OUR extraction contract, which the driver's per-row
invariant pins: ``extract_text(html) == pages.text`` byte-identical per
url (`BASELINE.json:15`).

Extraction rules (deterministic, order = document order):
- ``<script type="application/ld+json">…</script>`` → (``jsonld``, raw
  script text).  Script elements are raw-text in HTML5: no entity
  decoding.
- ``<pre data-format="FMT">…</pre>`` → (``FMT``, entity-decoded text),
  FMT ∈ {nt, nq, ttl, trig, gnq, rdfxml}.  Normal elements: character
  references are decoded.
- Microdata (``itemscope``/``itemtype``/``itemprop``) and RDFa-lite
  (``vocab``/``typeof``/``property``) attributes → handled by
  :mod:`sophia_rs_spark.sources.microdata` over the same parsed stream.

``extract_text`` = the concatenation of all payload texts joined with
``"\\n"`` — the byte-identical invariant target.
"""

from __future__ import annotations

import html as _htmllib
from html.parser import HTMLParser
from typing import List, Optional, Tuple

PAYLOAD_FORMATS = ("nt", "nq", "ttl", "trig", "gnq", "gtrig", "rdfxml", "jsonld")


class _PayloadExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True decodes entities in normal data, but NOT in
        # rawtext elements (script/style) — matching the HTML5 spec.
        super().__init__(convert_charrefs=True)
        self.payloads: List[Tuple[str, str]] = []
        self._mode: Optional[str] = None  # current capture format or None
        self._buf: List[str] = []
        self._depth = 0  # nesting depth inside the captured element

    def handle_starttag(self, tag, attrs):
        if self._mode is not None:
            self._depth += 1
            return
        d = dict(attrs)
        if tag == "script" and d.get("type") == "application/ld+json":
            self._mode = "jsonld"
            self._buf = []
            self._depth = 0
        elif tag == "pre" and d.get("data-format") in PAYLOAD_FORMATS:
            self._mode = d["data-format"]
            self._buf = []
            self._depth = 0

    def handle_endtag(self, tag):
        if self._mode is None:
            return
        if self._depth > 0:
            self._depth -= 1
            return
        if (self._mode == "jsonld" and tag == "script") or (
            self._mode != "jsonld" and tag == "pre"
        ):
            self.payloads.append((self._mode, "".join(self._buf)))
            self._mode = None
            self._buf = []

    def handle_data(self, data):
        if self._mode is not None:
            self._buf.append(data)


def extract_payloads(html: bytes | str) -> List[Tuple[str, str]]:
    """All (format, payload_text) pairs from an HTML document, in order."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8")
    p = _PayloadExtractor()
    p.feed(html)
    p.close()
    return p.payloads


def extract_text(html: bytes | str) -> str:
    """The byte-identical-invariant extraction: payload texts joined by \\n."""
    return "\n".join(text for _, text in extract_payloads(html))


# ---------------------------------------------------------------------------
# Synthesis (the inverse): wrap payloads into a deterministic HTML5 page
# ---------------------------------------------------------------------------


def synthesize_html(url: str, payloads: List[Tuple[str, str]], lang: str = "en") -> str:
    """Deterministic HTML5 page embedding the given RDF payloads.

    Inverse of :func:`extract_payloads`:
    ``extract_payloads(synthesize_html(u, ps)) == ps`` for payloads that
    don't contain ``</script`` (jsonld) — a constraint our synthetic
    corpora respect.
    """
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="{lang or "en"}"><head><meta charset="utf-8">',
        f"<title>{_htmllib.escape(url)}</title></head><body>",
        f"<h1>{_htmllib.escape(url)}</h1>",
    ]
    for fmt, text in payloads:
        if fmt == "jsonld":
            parts.append(f'<script type="application/ld+json">{text}</script>')
        else:
            parts.append(
                f'<pre data-format="{fmt}">{_htmllib.escape(text, quote=False)}</pre>'
            )
    parts.append("</body></html>")
    return "\n".join(parts)
