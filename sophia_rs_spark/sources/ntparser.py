"""Vectorized N-Triples / N-Quads / generalized N-Quads parser.

Semantics follow sophia's line-oriented RDF 1.2 NT/NQ parsers
(`turtle/src/parser/nt.rs:27-173`, `nq.rs:28`, `gnq.rs:29`, sample corpus
`turtle/src/test.rs:4-81`): one triple/quad per line, ``VERSION "1.2"``
directive, comments, RDF 1.2 triple terms ``<<( s p o )>>`` (object
position; any position + variables in generalized mode), and blank-node
label freshening — here deterministic url-scoped skolemization
(``_:label`` → ``_:h<xxh64(url,label)>``) instead of sophia's per-parse
UUIDv7 suffix, so output is stable across runs and cluster sizes.

Execution model: this module is pure pandas/Python and is invoked
per-Arrow-batch from ``mapInPandas`` (SURVEY.md §2.1).  A single-regex
pandas fast path handles escape-free simple triples/quads vectorized; a
per-line recursive-descent tokenizer handles the rest (escapes, triple
terms, errors with line/col positions).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pandas as pd

from ..terms.model import XSD_STRING, escape_literal, unescape
from ..terms.xxh64 import skolem_label

# ---------------------------------------------------------------------------
# Token patterns (from the public N-Triples 1.2 grammar)
# ---------------------------------------------------------------------------

_IRIREF = r'<(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>'
_PN_CHARS_BASE = (
    "A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u02ff\u0370-\u037d"
    "\u037f-\u1fff\u200c-\u200d\u2070-\u218f\u2c00-\u2fef\u3001-\ud7ff"
    "\uf900-\ufdcf\ufdf0-\ufffd\U00010000-\U000effff"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + r"0-9\-\u00b7\u0300-\u036f\u203f-\u2040"
_BNODE = rf"_:(?:[{_PN_CHARS_U}0-9])(?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"
_STRING = r'"(?:[^"\\\n\r]|\\.)*"'
_LANGDIR = r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--(?:ltr|rtl))?"
_VAR = rf"\?[{_PN_CHARS_U}0-9][{_PN_CHARS_U}0-9\u00b7\u0300-\u036f\u203f-\u2040]*"

TOKEN_RE = re.compile(
    rf"""(?x)
      (?P<ws>[ \t]+)
    | (?P<comment>\#.*)
    | (?P<iri>{_IRIREF})
    | (?P<tt_open><<\()
    | (?P<tt_close>\)>>)
    | (?P<bnode>{_BNODE})
    | (?P<string>{_STRING})
    | (?P<langdir>{_LANGDIR})
    | (?P<dtsep>\^\^)
    | (?P<var>{_VAR})
    | (?P<dot>\.)
    """
)

# fast path: escape-free, control-char-free simple triple/quad lines.
# IRIs must be ABSOLUTE (scheme-prefixed) — the N-Triples family has no
# base to resolve against (w3c rdf-tests nt-syntax-bad-uri-06..09);
# relative ones fall through to the slow path, which rejects them.
_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*:"
_F_TERM_S = rf'(?:<{_SCHEME}[^\x00-\x20<>"{{}}|^`\\]*>|{_BNODE})'
_F_IRI = rf'<{_SCHEME}[^\x00-\x20<>"{{}}|^`\\]*>'
# \x7f / U+FFFE / U+FFFF excluded: the canonical encoder escapes them
# ( etc.), so lines containing them raw must take the slow path or
# the same literal would get two different canonical strings.
_F_LIT = rf'"[^\x00-\x1f"\\\x7f￾￿]*"(?:{_LANGDIR}|\^\^{_F_IRI})?'
_F_OBJ = rf"(?:{_F_TERM_S}|{_F_LIT})"
FAST_RE = re.compile(
    rf"^[ \t]*(?P<s>{_F_TERM_S})[ \t]+(?P<p>{_F_IRI})[ \t]+(?P<o>{_F_OBJ})"
    rf"(?:[ \t]+(?P<g>{_F_TERM_S}))?[ \t]*\.[ \t]*(?:\#.*)?$"
)
# whole-document fast scan: same grammar, MULTILINE anchors (one findall
# call per document replaces the per-line explode — C-level line loop)
FAST_RE_M = re.compile(FAST_RE.pattern.replace("$", r"\r?$"), re.MULTILINE)
_NONTRIVIAL_RE = re.compile(r"^[ \t]*[^#\s\r\n]", re.MULTILINE)

_XSD_STRING_SUFFIX = f"^^<{XSD_STRING}>"

# absolute-IRI shape (RFC 3987 scheme) — required everywhere in the
# N-Triples family, which has no base IRI
_ABS_IRI_RE = re.compile(_SCHEME)


class NxError(ValueError):
    def __init__(self, msg: str, col: int):
        super().__init__(msg)
        self.col = col


class _LineParser:
    """Recursive-descent over one N-Triples/N-Quads line."""

    __slots__ = ("toks", "pos")

    def __init__(self, line: str):
        toks: List[Tuple[str, str, int]] = []
        i, n = 0, len(line)
        while i < n:
            m = TOKEN_RE.match(line, i)
            if m is None:
                raise NxError(f"unexpected character {line[i]!r}", i)
            kind = m.lastgroup
            if kind not in ("ws", "comment"):
                toks.append((kind, m.group(0), i))  # type: ignore[arg-type]
            i = m.end()
        self.toks = toks
        self.pos = 0

    def peek(self) -> Optional[Tuple[str, str, int]]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> Tuple[str, str, int]:
        t = self.peek()
        if t is None:
            raise NxError("unexpected end of line", -1)
        self.pos += 1
        return t

    def term(self, generalized: bool, position: str) -> Tuple[str, str]:
        """Parse one term; return (canonical_encoding, kind_tag).

        kind_tag in {iri,bnode,literal,tt,var}.  Blank-node labels are NOT
        yet skolemized here (done by the caller so the raw label is
        available for preserve_bn_labels)."""
        kind, text, col = self.next()
        if kind == "iri":
            try:
                iri = unescape(text[1:-1])
            except ValueError as e:
                raise NxError(str(e), col)
            if not _ABS_IRI_RE.match(iri):
                raise NxError(f"relative IRI {iri!r} not allowed here", col)
            return f"<{iri}>", "iri"
        if kind == "bnode":
            return text, "bnode"
        if kind == "var":
            if not generalized:
                raise NxError("variables only allowed in generalized mode", col)
            return text, "var"
        if kind == "string":
            try:
                lex = unescape(text[1:-1])
            except ValueError as e:
                raise NxError(str(e), col)
            nxt = self.peek()
            if nxt is not None and nxt[0] == "langdir":
                self.next()
                tag = nxt[1][1:]
                if "--" in tag:
                    tag, d = tag.rsplit("--", 1)
                    enc = f'"{escape_literal(lex)}"@{tag.lower()}--{d}'
                else:
                    enc = f'"{escape_literal(lex)}"@{tag.lower()}'
                return enc, "literal"
            if nxt is not None and nxt[0] == "dtsep":
                self.next()
                dk, dtext, dcol = self.next()
                if dk != "iri":
                    raise NxError("expected datatype IRI after ^^", dcol)
                try:
                    dt = unescape(dtext[1:-1])
                except ValueError as e:
                    raise NxError(str(e), dcol)
                if not _ABS_IRI_RE.match(dt):
                    raise NxError(f"relative datatype IRI {dt!r}", dcol)
                if dt == XSD_STRING:
                    return f'"{escape_literal(lex)}"', "literal"
                return f'"{escape_literal(lex)}"^^<{dt}>', "literal"
            return f'"{escape_literal(lex)}"', "literal"
        if kind == "tt_open":
            s, sk = self.term(generalized, "tt-s")
            if not generalized and sk not in ("iri", "bnode", "tt"):
                raise NxError("invalid triple-term subject", col)
            p, pk = self.term(generalized, "tt-p")
            if not generalized and pk != "iri":
                raise NxError("invalid triple-term predicate", col)
            o, _ok = self.term(generalized, "tt-o")
            ck, _, ccol = self.next()
            if ck != "tt_close":
                raise NxError("expected )>> closing triple term", ccol)
            return f"<<( {s} {p} {o} )>>", "tt"
        raise NxError(f"unexpected token {text!r} in {position}", col)


def _parse_line(
    line: str, quads: bool, generalized: bool
) -> Optional[Tuple[str, str, str, Optional[str]]]:
    """Parse one non-empty line → (s, p, o, g) canonical encodings with raw
    bnode labels, or None for directives.  Raises NxError on bad input."""
    # VERSION directive (RDF 1.2): sophia parses the version specifier and
    # carries on emitting nothing (nt.rs:112-131); we accept and skip it.
    stripped = line.lstrip()
    if stripped.startswith(("VERSION ", "VERSION\t", "@version ", "@version\t")):
        return None
    lp = _LineParser(line)
    if not lp.toks:
        return None

    s, sk = lp.term(generalized, "subject")
    if not generalized and sk not in ("iri", "bnode"):
        raise NxError("invalid subject kind", 0)
    p, pk = lp.term(generalized, "predicate")
    if not generalized and pk != "iri":
        raise NxError("invalid predicate kind", 0)
    o, _ok = lp.term(generalized, "object")
    g: Optional[str] = None
    nxt = lp.peek()
    if nxt is not None and nxt[0] != "dot":
        if not quads:
            raise NxError("expected '.'", nxt[2])
        g, gk = lp.term(generalized, "graph")
        if not generalized and gk not in ("iri", "bnode"):
            raise NxError("invalid graph-name kind", 0)
        nxt = lp.peek()
    if nxt is None or nxt[0] != "dot":
        raise NxError("expected '.'", nxt[2] if nxt else -1)
    lp.next()
    if lp.peek() is not None:
        raise NxError("trailing tokens after '.'", lp.peek()[2])  # type: ignore[index]
    return s, p, o, g


_BNODE_FIND = re.compile(rf"_:((?:[{_PN_CHARS_U}0-9])(?:[{_PN_CHARS}.]*[{_PN_CHARS}])?)")


def _skolemize_enc(enc: Optional[str], url: str) -> Optional[str]:
    """Rewrite every ``_:label`` inside a canonical encoding (including
    inside triple terms) to its url-scoped skolem label."""
    if enc is None or "_:" not in enc:
        return enc
    return _BNODE_FIND.sub(lambda m: "_:" + skolem_label(url, m.group(1)), enc)


def parse_nx_document(
    url: str,
    text: str,
    *,
    quads: bool = False,
    generalized: bool = False,
    preserve_bn_labels: bool = False,
) -> List[Tuple[int, Optional[str], Optional[str], Optional[str], Optional[str], Optional[str]]]:
    """Parse one NT/NQ document → rows (line_no, s, p, o, g, error).

    Error lines yield a row with s/p/o/g = None and a diagnostic carrying
    line and column (mirroring sophia's error positions,
    `turtle/src/parser/nt.rs:221-249`); good lines never set error.
    """
    out = []
    for line_no, line in enumerate(text.split("\n"), start=1):
        if not line or line.isspace():
            continue
        stripped = line.lstrip()
        if stripped.startswith("#"):
            continue
        try:
            r = _parse_line(line, quads or generalized, generalized)
        except NxError as e:
            out.append(
                (line_no, None, None, None, None, f"L{line_no}C{e.col}: {e}")
            )
            continue
        if r is None:
            continue
        s, p, o, g = r
        if not quads and not generalized and g is not None:
            out.append((line_no, None, None, None, None, f"L{line_no}: graph name not allowed in N-Triples"))
            continue
        if not preserve_bn_labels:
            s = _skolemize_enc(s, url)
            p = _skolemize_enc(p, url)
            o = _skolemize_enc(o, url)
            g = _skolemize_enc(g, url)
        out.append((line_no, s, p, o, g, None))
    return out


# ---------------------------------------------------------------------------
# Batch API (pandas) — the unit mapInPandas calls
# ---------------------------------------------------------------------------

_OUT_COLS = ["url", "line", "s", "p", "o", "g", "error"]


def _canon_fast_obj(o: str) -> str:
    """Canonicalize a fast-path object: lowercase lang tag, drop ^^xsd:string."""
    if o.endswith(_XSD_STRING_SUFFIX):
        return o[: -len(_XSD_STRING_SUFFIX)]
    if not o.startswith('"'):
        return o
    at = o.rfind('"@')
    if at >= 0:
        tag = o[at + 2 :]
        if tag.endswith("--ltr") or tag.endswith("--rtl"):
            return o[: at + 2] + tag[:-5].lower() + tag[-5:]
        return o[: at + 2] + tag.lower()
    return o


def parse_nx_batch(
    pdf: pd.DataFrame,
    *,
    quads: bool = False,
    generalized: bool = False,
    preserve_bn_labels: bool = False,
) -> pd.DataFrame:
    """Parse a batch of documents (columns ``url``, ``text``) into a quad
    frame with columns url/line/s/p/o/g/error.

    Fast path: ONE multiline ``finditer`` per document (C-level line
    loop — no python-side line explode, no intermediate frames).  A
    document where every non-trivial line matches the strict simple-
    triple grammar is emitted directly; any other document falls back to
    the per-line tokenizer (escapes, triple terms, errors)."""
    if len(pdf) == 0:
        return pd.DataFrame(columns=_OUT_COLS)
    rows: list[tuple] = []
    nt_mode = not (quads or generalized)
    for url, text in zip(pdf["url"], pdf["text"]):
        text = text or ""
        matches = list(FAST_RE_M.finditer(text))
        if len(matches) == len(_NONTRIVIAL_RE.findall(text)) and (
            not nt_mode or all(not m.group("g") for m in matches)
        ):
            line_no = 1
            pos = 0
            for m in matches:
                s, p, o, g = m.group("s", "p", "o", "g")
                start = m.start()
                line_no += text.count("\n", pos, start)
                pos = start
                if o[0] == '"':
                    o = _canon_fast_obj(o)
                if not preserve_bn_labels:
                    if s[0] == "_":
                        s = _skolemize_enc(s, url)
                    if o[0] == "_":
                        o = _skolemize_enc(o, url)
                    if g and g[0] == "_":
                        g = _skolemize_enc(g, url)
                rows.append((url, line_no, s, p, o, g or None, None))
            continue
        # slow path: exact per-line semantics (escapes, triple terms,
        # VERSION, generalized terms, error positions)
        for r in parse_nx_document(
            url,
            text,
            quads=quads,
            generalized=generalized,
            preserve_bn_labels=preserve_bn_labels,
        ):
            rows.append((url, *r))
    return pd.DataFrame(rows, columns=_OUT_COLS)
