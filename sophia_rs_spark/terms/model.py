"""RDF 1.2 term model + canonical N-Triples encoding.

Re-expresses the semantics of sophia's ``SimpleTerm``
(`api/src/term/_simple.rs:12-25`) and its canonical N-Triples serializer
(`turtle/src/serializer/nt.rs:154-262`, escaping rules
`turtle/src/serializer/_common.rs:75-119`) in Python.

Design decision (SURVEY.md §1.4): the engine's *wire format* for terms is
the **canonical N-Triples string** — one byte-comparable STRING column per
term position.  All joins, dedup, grouping and golden comparisons operate
on these strings; the structured (kind, lex, dt, lang, dir) view is
derived only where needed.  Lexical forms are NEVER normalized
("10"^^xsd:integer != "010"^^xsd:integer — `api/src/term.rs:389-411` and
the pinned test at :846-847).

Term kinds reuse sophia's integer discriminants (`api/src/term.rs:47-58`)
because they define the SPARQL cross-kind sort order:
BlankNode=0 < Iri=1 < Literal=2 < Triple=3 < Variable=4.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

KIND_BNODE = 0
KIND_IRI = 1
KIND_LITERAL = 2
KIND_TRIPLE = 3
KIND_VARIABLE = 4

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
RDF_LANGSTRING = RDF + "langString"
RDF_DIRLANGSTRING = RDF + "dirLangString"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_REIFIES = RDF + "reifies"

# ---------------------------------------------------------------------------
# Canonical string escaping (turtle/src/serializer/_common.rs:75-119)
# ---------------------------------------------------------------------------

# chars that must be escaped inside a double-quoted literal, canonical mode:
# controls 00-1F, DEL 7F, '"', '\', and the non-characters FFFE/FFFF.
_ESC_MAP = {}
for _c in range(0x00, 0x20):
    _ESC_MAP[chr(_c)] = f"\\u00{_c:02X}"
_ESC_MAP.update(
    {
        "\b": "\\b",
        "\t": "\\t",
        "\n": "\\n",
        "\x0b": "\\u000B",
        "\f": "\\f",
        "\r": "\\r",
        '"': '\\"',
        "\\": "\\\\",
        "\x7f": "\\u007F",
        "￾": "\\uFFFE",
        "￿": "\\uFFFF",
    }
)

_ESC_TRANS = {ord(k): v for k, v in _ESC_MAP.items()}


def escape_literal(lex: str) -> str:
    """Canonical N-Triples string escaping of a lexical form."""
    return lex.translate(_ESC_TRANS)


def unescape(s: str) -> str:
    """Decode N-Triples ECHAR/UCHAR escape sequences (\\t \\b \\n \\r \\f
    \\" \\' \\\\ \\uXXXX \\UXXXXXXXX)."""
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("dangling backslash")
        e = s[i + 1]
        if e == "t":
            out.append("\t")
            i += 2
        elif e == "b":
            out.append("\b")
            i += 2
        elif e == "n":
            out.append("\n")
            i += 2
        elif e == "r":
            out.append("\r")
            i += 2
        elif e == "f":
            out.append("\f")
            i += 2
        elif e == '"':
            out.append('"')
            i += 2
        elif e == "'":
            out.append("'")
            i += 2
        elif e == "\\":
            out.append("\\")
            i += 2
        elif e == "u":
            if i + 6 > n:
                raise ValueError("truncated \\u escape")
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            if i + 10 > n:
                raise ValueError("truncated \\U escape")
            out.append(chr(int(s[i + 2 : i + 10], 16)))
            i += 10
        else:
            raise ValueError(f"invalid escape \\{e}")
    return "".join(out)


# ---------------------------------------------------------------------------
# Term
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    """A structured RDF 1.2 term (sophia ``SimpleTerm`` equivalent).

    ``kind``: one of the KIND_* discriminants.
    ``lex``:  IRI text / bnode label / variable name / lexical form.
    ``dt``:   datatype IRI (literals only; None for lang literals where it
              is implied rdf:langString / rdf:dirLangString).
    ``lang``: language tag (lowercase-normalized for comparison at encode
              time, preserved as given here).
    ``dir``:  base direction "ltr"/"rtl" or None.
    ``spo``:  nested (s, p, o) Term tuple for triple terms.
    """

    kind: int
    lex: str = ""
    dt: Optional[str] = None
    lang: Optional[str] = None
    dir: Optional[str] = None
    spo: Optional[Tuple["Term", "Term", "Term"]] = None

    # -- constructors -------------------------------------------------------

    @staticmethod
    def iri(value: str) -> "Term":
        return Term(KIND_IRI, value)

    @staticmethod
    def bnode(label: str) -> "Term":
        return Term(KIND_BNODE, label)

    @staticmethod
    def literal(
        lex: str,
        dt: Optional[str] = None,
        lang: Optional[str] = None,
        dir: Optional[str] = None,
    ) -> "Term":
        if lang is not None:
            return Term(KIND_LITERAL, lex, None, lang, dir)
        return Term(KIND_LITERAL, lex, dt or XSD_STRING)

    @staticmethod
    def variable(name: str) -> "Term":
        return Term(KIND_VARIABLE, name)

    @staticmethod
    def triple(s: "Term", p: "Term", o: "Term") -> "Term":
        return Term(KIND_TRIPLE, spo=(s, p, o))

    # -- accessors ----------------------------------------------------------

    @property
    def datatype(self) -> Optional[str]:
        """Effective datatype IRI (lang literals get rdf:(dir)langString,
        `api/src/term/_simple.rs:66-76`)."""
        if self.kind != KIND_LITERAL:
            return None
        if self.lang is not None:
            return RDF_DIRLANGSTRING if self.dir is not None else RDF_LANGSTRING
        return self.dt

    # -- canonical N-Triples encoding --------------------------------------

    def encode(self) -> str:
        """Canonical N-Triples encoding (`turtle/src/serializer/nt.rs:171-262`,
        canonical mode: lowercased language tags, xsd:string implicit)."""
        k = self.kind
        if k == KIND_IRI:
            return f"<{self.lex}>"
        if k == KIND_BNODE:
            return f"_:{self.lex}"
        if k == KIND_LITERAL:
            q = escape_literal(self.lex)
            if self.lang is not None:
                tag = self.lang.lower()
                if self.dir is not None:
                    return f'"{q}"@{tag}--{self.dir}'
                return f'"{q}"@{tag}'
            if self.dt is None or self.dt == XSD_STRING:
                return f'"{q}"'
            return f'"{q}"^^<{self.dt}>'
        if k == KIND_TRIPLE:
            s, p, o = self.spo  # type: ignore[misc]
            return f"<<( {s.encode()} {p.encode()} {o.encode()} )>>"
        if k == KIND_VARIABLE:
            return f"?{self.lex}"
        raise ValueError(f"bad term kind {k}")

    # -- cross-kind SPARQL order key ----------------------------------------

    def order_key(self):
        """Total order key mirroring `api/src/term.rs:413-471`: kind first,
        then per-kind fields; literals by (datatype, lang, dir, lexical)."""
        if self.kind == KIND_LITERAL:
            return (
                self.kind,
                self.datatype or "",
                (self.lang or "").lower(),
                self.dir or "",
                self.lex,
            )
        if self.kind == KIND_TRIPLE:
            s, p, o = self.spo  # type: ignore[misc]
            return (self.kind, s.order_key(), p.order_key(), o.order_key())
        return (self.kind, self.lex)


# ---------------------------------------------------------------------------
# Decoding a single canonical term string back into a Term
# ---------------------------------------------------------------------------


def decode(enc: str) -> Term:
    """Parse one canonical-N-Triples-encoded term string into a Term."""
    t, rest = _decode_prefix(enc)
    if rest:
        raise ValueError(f"trailing data after term: {rest!r}")
    return t


def _decode_prefix(s: str) -> Tuple[Term, str]:
    if s.startswith("<<( "):
        sub, rest = _decode_prefix(s[4:])
        if not rest.startswith(" "):
            raise ValueError("bad triple term")
        pred, rest = _decode_prefix(rest[1:])
        if not rest.startswith(" "):
            raise ValueError("bad triple term")
        obj, rest = _decode_prefix(rest[1:])
        if not rest.startswith(" )>>"):
            raise ValueError("bad triple term close")
        return Term.triple(sub, pred, obj), rest[4:]
    if s.startswith("<"):
        i = s.index(">")
        return Term.iri(s[1:i]), s[i + 1 :]
    if s.startswith("_:"):
        i = 2
        n = len(s)
        while i < n and s[i] not in " )":
            i += 1
        return Term.bnode(s[2:i]), s[i:]
    if s.startswith("?"):
        i = 1
        n = len(s)
        while i < n and s[i] not in " )":
            i += 1
        return Term.variable(s[1:i]), s[i:]
    if s.startswith('"'):
        # find closing quote, honoring escapes
        i = 1
        n = len(s)
        while i < n:
            if s[i] == "\\":
                i += 2
                continue
            if s[i] == '"':
                break
            i += 1
        if i >= n:
            raise ValueError("unterminated literal")
        lex = unescape(s[1:i])
        rest = s[i + 1 :]
        if rest.startswith("^^<"):
            j = rest.index(">")
            return Term.literal(lex, dt=rest[3:j]), rest[j + 1 :]
        if rest.startswith("@"):
            j = 1
            m = len(rest)
            while j < m and rest[j] not in " )":
                j += 1
            tag = rest[1:j]
            if "--" in tag:
                tag, d = tag.rsplit("--", 1)
                return Term.literal(lex, lang=tag, dir=d), rest[j:]
            return Term.literal(lex, lang=tag), rest[j:]
        return Term.literal(lex), rest
    raise ValueError(f"cannot decode term: {s!r}")
