"""RDF 1.2 Turtle / TriG per-document parser.

Re-expresses the semantics of sophia's Turtle-family state machine
(`turtle/src/parser/turtle.rs:32-71`, `turtle/src/parser/turtle/_state.rs:
19-86`, shared tokenizer `turtle/src/parser/_common/_tx_source.rs`) as an
original recursive-descent parser over one document:

- directives ``@prefix/@base/@version`` + SPARQL-style ``PREFIX/BASE/
  VERSION`` (case-insensitive, no dot)
- prefixed names (with PN_LOCAL escapes), ``a`` keyword
- literal sugar: numerics (double regex tried before decimal/integer,
  matching `_tx_source.rs:1637` classification), booleans, 4 string forms
- collections ``( … )`` → rdf:first/rest/nil chains
- anonymous bnodes ``[ … ]`` property lists
- RDF 1.2: triple terms ``<<( … )>>``, reified triples ``<< … ~ r >>``
  (NOT asserted; reifier + ``rdf:reifies`` edge), annotation blocks
  ``{| … |}`` (asserted + reified) — semantics pinned by the reference
  sample counts (`turtle/src/test.rs:88-183`)
- TriG: graph blocks ``label { … }`` / ``GRAPH label { … }`` /
  bare ``{ … }`` for the default graph

Blank nodes: labeled ones keep their label; anonymous/collection/reifier
nodes get deterministic pre-order counter labels; ALL labels are then
url-scope-skolemized (stable across runs/partitionings).  Per-document
base IRI = the page url (overridable with @base), resolved per RFC 3986.

Parse errors quarantine the document's remainder (rows already parsed
are kept) with a position diagnostic.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pandas as pd

from ..terms.iri import resolve, split_iri
from ..terms.model import (
    RDF,
    XSD,
    escape_literal,
    unescape,
)
from ..terms.xxh64 import skolem_label
from .ntparser import _OUT_COLS, _skolemize_enc

RDF_TYPE_T = f"<{RDF}type>"
RDF_FIRST_T = f"<{RDF}first>"
RDF_REST_T = f"<{RDF}rest>"
RDF_NIL_T = f"<{RDF}nil>"
RDF_REIFIES_T = f"<{RDF}reifies>"

_PN_CHARS_BASE = (
    "A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u02ff\u0370-\u037d"
    "\u037f-\u1fff\u200c-\u200d\u2070-\u218f\u2c00-\u2fef\u3001-\ud7ff"
    "\uf900-\ufdcf\ufdf0-\ufffd\U00010000-\U000effff"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + r"0-9\-\u00b7\u0300-\u036f\u203f-\u2040"
_PN_PREFIX = rf"[{_PN_CHARS_BASE}](?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"
_PLX = r"%[0-9A-Fa-f]{2}|\\[_~.!$&'()*+,;=/?#@%-]"
_PN_LOCAL = (
    rf"(?:[{_PN_CHARS_U}:0-9]|{_PLX})"
    rf"(?:(?:[{_PN_CHARS}.:]|{_PLX})*(?:[{_PN_CHARS}:]|{_PLX}))?"
)

_IRIREF = r'<(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>'
_BNODE = rf"_:(?:[{_PN_CHARS_U}0-9])(?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"

_STR_LONG_DQ = r'"""(?:(?:"|"")?(?:[^"\\]|\\.))*"""'
_STR_LONG_SQ = r"'''(?:(?:'|'')?(?:[^'\\]|\\.))*'''"
_STR_DQ = r'"(?:[^"\\\n\r]|\\.)*"'
_STR_SQ = r"'(?:[^'\\\n\r]|\\.)*'"

_DOUBLE = r"[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+"
_DECIMAL = r"[+-]?\d*\.\d+"
_INTEGER = r"[+-]?\d+"

_LANGDIR = r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--(?:ltr|rtl))?"
_VAR = rf"\?[{_PN_CHARS_U}0-9][{_PN_CHARS_U}0-9\u00b7\u0300-\u036f\u203f-\u2040]*"

TOKEN_RE = re.compile(
    rf"""(?x)
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<atkw>@(?:prefix|base|version)\b)
    | (?P<langdir>{_LANGDIR})
    | (?P<iri>{_IRIREF})
    | (?P<tt_open><<\()
    | (?P<tt_close>\)>>)
    | (?P<rt_open><<)
    | (?P<rt_close>>>)
    | (?P<ann_open>\{{\|)
    | (?P<ann_close>\|\}})
    | (?P<bnode>{_BNODE})
    | (?P<string>{_STR_LONG_DQ}|{_STR_LONG_SQ}|{_STR_DQ}|{_STR_SQ})
    | (?P<double>{_DOUBLE})
    | (?P<decimal>{_DECIMAL})
    | (?P<integer>{_INTEGER})
    | (?P<dtsep>\^\^)
    | (?P<kw>(?i:PREFIX|BASE|VERSION|GRAPH)(?=[\s<#]|$))
    | (?P<boolean>(?:true|false)(?=[\s;,.)\]}}#]|$))
    | (?P<var>{_VAR})
    | (?P<a>a(?=[\s<_"'(\[#]|$))
    | (?P<pname>(?:{_PN_PREFIX})?:(?:{_PN_LOCAL})?)
    | (?P<punct>[;,.\[\]()~{{}}])
    """
)

_PN_LOCAL_UNESC = re.compile(r"\\([_~.!$&'()*+,;=/?#@%-])")


class TurtleError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(msg)
        self.pos = pos


class _TurtleParser:
    def __init__(self, url: str, text: str, trig: bool, generalized: bool = False):
        self.url = url
        self.text = text
        self.trig = trig
        self.generalized = generalized
        self.base = url
        self.prefixes: dict[str, str] = {}
        self.quads: List[Tuple[str, str, str, Optional[str]]] = []
        self.counter = 0
        self.graph: Optional[str] = None
        self.toks: List[Tuple[str, str, int]] = []
        self.pos = 0
        i, n = 0, len(text)
        while i < n:
            m = TOKEN_RE.match(text, i)
            if m is None:
                # lex error: keep everything tokenized so far; the parser
                # raises when it reaches this sentinel (partial results kept)
                self.toks.append(("lexerr", text[i], i))
                break
            kind = m.lastgroup
            if kind not in ("ws", "comment"):
                self.toks.append((kind, m.group(0), i))  # type: ignore[arg-type]
            i = m.end()

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0):
        j = self.pos + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise TurtleError("unexpected end of document", len(self.text))
        if t[0] == "lexerr":
            raise TurtleError(f"unexpected character {t[1]!r}", t[2])
        self.pos += 1
        return t

    def expect(self, kind: str, text: Optional[str] = None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise TurtleError(f"expected {text or kind}, got {t[1]!r}", t[2])
        return t

    def _reifier_starters(self) -> tuple:
        """Token kinds that can start an explicit reifier after '~'
        (iri/bnode in standard Turtle 1.2; any term in generalized)."""
        if self.generalized:
            return (
                "iri", "pname", "bnode", "string", "double", "decimal",
                "integer", "boolean", "var", "tt_open",
            )
        return ("iri", "pname", "bnode")

    def _fresh_bnode(self) -> str:
        """Deterministic label for anon/collection/reifier bnodes: pre-order
        counter hashed in a NUL namespace no user label can express (user
        labels can't contain NUL), url-scoped like all labels."""
        self.counter += 1
        return "_:" + skolem_label(self.url, f"\x00anon{self.counter}")

    def emit(self, s: str, p: str, o: str):
        self.quads.append((s, p, o, self.graph))

    # -- term production ----------------------------------------------------

    def _resolve_iri(self, raw: str, pos: int) -> str:
        iri = unescape(raw[1:-1])
        if split_iri(iri)[0] is not None:  # absolute: used verbatim
            return f"<{iri}>"
        return f"<{resolve(self.base, iri)}>"

    def _expand_pname(self, raw: str, pos: int) -> str:
        ns, _, local = raw.partition(":")
        if ns not in self.prefixes:
            raise TurtleError(f"undeclared prefix {ns!r}:", pos)
        local = _PN_LOCAL_UNESC.sub(r"\1", local)
        return f"<{self.prefixes[ns]}{local}>"

    def parse_iri_term(self) -> str:
        t = self.next()
        if t[0] == "iri":
            return self._resolve_iri(t[1], t[2])
        if t[0] == "pname":
            return self._expand_pname(t[1], t[2])
        raise TurtleError(f"expected IRI, got {t[1]!r}", t[2])

    def _string_lex(self, raw: str) -> str:
        if raw[:3] in ('"""', "'''"):
            return unescape(raw[3:-3])
        return unescape(raw[1:-1])

    def parse_literal(self, t) -> str:
        kind, raw, pos = t
        if kind == "string":
            lex = self._string_lex(raw)
            nxt = self.peek()
            if nxt is not None and nxt[0] == "langdir":
                self.next()
                tag = nxt[1][1:]
                if "--" in tag:
                    tag, d = tag.rsplit("--", 1)
                    return f'"{escape_literal(lex)}"@{tag.lower()}--{d}'
                return f'"{escape_literal(lex)}"@{tag.lower()}'
            if nxt is not None and nxt[0] == "dtsep":
                self.next()
                dt = self.parse_iri_term()
                if dt == f"<{XSD}string>":
                    return f'"{escape_literal(lex)}"'
                return f'"{escape_literal(lex)}"^^{dt}'
            return f'"{escape_literal(lex)}"'
        if kind == "double":
            return f'"{raw}"^^<{XSD}double>'
        if kind == "decimal":
            return f'"{raw}"^^<{XSD}decimal>'
        if kind == "integer":
            return f'"{raw}"^^<{XSD}integer>'
        if kind == "boolean":
            return f'"{raw}"^^<{XSD}boolean>'
        raise TurtleError(f"expected literal, got {raw!r}", pos)

    def parse_collection(self) -> str:
        """'(' already consumed; emits first/rest chain, returns head."""
        items: List[str] = []
        while True:
            t = self.peek()
            if t is None:
                raise TurtleError("unterminated collection", len(self.text))
            if t[0] == "punct" and t[1] == ")":
                self.next()
                break
            items.append(self.parse_object())
        if not items:
            return RDF_NIL_T
        cells = [self._fresh_bnode() for _ in items]
        for i, (cell, item) in enumerate(zip(cells, items)):
            self.emit(cell, RDF_FIRST_T, item)
            self.emit(
                cell, RDF_REST_T, cells[i + 1] if i + 1 < len(cells) else RDF_NIL_T
            )
        return cells[0]

    def parse_bnode_property_list(self) -> str:
        """'[' already consumed."""
        node = self._fresh_bnode()
        t = self.peek()
        if t is not None and t[0] == "punct" and t[1] == "]":
            self.next()
            return node  # ANON
        self.parse_predicate_object_list(node)
        self.expect("punct", "]")
        return node

    def parse_triple_term(self) -> str:
        """'<<(' already consumed."""
        s = self.parse_tt_component()
        p = self.parse_tt_component()
        o = self.parse_tt_component()
        self.expect("tt_close")
        return f"<<( {s} {p} {o} )>>"

    def parse_tt_component(self) -> str:
        t = self.peek()
        if t is not None and t[0] == "var":
            if not self.generalized:
                raise TurtleError("variables only allowed in generalized mode", t[2])
            self.next()
            return t[1]
        if t is None:
            raise TurtleError("unterminated triple term", len(self.text))
        if t[0] == "tt_open":
            self.next()
            return self.parse_triple_term()
        if t[0] in ("string", "double", "decimal", "integer", "boolean"):
            self.next()
            return self.parse_literal(t)
        if t[0] == "bnode":
            self.next()
            return t[1]
        if t[0] == "punct" and t[1] == "[":
            self.next()
            self.expect("punct", "]")  # ANON
            return self._fresh_bnode()
        if t[0] in ("iri", "pname"):
            return self.parse_iri_term()
        if t[0] == "a":
            self.next()
            return RDF_TYPE_T
        raise TurtleError(f"bad triple-term component {t[1]!r}", t[2])

    def parse_reified_triple(self) -> str:
        """'<<' already consumed.  Emits (r, rdf:reifies, tt); returns r.
        The inner triple is NOT asserted (reference sample 'reified
        subject' = 2 triples)."""
        s = self.parse_rt_component()
        t = self.peek()
        if t is not None and t[0] == "a":
            self.next()
            p = RDF_TYPE_T
        elif self.generalized:
            p = self.parse_rt_component()
        else:
            p = self.parse_iri_term()
        o = self.parse_rt_component()
        reifier = None
        t = self.peek()
        if t is not None and t[0] == "punct" and t[1] == "~":
            self.next()
            nxt = self.peek()
            if nxt is not None and (
                nxt[0] in self._reifier_starters()
                or (nxt[0] == "punct" and nxt[1] == "[")
            ):
                reifier = self.parse_reifier_node()
            else:
                reifier = self._fresh_bnode()
        if reifier is None:
            reifier = self._fresh_bnode()
        self.expect("rt_close")
        self.emit(reifier, RDF_REIFIES_T, f"<<( {s} {p} {o} )>>")
        return reifier

    def parse_reifier_node(self) -> str:
        t = self.peek()
        if t[0] == "bnode":
            self.next()
            return t[1]
        if t[0] == "punct" and t[1] == "[":
            self.next()
            self.expect("punct", "]")
            return self._fresh_bnode()
        if self.generalized:
            return self.parse_object()
        return self.parse_iri_term()

    def parse_rt_component(self) -> str:
        """subject/object inside << >>: iri, bnode, literal (object),
        triple term, or nested reified triple (+ variables, generalized)."""
        t = self.peek()
        if t is None:
            raise TurtleError("unterminated reified triple", len(self.text))
        if t[0] == "var":
            if not self.generalized:
                raise TurtleError("variables only allowed in generalized mode", t[2])
            self.next()
            return t[1]
        if t[0] == "rt_open":
            self.next()
            return self.parse_reified_triple()
        if t[0] == "tt_open":
            self.next()
            return self.parse_triple_term()
        if t[0] in ("string", "double", "decimal", "integer", "boolean"):
            self.next()
            return self.parse_literal(t)
        if t[0] == "bnode":
            self.next()
            return t[1]
        if t[0] == "punct" and t[1] == "[":
            self.next()
            self.expect("punct", "]")
            return self._fresh_bnode()
        if t[0] in ("iri", "pname"):
            return self.parse_iri_term()
        raise TurtleError(f"bad reified-triple component {t[1]!r}", t[2])

    def parse_subject(self) -> Tuple[str, bool]:
        """→ (term, pol_optional): pol optional after [..] and << >>."""
        t = self.peek()
        if t is None:
            raise TurtleError("expected subject", len(self.text))
        if t[0] == "bnode":
            self.next()
            return t[1], False
        if t[0] == "punct" and t[1] == "[":
            self.next()
            return self.parse_bnode_property_list(), True
        if t[0] == "punct" and t[1] == "(":
            self.next()
            return self.parse_collection(), False
        if t[0] == "rt_open":
            self.next()
            return self.parse_reified_triple(), True
        if t[0] in ("iri", "pname"):
            return self.parse_iri_term(), False
        if self.generalized:
            return self.parse_object(), False
        raise TurtleError(f"bad subject {t[1]!r}", t[2])

    def parse_object(self) -> str:
        t = self.peek()
        if t is None:
            raise TurtleError("expected object", len(self.text))
        if t[0] == "var":
            if not self.generalized:
                raise TurtleError("variables only allowed in generalized mode", t[2])
            self.next()
            return t[1]
        if t[0] == "bnode":
            self.next()
            return t[1]
        if t[0] == "punct" and t[1] == "[":
            self.next()
            return self.parse_bnode_property_list()
        if t[0] == "punct" and t[1] == "(":
            self.next()
            return self.parse_collection()
        if t[0] == "rt_open":
            self.next()
            return self.parse_reified_triple()
        if t[0] == "tt_open":
            self.next()
            return self.parse_triple_term()
        if t[0] in ("string", "double", "decimal", "integer", "boolean"):
            self.next()
            return self.parse_literal(t)
        if t[0] in ("iri", "pname"):
            return self.parse_iri_term()
        raise TurtleError(f"bad object {t[1]!r}", t[2])

    def parse_verb(self) -> str:
        t = self.peek()
        if t is not None and t[0] == "a":
            self.next()
            return RDF_TYPE_T
        if self.generalized:
            return self.parse_object()
        return self.parse_iri_term()

    def parse_predicate_object_list(self, subject: str):
        while True:
            verb = self.parse_verb()
            self.parse_object_list(subject, verb)
            t = self.peek()
            if t is not None and t[0] == "punct" and t[1] == ";":
                # consume runs of ';'; pol may end here
                while t is not None and t[0] == "punct" and t[1] == ";":
                    self.next()
                    t = self.peek()
                if t is None or not (t[0] in ("iri", "pname", "a")):
                    return
                continue
            return

    def parse_object_list(self, subject: str, verb: str):
        while True:
            obj = self.parse_object()
            self.emit(subject, verb, obj)
            self._parse_annotations(subject, verb, obj)
            t = self.peek()
            if t is not None and t[0] == "punct" and t[1] == ",":
                self.next()
                continue
            return

    def _parse_annotations(self, s: str, p: str, o: str):
        """RDF 1.2 annotation syntax after an object: ('~' reifier)? and
        '{| pol |}' blocks (reference sample 'annotation' = 5 triples)."""
        reifier: Optional[str] = None
        while True:
            t = self.peek()
            if t is not None and t[0] == "punct" and t[1] == "~" and reifier is None:
                self.next()
                nxt = self.peek()
                if nxt is not None and (
                    nxt[0] in self._reifier_starters()
                    or (nxt[0] == "punct" and nxt[1] == "[")
                ):
                    reifier = self.parse_reifier_node()
                else:
                    reifier = self._fresh_bnode()
                self.emit(reifier, RDF_REIFIES_T, f"<<( {s} {p} {o} )>>")
                continue
            if t is not None and t[0] == "ann_open":
                self.next()
                if reifier is None:
                    reifier = self._fresh_bnode()
                    self.emit(reifier, RDF_REIFIES_T, f"<<( {s} {p} {o} )>>")
                self.parse_predicate_object_list(reifier)
                self.expect("ann_close")
                continue
            return

    # -- statements ---------------------------------------------------------

    def parse_directive(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        kind, raw, pos = t
        kw = raw.lower().lstrip("@")
        if kind == "atkw" or (kind == "kw" and kw in ("prefix", "base", "version")):
            self.next()
            if kw == "prefix":
                pt = self.expect("pname")
                ns = pt[1][:-1] if pt[1].endswith(":") else pt[1].partition(":")[0]
                iri_t = self.expect("iri")
                iri = unescape(iri_t[1][1:-1])
                if split_iri(iri)[0] is None:
                    iri = resolve(self.base, iri)
                self.prefixes[ns] = iri
            elif kw == "base":
                iri_t = self.expect("iri")
                iri = unescape(iri_t[1][1:-1])
                self.base = (
                    iri if split_iri(iri)[0] is not None else resolve(self.base, iri)
                )
            else:  # version
                self.expect("string")
            if kind == "atkw":
                self.expect("punct", ".")
            return True
        return False

    def parse_graph_block_if_any(self) -> bool:
        """TriG graph blocks; returns True if one was consumed."""
        if not self.trig:
            return False
        t = self.peek()
        if t is None:
            return False
        if t[0] == "kw" and t[1].lower() == "graph":
            self.next()
            label = self.parse_reifier_node()  # iri | pname | bnode | []
            self._parse_wrapped_graph(label)
            return True
        if t[0] == "punct" and t[1] == "{":
            self._parse_wrapped_graph(None)
            return True
        # lookahead: label '{' — speculative parse with full state
        # restore (a failed label parse must not leak quads or counter
        # increments, or anon-label determinism would break)
        label_starters = ("iri", "pname", "bnode")
        if self.generalized:
            label_starters = (
                "iri", "pname", "bnode", "string", "double", "decimal",
                "integer", "boolean", "var", "tt_open",
            )
        if t[0] in label_starters or (t[0] == "punct" and t[1] == "["):
            save = (self.pos, len(self.quads), self.counter)
            try:
                label = self.parse_reifier_node()
            except TurtleError:
                self.pos, nq, self.counter = save
                del self.quads[nq:]
                return False
            nxt = self.peek()
            if nxt is not None and nxt[0] == "punct" and nxt[1] == "{":
                self._parse_wrapped_graph(label)
                return True
            self.pos, nq, self.counter = save
            del self.quads[nq:]
        return False

    def _parse_wrapped_graph(self, label: Optional[str]):
        self.expect("punct", "{")
        prev = self.graph
        self.graph = label
        while True:
            t = self.peek()
            if t is None:
                raise TurtleError("unterminated graph block", len(self.text))
            if t[0] == "punct" and t[1] == "}":
                self.next()
                break
            self.parse_triples()
            t = self.peek()
            if t is not None and t[0] == "punct" and t[1] == ".":
                self.next()
        self.graph = prev

    def parse_triples(self):
        subject, pol_optional = self.parse_subject()
        t = self.peek()
        if pol_optional and (
            t is None or (t[0] == "punct" and t[1] in (".", "}"))
        ):
            return
        self.parse_predicate_object_list(subject)

    def parse_statement(self):
        if self.parse_directive():
            return
        if self.parse_graph_block_if_any():
            return
        self.parse_triples()
        t = self.peek()
        if t is not None and t[0] == "punct" and t[1] == ".":
            self.next()
        elif t is None and not self.trig:
            raise TurtleError("expected '.' at end of statement", len(self.text))
        elif t is not None:
            raise TurtleError(f"expected '.', got {t[1]!r}", t[2])

    def parse_document(self):
        while self.peek() is not None:
            self.parse_statement()


def _line_of(text: str, pos: int) -> int:
    return text.count("\n", 0, min(pos, len(text))) + 1


def parse_turtle_document(
    url: str,
    text: str,
    *,
    quads: bool = False,
    generalized: bool = False,
    preserve_bn_labels: bool = False,
) -> List[Tuple[int, Optional[str], Optional[str], Optional[str], Optional[str], Optional[str]]]:
    """Parse one Turtle (``quads=False``) or TriG (``quads=True``) document
    → rows (line, s, p, o, g, error).  ``generalized`` enables sophia's
    generalized-RDF extension (any term kind anywhere + variables,
    `turtle/src/parser/gtrig.rs:34`).  On error, rows parsed before the
    error are kept and one quarantine row is appended."""
    out: List[Tuple] = []
    err: Optional[Tuple] = None
    try:
        p = _TurtleParser(url, text, trig=quads, generalized=generalized)
        p.parse_document()
        emitted = p.quads
    except TurtleError as e:
        emitted = getattr(e, "_partial", [])
        line = _line_of(text, e.pos)
        err = (line, None, None, None, None, f"L{line}C{e.pos}: {e}")
        # best effort: keep quads accumulated before the failure
        try:
            emitted = p.quads  # type: ignore[possibly-undefined]
        except UnboundLocalError:
            emitted = []
    for s, p_, o, g in emitted:
        if not preserve_bn_labels:
            s = _skolemize_enc(s, url)
            p_ = _skolemize_enc(p_, url)
            o = _skolemize_enc(o, url)
            g = _skolemize_enc(g, url) if g is not None else None
        out.append((0, s, p_, o, g, None))
    if err is not None:
        out.append(err)
    return out


def parse_turtle_batch(
    pdf: pd.DataFrame, *, quads: bool = False, generalized: bool = False
) -> pd.DataFrame:
    """Batch wrapper (the mapInPandas unit): columns url/text →
    url/line/s/p/o/g/error.  Turtle is inherently per-document stateful
    (SURVEY.md §2.1): per-row Python inside a vectorized Arrow batch."""
    rows = []
    for url, text in zip(pdf["url"], pdf["text"]):
        for r in parse_turtle_document(
            url, text or "", quads=quads, generalized=generalized
        ):
            rows.append((url, *r))
    return pd.DataFrame(rows, columns=_OUT_COLS)
