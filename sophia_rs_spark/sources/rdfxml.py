"""RDF/XML parser — the FIXTURES.md F8 subset.

The reference delegates to ``oxrdfxml`` (`xml/src/parser.rs:15-33`); we
implement the core grammar over ``xml.etree`` (expat): rdf:RDF roots,
rdf:Description and typed node elements, rdf:about / rdf:nodeID /
anonymous nodes, property elements with text content, rdf:resource,
rdf:nodeID or nested node values, rdf:datatype, xml:lang inheritance,
xml:base, rdf:parseType="Resource" (anon node shorthand),
rdf:parseType="Literal" (XML serialized as text), rdf:li container
auto-numbering (rdf:_1, rdf:_2, …), rdf:ID (fragment subjects on node
elements; classic statement reification on property elements), and
property attributes on node elements (common in the wild).

Also rdf:parseType="Collection" (rdf:first/rest/nil chains).
rdf:bagID (1999-only, removed in the 2004 REC) is rejected with a
parse error — the same behavior as oxrdfxml, the reference's parser.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

import pandas as pd

from ..terms.iri import resolve, split_iri
from ..terms.model import RDF, escape_literal
from ..terms.xxh64 import skolem_label
from .ntparser import _OUT_COLS

RDF_NS = RDF[:-1] if RDF.endswith("#") else RDF  # keep '#' form below
RDF_TYPE_T = f"<{RDF}type>"

_RDF = "{" + RDF + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"

_SYNTAX_ATTRS = {
    _RDF + "about",
    _RDF + "resource",
    _RDF + "nodeID",
    _RDF + "datatype",
    _RDF + "parseType",
    _RDF + "ID",
    _XML_LANG,
    _XML_BASE,
}


class RdfXmlError(ValueError):
    pass


def _expand(tag: str) -> str:
    """'{ns}local' → full IRI."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    raise RdfXmlError(f"unqualified name {tag!r}")


class _RdfXmlParser:
    def __init__(self, url: str):
        self.url = url
        self.counter = 0
        self.triples: List[Tuple[str, str, str]] = []

    def _bnode(self) -> str:
        self.counter += 1
        return "_:" + skolem_label(self.url, f"\x00xml{self.counter}")

    def _nodeid_bnode(self, label: str) -> str:
        return "_:" + skolem_label(self.url, label)

    def _iri(self, ref: str, base: str) -> str:
        if split_iri(ref)[0] is not None:
            return f"<{ref}>"
        return f"<{resolve(base, ref)}>"

    def _literal(self, lex: str, lang: Optional[str], dt: Optional[str]) -> str:
        if dt:
            return f'"{escape_literal(lex)}"^^<{dt}>'
        if lang:
            return f'"{escape_literal(lex)}"@{lang.lower()}'
        return f'"{escape_literal(lex)}"'

    def node_element(self, el: ET.Element, lang: Optional[str], base: str) -> str:
        lang = el.get(_XML_LANG, lang)
        base = el.get(_XML_BASE, base)
        if el.get(_RDF + "bagID") is not None:
            # rdf:bagID was removed in RDF/XML (2004); oxrdfxml — the
            # reference's parser — rejects it as an unexpected rdf:*
            # attribute, so we error (→ quarantine) rather than silently
            # emitting an rdf:bagID property triple
            raise RdfXmlError(
                "rdf:bagID is not RDF/XML (removed in the 2004 REC)"
            )
        if el.get(_RDF + "about") is not None:
            subject = self._iri(el.get(_RDF + "about"), base)
        elif el.get(_RDF + "ID") is not None:
            # rdf:ID on a node element ≡ rdf:about="#ID"
            subject = self._iri("#" + el.get(_RDF + "ID"), base)
        elif el.get(_RDF + "nodeID") is not None:
            subject = self._nodeid_bnode(el.get(_RDF + "nodeID"))
        else:
            subject = self._bnode()
        name = _expand(el.tag)
        if name != f"{RDF}Description":
            self.triples.append((subject, RDF_TYPE_T, f"<{name}>"))
        # property attributes (non-syntax attrs) → string literals
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith("{http://www.w3.org/2000/xmlns/"):
                continue
            try:
                pred = _expand(k)
            except RdfXmlError:
                continue  # unqualified attr (e.g. html) — skip
            self.triples.append((subject, f"<{pred}>", self._literal(v, lang, None)))
        li_counter = [0]  # rdf:li auto-numbering resets per node element
        for child in el:
            self.property_element(subject, child, lang, base, li_counter)
        return subject

    def property_element(
        self,
        subject: str,
        el: ET.Element,
        lang: Optional[str],
        base: str,
        li_counter: Optional[list] = None,
    ):
        lang = el.get(_XML_LANG, lang)
        base = el.get(_XML_BASE, base)
        name = _expand(el.tag)
        if name == f"{RDF}li":
            # container membership: rdf:li → rdf:_1, rdf:_2, …
            if li_counter is None:
                li_counter = [0]
            li_counter[0] += 1
            name = f"{RDF}_{li_counter[0]}"
        pred = f"<{name}>"
        reify_id = el.get(_RDF + "ID")
        if reify_id is not None:
            # rdf:ID on a property element reifies the asserted statement
            # (classic RDF reification: rdf:Statement + subject/predicate/
            # object at <base#ID>)
            mark = len(self.triples)
            self._property_value(subject, pred, el, lang, base)
            stmt = next(
                (t for t in self.triples[mark:] if t[0] == subject and t[1] == pred),
                None,
            )
            if stmt is not None:
                r = self._iri("#" + reify_id, base)
                self.triples.append((r, RDF_TYPE_T, f"<{RDF}Statement>"))
                self.triples.append((r, f"<{RDF}subject>", stmt[0]))
                self.triples.append((r, f"<{RDF}predicate>", stmt[1]))
                self.triples.append((r, f"<{RDF}object>", stmt[2]))
            return
        self._property_value(subject, pred, el, lang, base)

    def _property_value(self, subject: str, pred: str, el: ET.Element,
                        lang: Optional[str], base: str):
        parse_type = el.get(_RDF + "parseType")
        if el.get(_RDF + "resource") is not None:
            self.triples.append((subject, pred, self._iri(el.get(_RDF + "resource"), base)))
            return
        if el.get(_RDF + "nodeID") is not None:
            self.triples.append((subject, pred, self._nodeid_bnode(el.get(_RDF + "nodeID"))))
            return
        if parse_type == "Resource":
            node = self._bnode()
            self.triples.append((subject, pred, node))
            inner_li = [0]
            for child in el:
                self.property_element(node, child, lang, base, inner_li)
            return
        if parse_type == "Collection":
            # rdf:first/rest/nil chain over the child node elements
            items = [self.node_element(c, lang, base) for c in el]
            if not items:
                self.triples.append((subject, pred, f"<{RDF}nil>"))
                return
            cells = [self._bnode() for _ in items]
            self.triples.append((subject, pred, cells[0]))
            for i, (cell, item) in enumerate(zip(cells, items)):
                self.triples.append((cell, f"<{RDF}first>", item))
                self.triples.append(
                    (
                        cell,
                        f"<{RDF}rest>",
                        cells[i + 1] if i + 1 < len(cells) else f"<{RDF}nil>",
                    )
                )
            return
        if parse_type == "Literal":
            xml_text = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el
            )
            self.triples.append(
                (subject, pred, self._literal(xml_text, None, f"{RDF}XMLLiteral"))
            )
            return
        children = list(el)
        if children:
            obj = self.node_element(children[0], lang, base)
            self.triples.append((subject, pred, obj))
            return
        dt = el.get(_RDF + "datatype")
        self.triples.append(
            (subject, pred, self._literal(el.text or "", lang, dt))
        )

    def run(self, text: str):
        root = ET.fromstring(text)
        lang = root.get(_XML_LANG)
        base = root.get(_XML_BASE, self.url)
        if _expand(root.tag) == f"{RDF}RDF":
            for child in root:
                self.node_element(child, lang, base)
        else:
            self.node_element(root, lang, base)


def parse_rdfxml_document(
    url: str, text: str
) -> List[Tuple[int, Optional[str], Optional[str], Optional[str], Optional[str], Optional[str]]]:
    p = _RdfXmlParser(url)
    try:
        p.run(text)
    except (ET.ParseError, RdfXmlError) as e:
        return [(0, None, None, None, None, f"rdfxml: {e}")]
    return [(0, s, pr, o, None, None) for (s, pr, o) in p.triples]


def parse_rdfxml_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for url, text in zip(pdf["url"], pdf["text"]):
        for r in parse_rdfxml_document(url, text or ""):
            rows.append((url, *r))
    return pd.DataFrame(rows, columns=_OUT_COLS)
