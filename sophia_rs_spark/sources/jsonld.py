"""JSON-LD 1.1 → RDF (toRdf) for the schema.org-flavored subset.

Covers the FIXTURES.md F6 surface of sophia's JSON-LD parser
(`jsonld/src/parser.rs:42-100`, options `jsonld/src/options.rs:106-402`):
inline ``@context`` (term maps, ``@vocab``, ``@language``), bundled
static remote contexts (the ``StaticLoader`` model,
`jsonld/src/loader/static_loader.rs` — executors never do HTTP),
``@id``/anonymous nodes, ``@type``, ``@value``/``@language``/
``@direction``, typed values (JSON-LD canonical xsd:integer/xsd:double/
xsd:boolean forms), ``@list`` → rdf:first/rest/nil, top-level
``@graph``, nested node objects, arrays.

Also: ``@reverse``, ``@set`` unwrapping, ``@container: @index`` (index
keys dropped per toRdf), ``@nest``.  Documented limitations vs the full
spec (SURVEY.md §7 risk item): no ``@included``, term-scoped contexts,
or JSON literals.  Unmapped terms are dropped (spec behavior).
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict, List, Optional, Tuple

import pandas as pd

from ..terms.iri import resolve, split_iri
from ..terms.model import RDF, XSD, escape_literal
from ..terms.xxh64 import skolem_label
from .ntparser import _OUT_COLS

RDF_TYPE_T = f"<{RDF}type>"
RDF_FIRST_T = f"<{RDF}first>"
RDF_REST_T = f"<{RDF}rest>"
RDF_NIL_T = f"<{RDF}nil>"

# Bundled static contexts (offline StaticLoader model).  schema.org's real
# context is huge; the bundled version is @vocab-based, which yields the
# same term→IRI mapping for plain terms.
STATIC_CONTEXTS: Dict[str, Dict[str, Any]] = {
    "https://schema.org": {"@vocab": "https://schema.org/"},
    "http://schema.org": {"@vocab": "http://schema.org/"},
    "https://schema.org/": {"@vocab": "https://schema.org/"},
}

_KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@direction",
    "@list", "@graph", "@vocab", "@base", "@version",
}

RDF_JSON = f"{RDF}JSON"
I18N_NS = "https://www.w3.org/ns/i18n#"

# JSON-LD 1.1 features rejected under processing mode json-ld-1.0
# (options.rs:106-124 processing_mode; json-ld-api §4.4)
_V11_KEYWORDS = {"@json", "@direction", "@nest", "@included", "@version"}


class JsonLdError(ValueError):
    pass


def _jcs_number(v) -> str:
    """RFC 8785 (JCS) number serialization — the ES6 Number::toString
    subset we can hit from Python floats/ints."""
    if isinstance(v, int):
        return str(v)
    if v != v or v in (float("inf"), float("-inf")):
        raise JsonLdError("@json literal cannot contain NaN/Infinity")
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    r = repr(v)  # shortest round-trip, like ES6
    if "e" in r:
        mant, _, exp = r.partition("e")
        exp_i = int(exp)
        if mant.endswith(".0"):
            mant = mant[:-2]
        return f"{mant}e{'+' if exp_i >= 0 else ''}{exp_i}"
    return r


def _jcs(value) -> str:
    """JSON Canonicalization Scheme (RFC 8785): sorted keys, no
    whitespace, ES6 numbers — the rdf:JSON lexical form (json-ld-api
    §8.7 toRdf uses JCS for @json literals)."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return _jcs_number(value)
    if isinstance(value, str):
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, list):
        return "[" + ",".join(_jcs(v) for v in value) + "]"
    if isinstance(value, dict):
        items = sorted(value.items(), key=lambda kv: kv[0])
        return (
            "{"
            + ",".join(f"{json.dumps(k, ensure_ascii=False)}:{_jcs(v)}" for k, v in items)
            + "}"
        )
    raise JsonLdError(f"unserializable @json value {type(value)}")


def _canon_double(v: float) -> str:
    """JSON-LD canonical xsd:double lexical form (XSD canonical mapping:
    mantissa E exponent, e.g. 3.14 → '3.14E0')."""
    if v == 0:
        return "0.0E0" if math.copysign(1, v) > 0 else "-0.0E0"
    s = f"{v:E}"  # e.g. 3.140000E+00
    mant, _, exp = s.partition("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    exp_i = int(exp)
    return f"{mant}E{exp_i}"


class _Ctx:
    def __init__(self, base: str):
        self.terms: Dict[str, Any] = {}
        self.vocab: Optional[str] = None
        self.base = base
        self.language: Optional[str] = None
        self.direction: Optional[str] = None

    def clone(self) -> "_Ctx":
        c = _Ctx(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        c.direction = self.direction
        return c


class _JsonLdToRdf:
    def __init__(
        self,
        url: str,
        rdf_direction: Optional[str] = None,
        processing_mode: str = "json-ld-1.1",
    ):
        """``rdf_direction`` mirrors `jsonld/src/options.rs:125,352-365`:
        None (default) emits RDF 1.2 initial-text-direction literals
        (``"lex"@tag--dir`` — sophia's native representation);
        'i18n-datatype' emits ``"lex"^^<https://www.w3.org/ns/i18n#lang_dir>``;
        'compound-literal' emits a bnode with rdf:value/language/direction.
        ``processing_mode='json-ld-1.0'`` rejects 1.1-only keywords."""
        self.url = url
        self.counter = 0
        self.triples: List[Tuple[str, str, str, Optional[str]]] = []
        if rdf_direction not in (None, "i18n-datatype", "compound-literal"):
            raise JsonLdError(f"invalid rdfDirection {rdf_direction!r}")
        self.rdf_direction = rdf_direction
        self.mode_10 = processing_mode == "json-ld-1.0"

    def _check_11(self, kw: str):
        if self.mode_10 and kw in _V11_KEYWORDS:
            raise JsonLdError(f"{kw} requires JSON-LD 1.1 (processing mode is 1.0)")

    def _fresh_bnode(self) -> str:
        self.counter += 1
        return "_:" + skolem_label(self.url, f"\x00jld{self.counter}")

    def _bnode_ref(self, label: str) -> str:
        """Explicit ``_:label`` → url-scoped skolem label, matching the
        NT/Turtle/RDF-XML parsers (ntparser.py `_skolemize_enc`): blank
        nodes are document-scoped, so the same label in two documents
        must NOT collide when quads are unioned across pages."""
        return "_:" + skolem_label(self.url, label)

    # -- context ------------------------------------------------------------

    def _apply_context(self, ctx: _Ctx, spec: Any) -> _Ctx:
        out = ctx.clone()
        if spec is None:
            return _Ctx(self.url)
        specs = spec if isinstance(spec, list) else [spec]
        for s in specs:
            if isinstance(s, str):
                bundled = STATIC_CONTEXTS.get(s.rstrip("/")) or STATIC_CONTEXTS.get(s)
                if bundled is None:
                    raise JsonLdError(f"remote context not bundled: {s}")
                out = self._apply_context(out, bundled)
                continue
            if not isinstance(s, dict):
                raise JsonLdError("invalid @context entry")
            for k, v in s.items():
                if k == "@vocab":
                    out.vocab = v
                elif k == "@base":
                    out.base = (
                        v if split_iri(v)[0] is not None else resolve(out.base, v)
                    )
                elif k == "@language":
                    out.language = v
                elif k == "@direction":
                    self._check_11("@direction")
                    if v not in (None, "ltr", "rtl"):
                        raise JsonLdError(f"invalid @direction {v!r}")
                    out.direction = v
                elif k == "@version":
                    if v == 1.1 and self.mode_10:
                        raise JsonLdError(
                            "@version 1.1 in context under processing mode 1.0"
                        )
                else:
                    out.terms[k] = v
        return out

    def _expand_iri(self, ctx: _Ctx, value: str, vocab: bool) -> Optional[str]:
        if value in ctx.terms:
            t = ctx.terms[value]
            mapped = t if isinstance(t, str) else t.get("@id", value)
            if mapped != value:
                return self._expand_iri(ctx, mapped, vocab=True)
            return mapped
        if ":" in value:
            prefix, _, suffix = value.partition(":")
            if prefix in ctx.terms and not suffix.startswith("//"):
                t = ctx.terms[prefix]
                pfx = t if isinstance(t, str) else t.get("@id")
                return f"{pfx}{suffix}"
            return value  # absolute IRI (or bnode id)
        if vocab and ctx.vocab:
            return f"{ctx.vocab}{value}"
        if not vocab:
            return resolve(ctx.base, value)
        return None  # unmapped term → dropped

    def _term_def(self, ctx: _Ctx, term: str) -> Dict[str, Any]:
        t = ctx.terms.get(term)
        return t if isinstance(t, dict) else {}

    # -- values -------------------------------------------------------------

    def _literal(self, lex: str, dt: Optional[str] = None, lang: Optional[str] = None,
                 dir_: Optional[str] = None, graph: Optional[str] = None) -> str:
        if dir_ is not None:
            return self._dir_literal(lex, lang, dir_, graph)
        if lang is not None:
            return f'"{escape_literal(lex)}"@{lang.lower()}'
        if dt is None or dt == f"{XSD}string":
            return f'"{escape_literal(lex)}"'
        return f'"{escape_literal(lex)}"^^<{dt}>'

    def _dir_literal(
        self, lex: str, lang: Optional[str], dir_: str, graph: Optional[str]
    ) -> str:
        """Directional literal per the rdfDirection option
        (json-ld-api §8.7 steps 10-12; options.rs:352-365)."""
        tag = (lang or "").lower()
        if self.rdf_direction is None:
            # RDF 1.2 initial-text-direction literal (sophia-native)
            if not tag:
                return f'"{escape_literal(lex)}"'
            return f'"{escape_literal(lex)}"@{tag}--{dir_}'
        if self.rdf_direction == "i18n-datatype":
            return f'"{escape_literal(lex)}"^^<{I18N_NS}{tag}_{dir_}>'
        # compound-literal: fresh bnode carrying value/language/direction
        node = self._fresh_bnode()
        self.triples.append((node, f"<{RDF}value>", f'"{escape_literal(lex)}"', graph))
        if tag:
            self.triples.append((node, f"<{RDF}language>", f'"{tag}"', graph))
        self.triples.append((node, f"<{RDF}direction>", f'"{dir_}"', graph))
        return node

    def _scalar_to_term(
        self, ctx: _Ctx, v: Any, tdef: Dict[str, Any], graph: Optional[str] = None
    ) -> str:
        t_type = tdef.get("@type")
        if isinstance(v, bool):
            return self._literal("true" if v else "false", f"{XSD}boolean")
        if isinstance(v, int):
            if t_type == "@id":
                raise JsonLdError("numeric @id")
            return self._literal(str(v), f"{XSD}integer")
        if isinstance(v, float):
            if v.is_integer() and abs(v) < 1e21 and t_type != f"{XSD}double":
                return self._literal(str(int(v)), f"{XSD}integer")
            return self._literal(_canon_double(v), f"{XSD}double")
        # string
        if t_type == "@id":
            if v.startswith("_:"):
                return self._bnode_ref(v[2:])
            iri = self._expand_iri(ctx, v, vocab=False)
            return f"<{iri}>"
        if t_type:
            dt = self._expand_iri(ctx, t_type, vocab=True)
            return self._literal(v, dt)
        lang = tdef.get("@language", ctx.language)
        dir_ = tdef.get("@direction", ctx.direction) if lang is not None else None
        return self._literal(v, lang=lang, dir_=dir_, graph=graph)

    def _value_object(
        self, ctx: _Ctx, v: Dict[str, Any], graph: Optional[str] = None
    ) -> str:
        val = v["@value"]
        lang = v.get("@language")
        dir_ = v.get("@direction")
        if dir_ is not None:
            self._check_11("@direction")
        if "@type" in v:
            if v["@type"] == "@json":
                self._check_11("@json")
                return self._literal(_jcs(val), RDF_JSON)
            dt = self._expand_iri(ctx, v["@type"], vocab=True)
            if isinstance(val, bool):
                val = "true" if val else "false"
            return self._literal(str(val), dt)
        if isinstance(val, bool):
            return self._literal("true" if val else "false", f"{XSD}boolean")
        if isinstance(val, int):
            return self._literal(str(val), f"{XSD}integer")
        if isinstance(val, float):
            if val.is_integer() and abs(val) < 1e21:
                return self._literal(str(int(val)), f"{XSD}integer")
            return self._literal(_canon_double(val), f"{XSD}double")
        if dir_ is None and lang is not None:
            dir_ = ctx.direction  # context default direction
        return self._literal(str(val), lang=lang, dir_=dir_, graph=graph)

    # -- nodes --------------------------------------------------------------

    def _node_id(self, ctx: _Ctx, node: Dict[str, Any]) -> str:
        if "@id" in node:
            raw = node["@id"]
            if raw.startswith("_:"):
                return self._bnode_ref(raw[2:])
            iri = self._expand_iri(ctx, raw, vocab=False)
            return f"<{iri}>"
        return self._fresh_bnode()

    def process_node(self, ctx: _Ctx, node: Dict[str, Any], graph: Optional[str]) -> str:
        if "@context" in node:
            ctx = self._apply_context(ctx, node["@context"])
        if "@value" in node:
            return self._value_object(ctx, node, graph)
        if "@list" in node:
            return self._process_list(ctx, node["@list"], graph)
        subject = self._node_id(ctx, node)
        for key, value in node.items():
            self._process_key(ctx, subject, key, value, graph, node)
        return subject

    def _process_key(self, ctx: _Ctx, subject: str, key: str, value, graph, node):
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    tiri = self._expand_iri(ctx, t, vocab=True)
                    if tiri:
                        self.triples.append((subject, RDF_TYPE_T, f"<{tiri}>", graph))
                return
            if key == "@graph":
                # node with @id + @graph: named graph (TriG-like)
                gname = subject if "@id" in node else graph
                items = value if isinstance(value, list) else [value]
                for item in items:
                    self.process_node(ctx, item, gname)
                return
            if key in _KEYWORDS:
                return
            if key == "@nest" or (
                isinstance(ctx.terms.get(key), str) and ctx.terms[key] == "@nest"
            ):
                self._check_11("@nest")
                # @nest: nested object's properties belong to THIS subject
                for nested in value if isinstance(value, list) else [value]:
                    if isinstance(nested, dict):
                        for nk, nv in nested.items():
                            if nk != "@context":
                                self._process_key(ctx, subject, nk, nv, graph, nested)
                return
            if key == "@reverse":
                # { "@reverse": { prop: nodes } } → (node, prop, subject)
                for rkey, rval in value.items():
                    rpred = self._expand_iri(ctx, rkey, vocab=True)
                    if rpred is None:
                        continue
                    rvals = rval if isinstance(rval, list) else [rval]
                    for v in rvals:
                        obj = self._value_to_term(ctx, v, {}, graph)
                        if obj is not None:
                            self.triples.append((obj, f"<{rpred}>", subject, graph))
                return
            if key == "@included":
                # @included: sibling node objects (JSON-LD 1.1)
                self._check_11("@included")
                for inc in value if isinstance(value, list) else [value]:
                    if isinstance(inc, dict):
                        self.process_node(ctx, inc, graph)
                return
            pred = self._expand_iri(ctx, key, vocab=True)
            if pred is None:
                return  # unmapped term dropped
            tdef = self._term_def(ctx, key)
            if "@context" in tdef:
                # term-scoped context applies while processing this value
                ctx = self._apply_context(ctx, tdef["@context"])
            if tdef.get("@container") == "@index" and isinstance(value, dict):
                # index maps: keys are data-organization only — dropped
                value = [v for vs in value.values()
                         for v in (vs if isinstance(vs, list) else [vs])]
            values = value if isinstance(value, list) else [value]
            if tdef.get("@container") == "@list":
                head = self._process_list(ctx, values, graph, tdef)
                self.triples.append((subject, f"<{pred}>", head, graph))
                return
            for v in values:
                if isinstance(v, dict) and "@set" in v:
                    # @set unwraps to its members (no list structure)
                    for sv in (
                        v["@set"] if isinstance(v["@set"], list) else [v["@set"]]
                    ):
                        obj = self._value_to_term(ctx, sv, tdef, graph)
                        if obj is not None:
                            self.triples.append((subject, f"<{pred}>", obj, graph))
                    continue
                obj = self._value_to_term(ctx, v, tdef, graph)
                if obj is not None:
                    self.triples.append((subject, f"<{pred}>", obj, graph))

    def _value_to_term(self, ctx: _Ctx, v: Any, tdef: Dict[str, Any],
                       graph: Optional[str]) -> Optional[str]:
        if v is None and tdef.get("@type") != "@json":
            return None
        if tdef.get("@type") == "@json":
            # @json-typed term: the WHOLE value (object/array/scalar/null)
            # becomes one rdf:JSON literal (json-ld-api §8.7 step 8)
            self._check_11("@json")
            return self._literal(_jcs(v), RDF_JSON)
        if isinstance(v, dict):
            if "@value" in v:
                return self._value_object(ctx, v, graph)
            if "@list" in v:
                return self._process_list(ctx, v["@list"], graph, tdef)
            return self.process_node(ctx, v, graph)
        return self._scalar_to_term(ctx, v, tdef, graph)

    def _process_list(self, ctx: _Ctx, items: List[Any], graph: Optional[str],
                      tdef: Optional[Dict[str, Any]] = None) -> str:
        items = items if isinstance(items, list) else [items]
        if not items:
            return RDF_NIL_T
        cells = [self._fresh_bnode() for _ in items]
        for i, (cell, item) in enumerate(zip(cells, items)):
            obj = self._value_to_term(ctx, item, tdef or {}, graph)
            if obj is not None:
                self.triples.append((cell, RDF_FIRST_T, obj, graph))
            self.triples.append(
                (cell, RDF_REST_T, cells[i + 1] if i + 1 < len(cells) else RDF_NIL_T, graph)
            )
        return cells[0]

    def run(self, doc: Any):
        ctx = _Ctx(self.url)
        if isinstance(doc, dict) and "@context" in doc:
            ctx = self._apply_context(ctx, doc["@context"])
        if isinstance(doc, list):
            for node in doc:
                self.process_node(ctx, node, None)
        elif isinstance(doc, dict):
            if set(doc.keys()) <= {"@context", "@graph"} and "@graph" in doc:
                items = doc["@graph"]
                for node in items if isinstance(items, list) else [items]:
                    self.process_node(ctx, node, None)
            else:
                self.process_node(ctx, doc, None)
        else:
            raise JsonLdError("top-level JSON-LD must be object or array")


def parse_jsonld_document(
    url: str,
    text: str,
    *,
    rdf_direction: Optional[str] = None,
    processing_mode: str = "json-ld-1.1",
) -> List[Tuple[int, Optional[str], Optional[str], Optional[str], Optional[str], Optional[str]]]:
    """Parse one JSON-LD document → rows (line, s, p, o, g, error)."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        return [(e.lineno, None, None, None, None, f"L{e.lineno}: invalid JSON: {e.msg}")]
    proc = _JsonLdToRdf(url, rdf_direction=rdf_direction, processing_mode=processing_mode)
    try:
        proc.run(doc)
    except JsonLdError as e:
        return [(0, None, None, None, None, f"jsonld: {e}")]
    return [(0, s, p, o, g, None) for (s, p, o, g) in proc.triples]


def parse_jsonld_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for url, text in zip(pdf["url"], pdf["text"]):
        for r in parse_jsonld_document(url, text or ""):
            rows.append((url, *r))
    return pd.DataFrame(rows, columns=_OUT_COLS)
