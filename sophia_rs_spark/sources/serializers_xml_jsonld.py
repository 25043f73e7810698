"""RDF/XML and JSON-LD serializers (SURVEY.md §2.2 stretch items).

Driver-side pretty outputs for small graphs (like the reference's
pretty printers, which materialize into BTreeSets first,
`turtle/src/serializer/_pretty.rs:30-45`); the distributed output path
remains canonical N-Quads.  Semantics:

- RDF/XML (`xml/src/serializer.rs:22-49` equivalent): rdf:RDF root,
  one rdf:Description per subject, rdf:about / rdf:nodeID,
  rdf:resource for IRI objects, rdf:datatype / xml:lang on literals.
- JSON-LD (`jsonld/src/serializer.rs:26-113` equivalent): flat
  @graph of node objects, @id / @type, @value/@language/@direction/
  @type value objects, multiple values as arrays — the expanded-form
  output (compaction against a context is a documented omission).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple
from xml.sax.saxutils import escape as xml_escape
from xml.sax.saxutils import quoteattr

from ..terms.model import RDF, XSD, Term, decode

Triple = Tuple[str, str, str]


def _split_iri_name(iri: str) -> Tuple[str, str]:
    """namespace/local split at the last # or / (XML QName constraint)."""
    for i in range(len(iri) - 1, -1, -1):
        if iri[i] in "#/" and i + 1 < len(iri):
            local = iri[i + 1 :]
            if local and (local[0].isalpha() or local[0] == "_"):
                return iri[: i + 1], local
    raise ValueError(f"cannot form QName for {iri}")


def rdfxml_serialize(triples: List[Triple]) -> str:
    """(s, p, o) canonical-encoded triples → RDF/XML document."""
    ns_map: Dict[str, str] = {RDF: "rdf"}

    def prefix_for(ns: str) -> str:
        if ns not in ns_map:
            ns_map[ns] = f"ns{len(ns_map)}"
        return ns_map[ns]

    by_subject: Dict[str, List[Tuple[str, str]]] = {}
    order: List[str] = []
    for s, p, o in triples:
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append((p, o))

    bodies = []
    for s in order:
        st = decode(s)
        if st.kind == 1:
            subj_attr = f" rdf:about={quoteattr(st.lex)}"
        else:
            subj_attr = f" rdf:nodeID={quoteattr(st.lex)}"
        props = []
        for p, o in by_subject[s]:
            pt = decode(p)
            ns, local = _split_iri_name(pt.lex)
            pfx = prefix_for(ns)
            ot = decode(o)
            if ot.kind == 1:
                props.append(f"    <{pfx}:{local} rdf:resource={quoteattr(ot.lex)}/>")
            elif ot.kind == 0:
                props.append(f"    <{pfx}:{local} rdf:nodeID={quoteattr(ot.lex)}/>")
            else:
                attrs = ""
                if ot.lang is not None:
                    attrs = f" xml:lang={quoteattr(ot.lang)}"
                elif ot.dt and ot.dt != XSD + "string":
                    attrs = f" rdf:datatype={quoteattr(ot.dt)}"
                props.append(
                    f"    <{pfx}:{local}{attrs}>{xml_escape(ot.lex)}</{pfx}:{local}>"
                )
        bodies.append(
            f"  <rdf:Description{subj_attr}>\n" + "\n".join(props) + "\n  </rdf:Description>"
        )

    ns_decls = "".join(
        f'\n    xmlns:{pfx}="{ns}"' for ns, pfx in sorted(ns_map.items(), key=lambda x: x[1])
    )
    return (
        f"<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<rdf:RDF{ns_decls}>\n"
        + "\n".join(bodies)
        + "\n</rdf:RDF>\n"
    )


def _jsonld_value(ot: Term):
    if ot.kind == 1:
        return {"@id": ot.lex}
    if ot.kind == 0:
        return {"@id": f"_:{ot.lex}"}
    if ot.lang is not None:
        v = {"@value": ot.lex, "@language": ot.lang}
        if ot.dir is not None:
            v["@direction"] = ot.dir
        return v
    if ot.dt and ot.dt != XSD + "string":
        return {"@value": ot.lex, "@type": ot.dt}
    return {"@value": ot.lex}


def jsonld_serialize(triples: List[Triple], indent: Optional[int] = 2) -> str:
    """(s, p, o) canonical-encoded triples → expanded-form JSON-LD."""
    nodes: Dict[str, dict] = {}
    order: List[str] = []
    rdf_type = f"<{RDF}type>"
    for s, p, o in triples:
        st = decode(s)
        sid = st.lex if st.kind == 1 else f"_:{st.lex}"
        if sid not in nodes:
            nodes[sid] = {"@id": sid}
            order.append(sid)
        node = nodes[sid]
        ot = decode(o)
        if p == rdf_type and ot.kind == 1:
            node.setdefault("@type", []).append(ot.lex)
            continue
        pred = decode(p).lex
        node.setdefault(pred, []).append(_jsonld_value(ot))
    return json.dumps({"@graph": [nodes[k] for k in order]}, indent=indent)


def jsonld_compact(
    triples: List[Triple], context: Dict[str, object], indent: Optional[int] = 2
) -> str:
    """Compacted JSON-LD against a caller-supplied context (the
    `jsonld/src/serializer.rs:26-113` compaction option): predicate IRIs
    shorten to context terms (or @vocab-relative names), rdf:type →
    ``@type``, @type:@id-coerced terms emit plain IRI strings, plain
    string literals collapse to bare values, single-element arrays
    unwrap."""
    vocab = context.get("@vocab")
    iri_to_term: Dict[str, str] = {}
    id_coerced: Dict[str, bool] = {}
    for term, spec in context.items():
        if term.startswith("@"):
            continue
        if isinstance(spec, str):
            iri_to_term[spec] = term
        elif isinstance(spec, dict) and "@id" in spec:
            iri_to_term[spec["@id"]] = term
            id_coerced[term] = spec.get("@type") == "@id"

    def compact_iri(iri: str, as_vocab: bool) -> str:
        if iri in iri_to_term:
            return iri_to_term[iri]
        if as_vocab and isinstance(vocab, str) and iri.startswith(vocab):
            return iri[len(vocab):]
        return iri

    def compact_value(ot: Term, term: str):
        if ot.kind == 1:
            if id_coerced.get(term):
                return ot.lex
            return {"@id": ot.lex}
        if ot.kind == 0:
            return {"@id": f"_:{ot.lex}"}
        if ot.lang is None and (ot.dt is None or ot.dt == XSD + "string"):
            return ot.lex  # plain string collapses
        return _jsonld_value(ot)

    nodes: Dict[str, dict] = {}
    order: List[str] = []
    rdf_type = f"<{RDF}type>"
    for s, p, o in triples:
        st = decode(s)
        sid = st.lex if st.kind == 1 else f"_:{st.lex}"
        if sid not in nodes:
            nodes[sid] = {"@id": sid}
            order.append(sid)
        node = nodes[sid]
        ot = decode(o)
        if p == rdf_type and ot.kind == 1:
            node.setdefault("@type", []).append(compact_iri(ot.lex, True))
            continue
        term = compact_iri(decode(p).lex, True)
        node.setdefault(term, []).append(compact_value(ot, term))
    # unwrap single-element arrays
    for node in nodes.values():
        for k, v in list(node.items()):
            if k != "@id" and isinstance(v, list) and len(v) == 1:
                node[k] = v[0]
    doc: dict = {"@context": context}
    graph = [nodes[k] for k in order]
    if len(graph) == 1:
        doc.update(graph[0])
    else:
        doc["@graph"] = graph
    return json.dumps(doc, indent=indent)


def jsonld_roundtrip_check(triples: List[Triple], url: str = "urn:x-check:") -> bool:
    """Serialize → reparse → same triple set (bnode-label invariant via
    c14n) — the self-test the serializer ships with."""
    from ..operators.c14n import canonicalize
    from .jsonld import parse_jsonld_document

    doc = jsonld_serialize(triples)
    rows = parse_jsonld_document(url, doc)
    reparsed = [(r[1], r[2], r[3], None) for r in rows if r[5] is None]
    original = [(s, p, o, None) for s, p, o in triples]
    return canonicalize(reparsed) == canonicalize(original)
