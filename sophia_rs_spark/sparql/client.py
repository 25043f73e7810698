"""SPARQL 1.1 protocol client (transport-pluggable, Spark-first).

Mirrors the reference's ``SparqlClient`` (`sparql_client/src/lib.rs:58-177`):
POST the query with ``Content-type: application/sparql-query`` and a
content-negotiation ``Accept`` header (``DEFAULT_ACCEPT``,
`lib.rs:66-68`), then dispatch on the response media type —

- ``application/sparql-results+json`` / ``+xml`` → an ASK boolean or a
  SELECT bindings result (`sparql_client/src/results.rs:16-147`),
- ``text/turtle`` / ``application/n-triples`` / ``application/rdf+xml``
  → a CONSTRUCT/DESCRIBE triples result (`lib.rs:144-162`
  ``wrap_triple_source``),
- anything else → ``unsupported content-type`` (`lib.rs:163-167`).

Spark-first shape: bindings come back as a DataFrame of canonical term
encodings (one column per SELECT variable — the same encoding the rest
of the engine uses), and graph bodies are parsed DISTRIBUTED through
the existing `plans.extract.extract_quads` mapInPandas pipeline, so a
multi-gigabyte CONSTRUCT export is split and parsed in parallel instead
of on the driver.  The results-JSON/XML header+bindings documents are
decoded driver-side (they are one JSON/XML value; result sets a human
SELECTs are small — bulk data belongs to the graph formats).

The HTTP transport is injected: ``transport(url, headers, body) ->
(content_type, payload_bytes)``.  The default transport uses the
stdlib ``urllib`` (reqwest's role in `lib.rs:40`); tests inject fakes —
this sandbox has no network, and the protocol logic (request shape,
negotiation, dispatch, parsing, term validation) is what carries
parity.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Callable, Dict, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession

from ..terms.bcp47 import is_valid_language_tag
from ..terms.iri import is_valid_iri_ref
from ..terms.model import Term

Transport = Callable[[str, Dict[str, str], bytes], Tuple[str, bytes]]

_SRX_NS = "http://www.w3.org/2005/sparql-results#"


class SparqlClientError(Exception):
    """Client-side protocol error (`sparql_client/src/lib.rs:212-276`
    ``Error``: i/o, http, unsupported media type, invalid IRI / bnode
    id / language tag / base direction)."""


class SparqlClient:
    """A SPARQL 1.1 protocol client over a pluggable transport."""

    #: `lib.rs:66-68` — content-negotiation preference order.
    DEFAULT_ACCEPT = (
        "application/sparql-results+json,"
        "application/sparql-results+xml;q=0.8,"
        "text/turtle,application/n-triples;q=0.9,"
        "application/rdf+xml;q=0.8"
    )

    def __init__(
        self,
        endpoint: str,
        transport: Optional[Transport] = None,
        accept: Optional[str] = None,
    ):
        self.endpoint = endpoint
        self._transport = transport or _urllib_transport
        self._accept = accept

    def with_accept(self, accept: str) -> "SparqlClient":
        """`lib.rs:88-97` — override the Accept header (useful when an
        endpoint negotiates incorrectly)."""
        return SparqlClient(self.endpoint, self._transport, accept)

    @property
    def accept(self) -> str:
        return self._accept or self.DEFAULT_ACCEPT

    # -- request ------------------------------------------------------------

    def build_request(self, query: str) -> Tuple[str, Dict[str, str], bytes]:
        """The POST request triple (`lib.rs:123-133`): url, headers
        (Accept / Content-type / User-Agent), body = the query text."""
        headers = {
            "Accept": self.accept,
            "Content-type": "application/sparql-query",
            "User-Agent": "sophia-rs-spark SPARQL Client",
        }
        return self.endpoint, headers, query.encode("utf-8")

    # -- query --------------------------------------------------------------

    def query(
        self,
        spark: SparkSession,
        query: str,
        *,
        graph_ok: bool = True,
        return_nullable: bool = False,
    ) -> Union[bool, DataFrame, tuple]:
        """Execute ``query`` against the endpoint.  Returns an ASK
        boolean, a SELECT bindings DataFrame (canonical term-encoding
        columns, one per variable), or a triples DataFrame
        (s, p, o) for graph-shaped responses.  With ``graph_ok=False``
        a graph-shaped response errors instead (a SELECT caller must
        not misread a mislabeled graph body as bindings — SERVICE
        evaluation sets this).

        With ``return_nullable=True`` the result is a ``(result,
        nullable)`` pair where ``nullable`` is the set of variables the
        response actually left UNBOUND in some solution — known for
        free at parse time (the rows pass through the driver here
        anyway, by the protocol's small-document nature).  SERVICE
        evaluation uses it to keep fully-bound remote columns as plain
        equi-join keys instead of pessimistic compatibility conditions
        (which degrade to a nested-loop join)."""
        url, headers, body = self.build_request(query)
        try:
            ctype, payload = self._transport(url, headers, body)
        except SparqlClientError:
            raise
        except Exception as ex:  # i/o + http errors (`lib.rs:215-227`)
            raise SparqlClientError(f"http error: {ex}") from ex
        ctype = (ctype or "application/octet-stream").split(";")[0].strip()
        if ctype == "application/sparql-results+json":
            doc = parse_results_json(payload)
        elif ctype == "application/sparql-results+xml":
            doc = parse_results_xml(payload)
        elif ctype in ("text/turtle", "application/n-triples",
                       "application/rdf+xml"):
            if not graph_ok:
                raise SparqlClientError(
                    f"unexpected graph response: {ctype}"
                )
            fmt = {
                "text/turtle": "ttl",
                "application/n-triples": "nt",
                "application/rdf+xml": "rdfxml",
            }[ctype]
            out = self._triples_df(spark, payload, fmt)
            return (out, set()) if return_nullable else out
        else:
            raise SparqlClientError(
                f"unsupported content-type: {ctype}"
            )
        if isinstance(doc, bool):
            return (doc, set()) if return_nullable else doc
        variables, rows = doc
        schema = ", ".join(f"`{v}` string" for v in variables) or "dummy string"
        if not variables:
            out = spark.createDataFrame([], "dummy string").drop("dummy")
            return (out, set()) if return_nullable else out
        out = spark.createDataFrame(rows, schema)
        if not return_nullable:
            return out
        nullable = {
            v
            for i, v in enumerate(variables)
            if any(r[i] is None for r in rows)
        }
        return out, nullable

    def _triples_df(
        self, spark: SparkSession, payload: bytes, fmt: str
    ) -> DataFrame:
        """Graph-shaped response → distributed parse through the
        extraction pipeline (the Spark twin of `lib.rs:104-120`
        ``wrap_triple_source``): the body is one `text` payload whose
        parse fans out via mapInPandas; parse errors surface as rows in
        the quarantine `error` column, exactly like file ingestion."""
        from ..plans.extract import extract_quads

        pages = spark.createDataFrame(
            [(self.endpoint, payload.decode("utf-8"), fmt)],
            "url string, text string, fmt string",
        )
        quads = extract_quads(pages, from_html=False)
        return quads.where(quads["error"].isNull()).select("s", "p", "o")


# -- default transport -------------------------------------------------------


def _urllib_transport(
    url: str, headers: Dict[str, str], body: bytes
) -> Tuple[str, bytes]:
    """stdlib HTTP POST (the reqwest role).  Never exercised in tests —
    the sandbox has no network; injected fakes stand in."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers)
    with urllib.request.urlopen(req) as resp:  # pragma: no cover
        return (
            resp.headers.get("Content-Type", "application/octet-stream"),
            resp.read(),
        )


# -- results-document parsing (results.rs:16-147 inverse) --------------------


def _term_from_json(obj: dict) -> str:
    """Results-JSON term object → canonical encoding, with the same
    validation the reference applies while converting to terms
    (`results.rs:92-121`): invalid IRI / bnode id / language tag /
    base direction are protocol errors."""
    t = obj.get("type")
    v = obj.get("value")
    if t == "uri":
        if not isinstance(v, str) or not is_valid_iri_ref(v):
            raise SparqlClientError(f"invalid iri: {v!r}")
        return Term.iri(v).encode()
    if t == "bnode":
        if not isinstance(v, str) or not v or any(
            c.isspace() for c in v
        ):
            raise SparqlClientError(f"invalid bnode identifier: {v!r}")
        return Term.bnode(v).encode()
    if t == "literal" or t == "typed-literal":  # Virtuoso legacy alias
        if not isinstance(v, str):
            raise SparqlClientError(f"invalid literal value: {v!r}")
        lang = obj.get("xml:lang")
        if lang is not None:
            if not is_valid_language_tag(lang):
                raise SparqlClientError(f"invalid language tag: {lang!r}")
            dir_ = obj.get("its:dir")
            if dir_ is not None and dir_ not in ("ltr", "rtl"):
                raise SparqlClientError(f"invalid base direction: {dir_!r}")
            return Term.literal(v, lang=lang, dir=dir_).encode()
        dt = obj.get("datatype")
        if dt is not None and not is_valid_iri_ref(dt):
            raise SparqlClientError(f"invalid iri: {dt!r}")
        return Term.literal(v, dt=dt).encode()
    if t == "triple":
        if not isinstance(v, dict):
            raise SparqlClientError("invalid triple term")
        parts = []
        for k in ("subject", "predicate", "object"):
            if k not in v:
                raise SparqlClientError(f"triple term missing {k}")
            parts.append(_term_from_json(v[k]))
        return f"<<( {parts[0]} {parts[1]} {parts[2]} )>>"
    raise SparqlClientError(f"unknown term type: {t!r}")


def parse_results_json(
    payload: bytes,
) -> Union[bool, Tuple[List[str], List[tuple]]]:
    """``application/sparql-results+json`` → ASK boolean or
    (variables, binding rows of canonical encodings / None)
    (`results.rs:16-42` ``ResultsDocument`` / ``BindingsDocument``;
    row assembly = ``pop_binding``, `results.rs:124-137`: one slot per
    head variable, absent bindings stay unbound)."""
    try:
        doc = json.loads(payload.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as ex:
        raise SparqlClientError(f"invalid results json: {ex}") from ex
    if "boolean" in doc:
        return bool(doc["boolean"])
    try:
        variables = [str(v) for v in doc["head"]["vars"]]
        bindings = doc["results"]["bindings"]
    except (KeyError, TypeError) as ex:
        raise SparqlClientError("malformed results document") from ex
    rows = []
    for b in bindings:
        rows.append(
            tuple(
                _term_from_json(b[v]) if v in b else None
                for v in variables
            )
        )
    return variables, rows


def _term_from_xml(el: ET.Element) -> str:
    """Results-XML term element → canonical encoding (the reference's
    xml_parser module feeding the same ``Term`` model)."""
    tag = el.tag.split("}")[-1]
    if tag == "uri":
        v = el.text or ""
        if not is_valid_iri_ref(v):
            raise SparqlClientError(f"invalid iri: {v!r}")
        return Term.iri(v).encode()
    if tag == "bnode":
        v = el.text or ""
        if not v or any(c.isspace() for c in v):
            raise SparqlClientError(f"invalid bnode identifier: {v!r}")
        return Term.bnode(v).encode()
    if tag == "literal":
        v = el.text or ""
        lang = el.get("{http://www.w3.org/XML/1998/namespace}lang")
        if lang is not None:
            if not is_valid_language_tag(lang):
                raise SparqlClientError(f"invalid language tag: {lang!r}")
            dir_ = el.get("{http://www.w3.org/2005/11/its}dir") or el.get(
                "its:dir"
            )
            if dir_ is not None and dir_ not in ("ltr", "rtl"):
                raise SparqlClientError(f"invalid base direction: {dir_!r}")
            return Term.literal(v, lang=lang, dir=dir_).encode()
        dt = el.get("datatype")
        if dt is not None and not is_valid_iri_ref(dt):
            raise SparqlClientError(f"invalid iri: {dt!r}")
        return Term.literal(v, dt=dt).encode()
    if tag == "triple":
        parts = {}
        for child in el:
            role = child.tag.split("}")[-1]
            inner = list(child)
            if len(inner) != 1:
                raise SparqlClientError("invalid triple term xml")
            parts[role] = _term_from_xml(inner[0])
        try:
            return (
                f"<<( {parts['subject']} {parts['predicate']} "
                f"{parts['object']} )>>"
            )
        except KeyError as ex:
            raise SparqlClientError("triple term missing role") from ex
    raise SparqlClientError(f"unknown term element: {tag!r}")


def parse_results_xml(
    payload: bytes,
) -> Union[bool, Tuple[List[str], List[tuple]]]:
    """``application/sparql-results+xml`` → ASK boolean or
    (variables, binding rows), mirroring ``ResultsDocument::from_xml``
    (`results.rs:140-144`)."""
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as ex:
        raise SparqlClientError(f"invalid results xml: {ex}") from ex
    boolean = root.find(f"{{{_SRX_NS}}}boolean")
    if boolean is not None:
        return (boolean.text or "").strip() == "true"
    head = root.find(f"{{{_SRX_NS}}}head")
    results = root.find(f"{{{_SRX_NS}}}results")
    if head is None or results is None:
        raise SparqlClientError("malformed results document")
    variables = [
        v.get("name") or ""
        for v in head.findall(f"{{{_SRX_NS}}}variable")
    ]
    rows = []
    for result in results.findall(f"{{{_SRX_NS}}}result"):
        bound: Dict[str, str] = {}
        for b in result.findall(f"{{{_SRX_NS}}}binding"):
            name = b.get("name") or ""
            inner = list(b)
            if len(inner) != 1:
                raise SparqlClientError("malformed binding")
            bound[name] = _term_from_xml(inner[0])
        rows.append(tuple(bound.get(v) for v in variables))
    return variables, rows


# ---------------------------------------------------------------------------
# SERVICE transport registry
# ---------------------------------------------------------------------------

_SERVICE_TRANSPORT: Optional[Transport] = None


def set_service_transport(transport: Optional[Transport]) -> None:
    """Install the transport used by SPARQL ``SERVICE`` evaluation
    (``None`` restores the default urllib transport).  Tests and
    air-gapped deployments inject fakes; see
    ``sparql/eval.py::_eval_service``."""
    global _SERVICE_TRANSPORT
    _SERVICE_TRANSPORT = transport


def service_client(endpoint: str) -> SparqlClient:
    """A client for a ``SERVICE`` endpoint given in canonical term
    encoding (``<http://…>``) or as a bare URL."""
    url = endpoint[1:-1] if endpoint.startswith("<") else endpoint
    return SparqlClient(url, transport=_SERVICE_TRANSPORT)
