"""Deterministic fixture corpus (FIXTURES.md families) + page synthesis.

Fixture payloads are modeled on the reference's shared sample corpora
(`turtle/src/test.rs:4-81` NT/NQ/GNQ samples; Turtle/TriG families added
with the Turtle parser).  Expected outputs are hand-derived golden quads
in canonical N-Triples encoding with raw blank-node labels; tests
skolemize them per url before comparison.

Everything is seeded/deterministic — no external data (north rule).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import pandas as pd

from ..sources.html_extract import synthesize_html
from ..sources.ntparser import _skolemize_enc

Quad = Tuple[str, str, str, Optional[str]]


@dataclass(frozen=True)
class FixtureCase:
    name: str
    fmt: str  # nt | nq | ttl | trig | gnq | jsonld | rdfxml
    payload: str
    expected: Optional[List[Quad]] = None  # canonical quads, raw bnode labels
    error_lines: int = 0  # expected quarantined lines
    generalized: bool = False
    expected_count: Optional[int] = None  # count-only golden (bnode-heavy)


def _t(s: str, p: str, o: str, g: Optional[str] = None) -> Quad:
    return (s, p, o, g)


# --- F1: N-Triples line cases (turtle/src/test.rs:4-24) --------------------

F1_NT: List[FixtureCase] = [
    FixtureCase("nt_empty", "nt", "", []),
    FixtureCase("nt_comment", "nt", "# a comment", []),
    FixtureCase("nt_version", "nt", 'VERSION "1.2"', []),
    FixtureCase("nt_iii", "nt", "<x:s> <x:p> <x:o>.", [_t("<x:s>", "<x:p>", "<x:o>")]),
    FixtureCase("nt_bii", "nt", "_:s   <x:p> <x:o>.", [_t("_:s", "<x:p>", "<x:o>")]),
    FixtureCase("nt_iib", "nt", "<x:s> <x:p> _:o.", [_t("<x:s>", "<x:p>", "_:o")]),
    FixtureCase("nt_bib", "nt", "_:s   <x:p> _:o.", [_t("_:s", "<x:p>", "_:o")]),
    FixtureCase("nt_iil", "nt", '<x:s> <x:p> "o".', [_t("<x:s>", "<x:p>", '"o"')]),
    FixtureCase("nt_bil", "nt", '_:s   <x:p> "o".', [_t("_:s", "<x:p>", '"o"')]),
    FixtureCase(
        "nt_iild", "nt", '<x:s> <x:p> "o"^^<x:d>.', [_t("<x:s>", "<x:p>", '"o"^^<x:d>')]
    ),
    FixtureCase(
        "nt_bild", "nt", '_:s   <x:p> "o"^^<x:d>.', [_t("_:s", "<x:p>", '"o"^^<x:d>')]
    ),
    FixtureCase(
        "nt_iill", "nt", '<x:s> <x:p> "o"@en-UK.', [_t("<x:s>", "<x:p>", '"o"@en-uk')]
    ),
    FixtureCase(
        "nt_bill", "nt", '_:s   <x:p> "o"@en-UK.', [_t("_:s", "<x:p>", '"o"@en-uk')]
    ),
    FixtureCase(
        "nt_iilb",
        "nt",
        '<x:s> <x:p> "o"@en-UK--ltr.',
        [_t("<x:s>", "<x:p>", '"o"@en-uk--ltr')],
    ),
    FixtureCase(
        "nt_bilb",
        "nt",
        '_:s   <x:p> "o"@en-UK--rtl.',
        [_t("_:s", "<x:p>", '"o"@en-uk--rtl')],
    ),
    FixtureCase(
        "nt_iit",
        "nt",
        '<x:s> <x:p> <<(_:a <x:b> "c")>>.',
        [_t("<x:s>", "<x:p>", '<<( _:a <x:b> "c" )>>')],
    ),
    FixtureCase(
        "nt_bit",
        "nt",
        '_:s   <x:p> <<(_:a <x:b> "c")>>.',
        [_t("_:s", "<x:p>", '<<( _:a <x:b> "c" )>>')],
    ),
    FixtureCase(
        "nt_escape_useless",
        "nt",
        '<x:s> <x:p> "\\u006f".',
        [_t("<x:s>", "<x:p>", '"o"')],
    ),
    FixtureCase(
        "nt_escape_torture",
        "nt",
        '<x:s> <x:p> "\\u0001\\t\\n\\r\\"\\\\".',
        [_t("<x:s>", "<x:p>", '"\\u0001\\t\\n\\r\\"\\\\"')],
    ),
    # error fixtures (turtle/src/parser/nt.rs:221-232): quarantined, 0 triples
    FixtureCase("nt_err_nodot", "nt", "<x:s> <x:p> <x:o>", [], error_lines=1),
    FixtureCase("nt_err_litpred", "nt", '<x:s> "p" <x:o>.', [], error_lines=1),
    FixtureCase("nt_err_extra", "nt", "<x:s> <x:p> <x:o> <x:g>.", [], error_lines=1),
    FixtureCase(
        "nt_mixed_err",
        "nt",
        "<x:s> <x:p> <x:o>.\nbad line\n<x:s2> <x:p> <x:o>.",
        [_t("<x:s>", "<x:p>", "<x:o>"), _t("<x:s2>", "<x:p>", "<x:o>")],
        error_lines=1,
    ),
]

# --- F2: N-Quads (turtle/src/test.rs:27-57) --------------------------------

_NQ_OBJECTS = [
    ("i", "<x:o>", "<x:o>"),
    ("b", "_:o", "_:o"),
    ("l", '"o"', '"o"'),
    ("ld", '"o"^^<x:d>', '"o"^^<x:d>'),
    ("ll", '"o"@en-UK', '"o"@en-uk'),
    ("lb", '"o"@en-UK--ltr', '"o"@en-uk--ltr'),
    ("t", '<<(_:a <x:b> "c")>>', '<<( _:a <x:b> "c" )>>'),
]

F2_NQ: List[FixtureCase] = []
for _skind, _sraw, _senc in [("i", "<x:s>", "<x:s>"), ("b", "_:s", "_:s")]:
    for _okind, _oraw, _oenc in _NQ_OBJECTS:
        for _gkind, _graw, _genc in [
            ("i", "<x:g>", "<x:g>"),
            ("b", "_:g", "_:g"),
            ("d", None, None),
        ]:
            line = (
                f"{_sraw} <x:p> {_oraw} {_graw}." if _graw else f"{_sraw} <x:p> {_oraw}."
            )
            F2_NQ.append(
                FixtureCase(
                    f"nq_{_skind}_{_okind}_{_gkind}",
                    "nq",
                    line,
                    [_t(_senc, "<x:p>", _oenc, _genc)],
                )
            )

# --- F5: generalized N-Quads (turtle/src/test.rs:58-81) --------------------

F5_GNQ: List[FixtureCase] = [
    FixtureCase(
        "gnq_bnodes", "gnq", "_:s _:p _:o.", [_t("_:s", "_:p", "_:o")], generalized=True
    ),
    FixtureCase(
        "gnq_literals",
        "gnq",
        '"s" "p" "o".',
        [_t('"s"', '"p"', '"o"')],
        generalized=True,
    ),
    FixtureCase(
        "gnq_tripleterms",
        "gnq",
        '<<(<x:s> <x:p> <x:o>)>> <<(_:s _:p _:o)>> <<("s" "p" "o")>>.',
        [
            _t(
                "<<( <x:s> <x:p> <x:o> )>>",
                "<<( _:s _:p _:o )>>",
                '<<( "s" "p" "o" )>>',
            )
        ],
        generalized=True,
    ),
    FixtureCase(
        "gnq_vars", "gnq", "?s ?p ?o.", [_t("?s", "?p", "?o")], generalized=True
    ),
    FixtureCase(
        "gnq_quad_vars",
        "gnq",
        "?s ?p ?o ?g.",
        [_t("?s", "?p", "?o", "?g")],
        generalized=True,
    ),
]

# --- F3: Turtle documents (turtle/src/test.rs:88-183) ----------------------

_TTL_PREFIXES = (
    "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
    "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
    "PREFIX : <http://example.org/ns/>\n"
)
_NS = "http://example.org/ns/"
_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

F3_TTL: List[FixtureCase] = [
    FixtureCase(
        "ttl_factorized",
        "ttl",
        _TTL_PREFIXES
        + ':alice a :Person; :name "Alice"; :age 42.\n'
        + ':bob a :Person, :Man; :nick "bob"@fr, "bobby"@en; :admin true.',
        [
            _t(f"<{_NS}alice>", f"<{_RDFNS}type>", f"<{_NS}Person>"),
            _t(f"<{_NS}alice>", f"<{_NS}name>", '"Alice"'),
            _t(f"<{_NS}alice>", f"<{_NS}age>", f'"42"^^<{_XSD}integer>'),
            _t(f"<{_NS}bob>", f"<{_RDFNS}type>", f"<{_NS}Person>"),
            _t(f"<{_NS}bob>", f"<{_RDFNS}type>", f"<{_NS}Man>"),
            _t(f"<{_NS}bob>", f"<{_NS}nick>", '"bob"@fr'),
            _t(f"<{_NS}bob>", f"<{_NS}nick>", '"bobby"@en'),
            _t(f"<{_NS}bob>", f"<{_NS}admin>", f'"true"^^<{_XSD}boolean>'),
        ],
    ),
    FixtureCase(
        "ttl_unpretty_literals",
        "ttl",
        _TTL_PREFIXES
        + '<x:s> <x:p> "a"^^xsd:integer, "12"^^xsd:decimal, "1.2"^^xsd:double, "1"^^xsd:boolean.',
        [
            _t("<x:s>", "<x:p>", f'"a"^^<{_XSD}integer>'),
            _t("<x:s>", "<x:p>", f'"12"^^<{_XSD}decimal>'),
            _t("<x:s>", "<x:p>", f'"1.2"^^<{_XSD}double>'),
            _t("<x:s>", "<x:p>", f'"1"^^<{_XSD}boolean>'),
        ],
    ),
    FixtureCase(
        "ttl_lists",
        "ttl",
        _TTL_PREFIXES + "<x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), (\"a\" \"b\").",
        None,
        expected_count=20,
    ),
    FixtureCase(
        "ttl_bnode_cycles",
        "ttl",
        _TTL_PREFIXES
        + '_:a :n "a"; :p [ :q [ :r _:a ]].\n_:b :n "b"; :s [ :s _:b ].\n_:c :b "c"; :t _:c.',
        None,
        expected_count=9,
    ),
    FixtureCase(
        "ttl_annotation",
        "ttl",
        _TTL_PREFIXES + ":s :p :o {| :a :b, :c; :d :e |}.",
        None,
        expected_count=5,
    ),
    FixtureCase(
        "ttl_reified_nested",
        "ttl",
        _TTL_PREFIXES + "<< << :a :b :c >> :d << :e :f :g >> >> :h :i.",
        None,
        expected_count=4,
    ),
]

# --- F4: TriG documents (turtle/src/test.rs:185-262) -----------------------

F4_TRIG: List[FixtureCase] = [
    FixtureCase(
        "trig_implicit_graph",
        "trig",
        _TTL_PREFIXES + "<x:g> { :s :p :o }",
        [_t(f"<{_NS}s>", f"<{_NS}p>", f"<{_NS}o>", "<x:g>")],
    ),
    FixtureCase(
        "trig_explicit_graph",
        "trig",
        _TTL_PREFIXES + "GRAPH :g { :s :p :o }",
        [_t(f"<{_NS}s>", f"<{_NS}p>", f"<{_NS}o>", f"<{_NS}g>")],
    ),
    FixtureCase(
        "trig_alternating",
        "trig",
        _TTL_PREFIXES
        + ":s :p :o1.\nGRAPH :g1 { :s :p :o2 }\nGRAPH :g2 { :s :p :o3 }\n"
        + "GRAPH :g1 { :s :p :o4 }\n<< :s :p :o ~ :r >>.\nGRAPH :g1 { :r :p :o5 }",
        None,
        expected_count=6,
    ),
]

# --- F6: JSON-LD in HTML (jsonld/src/parser.rs toRdf subset) ---------------

_SCHEMA = "https://schema.org/"

F6_JSONLD: List[FixtureCase] = [
    FixtureCase(
        "jsonld_schema_org",
        "jsonld",
        '{"@context": "https://schema.org", "@id": "http://ex.org/alice",'
        ' "@type": "Person", "name": "Alice", "age": 42}',
        [
            _t(
                "<http://ex.org/alice>",
                "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
                f"<{_SCHEMA}Person>",
            ),
            _t("<http://ex.org/alice>", f"<{_SCHEMA}name>", '"Alice"'),
            _t(
                "<http://ex.org/alice>",
                f"<{_SCHEMA}age>",
                f'"42"^^<{_XSD}integer>',
            ),
        ],
    ),
    FixtureCase(
        "jsonld_lang_graph",
        "jsonld",
        '{"@context": {"@vocab": "https://schema.org/"}, "@graph": ['
        '{"@id": "http://ex.org/a", "name": {"@value": "chat", "@language": "fr"}},'
        '{"@id": "http://ex.org/b", "name": "B"}]}',
        [
            _t("<http://ex.org/a>", f"<{_SCHEMA}name>", '"chat"@fr'),
            _t("<http://ex.org/b>", f"<{_SCHEMA}name>", '"B"'),
        ],
    ),
    FixtureCase(
        "jsonld_nested_anon",
        "jsonld",
        '{"@context": {"@vocab": "https://schema.org/"},'
        ' "@id": "http://ex.org/a", "knows": {"name": "Bob"}}',
        None,
        expected_count=2,
    ),
    FixtureCase(
        "jsonld_list",
        "jsonld",
        '{"@context": {"@vocab": "https://schema.org/"},'
        ' "@id": "http://ex.org/a", "itemListElement": {"@list": ["x", "y"]}}',
        None,
        expected_count=5,
    ),
    FixtureCase(
        "jsonld_bad_json",
        "jsonld",
        "{this is not json",
        [],
        error_lines=1,
    ),
]

# --- F8: RDF/XML (xml/src/parser.rs subset) ---------------------------------

_RDFXML_HDR = (
    f'<rdf:RDF xmlns:rdf="{_RDFNS}" xmlns:ex="http://ex.org/">'
)

F8_RDFXML: List[FixtureCase] = [
    FixtureCase(
        "rdfxml_description",
        "rdfxml",
        _RDFXML_HDR
        + '<rdf:Description rdf:about="http://e/x">'
        + "<ex:name>Alice</ex:name>"
        + f'<ex:age rdf:datatype="{_XSD}integer">42</ex:age>'
        + "</rdf:Description></rdf:RDF>",
        [
            _t("<http://e/x>", "<http://ex.org/name>", '"Alice"'),
            _t("<http://e/x>", "<http://ex.org/age>", f'"42"^^<{_XSD}integer>'),
        ],
    ),
    FixtureCase(
        "rdfxml_typed_node",
        "rdfxml",
        _RDFXML_HDR
        + '<ex:Person rdf:about="http://e/y" xml:lang="en">'
        + '<ex:link rdf:resource="http://e/x"/>'
        + "<ex:note>hi</ex:note></ex:Person></rdf:RDF>",
        [
            _t("<http://e/y>", f"<{_RDFNS}type>", "<http://ex.org/Person>"),
            _t("<http://e/y>", "<http://ex.org/link>", "<http://e/x>"),
            _t("<http://e/y>", "<http://ex.org/note>", '"hi"@en'),
        ],
    ),
    FixtureCase(
        "rdfxml_bad",
        "rdfxml",
        "<rdf:RDF><broken>",
        [],
        error_lines=1,
    ),
]

ALL_CASES: List[FixtureCase] = (
    F1_NT + F2_NQ + F5_GNQ + F3_TTL + F4_TRIG + F6_JSONLD + F8_RDFXML
)

# --- F9: entity-linking & canonicalization overlays ------------------------

_OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
_SCHEMA_ID = "https://schema.org/identifier"


def linking_fixture() -> Tuple[pd.DataFrame, List[Tuple[str, str]]]:
    """F9: the same real-world entity under different IRIs with
    owl:sameAs bridges across pages → (pages frame, golden components
    as (canon_id, member) pairs).

    Entity e{k} appears as <http://siteA/e{k}>, <http://siteB/e{k}> and
    <http://siteC/e{k}>; bridges A↔B on one page, B↔C on another —
    multi-hop closure across documents.  Odd entities get only A↔B
    (2-member components).
    """
    cases: List[FixtureCase] = []
    golden: List[Tuple[str, str]] = []
    for k in range(6):
        a, b, c = (f"http://site{x}.example.org/entity/{k}" for x in "ABC")
        lines = [
            f"<{a}> <{_OWL_SAMEAS}> <{b}>.",
            f'<{a}> <{_SCHEMA_ID}> "ent-{k}".',
        ]
        cases.append(FixtureCase(f"link_ab_{k}", "nt", "\n".join(lines), None))
        members = [f"<{a}>", f"<{b}>"]
        if k % 2 == 0:
            cases.append(
                FixtureCase(
                    f"link_bc_{k}", "nt", f"<{b}> <{_OWL_SAMEAS}> <{c}>.", None
                )
            )
            members.append(f"<{c}>")
        canon = min(members)
        golden.extend((canon, m) for m in members)
    return fixture_pages(cases), golden


def expected_skolemized(case: FixtureCase, url: str) -> List[Quad]:
    """The case's golden quads with bnode labels skolemized for ``url``."""
    assert case.expected is not None
    return [
        (
            _skolemize_enc(s, url),
            _skolemize_enc(p, url),
            _skolemize_enc(o, url),
            _skolemize_enc(g, url) if g is not None else None,
        )
        for (s, p, o, g) in case.expected
    ]


# ---------------------------------------------------------------------------
# Page synthesis
# ---------------------------------------------------------------------------

_LANGS = ["en", "en-UK", "fr", "de", ""]
_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
N_SITES = 20


def page_url(i: int) -> str:
    return f"https://site{i % N_SITES}.example.org/page/{i}"


def fixture_pages(cases: Optional[List[FixtureCase]] = None) -> pd.DataFrame:
    """One page per fixture case → pandas frame with the pages schema
    (url, warc_ts, html BINARY, text, lang) + side columns (case, fmt)."""
    cases = cases if cases is not None else ALL_CASES
    rows = []
    for i, case in enumerate(cases):
        url = page_url(i)
        lang = _LANGS[i % len(_LANGS)]
        html = synthesize_html(url, [(case.fmt, case.payload)], lang)
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": case.payload,
                "lang": lang,
                "case": case.name,
                "fmt": case.fmt,
            }
        )
    return pd.DataFrame(rows)


def tiled_pages(n: int, cases: Optional[List[FixtureCase]] = None) -> pd.DataFrame:
    """``n`` pages cycling the fixture corpus with per-page-unique IRIs
    (``<x:s>`` → ``<x:s/{i}>``) so joins/dedup see realistic cardinality.
    Deterministic in ``n`` — used by bench and scale tests."""
    cases = [c for c in (cases or ALL_CASES) if not c.error_lines and c.expected]
    rows = []
    for i in range(n):
        case = cases[i % len(cases)]
        url = page_url(i)
        payload = case.payload.replace("<x:s>", f"<x:s/{i}>").replace(
            "<x:o>", f"<x:o/{i % 97}>"
        )
        lang = _LANGS[i % len(_LANGS)]
        html = synthesize_html(url, [(case.fmt, payload)], lang)
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": payload,
                "lang": lang,
                "case": case.name,
                "fmt": case.fmt,
            }
        )
    return pd.DataFrame(rows)
