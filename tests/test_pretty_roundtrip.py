"""Pretty-Turtle round-trip property test (r4 VERDICT #6): every
fixture document (the reference's NT_SAMPLES / TURTLE_SAMPLES corpora,
`turtle/src/test.rs:4-183`) must survive parse → pretty_turtle →
re-parse with an identical triple set — guarding the grouping (``;`` /
``,``), ``a``-sugar, and prefix-abbreviation printer paths against
output that parses differently (or not at all)."""

import pytest

from sophia_rs_spark.sources.serializers import pretty_turtle
from sophia_rs_spark.sources.turtle import parse_turtle_document

from test_ntparser import NT_SAMPLES
from test_turtle import PREFIXES, TURTLE_SAMPLES, U

PFX_MAP = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "": "http://example.org/ns/",
}


def _triples(doc_url, text):
    rows = parse_turtle_document(doc_url, text, preserve_bn_labels=True)
    errs = [r for r in rows if r[5] is not None]
    assert not errs, errs
    return sorted((r[1], r[2], r[3]) for r in rows if r[5] is None)


@pytest.mark.parametrize(
    "name,doc",
    [(n, d) for n, d, _count in TURTLE_SAMPLES],
    ids=[n for n, _d, _c in TURTLE_SAMPLES],
)
def test_turtle_fixture_roundtrip(name, doc):
    original = _triples(U, PREFIXES + doc)
    pretty = pretty_turtle([(s, p, o) for s, p, o in original], PFX_MAP)
    again = _triples(U, pretty)
    assert again == original, (name, pretty)


@pytest.mark.parametrize(
    "name,doc",
    [(n, d) for n, d, _e in NT_SAMPLES],
    ids=[n for n, _d, _e in NT_SAMPLES],
)
def test_nt_fixture_roundtrip(name, doc):
    # N-Triples 1.2 is a subset of Turtle 1.2 — same loop
    original = _triples(U, doc)
    pretty = pretty_turtle([(s, p, o) for s, p, o in original], PFX_MAP)
    again = _triples(U, pretty)
    assert again == original, (name, pretty)


def test_pretty_abbreviation_actually_used():
    # guard against the trivial pass where nothing abbreviates
    triples = [
        ("<http://example.org/ns/s>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<http://example.org/ns/T>"),
        ("<http://example.org/ns/s>", "<http://example.org/ns/p>", '"v"'),
        ("<http://example.org/ns/s>", "<http://example.org/ns/p>", '"w"'),
    ]
    txt = pretty_turtle(triples, PFX_MAP)
    assert ":s a :T ;" in txt
    assert '"v", "w"' in txt
    assert _triples(U, txt) == sorted(triples)
