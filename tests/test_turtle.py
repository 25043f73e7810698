"""Turtle/TriG parser tests mirroring the reference corpora
(`turtle/src/test.rs:82-262` TURTLE_SAMPLES / TRIG_SAMPLES): same
documents, same expected triple/quad counts, plus term-shape checks."""

import pytest

from sophia_rs_spark.sources.turtle import parse_turtle_document
from sophia_rs_spark.terms.model import RDF, XSD

U = "http://base.example.org/dir/page"

PREFIXES = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <http://example.org/ns/>
"""

TURTLE_SAMPLES = [
    (
        "factorized triples",
        """
        :alice a :Person; :name "Alice"; :age 42.
        :bob a :Person, :Man; :nick "bob"@fr, "bobby"@en; :admin true.
        """,
        8,
    ),
    (
        "pretty literals",
        """
        [] <x:p> 42, 3.14, 0.314e1, true, "foo".
        """,
        5,
    ),
    (
        "unpretty literals",
        """
        [] <x:p> "a"^^xsd:integer, "12"^^xsd:decimal, "1.2"^^xsd:double, "1"^^xsd:boolean.
        """,
        4,
    ),
    (
        "lists",
        """
        <x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), ("a" "b").
        """,
        20,
    ),
    (
        "subject list",
        """
        (1 2 3) a <tag:List>.
        """,
        7,
    ),
    (
        "malformed list",
        """
        _:a rdf:first 42, 43; rdf:rest (44 45).
        _:b rdf:first 42; rdf:rest (43), (44).
        """,
        14,
    ),
    (
        "bnode cycles",
        """
        _:a :n "a"; :p [ :q [ :r _:a ]].
        _:b :n "b"; :s [ :s _:b ].
        _:c :b "c"; :t _:c.
        """,
        9,
    ),
    ("reified subject", "<< :s :p :o >> :q :r.", 2),
    ("reified object", ":s :p << :t :q :r >>.", 2),
    ("reified nested", "<< << :a :b :c >> :d << :e :f :g >> >> :h :i.", 4),
    ("annotation", ":s :p :o {| :a :b, :c; :d :e |}.", 5),
    (
        "annotation nested",
        """
        :s :p :o {|
            :a :b {| :x :y1 |},
                :c {| :x :y2 |};
            :d :e {| :x :y3 |}
        |}.
        """,
        11,
    ),
    ("anon in list", ":s :p ( [:p :o] [:p :o;] [] ).", 9),
    ("rdf:nil in reified triple", "<< :s :p rdf:nil >> .", 1),
]


@pytest.mark.parametrize("name,doc,expected", TURTLE_SAMPLES)
def test_turtle_samples(name, doc, expected):
    rows = parse_turtle_document(U, PREFIXES + doc)
    good = [r for r in rows if r[5] is None]
    errs = [r for r in rows if r[5] is not None]
    assert not errs, (name, errs)
    assert len(good) == expected, (name, len(good), good)


TRIG_SAMPLES = [
    ("implicit iri", "<x:g> { :s :p :o }", 1),
    ("implicit pname", ":g { :s :p :o }", 1),
    ("implicit bnode", "_:g { :s :p :o }", 1),
    ("implicit anon", "[] { :s :p :o }", 1),
    ("explicit iri", "GRAPH <x:g> { :s :p :o }", 1),
    ("explicit pname", "GRAPH :g { :s :p :o }", 1),
    ("explicit bnode", "GRAPH _:g { :s :p :o }", 1),
    ("explicit anon", "GRAPH [] { :s :p :o }", 1),
    (
        "alternating graphs",
        """
            :s :p :o1.
            GRAPH :g1 { :s :p :o2 }
            GRAPH :g2 { :s :p :o3 }
            GRAPH :g1 { :s :p :o4 }
            << :s :p :o ~ :r >>.
            GRAPH :g1 { :r :p :o5 }
        """,
        6,
    ),
]


@pytest.mark.parametrize("name,doc,expected", TRIG_SAMPLES)
def test_trig_samples(name, doc, expected):
    rows = parse_turtle_document(U, PREFIXES + doc, quads=True)
    good = [r for r in rows if r[5] is None]
    errs = [r for r in rows if r[5] is not None]
    assert not errs, (name, errs)
    assert len(good) == expected, (name, len(good), good)


class TestSemantics:
    def test_literal_sugar_datatypes(self):
        rows = parse_turtle_document(U, '<x:s> <x:p> 42, 3.14, 0.314e1, true, "foo".')
        objs = sorted(r[3] for r in rows)
        assert f'"0.314e1"^^<{XSD}double>' in objs
        assert f'"3.14"^^<{XSD}decimal>' in objs
        assert f'"42"^^<{XSD}integer>' in objs
        assert f'"true"^^<{XSD}boolean>' in objs
        assert '"foo"' in objs

    def test_lexical_fidelity_of_unpretty(self):
        # "a"^^xsd:integer stays "a" — ill-typed but preserved
        rows = parse_turtle_document(
            U, f'<x:s> <x:p> "a"^^<{XSD}integer>, "012"^^<{XSD}integer>.'
        )
        objs = {r[3] for r in rows}
        assert f'"a"^^<{XSD}integer>' in objs
        assert f'"012"^^<{XSD}integer>' in objs

    def test_a_keyword(self):
        rows = parse_turtle_document(U, "<x:s> a <x:C>.")
        assert rows[0][2] == f"<{RDF}type>"

    def test_collection_structure(self):
        rows = parse_turtle_document(U, "<x:s> <x:p> (1 2).")
        preds = sorted(r[2] for r in rows)
        assert preds.count(f"<{RDF}first>") == 2
        assert preds.count(f"<{RDF}rest>") == 2
        # last rest is rdf:nil
        assert any(r[3] == f"<{RDF}nil>" for r in rows)

    def test_empty_collection_is_nil(self):
        rows = parse_turtle_document(U, "<x:s> <x:p> ().")
        assert rows[0][3] == f"<{RDF}nil>"

    def test_base_resolution(self):
        rows = parse_turtle_document(U, "<rel> <x:p> <../up>.")
        assert rows[0][1] == "<http://base.example.org/dir/rel>"
        assert rows[0][3] == "<http://base.example.org/up>"

    def test_base_directive(self):
        rows = parse_turtle_document(U, "@base <http://other.org/a/>. <rel> <x:p> <x:o>.")
        assert rows[0][1] == "<http://other.org/a/rel>"

    def test_sparql_style_directives_no_dot(self):
        rows = parse_turtle_document(
            U, "PREFIX ex: <http://ex.org/>\nBASE <http://b.org/>\nex:s <x:p> <rel>."
        )
        assert rows[0][1] == "<http://ex.org/s>"
        assert rows[0][3] == "<http://b.org/rel>"

    def test_version_directive(self):
        rows = parse_turtle_document(U, '@version "1.2". <x:s> <x:p> <x:o>.')
        assert len(rows) == 1 and rows[0][5] is None

    def test_pn_local_escapes(self):
        rows = parse_turtle_document(
            U, "PREFIX ex: <http://ex.org/>\nex:with\\~tilde <x:p> ex:a%20b."
        )
        assert rows[0][1] == "<http://ex.org/with~tilde>"
        assert rows[0][3] == "<http://ex.org/a%20b>"

    def test_long_strings(self):
        rows = parse_turtle_document(U, '<x:s> <x:p> """multi\nline "quoted" text""".')
        assert rows[0][3] == '"multi\\nline \\"quoted\\" text"'

    def test_anon_labels_deterministic(self):
        doc = PREFIXES + ":s :p [ :q :r ], [ :q :r2 ]."
        a = parse_turtle_document(U, doc)
        b = parse_turtle_document(U, doc)
        assert a == b
        c = parse_turtle_document(U + "x", doc)
        assert a != c  # url-scoped skolemization

    def test_named_reifier(self):
        rows = parse_turtle_document(U, PREFIXES + "<< :s :p :o ~ :r >>.")
        assert len(rows) == 1
        assert rows[0][1] == "<http://example.org/ns/r>"
        assert rows[0][2] == f"<{RDF}reifies>"

    def test_error_quarantine(self):
        rows = parse_turtle_document(U, "<x:s> <x:p> .")
        errs = [r for r in rows if r[5] is not None]
        assert errs

    def test_undeclared_prefix_error(self):
        rows = parse_turtle_document(U, "nope:s <x:p> <x:o>.")
        assert any(r[5] is not None and "prefix" in r[5] for r in rows)

    def test_partial_results_kept_before_error(self):
        rows = parse_turtle_document(U, "<x:s> <x:p> <x:o>. <x:s2> <x:p> !!!")
        good = [r for r in rows if r[5] is None]
        errs = [r for r in rows if r[5] is not None]
        assert len(good) == 1 and len(errs) == 1


def test_keyword_like_prefix_names():
    """ADVICE r1: prefixes named graph:/base:/prefix:/version: are legal."""
    from sophia_rs_spark.sources.turtle import parse_turtle_document

    doc = (
        "@prefix graph: <http://x/> .\n"
        "@prefix base: <http://y/> .\n"
        "@prefix prefix: <http://z/> .\n"
        "@prefix version: <http://w/> .\n"
        "graph:a base:b prefix:c .\n"
        "version:d graph:e base:f .\n"
    )
    rows = parse_turtle_document("http://doc.example/", doc)
    errs = [r for r in rows if r[5] is not None]
    assert errs == [], errs
    trips = [(r[1], r[2], r[3]) for r in rows]
    assert ("<http://x/a>", "<http://y/b>", "<http://z/c>") in trips
    assert ("<http://w/d>", "<http://x/e>", "<http://y/f>") in trips
