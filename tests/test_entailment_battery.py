"""Simple-entailment battery ported from `reasoner/src/test.rs:70-95`:
blank nodes and variables in the probe are existentials mapped by a
graph homomorphism, incl. structural matching inside triple terms."""

import pytest

from sophia_rs_spark.operators.reasoner import entails
from sophia_rs_spark.sources.turtle import parse_turtle_document

PFX = "PREFIX : <x:>\n"

CASES = [
    ("", ":s :p :o.", False, "empty graph does not entail"),
    (":s :p :o1, :o2.", "", True, "empty graph is entailed"),
    (":s :p :o1, :o2.", ":s :p :o1, :o2.", True, "same graph is entailed"),
    (":s :p :o1, :o2.", ":s :p :o1, :o3.", False, "different graph is not entailed"),
    (":s :p :o1, :o2.", ":s :p :o1, :o2, :o3.", False, "bigger graph is not entailed"),
    (":s :p :o1, :o2.", ":s :p :o2.", True, "subgraph is entailed"),
    (":s :p :o1, :o2.", ":s :p [].", True, "subgraph with bnode is entailed"),
    (":s :p :o1, :o2.", "[] :p [].", True, "subgraph with 2 bnodes is entailed"),
    (":s :p :o1, :o2.", "_:b :p _:b.", False, "subgraph with same bnode is not entailed"),
    (":s :p :o1, :o2.", ":s :p ?x.", True, "subgraph with variable is entailed"),
    (":s :p :o1, :o2.", "?x :p ?y.", True, "subgraph with 2 variables is entailed"),
    (":s :p :o1, :o2.", "?x :p ?x.", False, "subgraph with same variable is not entailed"),
    ('"s" "p" "o1", "o2".', '_:b "p" _:b.', False, "generalized, same bnode not entailed"),
    ('"s" "p" "o1", "s".', '_:b "p" _:b.', True, "generalized, same bnode entailed"),
    ('"s" "p" "o1", "s".', '_:b [] _:b.', True, "generalized, bnode as predicate entailed"),
    (":s :p <<( :a :b :o2 )>>.", ":s :p <<( :a :b [] )>>.", True, "tt bnode entailed"),
    (":s :p <<( :a :b :o2 )>>.", "[] :p <<( :a :b [] )>>.", True, "tt 2 bnodes entailed"),
    (":s :p <<( :a :b :o2 )>>.", "_:b :p <<( :a :b _:b )>>.", False, "tt same bnode not entailed"),
    (":s :p <<( :a :b :s )>>.", "_:b :p <<( :a :b _:b )>>.", True, "tt same bnode entailed"),
    (":s :p <<( :a :b :o2 )>>.", ":s :p <<( :a :b ?x )>>.", True, "tt variable entailed"),
    (":s :p <<( :a :b :o2 )>>.", "?x :p <<( :a :b ?y )>>.", True, "tt 2 variables entailed"),
    (":s :p <<( :a :b :o2 )>>.", "?x :p <<( :a :b ?x )>>.", False, "tt same variable not entailed"),
    ('"s" "p" <<( "a" "b" "o1" )>>.', '_:b "p" <<( "a" "b" _:b )>>.', False,
     "generalized tt same bnode not entailed"),
    ('"s" "p" <<( "a" "b" "s" )>>.', '_:b "p" <<( "a" "b" _:b )>>.', True,
     "generalized tt same bnode entailed"),
    ('"s" "p" <<( "a" "b" "s" )>>.', '_:b [] <<( "a" [] _:b )>>.', True,
     "generalized tt bnode as predicate entailed"),
]


def _df(spark, doc, url):
    rows = parse_turtle_document(
        url, PFX + doc, generalized=True, preserve_bn_labels=True
    )
    bad = [r[5] for r in rows if r[5]]
    assert bad == [], bad
    data = [(r[1], r[2], r[3]) for r in rows]
    schema = "s string, p string, o string"
    if not data:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(data, schema)


@pytest.mark.parametrize("g1,g2,exp,name", CASES, ids=[c[3] for c in CASES])
def test_simple_entail(spark, g1, g2, exp, name):
    graph = _df(spark, g1, "http://g1.example/")
    probe = _df(spark, g2, "http://g2.example/")
    assert entails(graph, probe, saturate=False) is exp
    # RDFS saturation must not change simple-entailment verdicts here
    assert entails(graph, probe) is exp


XSD_PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"

D_CASES = [
    (":s :p 01 .", ":s :p 1 .", "graph non-normalized integer"),
    (":s :p 1 .", ":s :p 01 .", "probe non-normalized integer"),
    (":s :p 1.00 .", ":s :p 1.0 .", "graph non-normalized decimal"),
    (":s :p 1.0 .", ":s :p 1.00 .", "probe non-normalized decimal"),
    (":s :p 10e-1 .", ":s :p 1e0 .", "graph non-normalized double"),
    (":s :p 1e0 .", ":s :p 10e-1 .", "probe non-normalized double"),
    (':s :p "1"^^xsd:boolean.', ":s :p true .", "graph non-normalized boolean"),
    (":s :p true .", ':s :p "1"^^xsd:boolean.', "probe non-normalized boolean"),
    (':s :p "01"^^xsd:int .', ':s :p "1"^^xsd:int .', "graph non-normalized int"),
    (':s :p "1"^^xsd:int .', ':s :p "01"^^xsd:int .', "probe non-normalized int"),
    (":s :p <<( :a :b 01 )>>.", ":s :p <<( :a :b 1 )>>.", "tt integer"),
    (":s :p <<( :a :b 1.0 )>>.", ":s :p <<( :a :b 1.00 )>>.", "tt decimal"),
    (":s :p <<( :a :b 10e-1 )>>.", ":s :p <<( :a :b 1e0 )>>.", "tt double"),
    (':s :p <<( :a :b "1"^^xsd:boolean)>>.', ":s :p <<( :a :b true )>>.", "tt boolean"),
    (":s :p 1 .", ":s :p 1.0 .", "integer entails decimal"),
    (":s :p 1.0 .", ":s :p 1 .", "decimal entails integer"),
    (':s :p "1"^^xsd:int .', ":s :p 1.0 .", "int entails decimal"),
    (":s :p 1.0 .", ':s :p "1"^^xsd:int .', "decimal entails int"),
    (":s :p <<( :a :b 1 )>>.", ":s :p <<( :a :b 1.0 )>>.", "tt integer entails decimal"),
    (":s :p <<( :a :b 1.0 )>>.", ':s :p <<( :a :b "1"^^xsd:int )>>.', "tt decimal entails int"),
]


@pytest.mark.parametrize("g1,g2,name", D_CASES, ids=[c[2] for c in D_CASES])
def test_d_sparql_entailment(spark, g1, g2, name):
    graph = _df(spark, XSD_PFX + g1, "http://g1.example/")
    probe = _df(spark, XSD_PFX + g2, "http://g2.example/")
    # simple entailment (no D) does NOT equate the variants...
    assert entails(graph, probe, saturate=False) is False
    # ...SPARQL D-entailment does (reasoner/src/test.rs:212-260)
    assert entails(graph, probe, saturate=False, d="sparql") is True


ILL_CASES = [
    ':s :p "foo"^^xsd:integer.',
    ':s :p "foo"^^xsd:decimal.',
    ':s :p "foo"^^xsd:double.',
    ':s :p "foo"^^xsd:boolean.',
    ':s :p "foo"^^xsd:dateTime.',
    ':s :p "foo"^^xsd:int.',
    ':s :p "299"^^xsd:byte.',
    ':s :p "-1"^^xsd:positiveInteger.',
    ':a1 :p1 <<( :a :b "c"^^xsd:integer )>>.',
]


@pytest.mark.parametrize("g1", ILL_CASES)
def test_d_sparql_ill_typed(spark, g1):
    from sophia_rs_spark.operators.validate import IllTypedError

    graph = _df(spark, XSD_PFX + g1, "http://g1.example/")
    probe = _df(spark, XSD_PFX + ":x :y :z.", "http://g2.example/")
    # without D: no error (ill-typed literals are legal RDF)
    entails(graph, probe, saturate=False)
    with pytest.raises(IllTypedError):
        entails(graph, probe, saturate=False, d="sparql")


def test_literal_normalization_sparql(spark):
    """reasoner/src/test.rs:33-70: under SPARQL D-recognition the two
    list graphs normalize to the same values (01=1, 1.00=1.0, 1000e-3=
    1e0, +inf/INF, nan/NaN, "01"^^int="1"^^int; unrecognized datatypes
    keep lexical identity)."""
    from sophia_rs_spark.operators.c14n import isomorphic
    from sophia_rs_spark.operators.validate import d_normalize

    g1 = (XSD_PFX + '<x:s> <x:p> ( 01 1.00 1000e-3 "+inf"^^xsd:double '
          '"nan"^^xsd:float "01"^^xsd:int "foo"^^<x:unrecognized> ).')
    g2 = (XSD_PFX + '<x:s> <x:p> ( 1 1.0 1e0 "INF"^^xsd:double '
          '"NaN"^^xsd:float "1"^^xsd:int "foo"^^<x:unrecognized> ).')
    q1 = [
        tuple(d_normalize(t) for t in (r[1], r[2], r[3])) + (None,)
        for r in parse_turtle_document("http://a.example/", g1)
    ]
    q2 = [
        tuple(d_normalize(t) for t in (r[1], r[2], r[3])) + (None,)
        for r in parse_turtle_document("http://b.example/", g2)
    ]
    assert isomorphic(q1, q2)
    # and WITHOUT normalization they differ
    r1 = [
        (r[1], r[2], r[3], None)
        for r in parse_turtle_document("http://a.example/", g1)
    ]
    r2 = [
        (r[1], r[2], r[3], None)
        for r in parse_turtle_document("http://b.example/", g2)
    ]
    assert not isomorphic(r1, r2)
