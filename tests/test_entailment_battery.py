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
