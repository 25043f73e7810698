"""Query-level battery ported from `sparql/src/test.rs:10-135`
(test_select_1_and_ask over dataset_101).  Expectations are rewritten
into our canonical encoding (xsd:string implicit; computed BIND values
are plain per the documented value-plane deviation); bnode results
compare as "_:b" like the reference's eval harness."""

import pytest

from sophia_rs_spark.sources.turtle import parse_turtle_document
from sophia_rs_spark.sparql import query

DATASET_TRIG = """
BASE <https://example.org/test>
PREFIX s: <http://schema.org/>

<#a> a s:Person ;
  s:name "Alice" ;
  s:performerIn [
    a s:Event ;
    s:name "Bob's birthday party" ;
  ].

GRAPH <#g> {
  <#b> a s:Person ;
    s:name "Alice".
}

GRAPH _:g {
  <#a> s:name "Albert".
}
"""

QPFX = "BASE <https://example.org/test> PREFIX s: <http://schema.org/> "

CASES = [
    ("SELECT ?x { ?s a ?x }",
     ["<http://schema.org/Event>", "<http://schema.org/Person>"], "types"),
    ("SELECT ?x { [] ?x [] }",
     ["<http://schema.org/name>", "<http://schema.org/name>",
      "<http://schema.org/performerIn>",
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"], "predicates"),
    ("SELECT ?x { [] ?p ?x }",
     ['"Alice"', '"Bob\'s birthday party"', "<http://schema.org/Event>",
      "<http://schema.org/Person>", "_:b"], "objects"),
    ('SELECT ?x { ?x ?y "not in the repo" }', [], "no result"),
    ("SELECT ?x { { ?x a s:Event } UNION { ?x a s:Person } }",
     ["<https://example.org/test#a>", "_:b"], "union2"),
    ("SELECT ?x { { ?x a s:Organization } UNION { ?x a s:Person } }",
     ["<https://example.org/test#a>"], "union1"),
    ("SELECT ?x { { ?x a s:Organization } UNION { ?x a s:Book } }",
     [], "union0"),
    ("SELECT ?x { GRAPH ?x { ?s ?p ?o } }",
     ["<https://example.org/test#g>", "<https://example.org/test#g>", "_:b"],
     "graphs"),
    ("SELECT ?x { GRAPH ?g { <#a> s:name ?x } }",
     ['"Albert"'], "Albert's name in all graphs"),
    ("SELECT ?x FROM NAMED <#g> { GRAPH ?g { <#a> s:name ?x } }",
     [], "Albert's name with FROM NAMED"),
    ("SELECT ?x { GRAPH ?g { ?y s:name ?x } }",
     ['"Albert"', '"Alice"'], "names in all graphs"),
    ("SELECT ?x FROM NAMED <#g> FROM NAMED <#h> { GRAPH ?g { ?y s:name ?x } }",
     ['"Alice"'], "names with FROM NAMED g h"),
    ("SELECT ?x FROM NAMED <#h> { GRAPH ?g { ?y s:name ?x } }",
     [], "names with FROM NAMED others"),
    ("SELECT ?x { GRAPH <#g> { ?y s:name ?x } }",
     ['"Alice"'], "names in g"),
    ("SELECT ?x FROM NAMED <#g> { GRAPH <#g> { ?y s:name ?x } }",
     ['"Alice"'], "names in g with FROM NAMED g"),
    ("SELECT ?x FROM NAMED <#h> { GRAPH <#g> { ?y s:name ?x } }",
     [], "names in g with FROM NAMED h"),
    ("SELECT ?x { GRAPH ?g { ?x s:name ?y } }",
     ["<https://example.org/test#a>", "<https://example.org/test#b>"],
     "named in all graphs"),
    ("SELECT ?x FROM <#g> { ?x s:name ?y }",
     ["<https://example.org/test#b>"], "named in g with FROM clause"),
    ("SELECT ?x { <#a> s:name ?n. BIND (?n as ?n2) GRAPH ?g { ?x s:name ?n2 } }",
     ["<https://example.org/test#b>"], "join"),
    ("SELECT ?x { VALUES ?t { s:Event s:Person } ?x a ?t. }",
     ["<https://example.org/test#a>", "_:b"], "values"),
    ("SELECT ?x { ?x s:name ?n. MINUS { ?x s:performerIn [] }}",
     ["_:b"], "minus"),
    ("SELECT ?x { ?x s:name ?n. MINUS { ?y s:performerIn [] }}",
     ["<https://example.org/test#a>", "_:b"], "minus disjoint domain"),
    ("SELECT ?x { ?x s:name ?x }", [],
     "multiple occurrence of variable in triple pattern"),
]


@pytest.fixture(scope="module")
def ds(spark):
    rows = parse_turtle_document(
        "https://example.org/test", DATASET_TRIG, quads=True
    )
    bad = [r[5] for r in rows if r[5]]
    assert bad == [], bad
    df = spark.createDataFrame(
        [(r[1], r[2], r[3], r[4]) for r in rows],
        "s string, p string, o string, g string",
    )
    df.cache().count()
    yield df
    df.unpersist()


def _norm(v):
    if v is None:
        return None
    return "_:b" if str(v).startswith("_:") else str(v)


@pytest.mark.parametrize("q,exp,name", CASES, ids=[c[2] for c in CASES])
def test_select_battery(ds, q, exp, name):
    got = query(ds, QPFX + q)
    vals = sorted(_norm(r["x"]) for r in got.collect())
    assert vals == sorted(exp), name


def test_values_cross_product_bind(ds):
    # reference expects typed integer literals; our value plane yields
    # plain numerics (documented deviation) — the VALUES cross product
    # and arithmetic are what's under test
    got = query(
        ds,
        QPFX + "SELECT ?x { VALUES ?y { 10 20 } VALUES ?z { 1 2 } "
        "BIND (?y+?z as ?x) }",
    )
    assert sorted(float(r["x"]) for r in got.collect()) == [11.0, 12.0, 21.0, 22.0]
