"""Vendored subset of the W3C SPARQL 1.1 query syntax tests
(w3c rdf-tests sparql11/syntax-query) — re-authored from the public
suite structure (no network in this sandbox): positive cases must
parse, negative cases must raise SparqlError.  Complements the
semantic batteries (test_sparql_battery.py) with pure front-end
grammar coverage."""

import pytest

from sophia_rs_spark.sparql.parser import SparqlError, parse_query

POSITIVE = [
    ("syntax-basic-01", "SELECT * WHERE { }"),
    ("syntax-basic-02", "SELECT * { }"),
    ("syntax-basic-03", "SELECT * WHERE { ?x ?y ?z }"),
    ("syntax-basic-04", "SELECT * WHERE { ?x ?y ?z . }"),
    ("syntax-basic-05", "SELECT * WHERE { ?x ?y ?z . ?a ?b ?c }"),
    ("syntax-basic-06", "SELECT * WHERE { ?x ?y ?z . ?a ?b ?c . }"),
    ("syntax-qname-01",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :y :z }"),
    ("syntax-qname-07",
     "PREFIX : <http://example.org/ns#> PREFIX x.y: <x#> "
     "SELECT * WHERE { :x.y x.y:  :a.b . }"),
    ("syntax-lit-01",
     'PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p "x" }'),
    ("syntax-lit-02",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p 'x' }"),
    ("syntax-lit-05",
     'PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p "x\\"" }'),
    ("syntax-lit-07",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p 123 }"),
    # (the upstream syntax-lit-08 "123. ." relies on the SPARQL 1.0
    # DECIMAL grammar; under 1.1, "123." lexes integer + dot)
    ("syntax-lit-08",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p 123. }"),
    ("syntax-lit-09",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p 123.0 . }"),
    ("syntax-lit-10",
     'PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p "x"@en }'),
    ("syntax-lit-12",
     'PREFIX : <http://example.org/ns#> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
     'SELECT * WHERE { :x :p "1"^^xsd:integer }'),
    ("syntax-lit-13",
     'PREFIX : <http://example.org/ns#> SELECT * WHERE { :x :p """long\n"" literal""" }'),
    ("syntax-struct-03",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { OPTIONAL { :a :b :c } . ?x ?y ?z }"),
    ("syntax-struct-09",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?x ?y ?z { :a :b :c } }"),
    ("syntax-union-01",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { { ?s ?p ?o } UNION { ?a ?b ?c } }"),
    ("syntax-expr-01", "SELECT * WHERE { ?s ?p ?o . FILTER (?o) }"),
    ("syntax-expr-02", "SELECT * WHERE { ?s ?p ?o . FILTER REGEX(?o, 'foo') }"),
    ("syntax-expr-03", "SELECT * WHERE { ?s ?p ?o . FILTER REGEX(?o, 'foo', 'i') }"),
    ("syntax-expr-04", "SELECT * WHERE { ?s ?p ?o . FILTER ((?o) = 'foo') }"),
    ("syntax-expr-05", "SELECT * WHERE { ?s ?p ?o . FILTER (!BOUND(?o) || ?o < 5 && ?o * 2 >= 10) }"),
    ("syntax-order-01", "SELECT * WHERE { ?s ?p ?o } ORDER BY ?o"),
    ("syntax-order-02", "SELECT * WHERE { ?s ?p ?o } ORDER BY (?o + 5)"),
    ("syntax-order-03", "SELECT * WHERE { ?s ?p ?o } ORDER BY ASC(?o) DESC(?s)"),
    ("syntax-limit-offset-01", "SELECT * WHERE { ?s ?p ?o } LIMIT 5"),
    ("syntax-limit-offset-02", "SELECT * WHERE { ?s ?p ?o } LIMIT 5 OFFSET 3"),
    ("syntax-limit-offset-03", "SELECT * WHERE { ?s ?p ?o } OFFSET 3 LIMIT 5"),
    ("syntax-pat-01", "SELECT * WHERE { }"),
    ("syntax-pat-02", "PREFIX : <http://example.org/ns#> SELECT * WHERE { FILTER (?x = :x) }"),
    ("syntax-bnodes-01", "PREFIX : <http://example.org/ns#> SELECT * WHERE { [:p :q ] }"),
    ("syntax-bnodes-02", "PREFIX : <http://example.org/ns#> SELECT * WHERE { [] :p :q }"),
    ("syntax-bnodes-03", "PREFIX : <http://example.org/ns#> SELECT * WHERE { [ ?x ?y ] :p [ ?pa ?b ] }"),
    ("syntax-forms-01", "PREFIX : <http://example.org/ns#> SELECT * WHERE { ( [ ?x ?y ] ) :p ( [ ?pa ?b ] 57 ) }"),
    ("syntax-lists-01", "PREFIX : <http://example.org/ns#> SELECT * WHERE { ( ?x ) :p ?z }"),
    ("syntax-lists-02", "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?x :p ( ?z ) }"),
    ("syntax-lists-04", "PREFIX : <http://example.org/ns#> SELECT * WHERE { ( 1 2 3 ) :p ?z }"),
    ("syn-1", "SELECT * WHERE { ?s ?p ?o . FILTER (?o = +3) }"),
    ("syntax-aggregate-01", "SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o }"),
    ("syntax-aggregate-04",
     "SELECT (MIN(?o) AS ?min) ?g WHERE { ?s ?p ?o . ?s <g:g> ?g } GROUP BY ?g"),
    ("syntax-aggregate-10",
     "SELECT ?g (SUM(?o) AS ?s) WHERE { ?s ?p ?o . ?s <g:g> ?g } GROUP BY ?g HAVING (SUM(?o) > 10)"),
    ("syntax-subquery-01",
     "SELECT ?x WHERE { { SELECT ?x WHERE { ?x ?p ?o } LIMIT 1 } ?x ?q ?z }"),
    ("syntax-exists-01",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?s ?p ?o FILTER EXISTS { ?s :q ?o } }"),
    ("syntax-not-exists-01",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?s ?p ?o FILTER NOT EXISTS { ?s :q ?o } }"),
    ("syntax-minus-01",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?s ?p ?o MINUS { ?s :q ?o } }"),
    ("syntax-bind-01",
     "SELECT ?z WHERE { ?s ?p ?o . BIND(?o + 10 AS ?z) }"),
    ("syntax-bindings-02a",
     "SELECT * WHERE { ?s ?p ?o } VALUES ?x { <http://example.org/a> }"),
    ("syntax-bindings-03a",
     "SELECT * WHERE { ?s ?p ?o } VALUES (?x ?y) { (1 2) (UNDEF 4) }"),
    ("syntax-construct-01",
     "PREFIX : <http://example.org/ns#> CONSTRUCT { ?s :p ?o } WHERE { ?s ?p ?o }"),
    ("syntax-construct-where-01",
     "CONSTRUCT WHERE { ?s ?p ?o }"),
    ("syntax-ask-01", "ASK { ?s ?p ?o }"),
    ("syntax-describe-01", "DESCRIBE <http://example.org/x>"),
    ("syntax-describe-02", "DESCRIBE ?x WHERE { ?x ?p ?o }"),
    ("syntax-dataset-01",
     "SELECT * FROM <http://example.org/g> WHERE { ?s ?p ?o }"),
    ("syntax-dataset-03",
     "SELECT * FROM NAMED <http://example.org/g> WHERE { GRAPH ?g { ?s ?p ?o } }"),
    ("syntax-graph-03",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { GRAPH ?g { :x :b ?a } }"),
    ("syntax-pp-in-collection",
     "PREFIX : <http://example.org/ns#> SELECT * WHERE { ?s :p1/:p2/:p3 ?o }"),
    ("syntax-pp-alternatives",
     "PREFIX : <http://example.org/ns#> ASK { :a (:p1|:p2)+ :b }"),
    ("syntax-pp-inverse",
     "PREFIX : <http://example.org/ns#> ASK { :a ^:p ?x }"),
    ("syntax-pp-negated",
     "PREFIX : <http://example.org/ns#> ASK { :a !(:p1|^:p2) ?x }"),
    # sparql-12 triple terms
    ("syntax-tterm-ground",
     "PREFIX : <http://example.org/ns#> ASK { <<( :a :p :b )>> :t ?m }"),
    ("syntax-tterm-vars",
     "PREFIX : <http://example.org/ns#> SELECT * { <<( ?s ?p [] )>> :t ?m }"),
    ("syntax-tterm-nested",
     "PREFIX : <http://example.org/ns#> "
     "ASK { <<( <<( ?s :p ?o )>> :q :r )>> :t ?m }"),
    ("syntax-tterm-expr",
     "PREFIX : <http://example.org/ns#> "
     "SELECT (ISTRIPLE(<<( :a :p :b )>>) AS ?x) { ?s ?p ?o }"),
    ("syntax-tterm-object",
     "PREFIX : <http://example.org/ns#> ASK { ?d :t <<( ?s :p ?o )>> }"),
]


@pytest.mark.parametrize("name,q", POSITIVE, ids=[c[0] for c in POSITIVE])
def test_syntax_positive(name, q):
    parse_query(q)  # must not raise


NEGATIVE = [
    ("syn-bad-01", "SELECT"),
    ("syn-bad-02", "SELECT *"),
    ("syn-bad-03", "SELECT * WHERE"),
    ("syn-bad-04", "SELECT * WHERE { ?s ?p ?o"),
    ("syn-bad-05", "SELECT * WHERE { ?s ?p ?o } ORDER"),
    ("syn-bad-26", 'SELECT * WHERE { ?s ?p "unterminated }'),
    ("syn-bad-27", "SELECT * WHERE { ?s ?p ?o . . }"),
    ("syn-bad-bnode-dot", "SELECT * WHERE { [] . }"),
    ("syn-bad-filter-empty", "SELECT * WHERE { ?s ?p ?o FILTER() }"),
    ("syn-bad-undefined-prefix", "SELECT * WHERE { :s :p :o }"),
    ("syn-bad-lone-list", "SELECT * WHERE { () . }"),
    ("syn-bad-values-arity",
     "SELECT * WHERE { ?s ?p ?o } VALUES (?x ?y) { (1) }"),
    ("syn-bad-group-unbound",
     "SELECT ?bad WHERE { ?s ?p ?o } GROUP BY ?s"),
    ("syn-bad-agg-no-group",
     "SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s ?p ?o }"),
    ("syn-bad-keyword-term", "SELECT * WHERE { ?s WHERE ?o }"),
    ("syn-bad-extra-close", "SELECT * WHERE { ?s ?p ?o } }"),
    ("syn-bad-tterm-arity",
     "SELECT * WHERE { <<( ?s ?p )>> <x:t> ?m }"),
    ("syn-bad-tterm-unclosed",
     "SELECT * WHERE { <<( ?s ?p ?o <x:t> ?m }"),
    ("syn-bad-tterm-nested-agg",
     "SELECT (SUM(SUM(?o)) AS ?x) WHERE { ?s ?p ?o }"),
]


@pytest.mark.parametrize("name,q", NEGATIVE, ids=[c[0] for c in NEGATIVE])
def test_syntax_negative(name, q):
    with pytest.raises(SparqlError):
        parse_query(q)
