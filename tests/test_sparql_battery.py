"""Query-level battery ported from `sparql/src/test.rs:10-135`
(test_select_1_and_ask over dataset_101).  Expectations are rewritten
into our canonical encoding (xsd:string implicit; computed numeric
values are TYPED canonical literals per value/_number.rs); bnode
results compare as "_:b" like the reference's eval harness."""

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
    # typed integer literals, exactly as the reference expects
    got = query(
        ds,
        QPFX + "SELECT ?x { VALUES ?y { 10 20 } VALUES ?z { 1 2 } "
        "BIND (?y+?z as ?x) }",
    )
    assert sorted(r["x"] for r in got.collect()) == [
        f'"{n}"^^<http://www.w3.org/2001/XMLSchema#integer>'
        for n in (11, 12, 21, 22)
    ]


# test.rs:800-817 — FILTER battery (EBV of constants, error-poisoning,
# EXISTS with correlated/uncorrelated bodies)
FILTER_CASES = [
    ("", ["<https://example.org/test#a>", "_:b"], "control"),
    ("FILTER (true)", ["<https://example.org/test#a>", "_:b"], "always true"),
    ("FILTER (false)", [], "always false"),
    ("FILTER (42/0)", [], "error"),
    ("FILTER EXISTS { ?x s:name ?e }",
     ["<https://example.org/test#a>", "_:b"], "exists redundant"),
    ("FILTER EXISTS { ?x s:performerIn ?e }",
     ["<https://example.org/test#a>"], "exists success"),
    ("FILTER EXISTS { ?x s:knows ?e }", [], "exists failure"),
]


@pytest.mark.parametrize("f,exp,name", FILTER_CASES, ids=[c[2] for c in FILTER_CASES])
def test_filter_battery(ds, f, exp, name):
    got = query(ds, QPFX + f"SELECT ?x {{ ?x s:name ?n. {f} }}")
    vals = sorted(_norm(r["x"]) for r in got.collect())
    assert vals == sorted(exp), name


# test.rs:822-857 — aggregate battery, expectations VERBATIM from the
# reference where it pins a term (typed numeric results: COUNT/SUM/AVG
# emit canonical literals with the promoted datatype — integer /
# decimal / double — value/_number.rs + value.rs lexical_form).
# Includes the error-poisoning rows ("sum err" etc. — a type-error
# element makes the whole SUM/AVG/MIN/MAX/GROUP_CONCAT unbound,
# aggregate_iter.rs:236-309) and the SPARQL value-order MIN/MAX rows
# ("min string", "min mixed terms" — test.rs:843-848).  None = unbound.
_XI = '^^<http://www.w3.org/2001/XMLSchema#integer>'
_XD = '^^<http://www.w3.org/2001/XMLSchema#decimal>'
_XF = '^^<http://www.w3.org/2001/XMLSchema#double>'
AGG_CASES = [
    ("SELECT (COUNT(*) as ?a) { VALUES ?x { 1 2 } VALUES ?y { 3 3 }}",
     f'"4"{_XI}', "count star"),
    ("SELECT (COUNT(DISTINCT *) as ?a) { VALUES ?x { 1 2 } VALUES ?y { 3 3 }}",
     f'"2"{_XI}', "count star distinct"),
    ("SELECT (COUNT(abs(?x)) as ?a) { VALUES ?x { 1 2 -2 } }",
     f'"3"{_XI}', "count expr"),
    ("SELECT (COUNT(DISTINCT abs(?x)) as ?a) { VALUES ?x { 1 2 -2 } }",
     f'"2"{_XI}', "count expr distinct"),
    ("SELECT (COUNT(abs(?x)) as ?a) { VALUES ?x { 1 true -2 } }",
     f'"2"{_XI}', "count expr err skips"),
    ("SELECT (SUM(abs(?x)) as ?a) { VALUES ?x { 1 2 -2 } }",
     f'"5"{_XI}', "sum"),
    ("SELECT (SUM(DISTINCT abs(?x)) as ?a) { VALUES ?x { 1 2 -2 } }",
     f'"3"{_XI}', "sum distinct"),
    ("SELECT (SUM(DISTINCT abs(?x)) as ?a) { VALUES ?x { 1 2.0 -2e0 } }",
     f'"5e0"{_XF}', "sum distinct mixed"),
    ("SELECT (SUM(DISTINCT xsd:integer(abs(?x))) as ?a) { VALUES ?x { 1 2.0 -2e0 } }",
     f'"3"{_XI}', "sum distinct coerced"),
    ("SELECT (AVG(abs(?x)) as ?a) { VALUES ?x { 1 2 -2 0 3 } }",
     f'"1.6"{_XD}', "avg"),
    ("SELECT (AVG(DISTINCT abs(?x)) as ?a) { VALUES ?x { 1 2 -2 0 3 } }",
     f'"1.5"{_XD}', "avg distinct"),
    ("SELECT (AVG(DISTINCT abs(?x)) as ?a) { VALUES ?x { 1 2.0 -2e0 0 3 } }",
     f'"1.6e0"{_XF}', "avg distinct mixed"),
    ("SELECT (AVG(DISTINCT xsd:decimal(abs(?x))) as ?a) { VALUES ?x { 1 2.0 -2e0 0 3 } }",
     f'"1.5"{_XD}', "avg distinct coerced"),
    ("SELECT (MIN(abs(?x)) as ?a) { VALUES ?x { 2 1 -3 -2 } }",
     f'"1"{_XI}', "min"),
    ("SELECT (MIN(abs(?x)) as ?a) { VALUES ?x { 2 1.0 -3e0 -2 } }",
     f'"1.0"{_XD}', "min mixed number"),
    ("SELECT (MAX(abs(?x)) as ?a) { VALUES ?x { 2 1 -3 -2 } }",
     f'"3"{_XI}', "max"),
    ("SELECT (MAX(abs(?x)) as ?a) { VALUES ?x { 2 1.0 -3e0 -2 } }",
     f'"3e0"{_XF}', "max mixed number"),
    ('SELECT (GROUP_CONCAT(str(abs(?x))) as ?a) { VALUES ?x { 1 2 -2 } }',
     '"1 2 2"', "group_concat"),
    ('SELECT (GROUP_CONCAT(DISTINCT str(abs(?x))) as ?a) { VALUES ?x { 1 2 -2 } }',
     '"1 2"', "group_concat distinct"),
    ('SELECT (GROUP_CONCAT(str(abs(?x)); SEPARATOR="|") as ?a) { VALUES ?x { 1 2 -2 } }',
     '"1|2|2"', "group_concat separator"),
    ("SELECT (SAMPLE(abs(?x)) as ?a) { VALUES ?x { 1 1 1 } }",
     f'"1"{_XI}', "sample"),
    # error-poisoning (test.rs:834,839,842,847,855)
    ("SELECT (SUM(abs(?x)) as ?a) { VALUES ?x { 1 true -2 } }", None, "sum err"),
    ("SELECT (AVG(abs(?x)) as ?a) { VALUES ?x { 1 true -2 0 3 } }", None, "avg err"),
    ('SELECT (MIN(abs(?x)) as ?a) { VALUES ?x { 2 1.0 -3e0 "-2" } }', None, "min err"),
    ('SELECT (MAX(abs(?x)) as ?a) { VALUES ?x { 2 1.0 -3e0 "-2" } }', None, "max err"),
    ('SELECT (GROUP_CONCAT(str(abs(?x))) as ?a) { VALUES ?x { 1 true -2 } }',
     None, "group_concat err"),
    # as_string_lit coercion (expression.rs:441-456): a non-string-
    # literal element — IRI or non-string typed literal — poisons the
    # whole GROUP_CONCAT to unbound; langString elements contribute
    # their text, and DISTINCT dedups on the TERM, not the text
    ('SELECT (GROUP_CONCAT(?x) as ?a) { VALUES ?x { "a" <x:i> } }',
     None, "group_concat iri err"),
    ('SELECT (GROUP_CONCAT(?x) as ?a) { VALUES ?x { "a" 2 } }',
     None, "group_concat typed err"),
    ('SELECT (GROUP_CONCAT(DISTINCT ?x) as ?a) { VALUES ?x { "w"@en "w"@fr } }',
     '"w w"', "group_concat distinct by term"),
    # SPARQL value order, not string order (test.rs:843-848; the r2
    # confirmed bug: MIN of {2, 10} returned 10 lexicographically)
    ("SELECT (MIN(?x) as ?a) { VALUES ?x { 2 10 } }",
     f'"2"{_XI}', "min value order"),
    ("SELECT (MAX(?x) as ?a) { VALUES ?x { 2 10 } }",
     f'"10"{_XI}', "max value order"),
    ('SELECT (MIN(SUBSTR(?x, 2)) as ?a) { VALUES ?x { "aC" "bA" "cD" "dB" } }',
     "A", "min string"),
    ('SELECT (MAX(SUBSTR(?x, 2)) as ?a) { VALUES ?x { "aC" "bA" "cD" "dB" } }',
     "D", "max string"),
    ("SELECT (MIN(?x) as ?a) { VALUES ?x { 3 <x:1> 2 <x:2> } }",
     "<x:1>", "min mixed terms"),
    ("SELECT (MAX(?x) as ?a) { VALUES ?x { 3 <x:1> 4 <x:2> } }",
     f'"4"{_XI}', "max mixed terms"),
    # SUM/AVG over an empty group = 0 (aggregate_iter.rs:150,390-394)
    ("SELECT (SUM(?x) as ?a) { VALUES ?x { 1 } FILTER(?x > 5) }",
     f'"0"{_XI}', "sum empty"),
    ("SELECT (AVG(?x) as ?a) { VALUES ?x { 1 } FILTER(?x > 5) }",
     f'"0.0"{_XD}', "avg empty"),
]


@pytest.mark.parametrize("q,exp,name", AGG_CASES, ids=[c[2] for c in AGG_CASES])
def test_aggregate_battery(spark, ds, q, exp, name):
    got = query(ds, "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> " + q).collect()
    assert len(got) == 1
    v = got[0]["a"]
    assert v == exp, name


def test_case_sensitive_variables(ds):
    # SPARQL variables are case-sensitive: ?m and ?M coexist (r2
    # confirmed crash: AMBIGUOUS_REFERENCE under Spark's default
    # case-insensitive resolution)
    got = query(
        ds, "SELECT (MIN(?x) AS ?m) (MAX(?x) AS ?M) { VALUES ?x { 2 10 } }"
    ).collect()
    assert len(got) == 1
    assert got[0]["m"] == '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert got[0]["M"] == '"10"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_select_star_hides_bnode_placeholders(ds):
    # SELECT * must not project the internal bnode-placeholder columns
    # for [] or _:b in query patterns (ADVICE r2)
    got = query(ds, "SELECT * { ?s ?p [] }")
    assert got.columns == ["s", "p"]
    got2 = query(ds, "SELECT * { ?s ?p _:x }")
    assert got2.columns == ["s", "p"]


def test_eq_unbound_is_error(ds):
    # FILTER(?v1 = ?v2) with both unbound is a TYPE ERROR (row dropped),
    # not true (ADVICE r2: eqNullSafe made NULL = NULL → TRUE)
    got = query(
        ds,
        "SELECT ?x { VALUES ?x { 1 } "
        "OPTIONAL { VALUES (?x ?v1) { (99 1) } } "
        "OPTIONAL { VALUES (?x ?v2) { (99 2) } } "
        "FILTER(?v1 = ?v2) }",
    ).collect()
    assert got == []
    # BIND((?a = ?b) AS ?t) with unbound operands binds NOTHING (error)
    got2 = query(
        ds,
        "SELECT ?t { VALUES ?x { 1 } OPTIONAL { VALUES (?x ?a) { (99 1) } } "
        "BIND((?a = ?x) AS ?t) }",
    ).collect()
    assert len(got2) == 1 and got2[0]["t"] is None


def test_multiple_aggregates_battery(spark, ds):
    got = query(
        ds,
        "SELECT (count(?y) as ?cy) (count(distinct ?y) as ?cdy) "
        "(avg(?y) as ?ay) (avg(distinct ?y) as ?ady) "
        "(min(?y) as ?miny) (max(?y) as ?maxy) "
        "{ VALUES (?x ?y) { (1 10) (2 14) (1 16) (2 16) (2 12) (1 10) (1 13) } }",
    ).collect()[0]
    assert got["cy"] == f'"7"{_XI}' and got["cdy"] == f'"5"{_XI}'
    assert got["ay"] == f'"13.0"{_XD}' and got["ady"] == f'"13.0"{_XD}'
    assert got["miny"] == '"10"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert got["maxy"] == '"16"^^<http://www.w3.org/2001/XMLSchema#integer>'


# test.rs:2294-2305 — CONSTRUCT battery (template bnodes fresh per
# solution; the generalized-collection template case is out of scope)
def test_construct_simple(ds):
    got = query(ds, QPFX + "CONSTRUCT { <x:s> <x:p> <x:o> } {}")
    assert [tuple(r) for r in got.collect()] == [("<x:s>", "<x:p>", "<x:o>")]


def test_construct_template_bnodes(ds):
    got = query(
        ds, QPFX + "CONSTRUCT { [] a ?o } { VALUES ?o { 1 2 } }"
    ).collect()
    assert len(got) == 2
    subs = {r["s"] for r in got}
    objs = {r["o"] for r in got}
    assert len(subs) == 2 and all(s.startswith("_:") for s in subs)
    assert objs == {
        '"1"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"2"^^<http://www.w3.org/2001/XMLSchema#integer>',
    }


def test_construct_shared_template_bnode(ds):
    # same [] label twice in one template row → same bnode per solution
    got = query(
        ds,
        QPFX + "CONSTRUCT { _:n <x:p1> ?o . _:n <x:p2> ?o } "
        "{ VALUES ?o { 1 2 } }",
    ).collect()
    by_o = {}
    for r in got:
        by_o.setdefault(r["o"], set()).add(r["s"])
    for o, subs in by_o.items():
        assert len(subs) == 1  # same bnode across the two triples
    assert len({next(iter(s)) for s in by_o.values()}) == 2  # fresh per solution


# test.rs:962-1023 — GRAPH scoping of nested OPTIONAL/NOT EXISTS/MINUS/join
GRAPH_OPT_DATA = """
PREFIX : <x:>
:g {
  :s1 :p :o1.
  :s2 :p :o2.
  :a1 :q :s1.
}
"""

GRAPH_OPT_CASES = [
    ("SELECT ?g ?x { GRAPH ?g { ?x :p []. } }",
     [("<x:g>", "<x:s1>"), ("<x:g>", "<x:s2>")], "graph only"),
    ("SELECT ?g ?x { GRAPH ?g { ?x :p []. OPTIONAL { ?a :q ?x } } }",
     [("<x:g>", "<x:s1>"), ("<x:g>", "<x:s2>")], "graph and optional"),
    ("SELECT ?g ?x { GRAPH ?g { ?x :p []. FILTER NOT EXISTS { ?a :q ?x } } }",
     [("<x:g>", "<x:s2>")], "graph and filter not exists"),
    ("SELECT ?g ?x { GRAPH ?g { ?x :p []. MINUS { ?a :q ?x } } }",
     [("<x:g>", "<x:s2>")], "graph and minus"),
    ("SELECT ?g ?x { GRAPH ?g { ?x :p []. { ?a :q ?x } } }",
     [("<x:g>", "<x:s1>")], "graph and join"),
]


@pytest.fixture(scope="module")
def gods(spark):
    rows = parse_turtle_document("x:doc2", GRAPH_OPT_DATA, quads=True)
    assert not [r[5] for r in rows if r[5]]
    df = spark.createDataFrame(
        [(r[1], r[2], r[3], r[4]) for r in rows],
        "s string, p string, o string, g string",
    )
    df.cache().count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("q,exp,name", GRAPH_OPT_CASES, ids=[c[2] for c in GRAPH_OPT_CASES])
def test_graph_and_optional(gods, q, exp, name):
    got = query(gods, "PREFIX : <x:> " + q)
    vals = sorted((r["g"], r["x"]) for r in got.collect())
    assert vals == sorted(exp), name


def test_count_in_graph(ds):
    """test.rs:1025-1046: subquery under GRAPH ?g aggregates PER active
    graph; IRI(bnode graph name) errors to unbound."""
    got = query(
        ds,
        "SELECT (IRI(?g) as ?h) ?c { GRAPH ?g { SELECT (COUNT(*) as ?c) "
        "{ ?s ?p ?o } } }",
    ).collect()
    rows = {
        (
            _norm(r["h"]) if r["h"] else None,
            int(r["c"].split('"')[1]),
        )
        for r in got
    }
    assert rows == {(None, 1), ("<https://example.org/test#g>", 2)}


# test.rs:2048-2158 — RDFterm-equal matrix (= / != incl. type errors)
EQ_TERMS = {
    "iri": "<x:xyz>", "bnode": "_:xyz", "string": '"xyz"',
    "langString": '"xyz"@en', "dirLangString": '"xyz"@en--ltr',
    "unrecognized": '"xyz"^^<x:unrecognized>',
    "illformed": '"xyz"^^xsd:integer',
    "tterm": '<<( _:xyz <x:xyz> "xyz" )>>',
    "iri2": "<x:xyz2>", "string2": '"xyz2"',
    "unrecognized2": '"xyz2"^^<x:unrecognized>',
    "illformed2": '"xyz2"^^xsd:integer',
}

EQ_MATRIX = [
    ("iri", "iri", True), ("iri", "bnode", False), ("iri", "string", False),
    ("iri", "unrecognized", False), ("iri", "illformed", False),
    ("iri", "tterm", False),
    ("bnode", "bnode", True), ("bnode", "string", False),
    ("string", "string", True), ("string", "langString", False),
    ("string", "dirLangString", False), ("string", "unrecognized", None),
    ("string", "illformed", None), ("string", "tterm", False),
    ("langString", "langString", True), ("langString", "dirLangString", False),
    ("langString", "unrecognized", None),
    ("dirLangString", "dirLangString", True),
    ("unrecognized", "bnode", False), ("unrecognized", "string", None),
    ("unrecognized", "unrecognized", True), ("unrecognized", "illformed", None),
    ("unrecognized", "tterm", False),
    ("illformed", "illformed", True), ("illformed", "tterm", False),
    ("tterm", "tterm", True),
    ("iri", "iri2", False), ("string", "string2", False),
    ("unrecognized", "unrecognized2", None), ("illformed", "illformed2", None),
]


@pytest.mark.parametrize(
    "k1,k2,exp", EQ_MATRIX, ids=[f"{a}-{b}" for a, b, _ in EQ_MATRIX]
)
def test_term_equality_matrix(spark, k1, k2, exp):
    rows = []
    for name, enc in EQ_TERMS.items():
        doc = f'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n<x:{name}> <x:p> {enc}.\n'
        parsed = parse_turtle_document("x:eqdoc", doc)
        assert not [r[5] for r in parsed if r[5]], (name, parsed)
        rows += [(r[1], r[2], r[3], None) for r in parsed]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    got = query(
        df,
        "PREFIX : <x:> SELECT ?eq ?neq { "
        f"<x:{k1}> :p ?v1. <x:{k2}> :p ?v2. "
        "BIND((?v1 = ?v2) AS ?eq) BIND((?v1 != ?v2) AS ?neq) }",
    ).collect()[0]
    def _b(v):
        return None if v is None else v.startswith('"true"')

    if exp is None:
        assert got["eq"] is None and got["neq"] is None
    else:
        assert _b(got["eq"]) is exp and _b(got["neq"]) is (not exp)


# test.rs:2210-2231 — strict < over values (numeric/string/lang/bool/dateTime)
LT_CASES = [
    ("42", "43"), ("42", "43.0"), ("42", "43e0"), ("42.0", "43e0"),
    ('""', '"a"'), ('"a"', '"ab"'), ('"a"', '"b"'), ('"10"', '"2"'),
    ('""@en', '"a"@en'), ('"a"@en', '"b"@en'),
    ('""@en--ltr', '"a"@en--ltr'),
    ("false", "true"),
    ('"2024-03-25T00:00:00Z"^^xsd:dateTime',
     '"2024-03-25T00:00:01Z"^^xsd:dateTime'),
    # timezone-aware: 01:00+01:00 is the SAME instant as 00:00Z
    ('"2024-03-25T00:00:00Z"^^xsd:dateTime',
     '"2024-03-25T01:00:01+01:00"^^xsd:dateTime'),
]


@pytest.mark.parametrize("e1,e2", LT_CASES, ids=[f"{a}<{b}" for a, b in LT_CASES])
def test_expr_lt(ds, e1, e2):
    got = query(
        ds,
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        f"SELECT ?lt ?ge {{ BIND(({e1} < {e2}) AS ?lt) BIND(({e1} >= {e2}) AS ?ge) }}",
    ).collect()[0]
    assert got["lt"] == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>' and got["ge"] == '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'


# test.rs:152-217 — repeated vars/bnodes, empty-GRAPH asks, 2-var selects,
# UNION with disjoint vars, REDUCED/DISTINCT
def test_multiple_occurrences_variable(spark):
    rows = [
        ("<t:a>", "<t:p>", "<t:a>", None),
        ("<t:a>", "<t:p>", "<t:b>", None),
        ("<t:c>", "<t:p>", "<t:a>", None),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    got = query(df, "SELECT ?x { ?x <t:p> ?x }")
    assert [r["x"] for r in got.collect()] == ["<t:a>"]
    # bnode in the probe acts as a plain variable inside a query
    got2 = query(df, "SELECT ?x { ?x <t:p> _:y. _:y <t:p> _:y. }")
    assert sorted(r["x"] for r in got2.collect()) == ["<t:a>", "<t:c>"]


GRAPH_ASK_CASES = [
    ("SELECT * { GRAPH <https://example.org/test#g> {} }", False, "graph exist"),
    ("SELECT * { GRAPH <https://example.org/test#absent> {} }", True, "graph not exist"),
    ("SELECT * FROM NAMED <#g> { GRAPH <https://example.org/test#g> {} }",
     False, "graph exist and named"),
    ("SELECT * FROM NAMED <#h> { GRAPH <https://example.org/test#g> {} }",
     True, "graph exist but not named"),
]


@pytest.mark.parametrize("q,empty,name", GRAPH_ASK_CASES, ids=[c[2] for c in GRAPH_ASK_CASES])
def test_empty_graph_pattern(ds, q, empty, name):
    got = query(ds, QPFX + q)
    assert (got.count() == 0) is empty, name
    ask = query(ds, QPFX + q.replace("SELECT *", "ASK"))
    assert ask is (not empty), name


def test_union_disjoint_vars(ds):
    got = query(
        ds,
        QPFX + "SELECT ?p ?e { { ?p a s:Person } UNION { ?e a s:Event } }",
    ).collect()
    rows = sorted(((r["p"], r["e"]) for r in got), key=lambda t: (t[0] is None, t))
    assert len(rows) == 2
    a = [r for r in rows if r[0] is not None][0]
    b = [r for r in rows if r[0] is None][0]
    assert a[0] == "<https://example.org/test#a>" and a[1] is None
    assert b[1].startswith("_:")


def test_select_two_vars_optional_condition(ds):
    # OPTIONAL with a filter folded into the join condition
    got = query(
        ds,
        QPFX + 'SELECT ?x ?y { ?x a ?z. OPTIONAL { ?x s:name ?y. FILTER (?y < "B") } }',
    ).collect()
    by_x = {_norm(r["x"]): r["y"] for r in got}
    assert by_x["<https://example.org/test#a>"] == '"Alice"'
    assert by_x["_:b"] is None  # "Bob's birthday party" >= "B" → unbound


def test_reduced_and_distinct(ds):
    got = query(ds, QPFX + 'SELECT DISTINCT ?x { VALUES ?x { "a" "a" "b" "a" } }')
    assert sorted(r["x"] for r in got.collect()) == ['"a"', '"b"']
    # REDUCED may eliminate any amount of duplication (full dedup legal)
    got2 = query(ds, QPFX + 'SELECT REDUCED ?x { VALUES ?x { "a" "a" "b" "a" } }')
    assert sorted(set(r["x"] for r in got2.collect())) == ['"a"', '"b"']


def test_limit_offset_pagination(ds):
    # test.rs:763-797: paging through [] ?p [] with every limit 1..6
    all_ps = sorted(
        r["p"] for r in query(ds, QPFX + "SELECT ?p { [] ?p [] }").collect()
    )
    assert len(all_ps) == 5
    for limit in range(1, 7):
        got, offset = [], 0
        while True:
            page = query(
                ds, QPFX + f"SELECT ?p {{ [] ?p [] }} OFFSET {offset} LIMIT {limit}"
            ).collect()
            exp_len = 0 if offset >= 5 else min(limit, 5 - offset)
            assert len(page) == exp_len, (limit, offset)
            got += [r["p"] for r in page]
            if exp_len == 0:
                break
            offset += limit
        assert sorted(got) == all_ps, limit


def test_from_multi_graph_merges_as_set(spark):
    # FROM <g1> FROM <g2> composes the default graph as a MERGE (set):
    # a triple present in both graphs yields ONE solution (ADVICE r2 —
    # bag union inflated counts/aggregates)
    rows = [
        ("<x:s>", "<x:p>", "<x:o>", "<x:g1>"),
        ("<x:s>", "<x:p>", "<x:o>", "<x:g2>"),
        ("<x:s>", "<x:p>", "<x:o2>", "<x:g2>"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    got = query(df, "SELECT ?o FROM <x:g1> FROM <x:g2> { <x:s> <x:p> ?o }")
    assert {r["o"] for r in got.collect()} == {"<x:o>", "<x:o2>"}
    # aggregate over the merged default graph is not inflated
    cnt = query(
        df, "SELECT (COUNT(*) AS ?n) FROM <x:g1> FROM <x:g2> { ?s ?p ?o }"
    ).collect()[0]["n"]
    assert cnt == '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_minus_unbound_compatibility(spark):
    # MINUS with a maybe-unbound shared var: a left row whose ?v is
    # unbound but whose ?x matches a right row IS removed (unbound =
    # compatible wildcard, and the domains overlap on ?x) — ADVICE r2:
    # the plain equi anti-join kept it
    df = spark.createDataFrame([("<x:s>", "<x:p>", "<x:o>")], "s string, p string, o string")
    q = """
    SELECT ?x ?v {
      VALUES (?x ?v) { (<x:a> UNDEF) (<x:b> "1") (<x:c> "2") }
      MINUS { VALUES (?x ?v) { (<x:a> "9") (<x:c> "2") } }
    }
    """
    got = {r["x"] for r in query(df, q).collect()}
    # <x:a> removed (UNDEF ?v compatible with "9", dom overlap on ?x);
    # <x:c> removed (exact match); <x:b> kept
    assert got == {"<x:b>"}


def test_regex_flags_validation(spark):
    df = spark.createDataFrame([("<x:s>", "<x:p>", '"a.c"')], "s string, p string, o string")
    # 'q' flag: pattern is a LITERAL string — "a.c" matches itself but
    # "abc" must NOT match the quoted "a.c"
    got = query(df, 'SELECT ?o { ?s ?p ?o FILTER REGEX(?o, "a.c", "q") }')
    assert got.count() == 1
    got2 = query(df, 'SELECT ?o { ?s ?p ?o FILTER REGEX("abc", "a.c", "q") }')
    assert got2.count() == 0
    # unquoted: "a.c" pattern matches "abc"
    got3 = query(df, 'SELECT ?o { ?s ?p ?o FILTER REGEX("abc", "a.c") }')
    assert got3.count() == 1
    # invalid flag letter → expression error → row dropped (not thrown)
    got4 = query(df, 'SELECT ?o { ?s ?p ?o FILTER REGEX(?o, "a", "z") }')
    assert got4.count() == 0
    # empty flag string is a no-op, not an invalid '(?)' prefix
    got5 = query(df, 'SELECT ?o { ?s ?p ?o FILTER REGEX(?o, "a", "") }')
    assert got5.count() == 1


def test_order_by_constraint_forms(spark):
    # OrderCondition: bare BuiltInCall and bracketted expressions
    df = spark.createDataFrame(
        [("<x:b>", "<x:p>", '"10"^^<http://www.w3.org/2001/XMLSchema#integer>'),
         ("<x:a>", "<x:p>", '"2"^^<http://www.w3.org/2001/XMLSchema#integer>')],
        "s string, p string, o string",
    )
    got = query(df, "SELECT ?s { ?s ?p ?o } ORDER BY STR(?s)")
    assert [r["s"] for r in got.collect()] == ["<x:a>", "<x:b>"]
    # bracketted arithmetic order condition uses VALUE order (2 < 10)
    got2 = query(df, "SELECT ?o { ?s ?p ?o } ORDER BY (?o * 1)")
    assert [r["o"].split('"')[1] for r in got2.collect()] == ["2", "10"]


def test_group_by_condition_forms(spark):
    # GroupCondition: bare BuiltInCall and unnamed bracketted expr group
    # without projecting the key (synthetic hidden column)
    df = spark.createDataFrame(
        [("<x:a>", "<x:n>", '"Alice"'), ("<x:b>", "<x:n>", '"Aaron"'),
         ("<x:c>", "<x:n>", '"Bob"')],
        "s string, p string, o string",
    )
    for q in (
        "SELECT (COUNT(*) AS ?n) { ?s <x:n> ?o } GROUP BY SUBSTR(?o, 1, 1)",
        "SELECT (COUNT(*) AS ?n) { ?s <x:n> ?o } GROUP BY (SUBSTR(?o, 1, 1))",
    ):
        got = query(df, q)
        assert "#" not in "".join(got.columns)
        vals = sorted(r["n"] for r in got.collect())
        assert vals == [
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>',
            '"2"^^<http://www.w3.org/2001/XMLSchema#integer>',
        ]


def test_having_condition_forms(spark):
    # HavingCondition+ — multiple bracketted conditions conjoin; a bare
    # BuiltInCall is also a legal condition
    df = spark.createDataFrame(
        [("<x:a>", "<x:n>", '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'),
         ("<x:a>", "<x:n>", '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'),
         ("<x:b>", "<x:n>", '"9"^^<http://www.w3.org/2001/XMLSchema#integer>')],
        "s string, p string, o string",
    )
    got = query(
        df,
        "SELECT ?s (SUM(?o) AS ?t) { ?s <x:n> ?o } GROUP BY ?s "
        "HAVING(?t > 2) (?t < 5)",
    ).collect()
    assert [(r["s"], r["t"].split('"')[1]) for r in got] == [("<x:a>", "3")]
    got2 = query(
        df,
        "SELECT ?s { ?s <x:n> ?o } GROUP BY ?s HAVING BOUND(?s)",
    )
    assert got2.count() == 2


def test_group_by_multiple_aggregates(ds):
    # test.rs:916-961 — per-group multi-aggregates, ordered by key
    got = query(
        ds,
        "SELECT ?x (count(?y) as ?cy) (count(distinct ?y) as ?cdy) "
        "(avg(?y) as ?ay) (avg(distinct ?y) as ?ady) "
        "(min(?y) as ?miny) (max(?y) as ?maxy) "
        "{ VALUES (?x ?y) { (1 10) (2 14) (1 16) (2 16) (2 12) (1 10) (1 13) } } "
        "GROUP BY ?x ORDER BY ?x",
    ).collect()
    def lex(v):
        return v.split('"')[1]
    rows = [
        (lex(r["x"]), lex(r["cy"]), lex(r["cdy"]), lex(r["ay"]),
         lex(r["ady"]), lex(r["miny"]), lex(r["maxy"]))
        for r in got
    ]
    assert rows == [
        ("1", "4", "3", "12.25", "13.0", "10", "16"),
        ("2", "3", "3", "14.0", "14.0", "12", "16"),
    ]


def test_ebv_simple_literal_from_string_fn(ds):
    # r3 ADVICE: EBV of a PLAIN computed string is the simple-literal
    # rule (sparql11-query 17.2.2 / reference is_truthy): non-empty ⇒
    # true — even when it looks numeric ("0") or boolean ("false")
    got = query(
        ds,
        'SELECT ?x { VALUES ?x { 1 } FILTER(STRAFTER("a0", "a")) }',
    )
    assert got.count() == 1, 'STRAFTER("a0","a") = "0" is a non-empty simple literal'
    got2 = query(
        ds,
        'SELECT ?x { VALUES ?x { 1 } FILTER(SUBSTR("falsehood", 1, 5)) }',
    )
    assert got2.count() == 1, 'computed "false" is a non-empty simple literal'
    got3 = query(
        ds,
        'SELECT ?x { VALUES ?x { 1 } FILTER(STRAFTER("a", "a")) }',
    )
    assert got3.count() == 0, "empty simple literal is falsy"
    # typed terms still use their typed EBV
    got4 = query(ds, 'SELECT ?x { VALUES ?x { 1 } FILTER(0) }')
    assert got4.count() == 0
    got5 = query(ds, 'SELECT ?x { VALUES ?x { 1 } FILTER(false) }')
    assert got5.count() == 0


def test_trailing_values_before_select_exprs(spark):
    # r3 ADVICE: §18.2.4.3 (VALUES) precedes §18.2.4.4 (SELECT exprs) —
    # SELECT (?x+1 AS ?y) ... VALUES ?x { 1 } must see ?x bound
    df = spark.createDataFrame(
        [("<x:a>", "<x:p>", '"o"')], "s string, p string, o string"
    )
    got = query(
        spark.createDataFrame(
            [("<x:a>", "<x:p>", '"o"')], "s string, p string, o string"
        ),
        "SELECT (?x+1 AS ?y) WHERE { ?s ?p ?o } VALUES ?x { 1 }",
    ).collect()
    assert len(got) == 1
    assert got[0]["y"] == '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'
    # COUNT(*) over the pattern is still NOT inflated by the VALUES rows
    got2 = query(
        df,
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } VALUES ?x { 1 2 3 }",
    ).collect()
    assert got2[0]["n"] == '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'
