"""Vendored subset of the W3C SPARQL 1.1 Query EVALUATION test suite
(w3c/rdf-tests sparql/sparql11/), complementing the syntax-only suite in
``test_sparql_syntax_suite.py``.  The reference treats the W3C suites as
its conformance yardstick (`/root/reference/README.md:104-105`); this
sandbox has no network, so each case below is re-authored from the
public suite structure: upstream test NAME, inline Turtle/TriG data, the
query, and the expected solution sequence in our canonical term-string
format (``<iri>``, ``"lex"``, ``"lex"@lang``, ``"lex"^^<dt>``).

Bindings are compared as BAGS (order-insensitive multisets) unless the
case is marked ``ordered`` (ORDER BY tests).  Cases whose results would
contain fresh blank nodes are avoided — bnode isomorphism is covered by
``operators/c14n.py`` tests.
"""

import pytest

from sophia_rs_spark.sources.turtle import parse_turtle_document
from sophia_rs_spark.sparql import query

XSD = "http://www.w3.org/2001/XMLSchema#"
INT = f"^^<{XSD}integer>"
DEC = f"^^<{XSD}decimal>"
DBL = f"^^<{XSD}double>"
STR = f"^^<{XSD}string>"
BOOL = f"^^<{XSD}boolean>"
DT = f"^^<{XSD}dateTime>"
DUR = f"^^<{XSD}dayTimeDuration>"

PFX = (
    "PREFIX : <http://example.org/>\n"
    "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
)
TTL_PFX = "@prefix : <http://example.org/> .\n@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"


def _load(spark, ttl, quads=False):
    rows = parse_turtle_document(
        "http://example.org/", TTL_PFX + ttl, quads=quads, preserve_bn_labels=True
    )
    bad = [r for r in rows if r[5] is not None]
    assert not bad, f"fixture Turtle failed to parse: {bad}"
    data = [(r[1], r[2], r[3], r[4]) for r in rows]
    return spark.createDataFrame(data, "s string, p string, o string, g string")


def _nskey(t):
    return tuple((x is None, x or "") for x in t)


def _bag(df, cols):
    return sorted(
        (
            tuple(r[c] if c in df.columns else None for c in cols)
            for r in df.collect()
        ),
        key=_nskey,
    )


def _rows(expected):
    """expected: list of dicts var→term-string (None = unbound)."""
    cols = sorted({k for d in expected for k in d})
    return cols, sorted(
        (tuple(d.get(c) for c in cols) for d in expected), key=_nskey
    )


def check(spark, ttl, q, expected, *, quads=False, ordered=False):
    df = _load(spark, ttl, quads=quads)
    got = query(df, PFX + q)
    if isinstance(expected, bool):
        assert got is expected
        return
    if not expected:
        assert got.count() == 0
        return
    cols, want = _rows(expected)
    assert sorted(got.columns) == cols, (sorted(got.columns), cols)
    if ordered:
        want = [tuple(d.get(c) for c in cols) for d in expected]
        have = [tuple(r[c] for c in cols) for r in got.collect()]
        assert have == want, (have, want)
    else:
        assert _bag(got, cols) == want, (_bag(got, cols), want)


# ---------------------------------------------------------------------------
# aggregates/ — agg01..agg08, per-function, error and empty-group cases
# ---------------------------------------------------------------------------

AGG_DATA = """\
:s1 :p "1"^^xsd:integer , "2"^^xsd:integer .
:s2 :p "3"^^xsd:integer .
"""


class TestAggregates:
    def test_agg01_count_star_group(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT ?s (COUNT(*) AS ?count) WHERE { ?s :p ?o } GROUP BY ?s",
            [
                {"s": "<http://example.org/s1>", "count": f'"2"{INT}'},
                {"s": "<http://example.org/s2>", "count": f'"1"{INT}'},
            ],
        )

    def test_agg04_count_star_no_group(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o }",
            [{"c": f'"3"{INT}'}],
        )

    def test_count_star_empty_is_zero(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT (COUNT(*) AS ?c) WHERE { ?s :none ?o }",
            [{"c": f'"0"{INT}'}],
        )

    def test_empty_group_by_yields_no_rows(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT ?s (COUNT(*) AS ?c) WHERE { ?s :none ?o } GROUP BY ?s",
            [],
        )

    def test_sum_empty_is_integer_zero(self, spark):
        # 18.5.1.5: Sum({}) = "0"^^xsd:integer
        check(
            spark,
            AGG_DATA,
            "SELECT (SUM(?o) AS ?c) WHERE { ?s :none ?o }",
            [{"c": f'"0"{INT}'}],
        )

    def test_min_empty_is_error_unbound(self, spark):
        # Min({}) is an error → variable stays unbound in the solution
        check(
            spark,
            AGG_DATA,
            "SELECT (MIN(?o) AS ?c) WHERE { ?s :none ?o }",
            [{"c": None}],
        )

    def test_agg_sum_01(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT (SUM(?o) AS ?sum) WHERE { ?s :p ?o }",
            [{"sum": f'"6"{INT}'}],
        )

    def test_agg_sum_mixed_promotes_decimal(self, spark):
        check(
            spark,
            ':s :n "1"^^xsd:integer , "2.5"^^xsd:decimal .',
            "SELECT (SUM(?o) AS ?sum) WHERE { ?s :n ?o }",
            [{"sum": f'"3.5"{DEC}'}],
        )

    def test_agg_avg_01(self, spark):
        check(
            spark,
            ':s :n "1"^^xsd:integer , "2"^^xsd:integer .',
            "SELECT (AVG(?o) AS ?avg) WHERE { ?s :n ?o }",
            [{"avg": f'"1.5"{DEC}'}],
        )

    def test_agg_min_max_mixed_numeric(self, spark):
        # value order across numeric types; result is the ORIGINAL term
        check(
            spark,
            ':s :n "1"^^xsd:integer , "0.5"^^xsd:decimal , "3"^^xsd:integer .',
            "SELECT (MIN(?o) AS ?mn) (MAX(?o) AS ?mx) WHERE { ?s :n ?o }",
            [{"mn": f'"0.5"{DEC}', "mx": f'"3"{INT}'}],
        )

    def test_agg_groupconcat_separator(self, spark):
        check(
            spark,
            ':s :q "a" . :s :r "b" .',
            'SELECT (GROUP_CONCAT(?o; SEPARATOR="|") AS ?g) '
            "WHERE { ?s ?p ?o } ",
            [{"g": '"a|b"'}],
        )

    def test_agg_err_propagates_to_unbound(self, spark):
        # aggregates/agg-err-01 family: SUM over a non-numeric → error
        check(
            spark,
            ':s :n "1"^^xsd:integer , "zap" .',
            "SELECT (SUM(?o) AS ?sum) WHERE { ?s :n ?o }",
            [{"sum": None}],
        )

    def test_count_var_skips_unbound(self, spark):
        check(
            spark,
            ':a :p "1"^^xsd:integer . :b :q "x" .',
            "SELECT (COUNT(?v) AS ?c) WHERE { ?s ?p ?o OPTIONAL { ?s :p ?v } }",
            [{"c": f'"1"{INT}'}],
        )

    # -- §18.2.4.1 embedded aggregates (spec §11.1 HAVING example, the
    # agg08-family projection-expression shape, ORDER BY aggregates) --

    def test_agg_having_embedded_sum(self, spark):
        # sparql11-query §11.1: HAVING (SUM(?lprice) > 10) with the
        # aggregate written inline, not declared in the projection
        check(
            spark,
            ':s1 :p "1"^^xsd:integer , "2"^^xsd:integer .'
            ':s2 :p "3"^^xsd:integer , "9"^^xsd:integer .',
            "SELECT ?s WHERE { ?s :p ?o } GROUP BY ?s HAVING (SUM(?o) > 10)",
            [{"s": "<http://example.org/s2>"}],
        )

    def test_agg_select_expr_over_aggregate(self, spark):
        check(
            spark,
            AGG_DATA,
            "SELECT ?s (SUM(?o) + 1 AS ?t) WHERE { ?s :p ?o } GROUP BY ?s",
            [
                {"s": "<http://example.org/s1>", "t": f'"4"{INT}'},
                {"s": "<http://example.org/s2>", "t": f'"4"{INT}'},
            ],
        )

    def test_agg_order_by_aggregate(self, spark):
        check(
            spark,
            ':s1 :p "1"^^xsd:integer . :s2 :p "1"^^xsd:integer , '
            '"2"^^xsd:integer .',
            "SELECT ?s WHERE { ?s :p ?o } GROUP BY ?s "
            "ORDER BY DESC(COUNT(?o)) ?s",
            [
                {"s": "<http://example.org/s2>"},
                {"s": "<http://example.org/s1>"},
            ],
            ordered=True,
        )

    def test_agg_embedded_reuses_declared(self, spark):
        # the inline SUM in HAVING must reuse the declared one — same
        # group column, one aggregate computed
        check(
            spark,
            AGG_DATA,
            "SELECT ?s (SUM(?o) AS ?sum) WHERE { ?s :p ?o } GROUP BY ?s "
            "HAVING (SUM(?o) = 3)",
            [
                {"s": "<http://example.org/s1>", "sum": f'"3"{INT}'},
                {"s": "<http://example.org/s2>", "sum": f'"3"{INT}'},
            ],
        )

    def test_agg_subquery_joined_with_outer(self, spark):
        # sq-style: a grouped subquery's aggregate joins the outer BGP
        check(
            spark,
            ':a :p "1"^^xsd:integer ; :q "10"^^xsd:integer , '
            '"20"^^xsd:integer . :b :p "2"^^xsd:integer ; '
            ':q "30"^^xsd:integer . :c :p "3"^^xsd:integer .',
            "SELECT ?s ?c WHERE { ?s :p ?po "
            "{ SELECT ?s (COUNT(?x) AS ?c) WHERE { ?s :q ?x } GROUP BY ?s } }",
            [
                {"s": "<http://example.org/a>", "c": f'"2"{INT}'},
                {"s": "<http://example.org/b>", "c": f'"1"{INT}'},
            ],
        )

    def test_agg_group_by_expression_alias(self, spark):
        # group04-style: GROUP BY (expr AS ?k) binds the key
        check(
            spark,
            ':a :p "1"^^xsd:integer . :b :p "2"^^xsd:integer . '
            ':c :p "3"^^xsd:integer .',
            "SELECT ?k (COUNT(?s) AS ?n) WHERE { ?s :p ?o } "
            "GROUP BY (?o > 1 AS ?k)",
            [
                {"k": f'"false"{BOOL}', "n": f'"1"{INT}'},
                {"k": f'"true"{BOOL}', "n": f'"2"{INT}'},
            ],
        )

    def test_agg_if_over_aggregate(self, spark):
        check(
            spark,
            AGG_DATA,
            'SELECT (IF(SUM(?o) > 3, "big", "small") AS ?t) '
            "WHERE { ?s :p ?o }",
            [{"t": '"big"'}],
        )

    def test_agg_trailing_values_with_sum(self, spark):
        # trailing VALUES joins after grouping, before the SELECT
        # expression (§18.2.4.3/.4) — ?base is bound in SUM(?o)+?base
        check(
            spark,
            AGG_DATA,
            "SELECT ?s (SUM(?o) + ?base AS ?t) WHERE { ?s :p ?o } "
            "GROUP BY ?s VALUES ?base { 100 }",
            [
                {"s": "<http://example.org/s1>", "t": f'"103"{INT}'},
                {"s": "<http://example.org/s2>", "t": f'"103"{INT}'},
            ],
        )

    def test_agg_count_star_embedded_in_having(self, spark):
        check(
            spark,
            ':a :q "1" , "2" . :b :q "3" .',
            "SELECT ?s WHERE { ?s :q ?x } GROUP BY ?s HAVING (COUNT(*) > 1)",
            [{"s": "<http://example.org/a>"}],
        )

    def test_agg_nested_aggregate_rejected(self, spark):
        from sophia_rs_spark.sparql.parser import SparqlError

        df = _load(spark, AGG_DATA)
        with pytest.raises(SparqlError):
            query(df, PFX + "SELECT (SUM(SUM(?o)) AS ?x) WHERE { ?s :p ?o }")
        with pytest.raises(SparqlError):
            query(
                df,
                PFX + "SELECT ?s WHERE { ?s :p ?o } GROUP BY ?s "
                "HAVING (MAX(COUNT(?o)) > 1)",
            )


# ---------------------------------------------------------------------------
# negation/ — EXISTS / NOT EXISTS / MINUS
# ---------------------------------------------------------------------------

NEG_DATA = """\
:alice a :Person ; :name "Alice" .
:bob a :Person ; :name "Bob" ; :email "bob@work" .
:carol a :Person .
"""


class TestNegation:
    def test_exists_01(self, spark):
        check(
            spark,
            NEG_DATA,
            "SELECT ?s WHERE { ?s a :Person FILTER EXISTS { ?s :name ?n } }",
            [{"s": "<http://example.org/alice>"}, {"s": "<http://example.org/bob>"}],
        )

    def test_subset_by_exclusion_nex_1(self, spark):
        check(
            spark,
            NEG_DATA,
            "SELECT ?s WHERE { ?s a :Person FILTER NOT EXISTS { ?s :email ?e } }",
            [{"s": "<http://example.org/alice>"}, {"s": "<http://example.org/carol>"}],
        )

    def test_minus_full_minuend(self, spark):
        check(
            spark,
            NEG_DATA,
            "SELECT ?s WHERE { ?s a :Person MINUS { ?s :email ?e } }",
            [{"s": "<http://example.org/alice>"}, {"s": "<http://example.org/carol>"}],
        )

    def test_minus_disjoint_domain_removes_nothing(self, spark):
        # negation/subtraction with no shared variable: nothing removed
        check(
            spark,
            NEG_DATA,
            "SELECT ?s WHERE { ?s a :Person MINUS { ?x :email ?e } }",
            [
                {"s": "<http://example.org/alice>"},
                {"s": "<http://example.org/bob>"},
                {"s": "<http://example.org/carol>"},
            ],
        )


# ---------------------------------------------------------------------------
# exists/ — substitution semantics (§18.6): EXISTS evaluated against the
# current row's bindings (exists01..exists05 shapes)
# ---------------------------------------------------------------------------


EXISTS_DATA = ":a1 :p :b1 . :a2 :p :b2 . :a3 :p :b3 .\n:b1 :q :c .\n"


class TestExistsSubstitution:
    def test_exists01_variable_from_outer_row(self, spark):
        # exists01 shape: ?o is bound by the outer pattern — only the
        # row whose object has a :q edge survives
        check(
            spark,
            EXISTS_DATA,
            "SELECT ?s { ?s :p ?o FILTER EXISTS { ?o :q :c } }",
            [{"s": "<http://example.org/a1>"}],
        )

    def test_exists02_ground_triple(self, spark):
        # exists02 shape: a ground subpattern holds for every row
        check(
            spark,
            EXISTS_DATA,
            "SELECT ?s { ?s :p ?o FILTER EXISTS { :b1 :q :c } }",
            [
                {"s": "<http://example.org/a1>"},
                {"s": "<http://example.org/a2>"},
                {"s": "<http://example.org/a3>"},
            ],
        )

    def test_exists03_graph_scoped(self, spark):
        # exists03 shape: EXISTS inside GRAPH evaluates against the
        # ACTIVE graph — :b :q :c lives in the default graph only, so
        # the filter inside GRAPH :g1 fails
        trig = (
            ":b :q :c .\n"
            ":g1 { :a :p :b . }\n"
        )
        check(
            spark,
            trig,
            "SELECT ?s { GRAPH :g1 { ?s :p ?o FILTER EXISTS { ?o :q :c } } }",
            [],
            quads=True,
        )
        check(
            spark,
            trig,
            "SELECT ?s { GRAPH :g1 { ?s :p ?o } FILTER EXISTS { ?o :q :c } }",
            [{"s": "<http://example.org/a>"}],
            quads=True,
        )

    def test_exists04_nested_positive(self, spark):
        check(
            spark,
            EXISTS_DATA,
            "SELECT ?s { ?s :p ?o"
            "  FILTER EXISTS { ?s :p ?o2 FILTER EXISTS { ?o2 :q :c } } }",
            [{"s": "<http://example.org/a1>"}],
        )

    def test_exists05_nested_negative_in_positive(self, spark):
        check(
            spark,
            EXISTS_DATA,
            "SELECT ?s { ?s :p ?o"
            "  FILTER EXISTS { ?s :p ?o2 FILTER NOT EXISTS { ?o2 :q :c } } }",
            [{"s": "<http://example.org/a2>"}, {"s": "<http://example.org/a3>"}],
        )

    def test_exists_in_optional_filter_outer_var(self, spark):
        # the dawg optional + §18.6 interaction: the EXISTS references
        # ?o bound only OUTSIDE the optional group
        data = EXISTS_DATA + ":a1 :r :m1 . :a2 :r :m2 .\n"
        check(
            spark,
            data,
            "SELECT ?s ?m { ?s :p ?o"
            "  OPTIONAL { ?s :r ?m FILTER EXISTS { ?o :q :c } } }",
            [
                {"s": "<http://example.org/a1>", "m": "<http://example.org/m1>"},
                {"s": "<http://example.org/a2>", "m": None},
                {"s": "<http://example.org/a3>", "m": None},
            ],
        )


# ---------------------------------------------------------------------------
# bind/ + bindings/ (VALUES)
# ---------------------------------------------------------------------------


class TestBindValues:
    def test_bind01(self, spark):
        check(
            spark,
            ':s :p "1"^^xsd:integer .',
            "SELECT ?z WHERE { ?s :p ?o . BIND(?o + 10 AS ?z) }",
            [{"z": f'"11"{INT}'}],
        )

    def test_bind_then_filter(self, spark):
        check(
            spark,
            ':s :p "1"^^xsd:integer , "5"^^xsd:integer .',
            "SELECT ?z WHERE { ?s :p ?o . BIND(?o + 10 AS ?z) FILTER(?z > 12) }",
            [{"z": f'"15"{INT}'}],
        )

    def test_inline01_values_post_pattern(self, spark):
        check(
            spark,
            ':a :p "1"^^xsd:integer . :b :p "2"^^xsd:integer .',
            "SELECT ?s ?o WHERE { ?s :p ?o } VALUES ?s { :a }",
            [{"s": "<http://example.org/a>", "o": f'"1"{INT}'}],
        )

    def test_inline02_undef(self, spark):
        check(
            spark,
            ':a :p "1"^^xsd:integer . :b :p "2"^^xsd:integer .',
            "SELECT ?s ?o WHERE { VALUES (?s ?o) { (:a UNDEF) } ?s :p ?o }",
            [{"s": "<http://example.org/a>", "o": f'"1"{INT}'}],
        )


# ---------------------------------------------------------------------------
# property-path/ — pp01.. subset
# ---------------------------------------------------------------------------

PP_DATA = """\
:a :p1 :b . :b :p2 :c .
:a :q :d .
:x :r :y . :y :r :z . :z :r :x .
"""


class TestPropertyPaths:
    def test_pp01_seq(self, spark):
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :a :p1/:p2 ?v }",
            [{"v": "<http://example.org/c>"}],
        )

    def test_pp03_alt(self, spark):
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :a (:p1|:q) ?v }",
            [{"v": "<http://example.org/b>"}, {"v": "<http://example.org/d>"}],
        )

    def test_pp_inverse(self, spark):
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :b ^:p1 ?v }",
            [{"v": "<http://example.org/a>"}],
        )

    def test_pp_star_cycle_distinct_nodes(self, spark):
        # zero-or-more over the 3-cycle: each node reached exactly once
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :x :r* ?v }",
            [
                {"v": "<http://example.org/x>"},
                {"v": "<http://example.org/y>"},
                {"v": "<http://example.org/z>"},
            ],
        )

    def test_pp_plus_cycle(self, spark):
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :x :r+ ?v }",
            [
                {"v": "<http://example.org/x>"},
                {"v": "<http://example.org/y>"},
                {"v": "<http://example.org/z>"},
            ],
        )

    def test_pp_negated_property_set(self, spark):
        check(
            spark,
            PP_DATA,
            "SELECT ?v WHERE { :a !(:q) ?v }",
            [{"v": "<http://example.org/b>"}],
        )

    def test_pp_zero_length_nodes_include_literals(self, spark):
        # pp35-shaped: a zero-length path with both ends free yields an
        # identity pair for EVERY subject and object in the graph —
        # literals included (reference: exec.rs path_zero chains
        # subjects_matching + objects_matching with no kind filter)
        check(
            spark,
            ':a :p1 :b .\n:b :note "lit" .\n',
            "SELECT ?x ?y WHERE { ?x :p1* ?y }",
            [
                {"x": "<http://example.org/a>", "y": "<http://example.org/a>"},
                {"x": "<http://example.org/a>", "y": "<http://example.org/b>"},
                {"x": "<http://example.org/b>", "y": "<http://example.org/b>"},
                {"x": '"lit"', "y": '"lit"'},
            ],
        )

    def test_pp_zero_length_literal_endpoint(self, spark):
        # a literal START binds itself under * (zero steps from a term
        # with no outgoing edges)
        check(
            spark,
            ':a :p1 :b .\n:b :note "lit" .\n',
            'SELECT ?y WHERE { "lit" :p1* ?y }',
            [{"y": '"lit"'}],
        )

    def test_pp_nps_with_inverse_member(self, spark):
        # !(:p1|^:p1): forward edges with predicate other than p1, plus
        # REVERSED edges with predicate other than p1 (spec §9.1 NPS
        # with inverse members)
        check(
            spark,
            ':a :p1 :b .\n:b :note "lit" .\n',
            "SELECT ?x ?y WHERE { ?x !(:p1|^:p1) ?y }",
            [
                {"x": "<http://example.org/b>", "y": '"lit"'},
                {"x": '"lit"', "y": "<http://example.org/b>"},
            ],
        )


# ---------------------------------------------------------------------------
# optional-filter/ (dawg) + optional/
# ---------------------------------------------------------------------------

OPT_DATA = """\
:x1 :p "4"^^xsd:integer .
:x2 :p "1"^^xsd:integer .
:x3 :q "5"^^xsd:integer .
"""


class TestOptional:
    def test_dawg_optional_001(self, spark):
        check(
            spark,
            OPT_DATA,
            "SELECT ?s ?q WHERE { ?s :p ?v OPTIONAL { ?s :q ?q } }",
            [
                {"s": "<http://example.org/x1>", "q": None},
                {"s": "<http://example.org/x2>", "q": None},
            ],
        )

    def test_dawg_optional_filter_001(self, spark):
        # the FILTER inside the OPTIONAL references the OUTER ?v
        check(
            spark,
            ':x1 :p "4"^^xsd:integer ; :q "a" .\n:x2 :p "1"^^xsd:integer ; :q "b" .',
            "SELECT ?s ?w WHERE { ?s :p ?v OPTIONAL { ?s :q ?w FILTER(?v > 2) } }",
            [
                {"s": "<http://example.org/x1>", "w": '"a"'},
                {"s": "<http://example.org/x2>", "w": None},
            ],
        )


# ---------------------------------------------------------------------------
# functions/ — string/numeric/datetime/hash builtins (the project-fn suite)
# ---------------------------------------------------------------------------

FN_ONE = ':s :p "x" .'


def one(spark, expr, expected):
    """Evaluate a single SELECT expression over one dummy row."""
    check(
        spark,
        FN_ONE,
        f"SELECT ({expr} AS ?out) WHERE {{ ?s :p ?o }}",
        [{"out": expected}],
    )


class TestFunctions:
    # NOTE on the value-plane convention (documented in
    # test_fn_battery.py): computed SIMPLE-literal results surface as
    # bare Spark strings; lang/dir-tagged and typed results surface as
    # canonical RDF term strings.

    def test_strbefore01a(self, spark):
        one(spark, 'STRBEFORE("abc", "b")', "a")
        one(spark, 'STRBEFORE("abc"@en, "b")', '"a"@en')
        one(spark, 'STRBEFORE("abc", "xyz")', "")
        one(spark, 'STRBEFORE("abc"@en, "")', '""@en')

    def test_strafter01a(self, spark):
        one(spark, 'STRAFTER("abc", "b")', "c")
        one(spark, 'STRAFTER("abc"@en, "ab")', '"c"@en')
        one(spark, 'STRAFTER("abc", "")', "abc")
        one(spark, 'STRAFTER("abc", "xyz")', "")

    def test_concat(self, spark):
        one(spark, 'CONCAT("foo", "bar")', "foobar")
        one(spark, 'CONCAT("foo"@en, "bar"@en)', '"foobar"@en')
        one(spark, 'CONCAT("foo"@en, "bar")', "foobar")

    def test_replace(self, spark):
        one(spark, 'REPLACE("abcd", "b", "Z")', "aZcd")
        one(spark, 'REPLACE("ab", "B", "Z", "i")', "aZ")

    def test_substr(self, spark):
        one(spark, 'SUBSTR("foobar", 4)', "bar")
        one(spark, 'SUBSTR("foobar"@en, 4, 1)', '"b"@en')

    def test_case(self, spark):
        one(spark, 'UCASE("foo"@en)', '"FOO"@en')
        one(spark, 'LCASE("BAR")', "bar")

    def test_contains_starts_ends(self, spark):
        one(spark, 'CONTAINS("foobar", "oba")', f'"true"{BOOL}')
        one(spark, 'STRSTARTS("foobar"@en, "foo")', f'"true"{BOOL}')
        one(spark, 'STRENDS("foobar"@en, "bar"@en)', f'"true"{BOOL}')

    def test_if_coalesce(self, spark):
        one(spark, "IF(1 < 2, \"yes\", \"no\")", '"yes"')
        one(spark, 'COALESCE(?unbound, "fallback")', '"fallback"')

    def test_numeric(self, spark):
        # decimal-ranked results carry the mandatory fraction digit
        # (`value.rs:239-246` dec2string: "11.0"); ROUND is the
        # reference's RoundingMode::HalfUp = half AWAY FROM ZERO
        # (`value/_number.rs:171-181`, test.rs round battery: round(-1.5)
        # → "-2.0"), a documented deviation from XPath fn:round
        one(spark, "ABS(-1.5)", f'"1.5"{DEC}')
        one(spark, "CEIL(10.5)", f'"11.0"{DEC}')
        one(spark, "FLOOR(-10.5)", f'"-11.0"{DEC}')
        one(spark, "ROUND(2.5)", f'"3.0"{DEC}')
        one(spark, "ROUND(-2.5)", f'"-3.0"{DEC}')
        one(spark, "ROUND(1.4)", f'"1.0"{DEC}')

    def test_numeric_promotion(self, spark):
        one(spark, "1 + 2.5", f'"3.5"{DEC}')
        one(spark, "3 / 2", f'"1.5"{DEC}')
        one(spark, "1 + 1e0", f'"2e0"{DBL}')

    def test_hash(self, spark):
        one(spark, 'MD5("abc")', "900150983cd24fb0d6963f7d28e17f72")
        one(spark, 'SHA1("abc")', "a9993e364706816aba3e25717850c26c9cd0d89d")

    def test_encode_for_uri(self, spark):
        one(spark, 'ENCODE_FOR_URI("Los Angeles")', "Los%20Angeles")

    def test_strdt_strlang(self, spark):
        one(spark, 'STRDT("123", xsd:integer)', f'"123"{INT}')
        one(spark, 'STRLANG("chat", "en")', '"chat"@en')

    def test_isnumeric(self, spark):
        one(spark, 'ISNUMERIC("12"^^xsd:integer)', f'"true"{BOOL}')
        one(spark, 'ISNUMERIC("12")', f'"false"{BOOL}')

    def test_in_notin(self, spark):
        one(spark, "2 IN (1, 2, 3)", f'"true"{BOOL}')
        one(spark, "2 NOT IN (1, 3)", f'"true"{BOOL}')

    def test_datetime_accessors(self, spark):
        dt = f'"2011-01-10T14:45:13.815-05:00"{DT}'
        one(spark, f"YEAR({dt})", f'"2011"{INT}')
        one(spark, f"MONTH({dt})", f'"1"{INT}')
        one(spark, f"DAY({dt})", f'"10"{INT}')
        one(spark, f"HOURS({dt})", f'"14"{INT}')
        one(spark, f"MINUTES({dt})", f'"45"{INT}')
        one(spark, f"SECONDS({dt})", f'"13.815"{DEC}')
        one(spark, f"TZ({dt})", "-05:00")
        one(spark, f"TIMEZONE({dt})", f'"-PT5H"{DUR}')
        one(spark, f'TZ("2011-01-10T14:45:13Z"{DT})', "Z")
        one(spark, f'TIMEZONE("2011-01-10T14:45:13Z"{DT})', f'"PT0S"{DUR}')


# ---------------------------------------------------------------------------
# expr-equals/ — value equality, open-world comparison
# ---------------------------------------------------------------------------


class TestExprEquals:
    def test_eq_1_numeric_value_equality(self, spark):
        check(
            spark,
            ':a :p "1"^^xsd:integer . :b :p "01"^^xsd:integer . :c :p "2"^^xsd:integer .',
            "SELECT ?s WHERE { ?s :p ?v FILTER(?v = 1) }",
            [{"s": "<http://example.org/a>"}, {"s": "<http://example.org/b>"}],
        )

    def test_eq_cross_type(self, spark):
        check(
            spark,
            ':a :p "1"^^xsd:integer .',
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v = "1.0"^^xsd:decimal) }',
            [{"s": "<http://example.org/a>"}],
        )

    def test_incomparable_is_error_drops_row(self, spark):
        # "a" = "a"@en is neither true nor false — type error → dropped
        check(
            spark,
            ':a :p "a"@en .',
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v = "a") }',
            [],
        )

    def test_datetime_eq_is_datatype_strict(self, spark):
        # value.rs:62 maps exactly xsd:dateTime to the DateTime value:
        # a PLAIN STRING whose lexical parses as the same instant is
        # cross-family — plain false, not instant-equal
        data = (
            ':s1 :p "2001-01-01T00:00:00Z" . '
            ':d1 :p "2001-01-01T00:00:00Z"^^xsd:dateTime . '
            ':d2 :p "2001-01-01T01:00:00+01:00"^^xsd:dateTime .'
        )
        check(
            spark, data,
            "SELECT ?s WHERE { ?s :p ?v "
            'FILTER(?v = "2001-01-01T01:00:00+01:00"^^xsd:dateTime) }',
            [{"s": "<http://example.org/d1>"}, {"s": "<http://example.org/d2>"}],
        )
        check(
            spark, data,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v = "2001-01-01T00:00:00Z") }',
            [{"s": "<http://example.org/s1>"}],
        )

    NAN_DATA = (
        ':n :p "NaN"^^xsd:double . :i :p "INF"^^xsd:double . '
        ':m :p "-INF"^^xsd:double . :one :p "1e0"^^xsd:double .'
    )

    def test_nan_equality_matches_reference(self, spark):
        # sparql_eq (value.rs:124): NaN = NaN is TRUE (`n1 == n2 ||
        # n1.is_nan() && n2.is_nan()`), NaN = x is FALSE — Spark's own
        # NaN equality semantics match and must not be "fixed"
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v = "NaN"^^xsd:double) }',
            [{"s": "<http://example.org/n>"}],
        )
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v != "NaN"^^xsd:double) }',
            [{"s": "<http://example.org/i>"}, {"s": "<http://example.org/m>"},
             {"s": "<http://example.org/one>"}],
        )

    def test_nan_order_comparison_is_error(self, spark):
        # SparqlNumber partial_cmp → None for NaN (Rust f64): any NaN
        # ORDER comparison is a type error, NOT Spark's
        # NaN-sorts-above-everything; INF/-INF compare normally.
        # Identical literals still satisfy <= via the sparql_cmp
        # literal-equality fallback.
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v > "1e0"^^xsd:double) }',
            [{"s": "<http://example.org/i>"}],
        )
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER("1e0"^^xsd:double < ?v) }',
            [{"s": "<http://example.org/i>"}],
        )
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v < "1e0"^^xsd:double) }',
            [{"s": "<http://example.org/m>"}],
        )
        check(
            spark, self.NAN_DATA,
            'SELECT ?s WHERE { ?s :p ?v FILTER(?v <= "NaN"^^xsd:double) }',
            [{"s": "<http://example.org/n>"}],
        )


# ---------------------------------------------------------------------------
# subquery/ + solution modifiers
# ---------------------------------------------------------------------------


class TestSubqueryModifiers:
    def test_subquery_order_limit(self, spark):
        check(
            spark,
            ':a :p "3"^^xsd:integer . :b :p "1"^^xsd:integer . :c :p "2"^^xsd:integer .',
            "SELECT ?s WHERE { { SELECT ?s WHERE { ?s :p ?o } ORDER BY ?o LIMIT 1 } }",
            [{"s": "<http://example.org/b>"}],
        )

    def test_order_by_numeric_then_offset(self, spark):
        check(
            spark,
            ':a :p "10"^^xsd:integer . :b :p "2"^^xsd:integer . :c :p "33"^^xsd:integer .',
            "SELECT ?o WHERE { ?s :p ?o } ORDER BY DESC(?o) OFFSET 1 LIMIT 2",
            [{"o": f'"10"{INT}'}, {"o": f'"2"{INT}'}],
            ordered=True,
        )

    def test_distinct_star(self, spark):
        check(
            spark,
            ':a :p "1" . :b :p "1" .',
            "SELECT DISTINCT ?o WHERE { ?s :p ?o }",
            [{"o": '"1"'}],
        )


# ---------------------------------------------------------------------------
# construct/ + ask/ + graph (TriG data)
# ---------------------------------------------------------------------------


class TestConstructAskGraph:
    def test_constructwhere01(self, spark):
        df = _load(spark, ':s :p "o" .')
        got = query(df, PFX + "CONSTRUCT WHERE { ?s :p ?o }")
        assert [tuple(r) for r in got.collect()] == [
            ("<http://example.org/s>", "<http://example.org/p>", '"o"')
        ]

    def test_ask(self, spark):
        check(spark, ':s :p "o" .', "ASK { :s :p ?x }", True)
        check(spark, ':s :p "o" .', "ASK { :s :none ?x }", False)

    def test_construct_variable_triple_term_template(self, spark):
        # sparql-12: a triple term in a CONSTRUCT template CONSTRUCTS
        # the term per solution; invalid component kinds (literal
        # subject) skip the row like an unbound slot
        df = _load(spark, ':a :p :b . :c :p "lit" .')
        got = query(
            df,
            PFX + 'CONSTRUCT { <<( ?s :p ?o )>> :seen "y" } '
            "WHERE { ?s :p ?o }",
        )
        assert sorted(tuple(r) for r in got.collect()) == [
            (
                "<<( <http://example.org/a> <http://example.org/p> "
                "<http://example.org/b> )>>",
                "<http://example.org/seen>",
                '"y"',
            ),
            (
                '<<( <http://example.org/c> <http://example.org/p> "lit" )>>',
                "<http://example.org/seen>",
                '"y"',
            ),
        ]
        got = query(
            df,
            PFX + 'CONSTRUCT { <<( ?o :p ?s )>> :seen "y" } '
            "WHERE { ?s :p ?o }",
        )
        # the "lit"-subject instantiation is invalid → skipped
        assert got.count() == 1

    def test_construct_where_short_form_tterm(self, spark):
        rows = [
            ("<x:a>", "<x:p>", "<x:b>", None),
            ("<<( <x:a> <x:p> <x:b> )>>", "<x:t>", '"m"', None),
            ("<<( <x:c> <x:q> <x:d> )>>", "<x:t>", '"n"', None),
        ]
        df = spark.createDataFrame(rows, "s string, p string, o string, g string")
        got = query(df, "CONSTRUCT WHERE { <<( ?s <x:p> ?o )>> <x:t> ?m }")
        assert sorted(tuple(r) for r in got.collect()) == [
            ("<<( <x:a> <x:p> <x:b> )>>", "<x:t>", '"m"'),
        ]
        # triple-term patterns scope per graph under GRAPH ?g
        rows2 = [
            ("<<( <x:a> <x:p> <x:b> )>>", "<x:t>", '"m"', "<x:g1>"),
            ("<<( <x:c> <x:q> <x:d> )>>", "<x:t>", '"n"', "<x:g2>"),
        ]
        df2 = spark.createDataFrame(rows2, "s string, p string, o string, g string")
        got2 = query(df2, "SELECT ?g ?s WHERE { GRAPH ?g { <<( ?s ?p ?o )>> <x:t> ?m } }")
        assert sorted(tuple(r) for r in got2.collect()) == [
            ("<x:g1>", "<x:a>"), ("<x:g2>", "<x:c>"),
        ]

    def test_describe_ground_triple_term(self, spark):
        rows = [
            ("<x:a>", "<x:p>", "<x:b>", None),
            ("<<( <x:a> <x:p> <x:b> )>>", "<x:t>", '"m"', None),
        ]
        df = spark.createDataFrame(rows, "s string, p string, o string, g string")
        got = query(df, "DESCRIBE <<( <x:a> <x:p> <x:b> )>>")
        assert sorted(tuple(r) for r in got.collect()) == [
            ("<<( <x:a> <x:p> <x:b> )>>", "<x:t>", '"m"'),
        ]

    def test_graph_var_binds(self, spark):
        check(
            spark,
            ':s :p :default .\n:g1 { :s :p :one . }',
            "SELECT ?g ?o WHERE { GRAPH ?g { ?s :p ?o } }",
            [{"g": "<http://example.org/g1>", "o": "<http://example.org/one>"}],
            quads=True,
        )


# ---------------------------------------------------------------------------
# r5 expansion (VERDICT #4): the highest-risk remaining families from the
# official sparql11 evaluation manifests — OPTIONAL/MINUS scoping,
# property-path evaluation, aggregate edge cases
# ---------------------------------------------------------------------------

E = "http://example.org/"


class TestOptionalScoping:
    """optional/ + optional-filter/ (dawg-optional-*): LeftJoin scoping."""

    def test_two_sequential_optionals_chain(self, spark):
        # dawg-optional-complex shape: the second OPTIONAL references a
        # variable bound only by the FIRST optional.  x2's ?n is
        # UNBOUND there — and per SPARQL compatibility an unbound var
        # is a WILDCARD, so x2 still merges with {n=n1, d="deep"} (the
        # famously counterintuitive dawg-optional behavior)
        check(
            spark,
            ":x1 :p :m1 . :x2 :p :m2 .\n:x1 :q :n1 .\n:n1 :r \"deep\" .",
            "SELECT ?s ?n ?d WHERE { ?s :p ?v"
            "  OPTIONAL { ?s :q ?n } OPTIONAL { ?n :r ?d } }",
            [
                {"s": f"<{E}x1>", "n": f"<{E}n1>", "d": '"deep"'},
                {"s": f"<{E}x2>", "n": f"<{E}n1>", "d": '"deep"'},
            ],
        )

    def test_nested_optional_binds_inside_out(self, spark):
        # OPTIONAL nested inside OPTIONAL: the inner LeftJoin evaluates
        # within the outer's right group
        check(
            spark,
            ":x1 :p :m1 .\n:x1 :q :n1 .\n:n1 :r \"v\" .\n:x2 :p :m2 .\n:x2 :q :n2 .",
            "SELECT ?s ?n ?d WHERE { ?s :p ?v"
            "  OPTIONAL { ?s :q ?n OPTIONAL { ?n :r ?d } } }",
            [
                {"s": f"<{E}x1>", "n": f"<{E}n1>", "d": '"v"'},
                {"s": f"<{E}x2>", "n": f"<{E}n2>", "d": None},
            ],
        )

    def test_optional_filter_inner_var_only(self, spark):
        # dawg-optional-filter-002 shape: the filter mentions only
        # right-side vars — equivalent to filtering the right side
        check(
            spark,
            ':x1 :p "4"^^xsd:integer ; :q "10"^^xsd:integer .\n'
            ':x2 :p "1"^^xsd:integer ; :q "2"^^xsd:integer .',
            "SELECT ?s ?w WHERE { ?s :p ?v OPTIONAL { ?s :q ?w FILTER(?w > 5) } }",
            [
                {"s": f"<{E}x1>", "w": '"10"^^<http://www.w3.org/2001/XMLSchema#integer>'},
                {"s": f"<{E}x2>", "w": None},
            ],
        )

    def test_negation_by_bound_after_optional(self, spark):
        # dawg-bound-query-001 / negation-by-failure idiom
        check(
            spark,
            ":x1 :p :a .\n:x2 :p :b .\n:x1 :q :c .",
            "SELECT ?s WHERE { ?s :p ?v OPTIONAL { ?s :q ?w } FILTER(!BOUND(?w)) }",
            [{"s": f"<{E}x2>"}],
        )

    def test_optional_shared_var_constrains(self, spark):
        # ?v appears on BOTH sides: the optional only extends rows
        # whose ?v matches (join on the shared var, not a free extend)
        check(
            spark,
            ":x1 :p :k .\n:x2 :p :j .\n:y :q :k .",
            "SELECT ?s ?y WHERE { ?s :p ?v OPTIONAL { ?y :q ?v } }",
            [
                {"s": f"<{E}x1>", "y": f"<{E}y>"},
                {"s": f"<{E}x2>", "y": None},
            ],
        )

    def test_union_inside_optional(self, spark):
        check(
            spark,
            ":x1 :p :m .\n:x1 :q1 \"a\" .\n:x1 :q2 \"b\" .",
            "SELECT ?s ?w WHERE { ?s :p ?v"
            "  OPTIONAL { { ?s :q1 ?w } UNION { ?s :q2 ?w } } }",
            [
                {"s": f"<{E}x1>", "w": '"a"'},
                {"s": f"<{E}x1>", "w": '"b"'},
            ],
        )

    def test_optional_preserves_bag_multiplicity(self, spark):
        # two :p bindings for x1 → the optional extension applies per
        # solution, keeping both rows
        check(
            spark,
            ":x1 :p :m1 , :m2 .\n:x1 :q \"w\" .",
            "SELECT ?s ?v ?w WHERE { ?s :p ?v OPTIONAL { ?s :q ?w } }",
            [
                {"s": f"<{E}x1>", "v": f"<{E}m1>", "w": '"w"'},
                {"s": f"<{E}x1>", "v": f"<{E}m2>", "w": '"w"'},
            ],
        )


class TestMinusScoping:
    """negation/ (full-minuend, subtraction scoping, MINUS≠NOT EXISTS)."""

    def test_minus_partial_overlap(self, spark):
        # only the compatible solution is subtracted
        check(
            spark,
            ":a :p :x .\n:b :p :y .\n:a :q :x .",
            "SELECT ?s WHERE { ?s :p ?o MINUS { ?s :q ?o } }",
            [{"s": f"<{E}b>"}],
        )

    def test_minus_with_filter_inside(self, spark):
        # the FILTER applies WITHIN the minus group before subtraction
        check(
            spark,
            ':a :p "1"^^xsd:integer .\n:b :p "5"^^xsd:integer .\n'
            ':a :q "1"^^xsd:integer .\n:b :q "5"^^xsd:integer .',
            "SELECT ?s WHERE { ?s :p ?o MINUS { ?s :q ?o FILTER(?o > 3) } }",
            [{"s": f"<{E}a>"}],
        )

    def test_minus_vs_not_exists_disjoint(self, spark):
        # sparql11-query §8.3.3: with no shared variables MINUS removes
        # NOTHING while NOT EXISTS removes EVERYTHING
        data = ":s :p :o ."
        check(
            spark,
            data,
            "SELECT ?s WHERE { ?s :p ?o MINUS { ?x :y ?z FILTER(?x != ?x) } }",
            [{"s": f"<{E}s>"}],
        )
        check(
            spark,
            data,
            "SELECT ?s WHERE { ?s :p ?o FILTER NOT EXISTS { ?x :p ?z } }",
            [],
        )

    def test_minus_two_pattern_group(self, spark):
        check(
            spark,
            ":a :p :x .\n:b :p :y .\n:a :q :m .\n:m :r :x .",
            "SELECT ?s WHERE { ?s :p ?o MINUS { ?s :q ?m . ?m :r ?o } }",
            [{"s": f"<{E}b>"}],
        )

    def test_minus_maybe_unbound_shared_var(self, spark):
        # ?w is bound only via OPTIONAL: an unbound ?w is compatible
        # with ANY right binding (SPARQL compat), so x2 is subtracted
        # only if some right solution exists with matching ?s
        check(
            spark,
            ":x1 :p :a .\n:x2 :p :b .\n:x1 :q :w1 .\n:x1 :r :w1 .",
            "SELECT ?s WHERE { ?s :p ?v OPTIONAL { ?s :q ?w }"
            "  MINUS { ?s :r ?w } }",
            [{"s": f"<{E}x2>"}],
        )


class TestPathEval:
    """property-path/ evaluation families beyond the syntax matrix."""

    def test_pp_zero_or_one(self, spark):
        check(
            spark,
            ":a :p :b . :b :p :c .",
            "SELECT ?y WHERE { :a :p? ?y }",
            [{"y": f"<{E}a>"}, {"y": f"<{E}b>"}],
        )

    def test_pp_seq_under_plus(self, spark):
        # (:p/:q)+ — composite step iterated
        check(
            spark,
            ":a :p :m1 . :m1 :q :b .\n:b :p :m2 . :m2 :q :c .",
            "SELECT ?y WHERE { :a (:p/:q)+ ?y }",
            [{"y": f"<{E}b>"}, {"y": f"<{E}c>"}],
        )

    def test_pp_plus_both_vars_distinct_pairs(self, spark):
        # ?x :p+ ?y enumerates DISTINCT reachable pairs
        check(
            spark,
            ":a :p :b . :b :p :a .",
            "SELECT ?x ?y WHERE { ?x :p+ ?y }",
            [
                {"x": f"<{E}a>", "y": f"<{E}a>"},
                {"x": f"<{E}a>", "y": f"<{E}b>"},
                {"x": f"<{E}b>", "y": f"<{E}a>"},
                {"x": f"<{E}b>", "y": f"<{E}b>"},
            ],
        )

    def test_pp_inside_optional(self, spark):
        check(
            spark,
            ":x1 :p :m .\n:m :r :n . :n :r :o .\n:x2 :p :z .",
            "SELECT ?s ?e WHERE { ?s :p ?v OPTIONAL { ?v :r+ ?e } }",
            [
                {"s": f"<{E}x1>", "e": f"<{E}n>"},
                {"s": f"<{E}x1>", "e": f"<{E}o>"},
                {"s": f"<{E}x2>", "e": None},
            ],
        )

    def test_pp_inverse_of_sequence(self, spark):
        # ^(:p/:q) ≡ ^:q/^:p
        check(
            spark,
            ":a :p :m . :m :q :b .",
            "SELECT ?x WHERE { :b ^(:p/:q) ?x }",
            [{"x": f"<{E}a>"}],
        )

    def test_pp_nps_multiple_excluded(self, spark):
        check(
            spark,
            ":a :p1 :b . :a :p2 :c . :a :p3 :d .",
            "SELECT ?y WHERE { :a !(:p1|:p2) ?y }",
            [{"y": f"<{E}d>"}],
        )

    def test_pp_star_ground_membership_ask(self, spark):
        check(spark, ":a :p :b . :b :p :c .", "ASK { :a :p* :c }", True)
        check(spark, ":a :p :b . :b :p :c .", "ASK { :c :p* :a }", False)


class TestAggregateEdges:
    """aggregates/ edge cases past the basic battery."""

    def test_count_distinct_star(self, spark):
        check(
            spark,
            ":s1 :p :a . :s1 :p :a . :s1 :q :a .",
            "SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?s ?p ?o }",
            [{"n": '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'}],
        )

    def test_group_concat_distinct_separator(self, spark):
        check(
            spark,
            ':s :p "a" , "b" , "a" .',
            'SELECT (GROUP_CONCAT(DISTINCT ?o ; separator="|") AS ?c)'
            " WHERE { ?s :p ?o } GROUP BY ?s",
            [{"c": '"a|b"'}],
        )

    def test_having_without_group_by(self, spark):
        check(
            spark,
            ':s1 :p "1"^^xsd:integer . :s2 :p "2"^^xsd:integer .',
            "SELECT (SUM(?o) AS ?t) WHERE { ?s :p ?o } HAVING(SUM(?o) > 2)",
            [{"t": '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'}],
        )
        check(
            spark,
            ':s1 :p "1"^^xsd:integer .',
            "SELECT (SUM(?o) AS ?t) WHERE { ?s :p ?o } HAVING(SUM(?o) > 2)",
            [],
        )

    def test_sample_singleton_deterministic(self, spark):
        check(
            spark,
            ':s1 :p "only" .',
            "SELECT ?s (SAMPLE(?o) AS ?v) WHERE { ?s :p ?o } GROUP BY ?s",
            [{"s": f"<{E}s1>", "v": '"only"'}],
        )

    def test_avg_empty_no_group_is_zero(self, spark):
        check(
            spark,
            ":s :p :o .",
            "SELECT (AVG(?x) AS ?a) WHERE { ?s :q ?x }",
            [{"a": '"0.0"^^<http://www.w3.org/2001/XMLSchema#decimal>'}],
        )

    def test_max_string_value_order(self, spark):
        check(
            spark,
            ':s :p "apple" , "pear" , "banana" .',
            "SELECT (MAX(?o) AS ?m) WHERE { ?s :p ?o }",
            [{"m": '"pear"'}],
        )

    def test_subquery_aggregate_scoping(self, spark):
        # inner SELECT projects only its own aggregate; ?o is not
        # visible to the outer group
        check(
            spark,
            ":s1 :p :a . :s1 :p :b . :s2 :p :c .",
            "SELECT ?s ?n WHERE { { SELECT ?s (COUNT(?o) AS ?n)"
            "  WHERE { ?s :p ?o } GROUP BY ?s } FILTER(?n > 1) }",
            [{"s": f"<{E}s1>", "n": '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'}],
        )


class TestDatasetClause:
    """dataset/ — FROM / FROM NAMED construct the active dataset
    (sparql11-query §13.2): FROM graphs MERGE into the default graph,
    FROM NAMED restricts what GRAPH can see, and each keeps the other's
    graphs invisible."""

    DATA = (
        ":s :p :d0 .\n"
        ":g1 { :s :p :one . :s :q :x1 . }\n"
        ":g2 { :s :p :two . }\n"
        ":g3 { :s :p :three . }"
    )

    def test_from_single_graph_replaces_default(self, spark):
        check(
            spark,
            self.DATA,
            "SELECT ?o FROM :g1 WHERE { ?s :p ?o }",
            [{"o": f"<{E}one>"}],
            quads=True,
        )

    def test_from_merges_multiple_graphs(self, spark):
        check(
            spark,
            self.DATA,
            "SELECT ?o FROM :g1 FROM :g2 WHERE { ?s :p ?o }",
            [{"o": f"<{E}one>"}, {"o": f"<{E}two>"}],
            quads=True,
        )

    def test_from_hides_named_graphs(self, spark):
        # with only FROM, there are no named graphs: GRAPH matches none
        check(
            spark,
            self.DATA,
            "SELECT ?g ?o FROM :g1 WHERE { GRAPH ?g { ?s :p ?o } }",
            [],
            quads=True,
        )

    def test_from_named_restricts_graph_enumeration(self, spark):
        check(
            spark,
            self.DATA,
            "SELECT ?g ?o FROM NAMED :g1 FROM NAMED :g2"
            "  WHERE { GRAPH ?g { ?s :p ?o } }",
            [
                {"g": f"<{E}g1>", "o": f"<{E}one>"},
                {"g": f"<{E}g2>", "o": f"<{E}two>"},
            ],
            quads=True,
        )

    def test_from_named_leaves_default_empty(self, spark):
        # only FROM NAMED: the default graph of the active dataset is
        # EMPTY — a non-GRAPH pattern matches nothing
        check(
            spark,
            self.DATA,
            "SELECT ?o FROM NAMED :g1 WHERE { ?s :p ?o }",
            [],
            quads=True,
        )

    def test_from_and_from_named_compose(self, spark):
        check(
            spark,
            self.DATA,
            "SELECT ?o ?n FROM :g3 FROM NAMED :g1"
            "  WHERE { ?s :p ?o GRAPH :g1 { ?s :q ?n } }",
            [{"o": f"<{E}three>", "n": f"<{E}x1>"}],
            quads=True,
        )

    def test_graph_iri_outside_from_named_is_empty(self, spark):
        check(
            spark,
            self.DATA,
            "SELECT ?o FROM NAMED :g1 WHERE { GRAPH :g2 { ?s :p ?o } }",
            [],
            quads=True,
        )
