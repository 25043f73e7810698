"""SPARQL front-end tests: query-string → results, mirroring the
reference's query-level test style (`sparql/src/test.rs`: query string →
expected bindings as canonical term strings)."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.sparql import query
from sophia_rs_spark.terms.model import XSD

PFX = "PREFIX : <http://example.org/ns/>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


@pytest.fixture(scope="module")
def data(spark):
    NS = "http://example.org/ns/"
    rows = [
        (f"<{NS}alice>", f"<{NS}name>", '"Alice"', None),
        (f"<{NS}alice>", f"<{NS}age>", f'"42"^^<{XSD}integer>', None),
        (f"<{NS}alice>", f"<{NS}knows>", f"<{NS}bob>", None),
        (f"<{NS}bob>", f"<{NS}name>", '"Bob"', None),
        (f"<{NS}bob>", f"<{NS}age>", f'"7"^^<{XSD}integer>', None),
        (f"<{NS}bob>", f"<{NS}knows>", f"<{NS}carol>", None),
        (f"<{NS}carol>", f"<{NS}name>", '"Carol"@en', None),
        (f"<{NS}alice>", f"<{NS}nick>", '"al"', "<x:g1>"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    df.cache().count()
    yield df
    df.unpersist()


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


class TestSelect:
    def test_simple_bgp(self, data):
        got = query(data, PFX + "SELECT ?n WHERE { :alice :name ?n }")
        assert rows_of(got) == [('"Alice"',)]

    def test_join_two_patterns(self, data):
        got = query(
            data, PFX + "SELECT ?n WHERE { :alice :knows ?x . ?x :name ?n }"
        )
        assert rows_of(got) == [('"Bob"',)]

    def test_select_star(self, data):
        got = query(data, PFX + "SELECT * WHERE { ?s :name ?n }")
        assert set(got.columns) == {"s", "n"}
        assert got.count() == 3

    def test_filter_numeric_value_comparison(self, data):
        # "7" > "42" lexically but 7 < 42 numerically — value semantics
        got = query(
            data, PFX + "SELECT ?s WHERE { ?s :age ?a FILTER(?a < 10) }"
        )
        assert rows_of(got) == [("<http://example.org/ns/bob>",)]

    def test_filter_string_fns(self, data):
        got = query(
            data,
            PFX + 'SELECT ?s WHERE { ?s :name ?n FILTER(STRSTARTS(STR(?n), "A")) }',
        )
        assert rows_of(got) == [("<http://example.org/ns/alice>",)]

    def test_filter_lang(self, data):
        got = query(
            data, PFX + 'SELECT ?s WHERE { ?s :name ?n FILTER(LANG(?n) = "en") }'
        )
        assert rows_of(got) == [("<http://example.org/ns/carol>",)]

    def test_optional(self, data):
        got = query(
            data,
            PFX + "SELECT ?s ?a WHERE { ?s :name ?n OPTIONAL { ?s :age ?a } }",
        )
        vals = dict(rows_of(got.select("s", "a")))
        assert vals["<http://example.org/ns/carol>"] is None
        assert vals["<http://example.org/ns/alice>"] == f'"42"^^<{XSD}integer>'

    def test_minus(self, data):
        got = query(
            data, PFX + "SELECT ?s WHERE { ?s :name ?n MINUS { ?s :age ?a } }"
        )
        assert rows_of(got) == [("<http://example.org/ns/carol>",)]

    def test_union(self, data):
        got = query(
            data,
            PFX + "SELECT ?x WHERE { { :alice :knows ?x } UNION { :bob :knows ?x } }",
        )
        assert got.count() == 2

    def test_bind(self, data):
        got = query(
            data,
            PFX + "SELECT ?l WHERE { :alice :name ?n BIND(STRLEN(STR(?n)) AS ?l) }",
        )
        assert rows_of(got) == [(5,)]

    def test_values(self, data):
        got = query(
            data,
            PFX + "SELECT ?s ?n WHERE { VALUES ?s { :alice :bob } ?s :name ?n }",
        )
        assert got.count() == 2

    def test_graph_constant_and_var(self, data):
        got = query(data, PFX + "SELECT ?o WHERE { GRAPH <x:g1> { ?s :nick ?o } }")
        assert rows_of(got) == [('"al"',)]
        got2 = query(data, PFX + "SELECT ?g WHERE { GRAPH ?g { ?s :nick ?o } }")
        assert rows_of(got2) == [("<x:g1>",)]

    def test_order_limit_offset(self, data):
        got = query(
            data,
            PFX + "SELECT ?s WHERE { ?s :age ?a } ORDER BY DESC(?a) LIMIT 1",
        )
        assert rows_of(got) == [("<http://example.org/ns/alice>",)]

    def test_distinct(self, data):
        # default-graph scope: the :nick triple lives in <x:g1> → excluded
        got = query(data, PFX + "SELECT DISTINCT ?p WHERE { ?s ?p ?o }")
        assert got.count() == 3

    def test_aggregates(self, data):
        got = query(
            data,
            PFX + "SELECT ?s (COUNT(*) AS ?cnt) WHERE { ?s ?p ?o } GROUP BY ?s",
        )
        vals = dict(rows_of(got))
        assert vals["<http://example.org/ns/alice>"] == 3  # default graph only
        got2 = query(
            data, PFX + "SELECT (SUM(?a) AS ?total) WHERE { ?s :age ?a }"
        )
        assert got2.collect()[0]["total"] == 49.0

    def test_group_concat_pinned(self, data):
        got = query(
            data,
            PFX + 'SELECT (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names) '
            "WHERE { ?s :name ?n }",
        )
        assert got.collect()[0]["names"] == "Alice,Bob,Carol"

    def test_exists(self, data):
        got = query(
            data,
            PFX + "SELECT ?s WHERE { ?s :name ?n FILTER EXISTS { ?s :age ?a } }",
        )
        assert got.count() == 2
        got2 = query(
            data,
            PFX + "SELECT ?s WHERE { ?s :name ?n FILTER NOT EXISTS { ?s :age ?a } }",
        )
        assert rows_of(got2) == [("<http://example.org/ns/carol>",)]

    def test_property_path_plus(self, data):
        got = query(
            data, PFX + "SELECT ?x WHERE { :alice :knows+ ?x }"
        )
        assert got.count() == 2  # bob, carol

    def test_property_path_alt_and_inverse(self, data):
        got = query(data, PFX + "SELECT ?x WHERE { ?x (:name|:nick) ?v }")
        assert got.select("x").distinct().count() == 3
        got2 = query(data, PFX + "SELECT ?x WHERE { :bob ^:knows ?x }")
        assert rows_of(got2) == [("<http://example.org/ns/alice>",)]

    def test_path_sequence(self, data):
        got = query(data, PFX + "SELECT ?n WHERE { :alice :knows/:name ?n }")
        assert rows_of(got) == [('"Bob"',)]


class TestAskConstruct:
    def test_ask(self, data):
        assert query(data, PFX + "ASK { :alice :knows :bob }") is True
        assert query(data, PFX + "ASK { :bob :knows :alice }") is False

    def test_construct(self, data):
        got = query(
            data,
            PFX + "CONSTRUCT { ?s :label ?n } WHERE { ?s :name ?n }",
        )
        assert got.count() == 3
        assert set(got.columns) == {"s", "p", "o"}
        assert got.filter(F.col("p") == "<http://example.org/ns/label>").count() == 3


class TestErrors:
    def test_undeclared_prefix(self, data):
        from sophia_rs_spark.sparql import SparqlError

        with pytest.raises(SparqlError):
            query(data, "SELECT ?s WHERE { ?s nope:p ?o }")

    def test_trailing_garbage(self, data):
        from sophia_rs_spark.sparql import SparqlError

        with pytest.raises(SparqlError):
            query(data, PFX + "SELECT ?s WHERE { ?s :name ?n } GARBAGE")


class TestMoreExpressions:
    def test_arithmetic_filter(self, data):
        got = query(
            data, PFX + "SELECT ?s WHERE { ?s :age ?a FILTER(?a * 2 > 50) }"
        )
        assert rows_of(got) == [("<http://example.org/ns/alice>",)]

    def test_in_operator(self, data):
        got = query(
            data,
            PFX + "SELECT ?s WHERE { ?s :name ?n FILTER(?n IN (\"Alice\", \"Bob\")) }",
        )
        assert got.count() == 2

    def test_logical_and_or_not(self, data):
        got = query(
            data,
            PFX + 'SELECT ?s WHERE { ?s :age ?a FILTER(?a > 5 && !(?a > 40)) }',
        )
        assert rows_of(got) == [("<http://example.org/ns/bob>",)]

    def test_strbefore_strafter_substr(self, data):
        got = query(
            data,
            PFX + 'SELECT ?b WHERE { :alice :name ?n BIND(SUBSTR(STR(?n), 2, 3) AS ?b) }',
        )
        assert rows_of(got) == [("lic",)]

    def test_coalesce_if(self, data):
        got = query(
            data,
            PFX + "SELECT ?s ?v WHERE { ?s :name ?n OPTIONAL { ?s :age ?a } "
            'BIND(COALESCE(?a, "none") AS ?v) }',
        )
        vals = dict(rows_of(got))
        assert vals["<http://example.org/ns/carol>"] == '"none"'  # term-valued COALESCE

    def test_isiri_isliteral(self, data):
        got = query(
            data, PFX + "SELECT ?o WHERE { :alice ?p ?o FILTER(ISIRI(?o)) }"
        )
        assert rows_of(got) == [("<http://example.org/ns/bob>",)]

    def test_having(self, data):
        got = query(
            data,
            PFX + "SELECT ?s (COUNT(*) AS ?cnt) WHERE { ?s ?p ?o } "
            "GROUP BY ?s HAVING(?cnt > 2)",
        )
        assert got.count() == 2  # alice and bob have 3 each, carol 1

    def test_order_by_expression(self, data):
        got = query(
            data,
            PFX + "SELECT ?s WHERE { ?s :age ?a } ORDER BY ASC(?a * 1)",
        )
        assert [r["s"] for r in got.collect()] == [
            "<http://example.org/ns/bob>",
            "<http://example.org/ns/alice>",
        ]

    def test_path_star_and_opt(self, data):
        got = query(data, PFX + "SELECT ?x WHERE { :alice :knows* ?x }")
        xs = {r["x"] for r in got.collect()}
        assert "<http://example.org/ns/alice>" in xs  # zero-length
        assert "<http://example.org/ns/carol>" in xs
        got2 = query(data, PFX + "SELECT ?x WHERE { :alice :knows? ?x }")
        xs2 = {r["x"] for r in got2.collect()}
        assert xs2 == {
            "<http://example.org/ns/alice>",
            "<http://example.org/ns/bob>",
        }

    def test_negated_property_set(self, data):
        got = query(
            data, PFX + "SELECT ?o WHERE { :bob !(:name|:age) ?o }"
        )
        assert rows_of(got) == [("<http://example.org/ns/carol>",)]

    def test_regex_builtin(self, data):
        got = query(
            data,
            PFX + 'SELECT ?s WHERE { ?s :name ?n FILTER(REGEX(STR(?n), "^[AB]")) }',
        )
        assert got.count() == 2

    def test_sameterm_langmatches(self, data):
        got = query(
            data,
            PFX + 'SELECT ?s WHERE { ?s :name ?n FILTER(LANGMATCHES(LANG(?n), "EN")) }',
        )
        assert rows_of(got) == [("<http://example.org/ns/carol>",)]


class TestSubquery:
    def test_subselect_join(self, data):
        got = query(
            data,
            PFX + """SELECT ?n WHERE {
              { SELECT ?s WHERE { ?s :age ?a } ORDER BY DESC(?a) LIMIT 1 }
              ?s :name ?n
            }""",
        )
        assert rows_of(got) == [('"Alice"',)]

    def test_subselect_aggregate(self, data):
        got = query(
            data,
            PFX + """SELECT ?s ?cnt WHERE {
              ?s :name ?n
              { SELECT ?s (COUNT(*) AS ?cnt) WHERE { ?s ?p ?o } GROUP BY ?s }
            }""",
        )
        vals = dict(rows_of(got))
        assert vals["<http://example.org/ns/alice>"] == 3


class TestDescribe:
    def test_describe_iri(self, data):
        got = query(data, PFX + "DESCRIBE :alice")
        assert got.count() == 3  # alice's default-graph triples
        assert set(got.columns) == {"s", "p", "o"}

    def test_describe_var_where(self, data):
        got = query(
            data, PFX + 'DESCRIBE ?s WHERE { ?s :name ?n FILTER(LANG(?n) = "en") }'
        )
        rows = {(r["s"], r["p"]) for r in got.collect()}
        assert rows == {("<http://example.org/ns/carol>", "<http://example.org/ns/name>")}


class TestCompatJoinSemantics:
    """SPARQL compatibility joins over possibly-unbound vars (ADVICE r1):
    UNDEF in VALUES and post-OPTIONAL unbound vars are join wildcards,
    not NULL keys (exec.rs:484-518)."""

    def test_values_undef_binds(self, data):
        got = query(
            data,
            PFX + 'SELECT ?x ?n WHERE { VALUES (?x ?n) { (UNDEF "Alice") } '
            "?x :name ?n }",
        )
        assert rows_of(got) == [("<http://example.org/ns/alice>", '"Alice"')]

    def test_values_undef_multiple_rows(self, data):
        got = query(
            data,
            PFX + "SELECT ?x ?n WHERE { ?x :name ?n "
            'VALUES (?x ?n) { (:bob UNDEF) (UNDEF "Carol"@en) } }',
        )
        assert rows_of(got) == [
            ("<http://example.org/ns/bob>", '"Bob"'),
            ("<http://example.org/ns/carol>", '"Carol"@en'),
        ]

    def test_values_bound_rows_still_exact(self, data):
        got = query(
            data,
            PFX + 'SELECT ?x WHERE { VALUES (?x ?n) { (:alice "Alice") '
            '(:bob "WRONG") } ?x :name ?n }',
        )
        assert rows_of(got) == [("<http://example.org/ns/alice>",)]

    def test_optional_unbound_then_join(self, data):
        # ?nick unbound for bob via OPTIONAL; joining a VALUES over ?nick
        # must treat unbound as compatible-with-anything
        got = query(
            data,
            PFX + "SELECT ?x ?nick WHERE { ?x :name ?n "
            "OPTIONAL { ?x :nick ?nick } "
            'VALUES ?nick { "al" } }',
        )
        # alice has nick "al"; bob/carol have unbound ?nick -> compatible,
        # take the VALUES binding
        assert rows_of(got) == [
            ("<http://example.org/ns/alice>", '"al"'),
            ("<http://example.org/ns/bob>", '"al"'),
            ("<http://example.org/ns/carol>", '"al"'),
        ]

    def test_union_asymmetric_then_join(self, data):
        got = query(
            data,
            PFX + "SELECT ?x ?v WHERE { { ?x :name ?v } UNION { ?x :age ?w } "
            '?x :name ?v }',
        )
        # branch 2 leaves ?v unbound -> compatible with the outer pattern
        names = {
            ("<http://example.org/ns/alice>", '"Alice"'),
            ("<http://example.org/ns/bob>", '"Bob"'),
            ("<http://example.org/ns/carol>", '"Carol"@en'),
        }
        got_rows = set(rows_of(got))
        # alice & bob appear twice (once per branch); carol once (no age)
        assert got_rows == names


def test_strlen_of_escaped_literal(spark):
    """ADVICE r1: STR functions must act on the DECODED lexical form."""
    NS = "http://example.org/ns/"
    rows = [
        (f"<{NS}a>", f"<{NS}t>", '"line1\\nline2"', None),
        (f"<{NS}b>", f"<{NS}t>", '"tab\\there"', None),
        (f"<{NS}c>", f"<{NS}t>", '"back\\\\slash\\nx"', None),  # raw \ then n
        (f"<{NS}d>", f"<{NS}t>", '"ctl\\u0001"', None),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    got = query(
        df,
        PFX + "SELECT ?s ?l WHERE { ?s :t ?o BIND(STRLEN(?o) AS ?l) }",
    )
    by_s = {r["s"]: r["l"] for r in got.collect()}
    assert by_s[f"<{NS}a>"] == len("line1\nline2")
    assert by_s[f"<{NS}b>"] == len("tab\there")
    assert by_s[f"<{NS}c>"] == len("back\\slash\nx")
    assert by_s[f"<{NS}d>"] == len("ctl\x01")
