"""Graph/Dataset behavioral contract suite.

Re-expresses the reference's reusable conformance macros
(`api/src/graph/test.rs:177` test_graph_impl! ~35 fns,
`api/src/dataset/test.rs:143` test_dataset_impl! ~41 fns) as DataFrame
assertions over one shared fixture dataset — the behavioral contract
every Graph/Dataset implementation must satisfy (SURVEY.md §5 item 3).
"""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators import graph_ops as G

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# the reference contract fixture family: people with types, names, ages
T = [
    ("<x:alice>", f"<{RDF}type>", "<x:Person>", None),
    ("<x:alice>", "<x:name>", '"Alice"', None),
    ("<x:bob>", f"<{RDF}type>", "<x:Person>", None),
    ("<x:bob>", "<x:name>", '"Bob"', None),
    ("<x:bob>", "<x:age>", f'"12"^^<{XSD}integer>', None),
    ("_:o", f"<{RDF}type>", "<x:Org>", None),
    ("_:o", "<x:member>", "<x:alice>", None),
    # named graphs
    ("<x:alice>", "<x:nick>", '"al"@en', "<x:g1>"),
    ("<x:alice>", "<x:nick>", '"ali"', "<x:g2>"),
    ("_:gb", "<x:p>", "<x:o>", "_:gn"),
]


@pytest.fixture(scope="module")
def ds(spark):
    df = spark.createDataFrame(T, "s string, p string, o string, g string")
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def g0(ds):
    return G.graph_view(ds, None)  # the default graph


class TestGraphContract:
    # triples() — full scan
    def test_triples_count(self, g0):
        assert g0.count() == 7

    # triples_matching over every constant/Any combination (the core of
    # the reference macro suite)
    @pytest.mark.parametrize(
        "s,p,o,expected",
        [
            (None, None, None, 7),
            ("<x:alice>", None, None, 2),
            (None, f"<{RDF}type>", None, 3),
            (None, None, "<x:Person>", 2),
            ("<x:alice>", f"<{RDF}type>", None, 1),
            ("<x:alice>", None, "<x:Person>", 1),
            (None, f"<{RDF}type>", "<x:Person>", 2),
            ("<x:alice>", f"<{RDF}type>", "<x:Person>", 1),
            ("<x:nobody>", None, None, 0),
            (None, "<x:nothing>", None, 0),
        ],
    )
    def test_triples_matching_matrix(self, g0, s, p, o, expected):
        assert G.triples_matching(g0, s, p, o).count() == expected

    def test_matching_list_matcher(self, g0):
        assert G.triples_matching(g0, s=["<x:alice>", "<x:bob>"]).count() == 5

    def test_matching_column_matcher(self, g0):
        # closure-style matcher: literals only
        assert G.triples_matching(g0, o=F.col("o").startswith('"')).count() == 3

    def test_contains(self, g0):
        assert G.contains(g0, "<x:alice>", "<x:name>", '"Alice"')
        assert not G.contains(g0, "<x:alice>", "<x:name>", '"Eve"')

    def test_subjects_predicates_objects(self, g0):
        assert G.subjects(g0).count() == 3
        assert G.predicates(g0).count() == 4
        assert G.objects(g0).count() == 6
        # non-distinct keeps duplicates (dups allowed, callers dedup)
        assert G.subjects(g0, distinct=False).count() == 7

    def test_atoms_by_kind(self, g0):
        iris = G.terms_of_kind(g0, 1).count()
        bnodes = G.terms_of_kind(g0, 0).count()
        lits = G.terms_of_kind(g0, 2).count()
        assert (iris, bnodes, lits) == (8, 1, 3)

    # mutation contract: insert is idempotent under SetGraph semantics;
    # remove of absent triples is a no-op
    def test_insert_idempotent(self, spark, g0):
        new = spark.createDataFrame(
            [("<x:alice>", "<x:name>", '"Alice"')], "s string, p string, o string"
        )
        assert G.insert_all(g0, new).count() == 7

    def test_insert_new(self, spark, g0):
        new = spark.createDataFrame(
            [("<x:carol>", "<x:name>", '"Carol"')], "s string, p string, o string"
        )
        assert G.insert_all(g0, new).count() == 8

    def test_remove_absent_noop(self, spark, g0):
        gone = spark.createDataFrame(
            [("<x:none>", "<x:none>", '"x"')], "s string, p string, o string"
        )
        assert G.remove_all(g0, gone).count() == 7

    def test_remove_matching_retain_matching_partition(self, g0):
        removed = G.remove_matching(g0, p=f"<{RDF}type>")
        retained = G.retain_matching(g0, p=f"<{RDF}type>")
        assert removed.count() + retained.count() == 7
        assert retained.count() == 3


class TestDatasetContract:
    def test_quads_count(self, ds):
        assert ds.count() == 10

    @pytest.mark.parametrize(
        "g,expected",
        [(G.DEFAULT_GRAPH, 7), ("<x:g1>", 1), ("<x:g2>", 1), ("_:gn", 1)],
    )
    def test_quads_matching_graph(self, ds, g, expected):
        assert G.quads_matching(ds, g=g).count() == expected

    def test_graph_names(self, ds):
        names = {r["g"] for r in G.graph_names(ds).collect()}
        assert names == {"<x:g1>", "<x:g2>", "_:gn"}

    def test_graph_view_drops_g(self, ds):
        v = G.graph_view(ds, "<x:g1>")
        assert "g" not in v.columns and v.count() == 1

    def test_union_graph_keeps_duplicates(self, spark):
        rows = [
            ("<s>", "<p>", "<o>", "<g1>"),
            ("<s>", "<p>", "<o>", "<g2>"),
        ]
        d = spark.createDataFrame(rows, "s string, p string, o string, g string")
        # same triple in two graphs → union keeps both occurrences
        assert G.union_graph(d).count() == 2

    def test_partial_union_selector(self, ds):
        assert G.partial_union_graph(ds, ["<x:g1>", "<x:g2>"]).count() == 2
        assert G.partial_union_graph(ds, [None, "<x:g1>"]).count() == 8

    def test_as_dataset_graph_roundtrip(self, g0, ds):
        back = G.graph_view(G.as_dataset(g0), None)
        assert back.count() == g0.count()

    def test_quads_matching_full_matrix(self, ds):
        assert G.quads_matching(ds, s="<x:alice>", g="<x:g1>").count() == 1
        assert G.quads_matching(ds, p="<x:nick>").count() == 2
        assert G.quads_matching(ds, o='"al"@en').count() == 1

    def test_set_dataset_insert(self, spark, ds):
        dup = spark.createDataFrame(
            [("<x:alice>", "<x:nick>", '"al"@en', "<x:g1>")],
            "s string, p string, o string, g string",
        )
        assert G.insert_all(ds, dup).count() == 10  # idempotent
        # same triple in a NEW graph is a new quad
        other = spark.createDataFrame(
            [("<x:alice>", "<x:nick>", '"al"@en', "<x:g3>")],
            "s string, p string, o string, g string",
        )
        assert G.insert_all(ds, other).count() == 11
