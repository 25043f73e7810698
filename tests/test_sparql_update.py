"""SPARQL 1.1 Update front-end (`sophia_rs_spark/sparql/update.py`,
sparql11-update §3) — functional graph-store semantics over a quads
DataFrame.  Beyond the reference: sophia_rs has no update evaluator
(mutation is its Graph/Dataset API, `api/src/dataset.rs`); these tests
pin our update-text semantics against hand-computed expected stores."""

import pytest

from sophia_rs_spark.sparql import SparqlError, update
from sophia_rs_spark.sparql.update import parse_update


def rows(df):
    return sorted(
        ((r.s, r.p, r.o, r.g) for r in df.collect()),
        key=lambda t: tuple(x or "" for x in t),
    )


@pytest.fixture()
def ds(spark):
    return spark.createDataFrame(
        [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:b>", "<x:p>", '"2"', None),
            ("<x:a>", "<x:q>", "<x:b>", "<x:g1>"),
        ],
        "s string, p string, o string, g string",
    )


class TestData:
    def test_insert_data_with_graph_block_and_dup(self, ds):
        got = update(
            ds,
            'INSERT DATA { <x:c> <x:p> "3" .'
            "  GRAPH <x:g2> { <x:c> <x:q> <x:a> }"
            '  <x:a> <x:p> "1" }',  # already present — set semantics
        )
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:a>", "<x:q>", "<x:b>", "<x:g1>"),
            ("<x:b>", "<x:p>", '"2"', None),
            ("<x:c>", "<x:p>", '"3"', None),
            ("<x:c>", "<x:q>", "<x:a>", "<x:g2>"),
        ]

    def test_delete_data_per_graph(self, ds):
        got = update(
            ds,
            'DELETE DATA { <x:a> <x:p> "1" .'
            "  GRAPH <x:g1> { <x:a> <x:q> <x:b> } }",
        )
        assert rows(got) == [("<x:b>", "<x:p>", '"2"', None)]

    def test_delete_data_wrong_graph_is_noop(self, ds):
        # the default-graph copy is NOT in g1 — nothing matches
        got = update(ds, 'DELETE DATA { GRAPH <x:g1> { <x:a> <x:p> "1" } }')
        assert got.count() == 3

    def test_insert_data_bnode_is_freshly_labeled(self, ds):
        got = update(ds, 'INSERT DATA { _:n <x:p> "fresh" }')
        (row,) = [t for t in rows(got) if t[2] == '"fresh"']
        assert row[0].startswith("_:u") and row[0] not in ("_:n",)
        # idempotent re-execution (deterministic minting)
        again = update(got, 'INSERT DATA { _:n <x:p> "fresh" }')
        assert again.count() == got.count()

    def test_vars_rejected_in_ground_quads(self, ds):
        with pytest.raises(SparqlError, match="not allowed in ground"):
            parse_update('INSERT DATA { ?s <x:p> "1" }')

    def test_bnodes_rejected_in_delete_data(self, ds):
        with pytest.raises(SparqlError, match="blank nodes"):
            parse_update('DELETE DATA { _:n <x:p> "1" }')

    def test_paths_rejected_in_quads(self, ds):
        with pytest.raises(SparqlError, match="paths"):
            parse_update("DELETE WHERE { ?s <x:p>+ ?o }")


class TestPatternUpdates:
    def test_delete_where(self, ds):
        got = update(ds, "DELETE WHERE { ?s <x:p> ?o }")
        assert rows(got) == [("<x:a>", "<x:q>", "<x:b>", "<x:g1>")]

    def test_delete_where_graph_pattern(self, ds):
        got = update(ds, "DELETE WHERE { GRAPH <x:g1> { ?s <x:q> ?o } }")
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:b>", "<x:p>", '"2"', None),
        ]

    def test_delete_where_variable_graph(self, ds):
        # r5 ADVICE: GRAPH ?g is legal in a DELETE WHERE quad pattern
        # (QuadsNotTriples ::= 'GRAPH' VarOrIri …) — wipes the matching
        # quads from EVERY named graph, leaving the default graph alone
        got = update(ds, "DELETE WHERE { GRAPH ?g { ?s ?p ?o } }")
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:b>", "<x:p>", '"2"', None),
        ]

    def test_modify_template_variable_graph(self, ds):
        # ?g bound in WHERE instantiates the INSERT template's GRAPH
        got = update(
            ds,
            "INSERT { GRAPH ?g { ?s <x:copied> ?o } }"
            "  WHERE { GRAPH ?g { ?s <x:q> ?o } }",
        )
        assert ("<x:a>", "<x:copied>", "<x:b>", "<x:g1>") in rows(got)
        assert got.count() == 4

    def test_template_unbound_variable_graph_contributes_nothing(self, ds):
        # ?g never binds (OPTIONAL miss): the GRAPH ?g quad must NOT
        # silently land in the default graph
        got = update(
            ds,
            "INSERT { GRAPH ?g { ?s <x:new> ?o } }"
            "  WHERE { ?s <x:p> ?o OPTIONAL { ?s <x:none> ?g } }",
        )
        assert rows(got) == rows(ds)

    def test_variable_graph_rejected_in_ground_data(self, ds):
        with pytest.raises(SparqlError, match="constant IRI"):
            parse_update('INSERT DATA { GRAPH ?g { <x:a> <x:p> "1" } }')

    def test_modify_rename_predicate(self, ds):
        got = update(
            ds,
            "DELETE { ?s <x:p> ?o } INSERT { ?s <x:renamed> ?o }"
            "  WHERE { ?s <x:p> ?o }",
        )
        assert rows(got) == [
            ("<x:a>", "<x:q>", "<x:b>", "<x:g1>"),
            ("<x:a>", "<x:renamed>", '"1"', None),
            ("<x:b>", "<x:renamed>", '"2"', None),
        ]

    def test_modify_templates_see_original_state(self, ds):
        # DELETE and INSERT instantiate against the ORIGINAL store;
        # inserting what is simultaneously deleted keeps it
        got = update(
            ds,
            "DELETE { ?s <x:p> ?o } INSERT { ?s <x:p> ?o }"
            "  WHERE { ?s <x:p> ?o }",
        )
        assert got.count() == 3

    def test_insert_only_modify_with_filter(self, ds):
        got = update(
            ds,
            'INSERT { ?s <x:big> "yes" } WHERE { ?s <x:p> ?o'
            '  FILTER(STR(?o) > "1") }',
        )
        assert ("<x:b>", "<x:big>", '"yes"', None) in rows(got)
        assert got.count() == 4

    def test_with_graph_scopes_pattern_and_templates(self, ds):
        got = update(
            ds,
            "WITH <x:g1> DELETE { ?s <x:q> ?o } INSERT { ?s <x:q2> ?o }"
            "  WHERE { ?s <x:q> ?o }",
        )
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:a>", "<x:q2>", "<x:b>", "<x:g1>"),
            ("<x:b>", "<x:p>", '"2"', None),
        ]

    def test_insert_template_graph_block(self, ds):
        got = update(
            ds,
            "INSERT { GRAPH <x:dst> { ?s <x:p2> ?o } }"
            "  WHERE { ?s <x:p> ?o }",
        )
        assert ("<x:a>", "<x:p2>", '"1"', "<x:dst>") in rows(got)
        assert ("<x:b>", "<x:p2>", '"2"', "<x:dst>") in rows(got)

    def test_insert_template_bnode_per_solution(self, ds):
        got = update(
            ds,
            "INSERT { ?s <x:stmt> _:st . _:st <x:val> ?o }"
            "  WHERE { ?s <x:p> ?o }",
        )
        new = [t for t in rows(got) if t[1] in ("<x:stmt>", "<x:val>")]
        assert len(new) == 4
        # same label, same solution → same bnode; across solutions → distinct
        by_stmt = {t[0]: t[2] for t in new if t[1] == "<x:stmt>"}
        vals = {t[0]: t[2] for t in new if t[1] == "<x:val>"}
        assert set(by_stmt.values()) == set(vals.keys())
        assert len(set(by_stmt.values())) == 2

    def test_bnodes_rejected_in_delete_template(self, ds):
        with pytest.raises(SparqlError, match="blank nodes"):
            parse_update("DELETE { ?s <x:p> _:b } WHERE { ?s <x:p> ?o }")

    def test_sequence_shares_prologue(self, ds):
        got = update(
            ds,
            'PREFIX p: <x:> INSERT DATA { p:d p:p "4" } ;'
            ' DELETE DATA { p:a p:p "1" }',
        )
        assert rows(got) == [
            ("<x:a>", "<x:q>", "<x:b>", "<x:g1>"),
            ("<x:b>", "<x:p>", '"2"', None),
            ("<x:d>", "<x:p>", '"4"', None),
        ]


class TestGraphManagement:
    def test_clear_graph_keeps_default(self, ds):
        got = update(ds, "CLEAR GRAPH <x:g1>")
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:b>", "<x:p>", '"2"', None),
        ]

    def test_clear_default_named_all(self, ds):
        assert update(ds, "CLEAR DEFAULT").count() == 1
        assert update(ds, "CLEAR NAMED").count() == 2
        assert update(ds, "CLEAR ALL").count() == 0

    def test_drop_is_clear_and_create_is_noop(self, ds):
        assert rows(update(ds, "DROP DEFAULT")) == rows(
            update(ds, "CLEAR DEFAULT")
        )
        assert update(ds, "CREATE GRAPH <x:new>").count() == 3

    def test_add(self, ds):
        got = update(ds, "ADD DEFAULT TO GRAPH <x:g1>")
        assert ("<x:a>", "<x:p>", '"1"', "<x:g1>") in rows(got)
        assert ("<x:a>", "<x:q>", "<x:b>", "<x:g1>") in rows(got)  # kept
        assert got.count() == 5

    def test_move_replaces_destination(self, ds):
        got = update(ds, "MOVE GRAPH <x:g1> TO DEFAULT")
        assert rows(got) == [("<x:a>", "<x:q>", "<x:b>", None)]

    def test_copy_replaces_destination(self, ds):
        got = update(ds, "COPY DEFAULT TO GRAPH <x:g1>")
        assert rows(got) == [
            ("<x:a>", "<x:p>", '"1"', None),
            ("<x:a>", "<x:p>", '"1"', "<x:g1>"),
            ("<x:b>", "<x:p>", '"2"', None),
            ("<x:b>", "<x:p>", '"2"', "<x:g1>"),
        ]

    def test_self_copy_is_noop(self, ds):
        assert update(ds, "MOVE DEFAULT TO DEFAULT").count() == 3

    # -- §3.2.x non-SILENT error semantics (r5 ADVICE) -----------------

    @pytest.mark.parametrize(
        "text",
        [
            "DROP GRAPH <x:nope>",
            "CLEAR GRAPH <x:nope>",
            "MOVE GRAPH <x:nope> TO DEFAULT",
            "COPY GRAPH <x:nope> TO GRAPH <x:g1>",
            "ADD GRAPH <x:nope> TO DEFAULT",
        ],
        ids=["drop", "clear", "move", "copy", "add"],
    )
    def test_nonexistent_graph_errors_without_silent(self, ds, text):
        with pytest.raises(SparqlError, match="does not exist"):
            update(ds, text)

    @pytest.mark.parametrize(
        "text,count",
        [
            ("DROP SILENT GRAPH <x:nope>", 3),
            ("CLEAR SILENT GRAPH <x:nope>", 3),
            ("MOVE SILENT GRAPH <x:nope> TO DEFAULT", 3),
            ("COPY SILENT GRAPH <x:nope> TO GRAPH <x:g1>", 3),
            ("ADD SILENT GRAPH <x:nope> TO DEFAULT", 3),
        ],
        ids=["drop", "clear", "move", "copy", "add"],
    )
    def test_silent_nonexistent_graph_is_tolerated(self, ds, text, count):
        # SILENT suppresses the failure and the failed op changes
        # NOTHING — MOVE/COPY must not still replace the destination
        assert update(ds, text).count() == count

    def test_create_existing_graph_errors_without_silent(self, ds):
        with pytest.raises(SparqlError, match="already exists"):
            update(ds, "CREATE GRAPH <x:g1>")
        assert update(ds, "CREATE SILENT GRAPH <x:g1>").count() == 3

    def test_default_graph_source_always_exists(self, spark):
        empty = spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
        assert update(empty, "CLEAR DEFAULT").count() == 0
        assert update(empty, "MOVE DEFAULT TO GRAPH <x:g>").count() == 0


class TestLoad:
    def test_load_turtle_file(self, ds, tmp_path):
        doc = tmp_path / "extra.ttl"
        doc.write_text('@prefix e: <x:> .\ne:new e:p "loaded" .\n')
        got = update(ds, f"LOAD <file://{doc}>")
        assert ("<x:new>", "<x:p>", '"loaded"', None) in rows(got)
        assert got.count() == 4

    def test_load_into_graph(self, ds, tmp_path):
        doc = tmp_path / "extra.nt"
        doc.write_text('<x:new> <x:p> "loaded" .\n')
        got = update(ds, f"LOAD <file://{doc}> INTO GRAPH <x:dst>")
        assert ("<x:new>", "<x:p>", '"loaded"', "<x:dst>") in rows(got)

    def test_load_missing_errors_silent_is_noop(self, ds, tmp_path):
        missing = tmp_path / "absent.nt"
        with pytest.raises(SparqlError, match="LOAD"):
            update(ds, f"LOAD <file://{missing}>")
        got = update(ds, f"LOAD SILENT <file://{missing}>")
        assert got.count() == 3

    def test_load_parse_error_surfaces(self, ds, tmp_path):
        doc = tmp_path / "bad.nt"
        doc.write_text("this is not ntriples\n")
        with pytest.raises(SparqlError, match="LOAD"):
            update(ds, f"LOAD <file://{doc}>")

    def test_injected_loader(self, spark, ds):
        def loader(sp, iri):
            return sp.createDataFrame(
                [("<x:inj>", "<x:p>", '"via loader"')],
                "s string, p string, o string",
            )

        got = update(ds, "LOAD <http://remote/doc.nt>", loader=loader)
        assert ("<x:inj>", "<x:p>", '"via loader"', None) in rows(got)


class TestTripleTerms:
    def test_insert_template_constructs_tterm(self, spark, ds):
        got = update(
            ds, 'INSERT { <<( ?s <x:p> ?o )>> <x:src> "dm" } '
                "WHERE { ?s <x:p> ?o }"
        )
        assert ('<<( <x:a> <x:p> "1" )>>', "<x:src>", '"dm"', None) in rows(got)
        assert ('<<( <x:b> <x:p> "2" )>>', "<x:src>", '"dm"', None) in rows(got)
        assert got.count() == 5

    def test_insert_data_ground_tterm(self, spark, ds):
        got = update(
            ds, 'INSERT DATA { <<( <x:a> <x:p> <x:b> )>> <x:g> "y" }'
        )
        assert ("<<( <x:a> <x:p> <x:b> )>>", "<x:g>", '"y"', None) in rows(got)

    def test_delete_where_tterm_pattern(self, spark, ds):
        withtt = update(
            ds, 'INSERT { <<( ?s <x:p> ?o )>> <x:src> "dm" } '
                "WHERE { ?s <x:p> ?o }"
        )
        got = update(
            withtt, 'DELETE WHERE { <<( ?s <x:p> ?o )>> <x:src> "dm" }'
        )
        assert sorted(rows(got)) == sorted(rows(ds))

    def test_insert_data_var_tterm_rejected(self, spark, ds):
        with pytest.raises(SparqlError, match="variable"):
            update(ds, 'INSERT DATA { <<( ?s <x:p> ?o )>> <x:g> "y" }')


class TestTriplesOnlyDataset:
    def test_triples_df_gets_default_graph(self, spark):
        ds3 = spark.createDataFrame(
            [("<x:a>", "<x:p>", '"1"')], "s string, p string, o string"
        )
        got = update(ds3, 'INSERT DATA { <x:b> <x:p> "2" }')
        assert got.columns == ["s", "p", "o", "g"]
        assert got.count() == 2


def test_insert_graph_var_bound_to_triple_term_is_dropped(ds):
    """ADVICE r5: a ?g bound to a triple term (or any non-IRI/bnode) is
    not a valid graph name — the instantiated quad must be dropped, not
    inserted with a malformed graph label."""
    got = update(
        ds,
        "INSERT { GRAPH ?g { <x:n> <x:p> ?o } } WHERE {"
        "  <x:a> <x:p> ?o ."
        "  BIND(TRIPLE(<x:a>, <x:p>, ?o) AS ?g) }",
    )
    assert rows(got) == rows(ds)


def test_insert_graph_var_bound_to_bnode_kept(ds):
    got = update(
        ds,
        "INSERT { GRAPH ?g { <x:n> <x:p> ?o } } WHERE {"
        "  <x:a> <x:p> ?o . BIND(BNODE() AS ?g) }",
    )
    new = [r for r in rows(got) if r not in rows(ds)]
    assert len(new) == 1 and new[0][3].startswith("_:")
