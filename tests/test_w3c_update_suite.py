"""Vendored subset of the W3C SPARQL 1.1 UPDATE evaluation test suite
(w3c/rdf-tests sparql/sparql11/, families basic-update/ delete-data/
delete-where/ delete-insert/ clear/ drop/ add/ move/ copy/).  The
reference treats the W3C suites as its conformance yardstick
(`/root/reference/README.md:104-105`); this sandbox has no network, so
each case is re-authored from the public suite structure: upstream test
NAME, inline data, the update string, and the hand-computed expected
store.  Default graph = ``g IS NULL``; stores compare as SETS (the
functional store is set-semantic, matching the spec's graph-as-set).
"""

import pytest

from sophia_rs_spark.sparql import SparqlError, update

FOAF = "http://xmlns.com/foaf/0.1/"
PFX = f"PREFIX foaf: <{FOAF}>\nPREFIX ex: <http://example.org/>\n"
EX = "http://example.org/"


def _iri(local, ns=EX):
    return f"<{ns}{local}>"


def store(df):
    return {(r.s, r.p, r.o, r.g) for r in df.collect()}


def quads(spark, rows):
    return spark.createDataFrame(
        list(rows), "s string, p string, o string, g string"
    )


# ---------------------------------------------------------------------------
# basic-update/ : INSERT DATA
# ---------------------------------------------------------------------------


class TestBasicUpdate:
    def test_insert_data_spo1(self, spark):
        # insert-data-spo1: one ground triple into the (empty) default
        # graph
        empty = spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
        got = update(empty, PFX + "INSERT DATA { ex:book1 ex:price 42 }")
        assert store(got) == {
            (
                _iri("book1"),
                _iri("price"),
                '"42"^^<http://www.w3.org/2001/XMLSchema#integer>',
                None,
            )
        }

    def test_insert_data_named1(self, spark):
        # insert-data-named1: ground quad into a named graph
        base = quads(spark, [(_iri("s"), _iri("p"), _iri("o"), None)])
        got = update(
            base,
            PFX + "INSERT DATA { GRAPH ex:g1 { ex:s ex:p ex:o } }",
        )
        assert store(got) == {
            (_iri("s"), _iri("p"), _iri("o"), None),
            (_iri("s"), _iri("p"), _iri("o"), _iri("g1")),
        }

    def test_insert_data_named2_merges_into_existing(self, spark):
        # insert-data-named2: inserting into a non-empty named graph
        # merges (set union), never replaces
        base = quads(spark, [(_iri("s"), _iri("p"), '"old"', _iri("g1"))])
        got = update(
            base, PFX + "INSERT DATA { GRAPH ex:g1 { ex:s ex:p 'new' } }"
        )
        assert store(got) == {
            (_iri("s"), _iri("p"), '"old"', _iri("g1")),
            (_iri("s"), _iri("p"), '"new"', _iri("g1")),
        }

    def test_insert_data_duplicate_is_set_union(self, spark):
        base = quads(spark, [(_iri("s"), _iri("p"), _iri("o"), None)])
        got = update(base, PFX + "INSERT DATA { ex:s ex:p ex:o }")
        assert store(got) == {(_iri("s"), _iri("p"), _iri("o"), None)}
        assert got.count() == 1  # set semantics, no duplicate row


# ---------------------------------------------------------------------------
# delete-data/ and delete-where/
# ---------------------------------------------------------------------------


DELETE_BASE = [
    (f"<{EX}william>", f"<{FOAF}givenName>", '"William"', None),
    (f"<{EX}william>", f"<{FOAF}knows>", f"<{EX}fred>", None),
    (f"<{EX}fred>", f"<{FOAF}givenName>", '"Fred"', None),
]


class TestDeleteData:
    def test_delete_data_existing_1(self, spark):
        got = update(
            quads(spark, DELETE_BASE),
            PFX + "DELETE DATA { ex:william foaf:knows ex:fred }",
        )
        assert store(got) == {
            (f"<{EX}william>", f"<{FOAF}givenName>", '"William"', None),
            (f"<{EX}fred>", f"<{FOAF}givenName>", '"Fred"', None),
        }

    def test_delete_data_absent_is_noop(self, spark):
        base = quads(spark, DELETE_BASE)
        got = update(
            base, PFX + "DELETE DATA { ex:nobody foaf:knows ex:fred }"
        )
        assert store(got) == store(base)

    def test_delete_where_01(self, spark):
        # dawg-delete-where-01: pattern with a variable deletes all
        # matching triples
        got = update(
            quads(spark, DELETE_BASE),
            PFX + "DELETE WHERE { ?s foaf:givenName ?n }",
        )
        assert store(got) == {
            (f"<{EX}william>", f"<{FOAF}knows>", f"<{EX}fred>", None)
        }


# ---------------------------------------------------------------------------
# delete-insert/ : the combined forms
# ---------------------------------------------------------------------------


class TestDeleteInsert:
    def test_delete_insert_01_rename(self, spark):
        # delete-insert-01: rename everybody named "Fred" — classic
        # DELETE/INSERT over one WHERE, templates against the original
        got = update(
            quads(spark, DELETE_BASE),
            PFX
            + """
            DELETE { ?p foaf:givenName 'Fred' }
            INSERT { ?p foaf:givenName 'William' }
            WHERE  { ?p foaf:givenName 'Fred' }
            """,
        )
        assert store(got) == {
            (f"<{EX}william>", f"<{FOAF}givenName>", '"William"', None),
            (f"<{EX}william>", f"<{FOAF}knows>", f"<{EX}fred>", None),
            (f"<{EX}fred>", f"<{FOAF}givenName>", '"William"', None),
        }

    def test_delete_insert_reverse_edges(self, spark):
        # swap the direction of every knows edge; where both directions
        # already exist the result is the same two edges (set semantics)
        base = [
            (_iri("a"), f"<{FOAF}knows>", _iri("b"), None),
            (_iri("b"), f"<{FOAF}knows>", _iri("a"), None),
            (_iri("a"), f"<{FOAF}knows>", _iri("c"), None),
        ]
        got = update(
            quads(spark, base),
            PFX
            + "DELETE { ?x foaf:knows ?y } INSERT { ?y foaf:knows ?x }"
            + " WHERE { ?x foaf:knows ?y }",
        )
        assert store(got) == {
            (_iri("a"), f"<{FOAF}knows>", _iri("b"), None),
            (_iri("b"), f"<{FOAF}knows>", _iri("a"), None),
            (_iri("c"), f"<{FOAF}knows>", _iri("a"), None),
        }

    def test_delete_insert_unbound_template_var_skips(self, spark):
        # a solution that leaves a template variable unbound contributes
        # no triple for that template (and must not error)
        base = [
            (_iri("a"), _iri("p"), '"1"', None),
            (_iri("b"), _iri("p"), '"2"', None),
            (_iri("a"), _iri("q"), '"x"', None),
        ]
        got = update(
            quads(spark, base),
            PFX
            + "INSERT { ?s ex:copy ?x } WHERE { ?s ex:p ?o"
            + "  OPTIONAL { ?s ex:q ?x } }",
        )
        assert store(got) == set(
            tuple(r) for r in base
        ) | {(_iri("a"), _iri("copy"), '"x"', None)}

    def test_using_restricts_where_dataset(self, spark):
        # delete-insert USING: WHERE evaluates against the USING graph
        # as the default graph; untouched graphs keep their rows
        base = [
            (_iri("a"), _iri("p"), '"def"', None),
            (_iri("a"), _iri("p"), '"g1"', _iri("g1")),
        ]
        got = update(
            quads(spark, base),
            PFX
            + "INSERT { ?s ex:seen ?o } USING ex:g1 WHERE { ?s ex:p ?o }",
        )
        assert store(got) == set(tuple(r) for r in base) | {
            (_iri("a"), _iri("seen"), '"g1"', None)
        }

    def test_using_named_scopes_graph_clause(self, spark):
        base = [
            (_iri("a"), _iri("p"), '"g1"', _iri("g1")),
            (_iri("a"), _iri("p"), '"g2"', _iri("g2")),
        ]
        got = update(
            quads(spark, base),
            PFX
            + "INSERT { ?s ex:seen ?g } USING NAMED ex:g1"
            + " WHERE { GRAPH ?g { ?s ex:p ?o } }",
        )
        assert store(got) == set(tuple(r) for r in base) | {
            (_iri("a"), _iri("seen"), _iri("g1"), None)
        }


# ---------------------------------------------------------------------------
# clear/ drop/ add/ move/ copy/
# ---------------------------------------------------------------------------


MGMT_BASE = [
    (_iri("d"), _iri("p"), '"def"', None),
    (_iri("s1"), _iri("p"), '"one"', _iri("g1")),
    (_iri("s2"), _iri("p"), '"two"', _iri("g2")),
]


class TestGraphStoreMgmt:
    def test_clear_graph_01(self, spark):
        got = update(quads(spark, MGMT_BASE), PFX + "CLEAR GRAPH ex:g1")
        assert store(got) == {
            (_iri("d"), _iri("p"), '"def"', None),
            (_iri("s2"), _iri("p"), '"two"', _iri("g2")),
        }

    def test_clear_default_01(self, spark):
        got = update(quads(spark, MGMT_BASE), "CLEAR DEFAULT")
        assert store(got) == {
            (_iri("s1"), _iri("p"), '"one"', _iri("g1")),
            (_iri("s2"), _iri("p"), '"two"', _iri("g2")),
        }

    def test_clear_all_01(self, spark):
        got = update(quads(spark, MGMT_BASE), "CLEAR ALL")
        assert store(got) == set()

    def test_drop_named_and_silent_on_missing(self, spark):
        got = update(quads(spark, MGMT_BASE), "DROP NAMED")
        assert store(got) == {(_iri("d"), _iri("p"), '"def"', None)}
        # DROP of an absent graph: graphs exist iff non-empty in our
        # store, so this is a no-op either way; SILENT must not error
        got2 = update(
            quads(spark, MGMT_BASE), PFX + "DROP SILENT GRAPH ex:nope"
        )
        assert store(got2) == set(tuple(r) for r in MGMT_BASE)

    def test_add_01(self, spark):
        # add-01: source stays, destination receives the union
        got = update(quads(spark, MGMT_BASE), PFX + "ADD ex:g1 TO ex:g2")
        assert store(got) == set(tuple(r) for r in MGMT_BASE) | {
            (_iri("s1"), _iri("p"), '"one"', _iri("g2"))
        }

    def test_add_default_to_named(self, spark):
        got = update(quads(spark, MGMT_BASE), PFX + "ADD DEFAULT TO ex:g1")
        assert store(got) == set(tuple(r) for r in MGMT_BASE) | {
            (_iri("d"), _iri("p"), '"def"', _iri("g1"))
        }

    def test_move_01_replaces_destination(self, spark):
        got = update(quads(spark, MGMT_BASE), PFX + "MOVE ex:g1 TO ex:g2")
        assert store(got) == {
            (_iri("d"), _iri("p"), '"def"', None),
            (_iri("s1"), _iri("p"), '"one"', _iri("g2")),
        }

    def test_copy_01_replaces_destination(self, spark):
        got = update(quads(spark, MGMT_BASE), PFX + "COPY ex:g1 TO ex:g2")
        assert store(got) == {
            (_iri("d"), _iri("p"), '"def"', None),
            (_iri("s1"), _iri("p"), '"one"', _iri("g1")),
            (_iri("s1"), _iri("p"), '"one"', _iri("g2")),
        }

    def test_copy_to_default_replaces_default(self, spark):
        got = update(quads(spark, MGMT_BASE), PFX + "COPY ex:g2 TO DEFAULT")
        assert store(got) == {
            (_iri("s2"), _iri("p"), '"two"', None),
            (_iri("s1"), _iri("p"), '"one"', _iri("g1")),
            (_iri("s2"), _iri("p"), '"two"', _iri("g2")),
        }


# ---------------------------------------------------------------------------
# sequences (update requests are ';'-separated, §3.1)
# ---------------------------------------------------------------------------


class TestSequences:
    def test_insert_then_delete_sees_insert(self, spark):
        empty = spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
        got = update(
            empty,
            PFX
            + """
            INSERT DATA { ex:s ex:p ex:o . ex:s ex:q ex:o };
            DELETE WHERE { ?s ex:q ?o }
            """,
        )
        assert store(got) == {(_iri("s"), _iri("p"), _iri("o"), None)}

    def test_malformed_second_op_raises(self, spark):
        empty = spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
        with pytest.raises(SparqlError):
            update(empty, PFX + "INSERT DATA { ex:s ex:p ex:o }; FROB ALL")
