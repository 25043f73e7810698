"""DESCRIBE bnode closure, D-entailment validation, serializers."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.describe import describe
from sophia_rs_spark.operators.validate import ill_typed_literals, is_ill_typed
from sophia_rs_spark.sources.serializers import (
    canonical_nquads,
    nquads_lines,
    pretty_turtle,
)

XSD = "http://www.w3.org/2001/XMLSchema#"


class TestDescribe:
    def test_bnode_closure(self, spark):
        rows = [
            ("<a>", "<p>", "_:b1", None),
            ("_:b1", "<q>", "_:b2", None),
            ("_:b2", "<r>", '"leaf"', None),
            ("<unrelated>", "<p>", "<x>", None),
        ]
        t = spark.createDataFrame(rows, "s string, p string, o string, g string")
        seeds = spark.createDataFrame([("<a>",)], "term string")
        got = {(r["s"], r["p"], r["o"]) for r in describe(t, seeds).collect()}
        assert got == {
            ("<a>", "<p>", "_:b1"),
            ("_:b1", "<q>", "_:b2"),
            ("_:b2", "<r>", '"leaf"'),
        }

    def test_bnode_cycle_terminates(self, spark):
        rows = [("_:x", "<p>", "_:y", None), ("_:y", "<p>", "_:x", None)]
        t = spark.createDataFrame(rows, "s string, p string, o string, g string")
        seeds = spark.createDataFrame([("_:x",)], "term string")
        assert describe(t, seeds).count() == 2


class TestValidate:
    def test_ill_typed_detection(self, spark):
        vals = [
            (f'"abc"^^<{XSD}integer>', True),
            (f'"42"^^<{XSD}integer>', False),
            (f'"4.5"^^<{XSD}integer>', True),
            (f'"4.5"^^<{XSD}decimal>', False),
            (f'"yes"^^<{XSD}boolean>', True),
            (f'"true"^^<{XSD}boolean>', False),
            ('"anything"', False),  # xsd:string: never ill-typed
            (f'"2020-13-01"^^<{XSD}date>', False),  # lexical-shape only check
            (f'"notadate"^^<{XSD}date>', True),
            ("<http://iri>", False),
        ]
        df = spark.createDataFrame([(v,) for v, _ in vals], "t string")
        got = {
            r["t"]: r["ill"]
            for r in df.select("t", is_ill_typed(F.col("t")).alias("ill")).collect()
        }
        for v, expected in vals:
            assert got[v] is expected, v

    def test_ill_typed_literals_over_graph(self, spark):
        rows = [
            ("<a>", "<p>", f'"nope"^^<{XSD}integer>'),
            ("<a>", "<p>", f'"7"^^<{XSD}integer>'),
        ]
        t = spark.createDataFrame(rows, "s string, p string, o string")
        got = [r["term"] for r in ill_typed_literals(t).collect()]
        assert got == [f'"nope"^^<{XSD}integer>']


class TestSerializers:
    def test_nquads_lines(self, spark):
        rows = [("<s>", "<p>", '"o"', None), ("<s>", "<p>", "<o>", "<g>")]
        df = spark.createDataFrame(rows, "s string, p string, o string, g string")
        got = sorted(r["line"] for r in nquads_lines(df).collect())
        assert got == ['<s> <p> "o" .', "<s> <p> <o> <g> ."]

    def test_tsv_mode(self, spark):
        df = spark.createDataFrame([("<s>", "<p>", '"o"')], "s string, p string, o string")
        got = nquads_lines(df, canonical=False).collect()[0]["line"]
        assert got == '<s>\t<p>\t"o"\t.'

    def test_canonical_nquads_label_invariant(self, spark):
        a = spark.createDataFrame(
            [("u", "_:x", "<p>", '"v"', None)],
            "url string, s string, p string, o string, g string",
        )
        b = spark.createDataFrame(
            [("u", "_:zz", "<p>", '"v"', None)],
            "url string, s string, p string, o string, g string",
        )
        assert canonical_nquads(a) == canonical_nquads(b) == ['_:c14n0 <p> "v" .']

    def test_pretty_turtle(self):
        triples = [
            ("<http://e/alice>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://e/Person>"),
            ("<http://e/alice>", "<http://e/name>", '"Alice"'),
            ("<http://e/alice>", "<http://e/nick>", '"al"'),
            ("<http://e/alice>", "<http://e/nick>", '"ali"'),
        ]
        txt = pretty_turtle(triples, {"e": "http://e/"})
        assert "@prefix e: <http://e/> ." in txt
        assert "e:alice a e:Person ;" in txt
        assert 'e:nick "al", "ali"' in txt
