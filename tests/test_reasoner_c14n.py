"""RDFS saturation (reasoner/src/ruleset/_rdfs.rs) and RDFC-1.0
canonicalization / isomorphism (c14n, isomorphism crates) tests."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.c14n import (
    canonical_mapping,
    canonicalize,
    canonicalize_by_url,
    isomorphic,
    relabel,
)
from sophia_rs_spark.operators.reasoner import (
    T_DOMAIN,
    T_RANGE,
    T_SUBCLASS,
    T_SUBPROP,
    T_TYPE,
    entails,
    rdfs_saturate,
    transitive_closure,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


class TestReasoner:
    def test_transitive_closure_chain(self, spark):
        pairs = spark.createDataFrame(
            [("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<d>")], "s string, o string"
        )
        got = {(r["s"], r["o"]) for r in transitive_closure(pairs).collect()}
        assert got == {
            ("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<d>"),
            ("<a>", "<c>"), ("<b>", "<d>"), ("<a>", "<d>"),
        }

    def test_rdfs9_subclass_inheritance(self, spark):
        t = _df(
            spark,
            [
                ("<x>", T_TYPE, "<C1>"),
                ("<C1>", T_SUBCLASS, "<C2>"),
                ("<C2>", T_SUBCLASS, "<C3>"),
            ],
        )
        sat = rdfs_saturate(t)
        got = {(r["s"], r["o"]) for r in sat.filter(F.col("p") == T_TYPE).collect()}
        assert ("<x>", "<C2>") in got and ("<x>", "<C3>") in got

    def test_rdfs7_subproperty(self, spark):
        t = _df(
            spark,
            [("<s>", "<p1>", "<o>"), ("<p1>", T_SUBPROP, "<p2>")],
        )
        sat = rdfs_saturate(t)
        assert sat.filter(
            (F.col("s") == "<s>") & (F.col("p") == "<p2>") & (F.col("o") == "<o>")
        ).count() == 1

    def test_rdfs2_domain_rdfs3_range(self, spark):
        t = _df(
            spark,
            [
                ("<s>", "<p>", "<o>"),
                ("<p>", T_DOMAIN, "<D>"),
                ("<p>", T_RANGE, "<R>"),
            ],
        )
        sat = rdfs_saturate(t)
        types = {
            (r["s"], r["o"]) for r in sat.filter(F.col("p") == T_TYPE).collect()
        }
        assert ("<s>", "<D>") in types and ("<o>", "<R>") in types

    def test_range_not_applied_to_literals(self, spark):
        t = _df(
            spark,
            [("<s>", "<p>", '"lit"'), ("<p>", T_RANGE, "<R>")],
        )
        sat = rdfs_saturate(t)
        assert sat.filter(
            (F.col("s") == '"lit"') & (F.col("p") == T_TYPE)
        ).count() == 0

    def test_chained_inference(self, spark):
        # subPropertyOf then domain of the super-property
        t = _df(
            spark,
            [
                ("<s>", "<p1>", "<o>"),
                ("<p1>", T_SUBPROP, "<p2>"),
                ("<p2>", T_DOMAIN, "<D>"),
            ],
        )
        sat = rdfs_saturate(t)
        assert sat.filter(
            (F.col("s") == "<s>") & (F.col("p") == T_TYPE) & (F.col("o") == "<D>")
        ).count() == 1

    def test_entails(self, spark):
        g = _df(
            spark,
            [("<x>", T_TYPE, "<C1>"), ("<C1>", T_SUBCLASS, "<C2>")],
        )
        q_yes = _df(spark, [("<x>", T_TYPE, "<C2>")])
        q_no = _df(spark, [("<x>", T_TYPE, "<C9>")])
        assert entails(g, q_yes)
        assert not entails(g, q_no)


class TestC14n:
    def test_no_bnodes_identity(self):
        qs = [("<s>", "<p>", "<o>", None), ("<s>", "<p>", '"x"', "<g>")]
        assert relabel(qs) == qs
        assert canonicalize(qs) == sorted(
            ["<s> <p> <o> .", '<s> <p> "x" <g> .']
        )

    def test_unique_bnodes(self):
        qs = [("_:x", "<p>", '"1"', None), ("_:y", "<p>", '"2"', None)]
        m = canonical_mapping(qs)
        assert set(m.keys()) == {"_:x", "_:y"}
        assert sorted(m.values()) == ["c14n0", "c14n1"]

    def test_label_invariance(self):
        a = [("_:x", "<p>", "_:y", None), ("_:y", "<p>", '"v"', None)]
        b = [("_:n1", "<p>", "_:n2", None), ("_:n2", "<p>", '"v"', None)]
        assert canonicalize(a) == canonicalize(b)

    def test_symmetric_bnodes_need_ndegree(self):
        # two interchangeable-looking bnodes distinguished only by links
        a = [
            ("_:a", "<p>", "_:b", None),
            ("_:b", "<p>", "_:a", None),
            ("_:a", "<q>", '"1"', None),
        ]
        b = [
            ("_:u", "<p>", "_:v", None),
            ("_:v", "<p>", "_:u", None),
            ("_:u", "<q>", '"1"', None),
        ]
        assert canonicalize(a) == canonicalize(b)

    def test_isomorphic_positive_negative(self):
        a = [("_:x", "<p>", '"v"', None)]
        b = [("_:zz", "<p>", '"v"', None)]
        c = [("_:zz", "<p>", '"w"', None)]
        assert isomorphic(a, b)
        assert not isomorphic(a, c)

    def test_fully_symmetric_cycle(self):
        # 2-cycle with no distinguishing features: permutation exploration
        a = [("_:a", "<p>", "_:b", None), ("_:b", "<p>", "_:a", None)]
        b = [("_:q", "<p>", "_:r", None), ("_:r", "<p>", "_:q", None)]
        assert canonicalize(a) == canonicalize(b)
        assert len(canonical_mapping(a)) == 2

    def test_spark_canonicalize_by_url(self, spark):
        rows = [
            ("u1", "_:h1", "<p>", '"v"', None),
            ("u1", "_:h1", "<q>", "_:h2", None),
            ("u2", "_:zz", "<p>", '"v"', None),
        ]
        df = spark.createDataFrame(
            rows, "url string, s string, p string, o string, g string"
        )
        out = canonicalize_by_url(df)
        got = {(r["url"], r["s"], r["p"], r["o"]) for r in out.collect()}
        assert ("u1", "_:c14n0", "<p>", '"v"') in got or ("u1", "_:c14n1", "<p>", '"v"') in got
        assert ("u2", "_:c14n0", "<p>", '"v"') in got
