"""P/R harness: exact scoring, isomorphism tolerance, diff output."""

import pytest

from sophia_rs_spark.operators.pr_harness import diff, precision_recall


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, s string, p string, o string, g string"
    )


def test_perfect_match(spark):
    rows = [("u1", "<a>", "<p>", '"v"', None), ("u1", "<a>", "<p>", "<b>", "<g>")]
    r = precision_recall(_df(spark, rows), _df(spark, rows))
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["pass_095"]


def test_partial_match(spark):
    golden = [("u1", "<a>", "<p>", f'"{i}"', None) for i in range(10)]
    emitted = golden[:9] + [("u1", "<a>", "<p>", '"wrong"', None)]
    r = precision_recall(_df(spark, emitted), _df(spark, golden))
    assert r["precision"] == 0.9 and r["recall"] == 0.9
    assert not r["pass_095"]
    fp, fn = diff(_df(spark, emitted), _df(spark, golden))
    assert fp.count() == 1 and fn.count() == 1


def test_isomorphism_tolerance(spark):
    # same graph, different bnode labels → perfect score WITH c14n,
    # imperfect without
    emitted = [("u1", "_:x1", "<p>", '"v"', None), ("u1", "_:x1", "<q>", "_:x2", None)]
    golden = [("u1", "_:zz", "<p>", '"v"', None), ("u1", "_:zz", "<q>", "_:ww", None)]
    r = precision_recall(_df(spark, emitted), _df(spark, golden), c14n=True)
    assert r["precision"] == 1.0 and r["recall"] == 1.0
    r2 = precision_recall(_df(spark, emitted), _df(spark, golden), c14n=False)
    assert r2["precision"] == 0.0


def test_default_graph_null_safe(spark):
    rows = [("u1", "<a>", "<p>", '"v"', None)]
    r = precision_recall(_df(spark, rows), _df(spark, rows), c14n=False)
    assert r["n_common"] == 1
