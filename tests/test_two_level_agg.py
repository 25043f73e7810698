"""Differential battery for the r6 two-level weighted aggregation.

The weighted plane (pre-aggregate to distinct (keys, values) with a
multiplicity, then Σ value×n) must produce byte-identical results to
the per-row plane for every eligible aggregate shape — including
error poisoning, empty groups, unbound elements, mixed ranks, big
integers and monster lexicals."""

import random

import pytest

import sophia_rs_spark.sparql.eval as E
from sophia_rs_spark.sparql import query
from sophia_rs_spark.terms.model import XSD


def both_planes(spark, rows, q):
    df = spark.createDataFrame(rows, "s string, p string, o string")
    res = {}
    for flag in (True, False):
        old = E._TWO_LEVEL_AGG
        E._TWO_LEVEL_AGG = flag
        try:
            out = query(df, q)
            res[flag] = sorted(
                tuple(r[c] for c in sorted(out.columns)) for r in out.collect()
            )
        finally:
            E._TWO_LEVEL_AGG = old
    return res[True], res[False]


AGG_Q = """
SELECT ?k (COUNT(*) AS ?all) (COUNT(?v) AS ?n) (SUM(?v) AS ?s)
       (AVG(?v) AS ?a) (MIN(?v) AS ?mn) (MAX(?v) AS ?mx)
WHERE { ?x <http://e/k> ?k . OPTIONAL { ?x <http://e/v> ?v } }
GROUP BY ?k
"""


def _lit(v, dt="integer"):
    return f'"{v}"^^<{XSD}{dt}>'


def test_weighted_matches_perrow_random(spark):
    rng = random.Random(42)
    rows = []
    vals = (
        [_lit(rng.randint(-50, 50)) for _ in range(8)]
        + [_lit(f"{rng.randint(0, 99)}.{rng.randint(0, 99)}", "decimal")]
        + [_lit("123456789012345678901234567890123456789012345678901234567890" * 3)]
        + [_lit("1.5e1", "double"), _lit("NaN", "double"), _lit("2.5", "float")]
    )
    for i in range(400):
        k = f'"g{rng.randint(0, 4)}"'
        x = f"<http://e/x{i}>"
        rows.append((x, "<http://e/k>", k))
        if rng.random() < 0.9:
            rows.append((x, "<http://e/v>", rng.choice(vals)))
    w, p = both_planes(spark, rows, AGG_Q)
    assert w == p, (w, p)


def test_weighted_matches_perrow_poison(spark):
    # one group has a non-numeric element (poisons SUM/AVG/MIN-order),
    # one group only unbound ?v (COUNT 0, SUM poisoned by NULL rank)
    rows = [
        ("<http://e/a>", "<http://e/k>", '"g0"'),
        ("<http://e/a>", "<http://e/v>", _lit(5)),
        ("<http://e/b>", "<http://e/k>", '"g0"'),
        ("<http://e/b>", "<http://e/v>", '"oops"'),
        ("<http://e/c>", "<http://e/k>", '"g1"'),
    ]
    w, p = both_planes(spark, rows, AGG_Q)
    assert w == p, (w, p)


def test_weighted_matches_perrow_duplicates_and_monsters(spark):
    # heavy duplication (the case the pre-aggregation collapses) plus a
    # monster (>10 fraction digits) appearing with multiplicity > 1
    monster = _lit("0." + "1" * 25, "decimal")
    rows = []
    for i in range(300):
        x = f"<http://e/x{i}>"
        rows.append((x, "<http://e/k>", '"g0"'))
        rows.append((x, "<http://e/v>", _lit(7)))
    for i in range(3):
        x = f"<http://e/m{i}>"
        rows.append((x, "<http://e/k>", '"g0"'))
        rows.append((x, "<http://e/v>", monster))
    w, p = both_planes(spark, rows, AGG_Q)
    assert w == p, (w, p)
    # SUM = 300*7 + 3*0.111… — check the exact decimal came through
    s = [t for t in w[0]]
    assert any("2100.3" in str(x) for x in s), s


def test_group_concat_and_distinct_fall_back(spark):
    # multiplicities must survive GROUP_CONCAT (per-row path) and
    # DISTINCT aggregates; both are ineligible for the weighted plane,
    # so the flag must make no difference
    rows = [
        ("<http://e/a>", "<http://e/k>", '"g0"'),
        ("<http://e/a>", "<http://e/v>", '"x"'),
        ("<http://e/b>", "<http://e/k>", '"g0"'),
        ("<http://e/b>", "<http://e/v>", '"x"'),
    ]
    q = (
        "SELECT ?k (GROUP_CONCAT(?v; SEPARATOR=\",\") AS ?c) "
        "(COUNT(DISTINCT ?v) AS ?d) WHERE { ?x <http://e/k> ?k . "
        "?x <http://e/v> ?v } GROUP BY ?k"
    )
    w, p = both_planes(spark, rows, q)
    assert w == p == [('"x,x"', '"1"^^<%sinteger>' % XSD, '"g0"')], (w, p)
