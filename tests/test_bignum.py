"""Arbitrary-precision integer plane (r3 VERDICT missing #2).

The reference promotes integers that overflow the native word to BigInt
(`sparql/src/value/_number.rs:5-11`, `try_parse_integer` at :70-77) and
keeps arithmetic exact.  Here integers beyond the decimal(38,10) plane
ride a NULL-masked string plane with exact Python-int arithmetic in an
Arrow-batched UDF (`functions/sparql_fns.py:bigop`) — engaged only for
the overflowing rows, so the common path stays JVM-side.
"""

import pytest

from sophia_rs_spark.sparql import query

XI = '"^^<http://www.w3.org/2001/XMLSchema#integer>'
XD = '"^^<http://www.w3.org/2001/XMLSchema#decimal>'
BIG = "9" * 40

CASES = [
    # parse + emit passthrough of a 40-digit literal
    (f"SELECT (?x AS ?a) {{ VALUES ?x {{ {BIG} }} }}", f'"{BIG}{XI}', "passthrough"),
    # exact big + small
    (f"SELECT (?x + 1 AS ?a) {{ VALUES ?x {{ {BIG} }} }}",
     '"1' + "0" * 40 + XI, "add small"),
    # overflow arising from small operands (10^20 * 10^20)
    ("SELECT (?x * ?x AS ?a) { VALUES ?x { %s } }" % ("1" + "0" * 20),
     '"1' + "0" * 40 + XI, "mul overflow"),
    (f"SELECT (?x - {BIG} AS ?a) {{ VALUES ?x {{ {BIG} }} }}", '"0' + XI, "sub to zero"),
    (f"SELECT (-?x AS ?a) {{ VALUES ?x {{ {BIG} }} }}", f'"-{BIG}{XI}', "neg"),
    (f"SELECT (ABS(-?x) AS ?a) {{ VALUES ?x {{ {BIG} }} }}", f'"{BIG}{XI}', "abs"),
    (f"SELECT (CEIL(?x) AS ?a) {{ VALUES ?x {{ {BIG} }} }}", f'"{BIG}{XI}', "ceil identity"),
    # big/big division → exact decimal
    (f"SELECT (?x / ?x AS ?a) {{ VALUES ?x {{ {BIG} }} }}", '"1.0' + XD, "div exact"),
    (f"SELECT (?x / 0 AS ?a) {{ VALUES ?x {{ {BIG} }} }}", None, "div zero err"),
    # non-canonical lexical normalized on the way through
    ('SELECT (?x + 0 AS ?a) { VALUES ?x { "0000%s"^^xsd:integer } }' % BIG,
     f'"{BIG}{XI}', "canon leading zeros"),
    (f"SELECT (?x + 1 - 1 AS ?a) {{ VALUES ?x {{ {BIG} }} }}", f'"{BIG}{XI}', "chained"),
    # the small-int fast path is untouched
    ("SELECT (2 + 3 AS ?a) { }", '"5' + XI, "small add"),
    ("SELECT (2.5 * 2 AS ?a) { }", '"5.0' + XD, "small mul decimal"),
    ("SELECT (7 / 2 AS ?a) { }", '"3.5' + XD, "small div"),
    # FILTER over a big literal must not crash (double-approx compare)
    (f"SELECT (1 AS ?a) {{ VALUES ?x {{ {BIG} }} FILTER(?x > 0) }}", '"1' + XI, "filter big"),
    # mixed big∘double promotes to double (approximate, like reference
    # BigInt→f64 coercion)
    (f"SELECT (?x * 1e0 AS ?a) {{ VALUES ?x {{ {BIG} }} }}",
     '"1e40"^^<http://www.w3.org/2001/XMLSchema#double>', "big times double"),
]


@pytest.fixture(scope="module")
def unit(spark):
    return spark.createDataFrame(
        [("<x:a>", "<x:p>", '"o"')], "s string, p string, o string"
    )


@pytest.mark.parametrize("q,exp,name", CASES, ids=[c[2] for c in CASES])
def test_bignum_battery(unit, q, exp, name):
    got = query(
        unit, "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> " + q
    ).collect()
    assert len(got) == 1
    assert got[0]["a"] == exp, name


def test_bigop_masked_inputs_stay_null(unit):
    # the common path: small ints only — the big plane's UDF inputs are
    # all NULL and the result is identical to the pure-JVM plane
    got = query(
        unit,
        "SELECT (?x * ?y AS ?a) { VALUES (?x ?y) { (6 7) (-2 3) } }",
    ).collect()
    assert sorted(r["a"] for r in got) == ['"-6' + XI, '"42' + XI]
