"""Equivalence battery for the r6 suffix-dispatch numeric probe.

The probe (FN.num_term_probe / num_lex_at / num_rank_probe /
int_lex_valid / dec_lex_valid) replaces the regex-based
datatype()+lex_num()+num_rank_parts() decomposition on the SUM/AVG and
comparison hot paths; this pins exact equivalence over an adversarial
term battery (every numeric datatype, invalid lexicals, escapes,
multi-byte, lookalike datatypes, non-literals)."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.functions import sparql_fns as FN
from sophia_rs_spark.terms.model import XSD

TERMS = [
    # valid numerics, every datatype
    '"0"^^<%sinteger>' % XSD,
    '"-42"^^<%sinteger>' % XSD,
    '"+7"^^<%sinteger>' % XSD,
    '"00123"^^<%sinteger>' % XSD,
    '"12345678901234567890123456789012345678901"^^<%sinteger>' % XSD,
    '"1.5"^^<%sdecimal>' % XSD,
    '"-0.0"^^<%sdecimal>' % XSD,
    '".5"^^<%sdecimal>' % XSD,
    '"5."^^<%sdecimal>' % XSD,
    '"+.5"^^<%sdecimal>' % XSD,
    '"1e3"^^<%sdouble>' % XSD,
    '"INF"^^<%sdouble>' % XSD,
    '"-INF"^^<%sfloat>' % XSD,
    '"NaN"^^<%sdouble>' % XSD,
    '"3.25"^^<%sfloat>' % XSD,
    '"5"^^<%sint>' % XSD,
    '"5"^^<%slong>' % XSD,
    '"5"^^<%sshort>' % XSD,
    '"5"^^<%sbyte>' % XSD,
    '"5"^^<%snonNegativeInteger>' % XSD,
    '"5"^^<%spositiveInteger>' % XSD,
    '"-5"^^<%snegativeInteger>' % XSD,
    '"-5"^^<%snonPositiveInteger>' % XSD,
    '"5"^^<%sunsignedLong>' % XSD,
    '"5"^^<%sunsignedInt>' % XSD,
    '"5"^^<%sunsignedShort>' % XSD,
    '"5"^^<%sunsignedByte>' % XSD,
    # invalid lexicals under numeric datatypes
    '"abc"^^<%sinteger>' % XSD,
    '"1.5"^^<%sinteger>' % XSD,
    '"1 2"^^<%sinteger>' % XSD,
    '" 12"^^<%sinteger>' % XSD,
    '"12 "^^<%sinteger>' % XSD,
    '"+"^^<%sinteger>' % XSD,
    '"-"^^<%sdecimal>' % XSD,
    '"."^^<%sdecimal>' % XSD,
    '"+."^^<%sdecimal>' % XSD,
    '"1-2"^^<%sinteger>' % XSD,
    '"12+"^^<%sinteger>' % XSD,
    '"1.2.3"^^<%sdecimal>' % XSD,
    '"5.+3"^^<%sdecimal>' % XSD,
    '".+5"^^<%sdecimal>' % XSD,
    '"1e3"^^<%sdecimal>' % XSD,
    '"INF"^^<%sinteger>' % XSD,
    '"12€"^^<%sinteger>' % XSD,
    '"１２"^^<%sinteger>' % XSD,  # fullwidth digits
    '"1\\n2"^^<%sinteger>' % XSD,
    '"1\\"2"^^<%sinteger>' % XSD,
    '"a\\\\"^^<%sinteger>' % XSD,
    # INF/NaN under non-fp numeric datatypes, empty lexicals
    '""^^<%sinteger>' % XSD,
    '""^^<%sdecimal>' % XSD,
    '""^^<%sdouble>' % XSD,
    # non-numeric / lookalike datatypes
    '"5"^^<%sstring>' % XSD,
    '"5"^^<http://example.org/myinteger>',
    '"5"^^<http://example.org/vocinteger>',
    '"5"^^<http://example.org/#integer>',  # wrong namespace, same local
    '"5"^^<%sintege>' % XSD,
    '"5"^^<%sintegerr>' % XSD,
    # plain/tagged literals whose LEXICAL mimics a numeric suffix
    '"5"',
    '"5"@en',
    '"5"@en--ltr',
    '"5^^<%sinteger>"' % XSD,
    '"x"^^<%sinteger>extra' % XSD,  # junk after suffix (non-canonical)
    # non-literals
    "<http://example.org/x#integer>",
    "_:b0",
    '<<( <http://e/s> <http://e/p> "5"^^<%sinteger> )>>' % XSD,
    # pathological
    '"',
    '"^^<%sinteger>' % XSD,
    "",
]


@pytest.fixture(scope="module")
def term_df(spark):
    return spark.createDataFrame([(t,) for t in TERMS], "t string")


def test_num_probe_equivalence(term_df):
    cs = F.col("t")
    probe = FN.num_term_probe(cs)
    lex_fast = FN.num_lex_at(cs, probe["w"])
    rank_fast = FN.num_rank_probe(probe["k"], lex_fast)
    rank_ref = FN.num_rank_parts(FN.datatype(cs), FN.lex_num(cs))
    rows = term_df.select(
        "t",
        rank_fast.alias("rf"),
        rank_ref.alias("rr"),
        lex_fast.alias("lf"),
        FN.lex_num(cs).alias("lr"),
    ).collect()
    for r in rows:
        assert r["rf"] == r["rr"], f"rank mismatch for {r['t']!r}: {r['rf']} vs {r['rr']}"
        if r["rf"] is not None:
            # the lexical only feeds consumers gated on a non-NULL rank
            assert r["lf"] == r["lr"], f"lex mismatch for {r['t']!r}"


def test_lex_valid_equivalence(spark):
    lexes = [
        "", "0", "5", "-5", "+5", "007", "+", "-", ".", "+.", "-.",
        "1.5", ".5", "5.", "-0.0", "+.5", "1.2.3", "5.+3", ".+5",
        "1-2", "12+", "1 2", " 12", "12 ", "abc", "1e3", "INF", "-INF",
        "NaN", "12€", "１２", "1\n2", "\t5", "5\t", "--5", "++5", "-+5",
        "5-", "5.", "-.5", "0.", ".0",
    ]
    df = spark.createDataFrame([(x,) for x in lexes], "l string")
    rows = df.select(
        "l",
        FN.int_lex_valid(F.col("l")).alias("iv"),
        F.col("l").rlike(FN._INT_LEX_RE).alias("ir"),
        FN.dec_lex_valid(F.col("l")).alias("dv"),
        F.col("l").rlike(FN._DEC_LEX_RE).alias("dr"),
    ).collect()
    for r in rows:
        assert bool(r["iv"]) == bool(r["ir"]), f"int validity mismatch for {r['l']!r}"
        assert bool(r["dv"]) == bool(r["dr"]), f"dec validity mismatch for {r['l']!r}"


def test_cmp_probe_iri_lookalike(spark):
    """An IRI/bnode whose text ends in '"^^<xsd:integer>' must not rank
    numeric in FILTER comparisons (the probe is guarded to literals)."""
    from sophia_rs_spark.sparql import query

    rows = [
        ("<http://e/a>", "<http://e/p>", '"5"^^<%sinteger>' % XSD),
        ("<http://e/b>", "<http://e/p>", '<http://e/x5"^^<%sinteger>' % XSD),
        ("<http://e/c>", "<http://e/p>", '_:b5"^^<%sinteger>' % XSD),
        ("<http://e/d>", "<http://e/p>", '"12"'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    out = query(df, "SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(?o > 3) }")
    got = sorted(r["s"] for r in out.collect())
    # only the real numeric literal survives: the IRI/bnode lookalikes
    # and the plain string are cross-family type errors
    assert got == ["<http://e/a>"], got


def test_cmp_probe_matrix(spark):
    """Comparison results over mixed numeric operand shapes are
    unchanged by the probe fast path (spot matrix)."""
    from sophia_rs_spark.sparql import query

    vals = [
        '"5"^^<%sinteger>' % XSD,
        '"5.0"^^<%sdecimal>' % XSD,
        '"5e0"^^<%sdouble>' % XSD,
        '"NaN"^^<%sdouble>' % XSD,
        '"INF"^^<%sfloat>' % XSD,
        '"99999999999999999999999999999999"^^<%sinteger>' % XSD,
        '"-99999999999999999999999999999998"^^<%sinteger>' % XSD,
        '"abc"^^<%sinteger>' % XSD,
        '"5"',
        "<http://e/i>",
    ]
    rows = [(f"<http://e/s{i}>", "<http://e/p>", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    gt = query(df, 'SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(?o > "4.5"^^<http://www.w3.org/2001/XMLSchema#decimal>) }')
    got = sorted(r["s"] for r in gt.collect())
    assert got == [
        "<http://e/s0>", "<http://e/s1>", "<http://e/s2>",
        "<http://e/s4>", "<http://e/s5>",
    ], got
    lt = query(df, 'SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(?o < "4.5"^^<http://www.w3.org/2001/XMLSchema#decimal>) }')
    got = sorted(r["s"] for r in lt.collect())
    assert got == ["<http://e/s6>"], got
    eq = query(df, "SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(?o = 5) }")
    got = sorted(r["s"] for r in eq.collect())
    assert got == ["<http://e/s0>", "<http://e/s1>", "<http://e/s2>"], got
