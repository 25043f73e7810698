"""Generalized TriG tests mirroring the reference corpus
(`turtle/src/test.rs:262-330` GTRIG_SAMPLES): any term kind anywhere +
variables; strict mode quarantines."""

import pytest

from sophia_rs_spark.sources.turtle import parse_turtle_document

U = "https://site0.example.org/page/3"

GTRIG_SAMPLES = [
    (
        "all bnodes",
        """
      _:b01 _:b02 _:b03 ~ _:b04.
      _:b05 { _:b06 _:b07 _:b08 }
      GRAPH _:b09 { _:b10 _:b11 _:b12 }
      << _:b13 _:b14 _:b15 ~ _:b16 >> _:b17 <<( _:b18 _:b19 _:b20 )>>.
      _:b21 _:b22 ( _:b23 _:b24 ).
    """,
        11,
    ),
    (
        "all anon",
        """
      [] [] [] ~ [].
      [] { [] [] [] }
      GRAPH [] { [] [] [] }
      << [] [] [] ~ [] >> [] <<( [] [] [] )>>.
      [] [] ( [] [] ).
    """,
        11,
    ),
    (
        "all strings",
        '''
      "s01" "s02" "s03" ~ "s04".
      "s05" { "s06" "s07" "s08" }
      GRAPH "s09" { "s10" "s11" "s12" }
      << "s13" "s14" "s15" ~ "s16" >> "s17" <<( "s18" "s19" "s20" )>>.
      "s21" "s22" ( "s23" "s24" ).
    ''',
        11,
    ),
    (
        "all numbers",
        """
      .01 .02 .03 ~ .04.
      .05 { .06 .07 .08 }
      GRAPH .09 { .10 .11 .12 }
      << .13 .14 .15 ~ .16 >> .17 <<( .18 .19 .20 )>>.
      .21 .22 ( .23 .24 ).
    """,
        11,
    ),
    (
        "all variables",
        """
      ?v01 ?v02 ?v03 ~ ?v04.
      ?v05 { ?v06 ?v07 ?v08 }
      GRAPH ?v09 { ?v10 ?v11 ?v12 }
      << ?v13 ?v14 ?v15 ~ ?v16 >> ?v17 <<( ?v18 ?v19 ?v20 )>>.
      ?v21 ?v22 ( ?v23 ?v24 ).
    """,
        11,
    ),
    (
        "all triple terms",
        """
      <<( ?s ?p ?o01 )>> <<( ?s ?p ?o02 )>> <<( ?s ?p ?o03 )>> ~ <<( ?s ?p ?o04 )>>.
      <<( ?s ?p ?o05 )>> { <<( ?s ?p ?o06 )>> <<( ?s ?p ?o07 )>> <<( ?s ?p ?o08 )>> }
      GRAPH <<( ?s ?p ?o09 )>> { <<( ?s ?p ?o10 )>> <<( ?s ?p ?o11 )>> <<( ?s ?p ?o12 )>> }
      << <<( ?s ?p ?o13 )>> <<( ?s ?p ?o14 )>> <<( ?s ?p ?o15 )>> ~ <<( ?s ?p ?o16 )>> >> <<( ?s ?p ?o17 )>> <<( <<( ?s ?p ?o18 )>> <<( ?s ?p ?o19 )>> <<( ?s ?p ?o20 )>> )>>.
      <<( ?s ?p ?o21 )>> <<( ?s ?p ?o22 )>> ( <<( ?s ?p ?o23 )>> <<( ?s ?p ?o24 )>> ).
    """,
        11,
    ),
]


@pytest.mark.parametrize("name,doc,expected", GTRIG_SAMPLES)
def test_gtrig_samples(name, doc, expected):
    rows = parse_turtle_document(U, doc, quads=True, generalized=True)
    good = [r for r in rows if r[5] is None]
    errs = [r for r in rows if r[5] is not None]
    assert not errs, (name, errs)
    assert len(good) == expected, (name, len(good), good)


def test_strict_mode_rejects_generalized():
    rows = parse_turtle_document(U, '"s" "p" "o".', quads=True, generalized=False)
    assert any(r[5] is not None for r in rows)


def test_variable_encoding():
    rows = parse_turtle_document(U, "?s ?p ?o.", generalized=True)
    assert rows[0][1] == "?s" and rows[0][2] == "?p" and rows[0][3] == "?o"


def test_generalized_graph_label_variable():
    rows = parse_turtle_document(U, "?g { ?s ?p ?o }", quads=True, generalized=True)
    assert rows[0][4] == "?g"


def test_speculative_label_rollback_keeps_determinism():
    # "[ :p :o ] :q :r." starts like a graph label but isn't; anon labels
    # must be identical to a parse without the failed speculation
    doc = "PREFIX : <http://e/>\n[ :p :o ] :q :r."
    trig = parse_turtle_document(U, doc, quads=True)
    ttl = parse_turtle_document(U, doc, quads=False)
    assert [(r[1], r[2], r[3]) for r in trig] == [(r[1], r[2], r[3]) for r in ttl]
