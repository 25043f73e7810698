"""NT/NQ parser tests mirroring the reference sample corpora
(`turtle/src/test.rs:4-81` NT_SAMPLES / NQ_SAMPLES / GNQ_SAMPLES)."""

import pandas as pd
import pytest

from sophia_rs_spark.sources.ntparser import parse_nx_batch, parse_nx_document

U = "https://site0.example.org/page/1"

NT_SAMPLES = [
    ("empty", "", 0),
    ("comment", "# a comment", 0),
    ("version", 'VERSION "1.2"', 0),
    ("triple i i i", "<x:s> <x:p> <x:o>.              ", 1),
    ("triple b i i", "_:s   <x:p> <x:o>.              ", 1),
    ("triple i i b", "<x:s> <x:p> _:o.                ", 1),
    ("triple b i b", "_:s   <x:p> _:o.                ", 1),
    ("triple i i l", '<x:s> <x:p> "o".                ', 1),
    ("triple b i l", '_:s   <x:p> "o".                ', 1),
    ("triple i i ld", '<x:s> <x:p> "o"^^<x:d>.         ', 1),
    ("triple b i ld", '_:s   <x:p> "o"^^<x:d>.         ', 1),
    ("triple i i ll", '<x:s> <x:p> "o"@en-UK.          ', 1),
    ("triple b i ll", '_:s   <x:p> "o"@en-UK.          ', 1),
    ("triple i i lb", '<x:s> <x:p> "o"@en-UK--ltr.     ', 1),
    ("triple b i lb", '_:s   <x:p> "o"@en-UK--rtl.     ', 1),
    ("triple i i t", '<x:s> <x:p> <<(_:a <x:b> "c")>>.', 1),
    ("triple b i t", '_:s   <x:p> <<(_:a <x:b> "c")>>.', 1),
    ("escape useless", '<x:s> <x:p> "\\u006f".', 1),
]


@pytest.mark.parametrize("name,doc,expected", NT_SAMPLES)
def test_nt_samples(name, doc, expected):
    rows = parse_nx_document(U, doc)
    good = [r for r in rows if r[5] is None]
    errs = [r for r in rows if r[5] is not None]
    assert len(good) == expected, (name, rows)
    assert not errs, (name, rows)


def test_escape_torture():
    doc = '<x:s> <x:p> "\\u0001\\t\\n\\r\\"\\\\\\u000B".'
    rows = parse_nx_document(U, doc)
    assert rows[0][5] is None
    # canonical re-encoding of the unescaped lexical form
    assert rows[0][3] == '"\\u0001\\t\\n\\r\\"\\\\\\u000B"'


def test_useless_escape_normalized():
    rows = parse_nx_document(U, '<x:s> <x:p> "\\u006f".')
    assert rows[0][3] == '"o"'


def test_lang_tag_canonical_lowercase():
    rows = parse_nx_document(U, '<x:s> <x:p> "o"@en-UK.')
    assert rows[0][3] == '"o"@en-uk'
    rows = parse_nx_document(U, '<x:s> <x:p> "o"@en-UK--ltr.')
    assert rows[0][3] == '"o"@en-uk--ltr'


def test_xsd_string_implicit():
    rows = parse_nx_document(
        U, '<x:s> <x:p> "o"^^<http://www.w3.org/2001/XMLSchema#string>.'
    )
    assert rows[0][3] == '"o"'


def test_skolemization_deterministic_and_url_scoped():
    r1 = parse_nx_document(U, "_:a <x:p> _:b.")
    r2 = parse_nx_document(U, "_:a <x:p> _:b.")
    r3 = parse_nx_document(U + "x", "_:a <x:p> _:b.")
    assert r1 == r2
    assert r1[0][1].startswith("_:h") and len(r1[0][1]) == 2 + 17
    assert r1[0][1] != r3[0][1]
    # same label same doc → same skolem; different labels differ
    assert r1[0][1] != r1[0][3]


def test_skolemization_inside_triple_terms():
    r = parse_nx_document(U, '<x:s> <x:p> <<(_:a <x:b> "c")>>.')
    assert "_:h" in r[0][3]


def test_preserve_bn_labels():
    r = parse_nx_document(U, "_:a <x:p> _:b.", preserve_bn_labels=True)
    assert r[0][1] == "_:a" and r[0][3] == "_:b"


def test_errors_quarantined_with_position():
    rows = parse_nx_document(U, "<x:s> <x:p> .")
    assert rows[0][5] is not None and "L1" in rows[0][5]
    rows = parse_nx_document(U, '<x:s> "lit" <x:o>.')
    assert rows[0][5] is not None
    rows = parse_nx_document(U, "<x:s> <x:p> <x:o>")  # missing dot
    assert rows[0][5] is not None
    # error on line 2 only; line 1 still parses
    rows = parse_nx_document(U, "<x:s> <x:p> <x:o>.\nbad")
    assert rows[0][5] is None and rows[1][5] is not None and "L2" in rows[1][5]


def test_nt_rejects_graph_name():
    rows = parse_nx_document(U, "<x:s> <x:p> <x:o> <x:g>.")
    assert rows[0][5] is not None


NQ_GRAPHS = ["<x:g>", "_:g", None]


@pytest.mark.parametrize("g", NQ_GRAPHS)
def test_nq_samples(g):
    line = f"<x:s> <x:p> <x:o> {g}." if g else "<x:s> <x:p> <x:o>."
    rows = parse_nx_document(U, line, quads=True)
    assert rows[0][5] is None
    if g is None:
        assert rows[0][4] is None
    elif g == "<x:g>":
        assert rows[0][4] == "<x:g>"
    else:
        assert rows[0][4].startswith("_:h")


GNQ_SAMPLES = [
    ("triple of bnodes", "_:s _:p _:o.", 1),
    ("triple of literals", '"s" "p" "o".', 1),
    (
        "triple of triple terms",
        '<<(<x:s> <x:p> <x:o>)>> <<(_:s _:p _:o)>> <<("s" "p" "o")>>.',
        1,
    ),
    ("triple of variables", "?s ?p ?o.", 1),
    ("quad of bnodes", "_:s _:p _:o _:g.", 1),
    ("quad of literals", '"s" "p" "o" "g".', 1),
    (
        "quad of triple terms",
        '<<(<x:s> <x:p> <x:o>)>> <<(_:s _:p _:o)>> <<("s" "p" "o")>> <<( ?s ?p ?o)>>.',
        1,
    ),
    ("quad of variables", "?s ?p ?o ?g.", 1),
    (
        "nested generalized triple term",
        '<<( <<(<x:s> <x:p> <x:o>)>> <<(_:s _:p _:o)>> <<("s" "p" "o")>> )>> ?p ?o.',
        1,
    ),
]


@pytest.mark.parametrize("name,doc,expected", GNQ_SAMPLES)
def test_gnq_samples(name, doc, expected):
    rows = parse_nx_document(U, doc, generalized=True)
    good = [r for r in rows if r[5] is None]
    assert len(good) == expected, (name, rows)


@pytest.mark.parametrize("name,doc,expected", GNQ_SAMPLES)
def test_strict_mode_quarantines_generalized(name, doc, expected):
    rows = parse_nx_document(U, doc, quads=True)
    good = [r for r in rows if r[5] is None]
    assert len(good) == 0, (name, rows)


def test_batch_matches_document_parse():
    docs = {
        "u1": "<x:s> <x:p> <x:o>.\n" + '<x:s> <x:p> "o"@en-UK.\n_:a <x:p> _:b.',
        "u2": '_:b <x:p> "x\\n".\n# c\n\nbad line here',
        "u3": 'VERSION "1.2"\n<x:s> <x:p> <<(_:a <x:b> "c")>>.',
    }
    pdf = pd.DataFrame({"url": list(docs), "text": list(docs.values())})
    out = parse_nx_batch(pdf)
    for url, text in docs.items():
        expected = parse_nx_document(url, text)
        got = out[out.url == url]
        got_rows = [tuple(r) for r in got[["line", "s", "p", "o", "g", "error"]].itertuples(index=False)]
        assert sorted(got_rows, key=str) == sorted(expected, key=str), url


def test_batch_fast_and_slow_paths_agree():
    # the same logical triple through fast path (no escapes) and slow path
    # (with a useless escape) must produce identical canonical output
    fast = parse_nx_batch(pd.DataFrame({"url": [U], "text": ['<x:s> <x:p> "o".']}))
    slow = parse_nx_batch(pd.DataFrame({"url": [U], "text": ['<x:s> <x:p> "\\u006f".']}))
    assert fast.o[0] == slow.o[0] == '"o"'


def test_batch_empty():
    out = parse_nx_batch(pd.DataFrame({"url": [], "text": []}))
    assert list(out.columns) == ["url", "line", "s", "p", "o", "g", "error"]
    assert len(out) == 0


def test_fast_slow_path_canonical_parity_del_fffe():
    """ADVICE r1: raw DEL / U+FFFE / U+FFFF must canonicalize identically
    regardless of which path parses the document (fast path must decline)."""
    from sophia_rs_spark.sources.ntparser import parse_nx_batch
    import pandas as pd

    for ch, esc in (("\x7f", "\\u007F"), ("￾", "\\uFFFE"), ("￿", "\\uFFFF")):
        raw_doc = f'<x:s> <x:p> "a{ch}b" .\n'
        esc_doc = f'<x:s> <x:p> "a{esc}b" .\n'
        out_raw = parse_nx_batch(pd.DataFrame({"url": ["u"], "text": [raw_doc]}))
        out_esc = parse_nx_batch(pd.DataFrame({"url": ["u"], "text": [esc_doc]}))
        assert list(out_raw["error"]) == [None]
        assert list(out_raw["o"]) == list(out_esc["o"]) == [f'"a{esc}b"']
