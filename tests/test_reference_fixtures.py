"""Parse the reference repo's OWN Turtle/NT fixtures and cross-check
against its own serialized output.

`resource/test/file3.nt` is sophia's serialization of
`resource/test/file1.ttl` — parsing both with our parsers and asserting
dataset isomorphism is direct output parity with the reference."""

import pathlib

import pytest

from sophia_rs_spark.operators.c14n import isomorphic
from sophia_rs_spark.sources.ntparser import parse_nx_document
from sophia_rs_spark.sources.turtle import parse_turtle_document

REF = pathlib.Path("/root/reference")

FILE1_URL = "file:///home/pa/dev/sophia_rs/resource/test/file1.ttl"


def _quads(rows):
    bad = [r[5] for r in rows if r[5] is not None]
    assert bad == [], bad
    return [(r[1], r[2], r[3], r[4]) for r in rows]


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
class TestReferenceFixtures:
    def test_file1_ttl_isomorphic_to_sophia_nt_output(self):
        ttl = (REF / "resource/test/file1.ttl").read_text()
        nt = (REF / "resource/test/file3.nt").read_text()
        ours = _quads(parse_turtle_document(FILE1_URL, ttl))
        sophias = _quads(parse_nx_document(FILE1_URL, nt))
        assert len(ours) == len(sophias) == 20
        assert isomorphic(ours, sophias)

    def test_file2_ttl_fragment_subjects(self):
        url = "file:///home/pa/dev/sophia_rs/resource/test/file2.ttl"
        rows = parse_turtle_document(url, (REF / "resource/test/file2.ttl").read_text())
        qs = _quads(rows)
        assert (f"<{url}#res2>", "<http://example.org/ns#next>", f"<{url}#res1>", None) in qs

    def test_sophia_doap_ttl_parses_clean(self):
        # the project's real-world DOAP file: @base + fragments, typed
        # dates, language strings, nested lists of implementations
        url = "https://pchampin.github.io/sophia_rs/doap.ttl"
        rows = parse_turtle_document(url, (REF / "sophia_doap.ttl").read_text())
        qs = _quads(rows)
        assert len(qs) > 30
        base = "https://pchampin.github.io/sophia_rs/doap.ttl"
        assert any(
            s == f"<{base}#this>"
            and p == "<http://usefulinc.com/ns/doap#created>"
            and o == '"2018-06-07"^^<http://www.w3.org/2001/XMLSchema#date>'
            for s, p, o, g in qs
        )
        assert any(
            o == '"A Rust toolkit for RDF and Linked Data."@en' for _, _, o, _ in qs
        )

    def test_resource_api_over_file1(self, spark):
        ttl = (REF / "resource/test/file1.ttl").read_text()
        qs = _quads(parse_turtle_document(FILE1_URL, ttl))
        df = spark.createDataFrame(
            [(s, p, o, g) for s, p, o, g in qs], "s string, p string, o string, g string"
        )
        from sophia_rs_spark.plans.resource import Resource

        EX = "http://example.org/ns#"
        r1 = Resource(df, f"<{FILE1_URL}#res1>")
        assert r1.get_str(f"<{EX}id>") == "res1"
        assert len(r1.get_all(f"<{EX}related>")) == 3
        nxt = r1.get_resource(f"<{EX}next>")
        assert nxt.get_str(f"<{EX}id>") == "res2"
        # rdf:list traversal: follow first/rest from ex:list
        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        cell = r1.get_resource(f"<{EX}list>")
        items = []
        while cell.subject != f"<{RDF}nil>":
            items.append(cell.get_term(f"<{RDF}first>"))
            cell = cell.get_resource(f"<{RDF}rest>")
        assert items == [
            f"<{FILE1_URL}#res3>",
            f"<{FILE1_URL}#res2>",
            "<file:///home/pa/dev/sophia_rs/resource/test/file2.ttl#res1>",
        ]
