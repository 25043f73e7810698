"""RDF/XML parser tests (F8 subset; semantics per xml/src/parser.rs)."""

from sophia_rs_spark.sources.rdfxml import parse_rdfxml_document
from sophia_rs_spark.terms.model import RDF, XSD

U = "https://site0.example.org/page/9"
RDF_TYPE = f"<{RDF}type>"

HDR = f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="http://ex.org/">'


def good(rows):
    assert all(r[5] is None for r in rows), rows
    return [(r[1], r[2], r[3]) for r in rows]


def test_description_about_literal():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            "<ex:name>Alice</ex:name></rdf:Description></rdf:RDF>"
        )
    )
    assert t == [("<http://e/x>", "<http://ex.org/name>", '"Alice"')]


def test_typed_node():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<ex:Person rdf:about="http://e/x"/></rdf:RDF>'
        )
    )
    assert t == [("<http://e/x>", RDF_TYPE, "<http://ex.org/Person>")]


def test_resource_and_relative():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            '<ex:link rdf:resource="/other"/></rdf:Description></rdf:RDF>'
        )
    )
    assert t == [("<http://e/x>", "<http://ex.org/link>", "<https://site0.example.org/other>")]


def test_xml_lang_inherited():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x" xml:lang="EN">'
            "<ex:name>Alice</ex:name></rdf:Description></rdf:RDF>"
        )
    )
    assert t[0][2] == '"Alice"@en'


def test_datatype():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            f'<ex:age rdf:datatype="{XSD}integer">42</ex:age>'
            "</rdf:Description></rdf:RDF>"
        )
    )
    assert t[0][2] == f'"42"^^<{XSD}integer>'


def test_nested_node_and_bnodes():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            "<ex:knows><ex:Person><ex:name>Bob</ex:name></ex:Person></ex:knows>"
            "</rdf:Description></rdf:RDF>"
        )
    )
    assert len(t) == 3
    knows = [x for x in t if x[1] == "<http://ex.org/knows>"][0]
    assert knows[2].startswith("_:h")


def test_nodeid_shared():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            '<ex:p rdf:nodeID="b1"/></rdf:Description>'
            '<rdf:Description rdf:nodeID="b1"><ex:name>N</ex:name></rdf:Description>'
            "</rdf:RDF>"
        )
    )
    obj = [x for x in t if x[1] == "<http://ex.org/p>"][0][2]
    subj = [x for x in t if x[1] == "<http://ex.org/name>"][0][0]
    assert obj == subj


def test_property_attributes():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<ex:Person rdf:about="http://e/x" ex:name="Alice"/></rdf:RDF>'
        )
    )
    assert ("<http://e/x>", "<http://ex.org/name>", '"Alice"') in t


def test_parse_type_resource():
    t = good(
        parse_rdfxml_document(
            U, HDR + '<rdf:Description rdf:about="http://e/x">'
            '<ex:addr rdf:parseType="Resource"><ex:zip>69000</ex:zip></ex:addr>'
            "</rdf:Description></rdf:RDF>"
        )
    )
    assert len(t) == 2
    addr = [x for x in t if x[1] == "<http://ex.org/addr>"][0][2]
    assert (addr, "<http://ex.org/zip>", '"69000"') in t


def test_bad_xml_quarantined():
    rows = parse_rdfxml_document(U, "<rdf:RDF><unclosed>")
    assert rows[0][5] is not None


def test_rdf_li_containers():
    doc = (
        HDR + '<rdf:Description rdf:about="http://e/bag">'
        "<ex:items><rdf:Bag>"
        "<rdf:li>one</rdf:li><rdf:li>two</rdf:li><rdf:li>three</rdf:li>"
        "</rdf:Bag></ex:items></rdf:Description></rdf:RDF>"
    )
    t = good(parse_rdfxml_document(U, doc))
    preds = sorted(x[1] for x in t if "_" in x[1])
    assert preds == [f"<{RDF}_1>", f"<{RDF}_2>", f"<{RDF}_3>"]
    objs = {x[1]: x[2] for x in t}
    assert objs[f"<{RDF}_1>"] == '"one"'
    # Bag typed node present
    assert any(x[2] == f"<{RDF}Bag>" for x in t)


def test_rdf_li_resets_per_node():
    doc = (
        HDR + '<rdf:Description rdf:about="http://e/a">'
        "<ex:l><rdf:Seq><rdf:li>x</rdf:li></rdf:Seq></ex:l>"
        "<ex:m><rdf:Seq><rdf:li>y</rdf:li></rdf:Seq></ex:m>"
        "</rdf:Description></rdf:RDF>"
    )
    t = good(parse_rdfxml_document(U, doc))
    ones = [x for x in t if x[1] == f"<{RDF}_1>"]
    assert len(ones) == 2  # both Seqs start at _1


def test_rdf_id_node_element():
    doc = HDR + '<rdf:Description rdf:ID="frag"><ex:p>v</ex:p></rdf:Description></rdf:RDF>'
    t = good(parse_rdfxml_document(U, doc))
    assert t[0][0] == f"<{U}#frag>"


def test_rdf_id_property_reification():
    doc = (
        HDR + '<rdf:Description rdf:about="http://e/s">'
        '<ex:p rdf:ID="stmt1">val</ex:p></rdf:Description></rdf:RDF>'
    )
    t = good(parse_rdfxml_document(U, doc))
    assert ("<http://e/s>", "<http://ex.org/p>", '"val"') in t
    r = f"<{U}#stmt1>"
    assert (r, f"<{RDF}type>", f"<{RDF}Statement>") in t
    assert (r, f"<{RDF}subject>", "<http://e/s>") in t
    assert (r, f"<{RDF}predicate>", "<http://ex.org/p>") in t
    assert (r, f"<{RDF}object>", '"val"') in t
    assert len(t) == 5


def test_parse_type_collection():
    doc = (
        HDR + '<rdf:Description rdf:about="http://e/s">'
        '<ex:items rdf:parseType="Collection">'
        '<rdf:Description rdf:about="http://e/a"/>'
        '<rdf:Description rdf:about="http://e/b"/>'
        "</ex:items></rdf:Description></rdf:RDF>"
    )
    t = good(parse_rdfxml_document(U, doc))
    preds = [x[1] for x in t]
    assert preds.count(f"<{RDF}first>") == 2
    assert preds.count(f"<{RDF}rest>") == 2
    firsts = {x[2] for x in t if x[1] == f"<{RDF}first>"}
    assert firsts == {"<http://e/a>", "<http://e/b>"}
    assert any(x[2] == f"<{RDF}nil>" for x in t)


def test_bagid_rejected_to_quarantine():
    """rdf:bagID (RDF 1999-only, removed in the 2004 REC) must be
    rejected like oxrdfxml does — not emitted as a property triple."""
    from sophia_rs_spark.sources.rdfxml import parse_rdfxml_document

    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://x/">'
        '<rdf:Description rdf:about="http://x/s" rdf:bagID="b1">'
        "<ex:p>v</ex:p></rdf:Description></rdf:RDF>"
    )
    rows = parse_rdfxml_document("http://d.example/", doc)
    assert any(r[5] and "bagID" in r[5] for r in rows)
    assert not any(r[2] and "bagID" in r[2] for r in rows if r[5] is None)
