"""Microdata / RDFa-lite extraction tests (FIXTURES.md F7 — our
extractor, goldens hand-derived)."""

from sophia_rs_spark.sources.microdata import extract_microdata

U = "https://site0.example.org/page/7"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


class TestMicrodata:
    def test_itemscope_itemtype_itemprop(self):
        html = (
            '<div itemscope itemtype="https://schema.org/Person">'
            '<span itemprop="name">Alice</span></div>'
        )
        t = extract_microdata(U, html)
        assert len(t) == 2
        node = t[0][0]
        assert node.startswith("_:h")
        assert (node, RDF_TYPE, "<https://schema.org/Person>") in t
        assert (node, "<https://schema.org/name>", '"Alice"') in t

    def test_itemid(self):
        html = (
            '<div itemscope itemid="http://ex.org/me" '
            'itemtype="https://schema.org/Person"></div>'
        )
        t = extract_microdata(U, html)
        assert t == [("<http://ex.org/me>", RDF_TYPE, "<https://schema.org/Person>")]

    def test_href_value_resolved(self):
        html = (
            '<div itemscope itemtype="https://schema.org/Person">'
            '<a itemprop="url" href="/profile">me</a></div>'
        )
        t = extract_microdata(U, html)
        assert (
            t[1][2] == "<https://site0.example.org/profile>"
        ), t

    def test_content_attr(self):
        html = (
            '<div itemscope itemtype="https://schema.org/Person">'
            '<meta itemprop="height" content="1.75"></div>'
        )
        t = extract_microdata(U, html)
        assert t[1][2] == '"1.75"'

    def test_nested_item(self):
        html = (
            '<div itemscope itemtype="https://schema.org/Person">'
            '<div itemprop="address" itemscope itemtype="https://schema.org/PostalAddress">'
            '<span itemprop="postalCode">69000</span></div></div>'
        )
        t = extract_microdata(U, html)
        person = t[0][0]
        addr = [x for x in t if x[1] == "<https://schema.org/address>"][0][2]
        assert addr.startswith("_:h") and addr != person
        assert (addr, "<https://schema.org/postalCode>", '"69000"') in t
        assert (addr, RDF_TYPE, "<https://schema.org/PostalAddress>") in t

    def test_deterministic_bnodes(self):
        html = '<div itemscope itemtype="https://schema.org/Thing"></div>'
        assert extract_microdata(U, html) == extract_microdata(U, html)
        assert extract_microdata(U, html) != extract_microdata(U + "x", html)


class TestRdfaLite:
    def test_vocab_typeof_property(self):
        html = (
            '<div vocab="https://schema.org/" typeof="Person">'
            '<span property="name">Bob</span></div>'
        )
        t = extract_microdata(U, html)
        node = t[0][0]
        assert (node, RDF_TYPE, "<https://schema.org/Person>") in t
        assert (node, "<https://schema.org/name>", '"Bob"') in t

    def test_about_subject(self):
        html = (
            '<div vocab="https://schema.org/" about="http://ex.org/bob" typeof="Person">'
            '<span property="name">Bob</span></div>'
        )
        t = extract_microdata(U, html)
        assert t[0][0] == "<http://ex.org/bob>"

    def test_property_href(self):
        html = (
            '<div vocab="https://schema.org/" typeof="Person">'
            '<a property="url" href="http://ex.org/b">b</a></div>'
        )
        t = extract_microdata(U, html)
        assert (t[0][0], "<https://schema.org/url>", "<http://ex.org/b>") in t

    def test_no_markers_no_triples(self):
        assert extract_microdata(U, "<p>plain html</p>") == []
