"""JSON-LD toRdf subset tests (FIXTURES.md F6; semantics per
`jsonld/src/parser.rs:42-100` with StaticLoader-style offline contexts)."""

import pytest

from sophia_rs_spark.sources.jsonld import parse_jsonld_document
from sophia_rs_spark.terms.model import RDF, XSD

U = "https://site0.example.org/page/1"


def good(rows):
    assert all(r[5] is None for r in rows), rows
    return [(r[1], r[2], r[3], r[4]) for r in rows]


class TestBasics:
    def test_id_and_property(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"name": "http://schema.org/name"},'
                ' "@id": "http://ex.org/x", "name": "Alice"}',
            )
        )
        assert t == [("<http://ex.org/x>", "<http://schema.org/name>", '"Alice"', None)]

    def test_vocab_context(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://schema.org/"},'
                ' "@id": "http://ex.org/x", "name": "Alice"}',
            )
        )
        assert t[0][1] == "<http://schema.org/name>"

    def test_bundled_schema_org_context(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": "https://schema.org",'
                ' "@id": "http://ex.org/x", "name": "Alice"}',
            )
        )
        assert t[0][1] == "<https://schema.org/name>"

    def test_type(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://schema.org/"},'
                ' "@id": "http://ex.org/x", "@type": "Person"}',
            )
        )
        assert t == [
            ("<http://ex.org/x>", f"<{RDF}type>", "<http://schema.org/Person>", None)
        ]

    def test_anonymous_node_gets_deterministic_bnode(self):
        doc = '{"@context": {"@vocab": "http://s.org/"}, "name": "X"}'
        a = good(parse_jsonld_document(U, doc))
        b = good(parse_jsonld_document(U, doc))
        c = good(parse_jsonld_document(U + "2", doc))
        assert a == b
        assert a[0][0].startswith("_:h")
        assert a[0][0] != c[0][0]

    def test_nested_node(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"},'
                ' "@id": "http://e/x", "knows": {"name": "Bob"}}',
            )
        )
        assert len(t) == 2
        knows = [x for x in t if x[1] == "<http://s.org/knows>"][0]
        name = [x for x in t if x[1] == "<http://s.org/name>"][0]
        assert knows[2] == name[0]  # object bnode is the nested subject

    def test_unmapped_term_dropped(self):
        t = good(
            parse_jsonld_document(
                U, '{"@id": "http://e/x", "unmapped": "v"}'
            )
        )
        assert t == []

    def test_relative_id_resolved_against_url(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"},'
                ' "@id": "sub/page", "name": "v"}',
            )
        )
        assert t[0][0] == "<https://site0.example.org/page/sub/page>"


class TestValues:
    def test_typed_values(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "age": 42, "score": 3.14, "ok": true}',
            )
        )
        objs = {x[1]: x[2] for x in t}
        assert objs["<http://s.org/age>"] == f'"42"^^<{XSD}integer>'
        assert objs["<http://s.org/score>"] == f'"3.14E0"^^<{XSD}double>'
        assert objs["<http://s.org/ok>"] == f'"true"^^<{XSD}boolean>'

    def test_language_value_and_direction(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "label": {"@value": "chat", "@language": "FR"},'
                ' "rtl": {"@value": "x", "@language": "ar", "@direction": "rtl"}}',
            )
        )
        objs = {x[1]: x[2] for x in t}
        assert objs["<http://s.org/label>"] == '"chat"@fr'
        assert objs["<http://s.org/rtl>"] == '"x"@ar--rtl'

    def test_context_default_language(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/", "@language": "en"},'
                ' "@id": "http://e/x", "label": "hello"}',
            )
        )
        assert t[0][2] == '"hello"@en'

    def test_explicit_value_type(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                f' "d": {{"@value": "2020-01-01", "@type": "{XSD}date"}}}}',
            )
        )
        assert t[0][2] == f'"2020-01-01"^^<{XSD}date>'

    def test_id_typed_term(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/",'
                ' "url": {"@id": "http://s.org/url", "@type": "@id"}},'
                ' "@id": "http://e/x", "url": "http://other.org/"}',
            )
        )
        assert t[0][2] == "<http://other.org/>"


class TestStructures:
    def test_array_values(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "tag": ["a", "b", "c"]}',
            )
        )
        assert len(t) == 3

    def test_list(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "steps": {"@list": [1, 2]}}',
            )
        )
        preds = [x[1] for x in t]
        assert preds.count(f"<{RDF}first>") == 2
        assert preds.count(f"<{RDF}rest>") == 2
        assert len(t) == 5  # 4 list cells + link

    def test_top_level_graph(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@graph": ['
                '{"@id": "http://e/a", "name": "A"},'
                '{"@id": "http://e/b", "name": "B"}]}',
            )
        )
        assert len(t) == 2
        assert all(x[3] is None for x in t)

    def test_named_graph_node(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"},'
                ' "@id": "http://e/g", "@graph": [{"@id": "http://e/a", "name": "A"}]}',
            )
        )
        assert t == [("<http://e/a>", "<http://s.org/name>", '"A"', "<http://e/g>")]

    def test_prefix_term(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"sc": "http://schema.org/"},'
                ' "@id": "http://e/x", "sc:name": "v"}',
            )
        )
        assert t[0][1] == "<http://schema.org/name>"


class TestErrors:
    def test_invalid_json_quarantined(self):
        rows = parse_jsonld_document(U, "{not json")
        assert rows[0][5] is not None and "invalid JSON" in rows[0][5]

    def test_unbundled_remote_context(self):
        rows = parse_jsonld_document(
            U, '{"@context": "https://unknown.example/ctx", "@id": "http://e/x"}'
        )
        assert rows[0][5] is not None and "not bundled" in rows[0][5]


class TestSetReverse:
    def test_set_unwraps(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "tag": {"@set": ["a", "b"]}}',
            )
        )
        assert len(t) == 2
        assert {x[2] for x in t} == {'"a"', '"b"'}

    def test_reverse(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "@reverse": {"parent": {"@id": "http://e/child"}}}',
            )
        )
        assert t == [("<http://e/child>", "<http://s.org/parent>", "<http://e/x>", None)]


class TestNestIndex:
    def test_nest(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "@nest": {"name": "Alice", "age": 42}}',
            )
        )
        assert len(t) == 2
        assert all(x[0] == "<http://e/x>" for x in t)

    def test_index_container_dropped(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/",'
                ' "post": {"@id": "http://s.org/post", "@container": "@index"}},'
                ' "@id": "http://e/x", "post": {"en": "hello", "fr": ["salut", "bonjour"]}}',
            )
        )
        assert len(t) == 3
        assert {x[2] for x in t} == {'"hello"', '"salut"', '"bonjour"'}


class TestScopedIncluded:
    def test_term_scoped_context(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/",'
                ' "detail": {"@id": "http://s.org/detail",'
                '            "@context": {"zip": "http://post.org/zip"}}},'
                ' "@id": "http://e/x", "detail": {"zip": "69000"}}',
            )
        )
        assert ("<http://s.org/detail>" in {x[1] for x in t})
        assert ("<http://post.org/zip>" in {x[1] for x in t})

    def test_included(self):
        t = good(
            parse_jsonld_document(
                U,
                '{"@context": {"@vocab": "http://s.org/"}, "@id": "http://e/x",'
                ' "name": "A",'
                ' "@included": [{"@id": "http://e/y", "name": "B"}]}',
            )
        )
        subs = {x[0] for x in t}
        assert subs == {"<http://e/x>", "<http://e/y>"}


def test_explicit_bnode_labels_are_url_scoped(spark):
    """ADVICE r1 (high): explicit "_:b1" in two different documents must
    NOT produce the same term once quads are unioned across pages."""
    from sophia_rs_spark.sources.jsonld import parse_jsonld_document

    doc = '{"@context": {"@vocab": "http://x/"}, "@id": "_:b1", "p": {"@id": "_:b2"}}'
    t1 = [r for r in parse_jsonld_document("http://a.example/", doc) if r[5] is None]
    t2 = [r for r in parse_jsonld_document("http://b.example/", doc) if r[5] is None]
    s1 = {r[1] for r in t1} | {r[3] for r in t1}
    s2 = {r[1] for r in t2} | {r[3] for r in t2}
    bn1 = {t for t in s1 if t.startswith("_:")}
    bn2 = {t for t in s2 if t.startswith("_:")}
    assert len(bn1) == 2 and len(bn2) == 2
    assert bn1.isdisjoint(bn2), "cross-document bnode collision"
    # within one document the label is stable: _:b1 subject == _:b1 reference
    doc2 = ('{"@context": {"@vocab": "http://x/"}, "@graph": ['
            '{"@id": "_:b1", "p": "x"}, {"@id": "http://x/s", '
            '"q": {"@id": "_:b1"}}]}')
    t3 = [r for r in parse_jsonld_document("http://a.example/", doc2) if r[5] is None]
    subj = [r[1] for r in t3 if r[1].startswith("_:")]
    objs = [r[3] for r in t3 if r[3].startswith("_:")]
    assert subj and objs and subj[0] == objs[0]


def test_type_id_coercion_bnode_scoped(spark):
    from sophia_rs_spark.sources.jsonld import parse_jsonld_document

    doc = ('{"@context": {"@vocab": "http://x/", "p": {"@type": "@id"}}, '
           '"@id": "http://x/s", "p": "_:n"}')
    a = [r for r in parse_jsonld_document("http://a.example/", doc) if r[5] is None]
    b = [r for r in parse_jsonld_document("http://b.example/", doc) if r[5] is None]
    assert a[0][3].startswith("_:") and b[0][3].startswith("_:")
    assert a[0][3] != b[0][3]


class TestJsonLiteralsAndDirection:
    """Round-2 option surface: @json literals (RFC 8785 JCS lexical
    forms, rdf:JSON datatype), rdfDirection modes, processing mode 1.0
    (jsonld/src/options.rs:125,352-365)."""

    RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def _one(self, doc, **kw):
        from sophia_rs_spark.sources.jsonld import parse_jsonld_document

        rows = parse_jsonld_document("http://d.example/", doc, **kw)
        errs = [r[5] for r in rows if r[5]]
        assert errs == [], errs
        return [(r[1], r[2], r[3]) for r in rows]

    def test_json_literal_value_object(self):
        doc = ('{"@context":{"@vocab":"http://x/"},"@id":"http://x/s",'
               '"p":{"@value":{"b":2,"a":[1,true,null]},"@type":"@json"}}')
        (s, p, o), = self._one(doc)
        assert o == f'"{{\\"a\\":[1,true,null],\\"b\\":2}}"^^<{self.RDFNS}JSON>'

    def test_json_literal_term_scoped(self):
        doc = ('{"@context":{"@vocab":"http://x/","p":{"@type":"@json"}},'
               '"@id":"http://x/s","p":{"config":{"z":1.5,"y":"t\\"xt"}}}')
        (s, p, o), = self._one(doc)
        assert o.endswith(f'"^^<{self.RDFNS}JSON>')
        assert '{\\"config\\":{\\"y\\":\\"t\\\\\\"xt\\",\\"z\\":1.5}}' in o

    def test_json_literal_null_and_array(self):
        doc = ('{"@context":{"@vocab":"http://x/","p":{"@type":"@json"}},'
               '"@id":"http://x/s","p":null}')
        (s, p, o), = self._one(doc)
        assert o == f'"null"^^<{self.RDFNS}JSON>'

    def test_rdf_direction_default_rdf12(self):
        doc = ('{"@context":{"@vocab":"http://x/"},"@id":"http://x/s",'
               '"p":{"@value":"x","@language":"AR","@direction":"rtl"}}')
        (s, p, o), = self._one(doc)
        assert o == '"x"@ar--rtl'

    def test_rdf_direction_i18n(self):
        doc = ('{"@context":{"@vocab":"http://x/"},"@id":"http://x/s",'
               '"p":{"@value":"x","@language":"AR","@direction":"rtl"}}')
        (s, p, o), = self._one(doc, rdf_direction="i18n-datatype")
        assert o == '"x"^^<https://www.w3.org/ns/i18n#ar_rtl>'

    def test_rdf_direction_compound(self):
        doc = ('{"@context":{"@vocab":"http://x/"},"@id":"http://x/s",'
               '"p":{"@value":"x","@language":"ar","@direction":"rtl"}}')
        trips = self._one(doc, rdf_direction="compound-literal")
        by_p = {}
        node = None
        for s, p, o in trips:
            if p == "<http://x/p>":
                node = o
            by_p[p] = o
        assert node and node.startswith("_:")
        assert by_p[f"<{self.RDFNS}value>"] == '"x"'
        assert by_p[f"<{self.RDFNS}language>"] == '"ar"'
        assert by_p[f"<{self.RDFNS}direction>"] == '"rtl"'

    def test_context_default_direction(self):
        doc = ('{"@context":{"@vocab":"http://x/","@language":"he",'
               '"@direction":"rtl"},"@id":"http://x/s","p":"shalom"}')
        (s, p, o), = self._one(doc)
        assert o == '"shalom"@he--rtl'

    def test_processing_mode_10_rejects_11_features(self):
        from sophia_rs_spark.sources.jsonld import parse_jsonld_document

        for doc in (
            '{"@context":{"@vocab":"http://x/"},"@id":"http://x/s",'
            '"p":{"@value":{"a":1},"@type":"@json"}}',
            '{"@context":{"@vocab":"http://x/","@direction":"rtl"},'
            '"@id":"http://x/s","p":"x"}',
            '{"@context":{"@vocab":"http://x/","@version":1.1},'
            '"@id":"http://x/s","p":"x"}',
        ):
            rows = parse_jsonld_document(
                "http://d.example/", doc, processing_mode="json-ld-1.0"
            )
            assert any(r[5] for r in rows), doc
        # but 1.1 (default) accepts all three
        for doc in (
            '{"@context":{"@vocab":"http://x/","@version":1.1},'
            '"@id":"http://x/s","p":"x"}',
        ):
            rows = parse_jsonld_document("http://d.example/", doc)
            assert not any(r[5] for r in rows)

    def test_jcs_numbers(self):
        from sophia_rs_spark.sources.jsonld import _jcs

        assert _jcs({"n": 1.0}) == '{"n":1}'
        assert _jcs([10, 1.5, 0.5]) == "[10,1.5,0.5]"
        assert _jcs(1e25) == "1e+25"
        assert _jcs({"k": True, "a": None}) == '{"a":null,"k":true}'
