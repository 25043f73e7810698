"""Term core tests: canonical encoding (`turtle/src/serializer/nt.rs`
canonical mode), eq/order semantics (`api/src/term.rs:389-501,846-847`),
escaping (`turtle/src/serializer/_common.rs:75-119`), IRI resolution
(`iri/src/resolve.rs`), BCP47 (`bcp47/src/_tag.rs`), xxh64."""

import pytest

from sophia_rs_spark.terms import bcp47, iri
from sophia_rs_spark.terms.model import (
    XSD_INTEGER,
    XSD_STRING,
    Term,
    decode,
    escape_literal,
    unescape,
)
from sophia_rs_spark.terms.xxh64 import skolem_label, xxh64, xxh64_signed


class TestEncode:
    def test_iri(self):
        assert Term.iri("http://a/b").encode() == "<http://a/b>"

    def test_bnode(self):
        assert Term.bnode("b1").encode() == "_:b1"

    def test_plain_literal(self):
        assert Term.literal("foo").encode() == '"foo"'

    def test_xsd_string_implicit(self):
        assert Term.literal("foo", dt=XSD_STRING).encode() == '"foo"'

    def test_typed_literal(self):
        assert Term.literal("10", dt=XSD_INTEGER).encode() == f'"10"^^<{XSD_INTEGER}>'

    def test_lang_literal_lowercased(self):
        # canonical N-Triples lowercases language tags (nt.rs:196-200)
        assert Term.literal("o", lang="en-UK").encode() == '"o"@en-uk'

    def test_dir_lang_literal(self):
        assert Term.literal("o", lang="en-UK", dir="ltr").encode() == '"o"@en-uk--ltr'

    def test_triple_term(self):
        t = Term.triple(Term.bnode("a"), Term.iri("x:b"), Term.literal("c"))
        assert t.encode() == '<<( _:a <x:b> "c" )>>'

    def test_variable(self):
        assert Term.variable("v").encode() == "?v"

    def test_escaping(self):
        assert escape_literal('a"b\\c\nd') == 'a\\"b\\\\c\\nd'
        assert escape_literal("\x01\x0b\x7f") == "\\u0001\\u000B\\u007F"
        assert escape_literal("\t\b\f\r") == "\\t\\b\\f\\r"
        assert escape_literal("￾￿") == "\\uFFFE\\uFFFF"
        # non-ASCII is NOT escaped (ascii mode off)
        assert escape_literal("é漢") == "é漢"

    def test_unescape_roundtrip(self):
        for s in ['a"b\\c\nd', "\x01\x0b\x7f", "\t\b\f\r", "plain", "é漢"]:
            assert unescape(escape_literal(s)) == s

    def test_unescape_uchar(self):
        assert unescape("\\u006f") == "o"
        assert unescape("\\U0001F600") == "\U0001f600"


class TestDecode:
    @pytest.mark.parametrize(
        "enc",
        [
            "<http://a/b>",
            "_:b1",
            '"foo"',
            f'"10"^^<{XSD_INTEGER}>',
            '"o"@en-uk',
            '"o"@en-uk--ltr',
            '<<( _:a <x:b> "c" )>>',
            '<<( <<( _:a <x:b> "c" )>> <x:p> "o"@fr )>>',
            "?v",
            '"with \\"quotes\\" and \\\\"',
        ],
    )
    def test_roundtrip(self, enc):
        assert decode(enc).encode() == enc


class TestOrder:
    def test_lexical_fidelity(self):
        # "10"^^xsd:integer != "010"^^xsd:integer (api/src/term.rs:846-847)
        a = Term.literal("10", dt=XSD_INTEGER)
        b = Term.literal("010", dt=XSD_INTEGER)
        assert a != b
        assert a.encode() != b.encode()

    def test_term_order_is_lexical_not_numeric(self):
        # "10" < "2" lexically (api/src/term.rs:846-847)
        a = Term.literal("10", dt=XSD_INTEGER)
        b = Term.literal("2", dt=XSD_INTEGER)
        assert a.order_key() < b.order_key()

    def test_cross_kind_order(self):
        b = Term.bnode("z")
        i = Term.iri("a:a")
        l = Term.literal("a")
        t = Term.triple(i, i, i)
        v = Term.variable("a")
        keys = [x.order_key() for x in (b, i, l, t, v)]
        assert keys == sorted(keys)


class TestIri:
    @pytest.mark.parametrize(
        "base,ref,expected",
        [
            ("http://a/b/c/d;p?q", "g", "http://a/b/c/g"),
            ("http://a/b/c/d;p?q", "./g", "http://a/b/c/g"),
            ("http://a/b/c/d;p?q", "g/", "http://a/b/c/g/"),
            ("http://a/b/c/d;p?q", "/g", "http://a/g"),
            ("http://a/b/c/d;p?q", "//g", "http://g"),
            ("http://a/b/c/d;p?q", "?y", "http://a/b/c/d;p?y"),
            ("http://a/b/c/d;p?q", "#s", "http://a/b/c/d;p?q#s"),
            ("http://a/b/c/d;p?q", "", "http://a/b/c/d;p?q"),
            ("http://a/b/c/d;p?q", ".", "http://a/b/c/"),
            ("http://a/b/c/d;p?q", "..", "http://a/b/"),
            ("http://a/b/c/d;p?q", "../g", "http://a/b/g"),
            ("http://a/b/c/d;p?q", "../..", "http://a/"),
            ("http://a/b/c/d;p?q", "../../g", "http://a/g"),
            ("http://a/b/c/d;p?q", "../../../g", "http://a/g"),
            ("http://a/b/c/d;p?q", "g;x?y#s", "http://a/b/c/g;x?y#s"),
            ("http://a/b/c/d;p?q", "http://x/y", "http://x/y"),
            # scheme-agnostic (urljoin would break these)
            ("tag:x/y", "z", "tag:x/z"),
            ("urn:a:b", "#f", "urn:a:b#f"),
        ],
    )
    def test_resolve_rfc3986(self, base, ref, expected):
        assert iri.resolve(base, ref) == expected

    def test_validate(self):
        assert iri.is_absolute_iri("http://example.org/a?b=1#c")
        assert iri.is_absolute_iri("tag:foo")
        assert iri.is_absolute_iri("x:s")
        assert not iri.is_absolute_iri("no scheme here")
        assert not iri.is_absolute_iri("http://a/ b")
        assert iri.is_valid_iri_ref("../rel/path")
        assert iri.is_valid_iri_ref("#frag")
        # IRIs: non-ASCII allowed
        assert iri.is_absolute_iri("http://例え.jp/パス")


class TestBcp47:
    @pytest.mark.parametrize(
        "tag", ["en", "en-UK", "fr", "de", "zh-Hant-TW", "x-private", "en-GB-oed"]
    )
    def test_valid(self, tag):
        assert bcp47.is_valid_language_tag(tag)

    @pytest.mark.parametrize("tag", ["", "123", "a", "en--", "-en", "toolongtag123"])
    def test_invalid(self, tag):
        assert not bcp47.is_valid_language_tag(tag)

    def test_case_insensitive_compare(self):
        assert bcp47.normalize("en-UK") == bcp47.normalize("EN-uk")


class TestXxh64:
    def test_known_vectors(self):
        # public XXH64 reference vectors (seed 0)
        assert xxh64(b"", 0) == 0xEF46DB3751D8E999
        assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
        assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999

    def test_skolem_label_shape(self):
        l1 = skolem_label("http://u/1", "a")
        assert l1.startswith("h") and len(l1) == 17
        assert skolem_label("http://u/1", "a") == l1
        assert skolem_label("http://u/2", "a") != l1

    def test_matches_spark_xxhash64(self, spark):
        from pyspark.sql import functions as F

        vals = ["", "a", "abc", "hello world", "é漢字", "x" * 100]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = {
            r["v"]: r["h"]
            for r in df.select("v", F.xxhash64("v").alias("h")).collect()
        }
        for v in vals:
            assert got[v] == xxh64_signed(v.encode("utf-8")), v


class TestRelativize:
    @pytest.mark.parametrize(
        "base,iri_,expected",
        [
            ("http://a/b/c/d", "http://a/b/c/g", "g"),
            ("http://a/b/c/d", "http://a/b/c/d", ""),
            ("http://a/b/c/d", "http://a/b/c/d#s", "#s"),
            ("http://a/b/c/d", "http://a/b/c/g?y", "g?y"),
            ("http://a/b/c/d", "http://a/b/g", "../g"),
            ("http://a/b/c/d", "http://a/g", "../../g"),
            ("http://a/b/c/d", "http://a/b/c/", "./"),
            ("http://a/b/c/d", "http://other/x", None),
            ("http://a/b/c/d", "https://a/b/c/d", None),
        ],
    )
    def test_cases(self, base, iri_, expected):
        assert iri.relativize(base, iri_) == expected

    def test_parent_limit(self):
        assert iri.relativize("http://a/b/c/d/e", "http://a/x", max_parents=2) is None
        assert iri.relativize("http://a/b/c/d/e", "http://a/x", max_parents=3) == "../../../x"

    def test_roundtrip_property(self):
        import itertools
        bases = ["http://a/b/c/d?q", "http://a/", "http://a/b/"]
        targets = [
            "http://a/b/c/d", "http://a/b/c/e#f", "http://a/x/y",
            "http://a/", "http://a/b/c/d/e/f",
        ]
        for b, t in itertools.product(bases, targets):
            r = iri.relativize(b, t, max_parents=5)
            if r is not None:
                assert iri.resolve(b, r) == t, (b, t, r)


class TestReferenceIriBattery:
    """The reference's complete IRI battery (`iri/src/test.rs`):
    RELATIVE_IRIS (RFC 3986 §5.4.1 + §5.4.2 verbatim) against resolve(),
    NEGATIVE_IRIS against the validator."""

    RELATIVE = [
        ("g:h", "g:h"), ("g", "http://a/b/c/g"), ("./g", "http://a/b/c/g"),
        ("g/", "http://a/b/c/g/"), ("/g", "http://a/g"), ("//g", "http://g"),
        ("?y", "http://a/b/c/d;p?y"), ("g?y", "http://a/b/c/g?y"),
        ("#s", "http://a/b/c/d;p?q#s"), ("g#s", "http://a/b/c/g#s"),
        ("g?y#s", "http://a/b/c/g?y#s"), (";x", "http://a/b/c/;x"),
        ("g;x", "http://a/b/c/g;x"), ("g;x?y#s", "http://a/b/c/g;x?y#s"),
        ("", "http://a/b/c/d;p?q"), (".", "http://a/b/c/"),
        ("./", "http://a/b/c/"), ("..", "http://a/b/"), ("../", "http://a/b/"),
        ("../g", "http://a/b/g"), ("../..", "http://a/"),
        ("../../", "http://a/"), ("../../g", "http://a/g"),
        ("../../../g", "http://a/g"), ("../../../../g", "http://a/g"),
        ("/./g", "http://a/g"), ("/../g", "http://a/g"),
        ("g.", "http://a/b/c/g."), (".g", "http://a/b/c/.g"),
        ("g..", "http://a/b/c/g.."), ("..g", "http://a/b/c/..g"),
        ("./../g", "http://a/b/g"), ("./g/.", "http://a/b/c/g/"),
        ("g/./h", "http://a/b/c/g/h"), ("g/../h", "http://a/b/c/h"),
        ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
        ("g;x=1/../y", "http://a/b/c/y"),
        ("g?y/./x", "http://a/b/c/g?y/./x"),
        ("g?y/../x", "http://a/b/c/g?y/../x"),
        ("g#s/./x", "http://a/b/c/g#s/./x"),
        ("g#s/../x", "http://a/b/c/g#s/../x"),
    ]

    def test_relative_iris(self):
        for ref, expected in self.RELATIVE:
            assert iri.resolve("http://a/b/c/d;p?q", ref) == expected, ref

    NEGATIVE = [
        "http://[/", "http://a/[", "http://a/]", "http://a/|", "http://a/ ",
        "[", "]", "|", " ",
    ]

    def test_negative_iris(self):
        for bad in self.NEGATIVE:
            assert not iri.is_valid_iri_ref(bad), bad

    POSITIVE = [
        "http:", "http://example.org", "http://127.0.0.1", "http://[::]",
        "http://%0D", "http://example.org/", "http://éxample.org/",
        "http://user:pw@example.org:1234/", "http://example.org/foo/bar/baz",
        "http://example.org/foo/.././/bar",
    ]

    def test_positive_iris(self):
        for good in self.POSITIVE:
            assert iri.is_valid_iri_ref(good), good
