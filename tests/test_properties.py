"""Property-based invariants (hypothesis) for the term codec layer:
escape/unescape round-trips, triple-term splitting, JCS determinism,
PNG pixel round-trips. These pin the byte-comparable-term invariant the
whole engine relies on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sophia_rs_spark.functions.triple_terms import split_triple_term
from sophia_rs_spark.operators.multimodal import decode_png, encode_png
from sophia_rs_spark.sources.jsonld import _jcs
from sophia_rs_spark.terms.model import escape_literal, unescape

# text incl. controls, quotes, backslashes, astral chars, noncharacters
_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "Cc")
    ),
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_escape_unescape_roundtrip(s):
    assert unescape(escape_literal(s)) == s


@settings(max_examples=200, deadline=None)
@given(_text)
def test_escaped_form_has_no_raw_controls(s):
    esc = escape_literal(s)
    assert not any(ord(c) < 0x20 or ord(c) == 0x7F for c in esc)
    assert '"' not in esc.replace('\\"', "")


@settings(max_examples=100, deadline=None)
@given(_text, st.sampled_from(["", "@en", "@ar--rtl", "^^<http://x/dt>"]))
def test_triple_term_split_roundtrip(s, suffix):
    lit = f'"{escape_literal(s)}"{suffix}'
    tt = f"<<( <x:s> <x:p> {lit} )>>"
    assert split_triple_term(tt) == ("<x:s>", "<x:p>", lit)
    nested = f"<<( {tt} <x:q> <x:o> )>>"
    assert split_triple_term(nested) == (tt, "<x:q>", "<x:o>")


_json = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**12), max_value=10**12)
    | st.text(max_size=20),
    lambda inner: st.lists(inner, max_size=4)
    | st.dictionaries(st.text(max_size=8), inner, max_size=4),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(_json)
def test_jcs_deterministic_and_parseable(v):
    import json

    a, b = _jcs(v), _jcs(v)
    assert a == b
    assert json.loads(a) == v  # canonical form parses back to the value


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(w, h, c, seed):
    pixels = bytes(((seed + i * 2654435761) >> (i % 13)) % 256 for i in range(w * h * c))
    assert decode_png(encode_png(w, h, pixels, c)) == (w, h, c, pixels)
