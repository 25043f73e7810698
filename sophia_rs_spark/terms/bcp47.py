"""BCP 47 (RFC 5646) language-tag well-formedness validation.

Mirrors sophia's ``bcp47`` crate semantics (`bcp47/src/_tag.rs:18-174`):
well-formedness only (no registry validity), case-insensitive comparison.
Regex constructed from the public RFC 5646 ABNF.
"""

from __future__ import annotations

import re

_ALPHA = "[A-Za-z]"
_DIGIT = "[0-9]"
_ALNUM = "[A-Za-z0-9]"

_EXTLANG = rf"{_ALPHA}{{3}}(?:-{_ALPHA}{{3}}){{0,2}}"
_LANGUAGE = rf"(?:{_ALPHA}{{2,3}}(?:-{_EXTLANG})?|{_ALPHA}{{4}}|{_ALPHA}{{5,8}})"
_SCRIPT = rf"{_ALPHA}{{4}}"
_REGION = rf"(?:{_ALPHA}{{2}}|{_DIGIT}{{3}})"
_VARIANT = rf"(?:{_ALNUM}{{5,8}}|{_DIGIT}{_ALNUM}{{3}})"
_SINGLETON = "[0-9A-WY-Za-wy-z]"
_EXTENSION = rf"{_SINGLETON}(?:-{_ALNUM}{{2,8}})+"
_PRIVATEUSE = rf"[xX](?:-{_ALNUM}{{1,8}})+"

_LANGTAG = (
    rf"{_LANGUAGE}(?:-{_SCRIPT})?(?:-{_REGION})?"
    rf"(?:-{_VARIANT})*(?:-{_EXTENSION})*(?:-{_PRIVATEUSE})?"
)

# grandfathered tags (irregular + regular, from the RFC)
_GRANDFATHERED = (
    "en-GB-oed|i-ami|i-bnn|i-default|i-enochian|i-hak|i-klingon|i-lux|"
    "i-mingo|i-navajo|i-pwn|i-tao|i-tay|i-tsu|sgn-BE-FR|sgn-BE-NL|sgn-CH-DE|"
    "art-lojban|cel-gaulish|no-bok|no-nyn|zh-guoyu|zh-hakka|zh-min|"
    "zh-min-nan|zh-xiang"
)

LANGTAG_RE = re.compile(
    rf"^(?:{_LANGTAG}|{_PRIVATEUSE}|{_GRANDFATHERED})$", re.IGNORECASE
)


def is_valid_language_tag(tag: str) -> bool:
    return LANGTAG_RE.match(tag) is not None


def normalize(tag: str) -> str:
    """Comparison form: lowercase (tags compare case-insensitively,
    `bcp47/src/_tag.rs` PartialEq)."""
    return tag.lower()
