"""IRI validation (RFC 3987) and reference resolution (RFC 3986 §5).

Semantics mirror sophia's ``iri`` crate: validation regexes built from the
public RFC 3987 ABNF (`iri/src/_regex.rs:28-52` does the same), and
strict-mode reference resolution per RFC 3986 §5.2 (`iri/src/resolve.rs:
22-57` via oxiri).  Implementation is original, derived from the RFCs.

Python's ``urllib.parse.urljoin`` is NOT used: it special-cases known
schemes (``uses_relative``) and mis-resolves against e.g. ``tag:`` or
``urn:`` bases, which real RDF data uses.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# RFC 3987 validation (full-match regexes, original construction from ABNF)
# ---------------------------------------------------------------------------

_UCSCHAR = (
    " -퟿豈-﷏ﷰ-￯"
    "\U00010000-\U0001fffd\U00020000-\U0002fffd\U00030000-\U0003fffd"
    "\U00040000-\U0004fffd\U00050000-\U0005fffd\U00060000-\U0006fffd"
    "\U00070000-\U0007fffd\U00080000-\U0008fffd\U00090000-\U0009fffd"
    "\U000a0000-\U000afffd\U000b0000-\U000bfffd\U000c0000-\U000cfffd"
    "\U000d0000-\U000dfffd\U000e1000-\U000efffd"
)
_IPRIVATE = "-\U000f0000-\U000ffffd\U00100000-\U0010fffd"
_IUNRESERVED = rf"A-Za-z0-9\-._~{_UCSCHAR}"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUBDELIMS = r"!$&'()*+,;="
_IPCHAR_CC = rf"{_IUNRESERVED}{_SUBDELIMS}:@"  # inner char-class body
_IPCHAR = rf"(?:[{_IPCHAR_CC}]|{_PCT})"
_SCHEME = r"[A-Za-z][A-Za-z0-9+\-.]*"

_IUSERINFO = rf"(?:[{_IUNRESERVED}{_SUBDELIMS}:]|{_PCT})*"
_IREGNAME = rf"(?:[{_IUNRESERVED}{_SUBDELIMS}]|{_PCT})*"
_IPLITERAL = r"\[[0-9A-Fa-f:.v]+\]"  # liberal IP-literal (v6/future)
_IPV4 = r"(?:\d{1,3}\.){3}\d{1,3}"
_IHOST = rf"(?:{_IPLITERAL}|{_IPV4}|{_IREGNAME})"
_IAUTHORITY = rf"(?:{_IUSERINFO}@)?{_IHOST}(?::\d*)?"
_ISEGMENT = rf"{_IPCHAR}*"
_ISEGMENT_NZ = rf"{_IPCHAR}+"
_IPATH_ABEMPTY = rf"(?:/{_ISEGMENT})*"
_IPATH_ABSOLUTE = rf"/(?:{_ISEGMENT_NZ}(?:/{_ISEGMENT})*)?"
_IPATH_ROOTLESS = rf"{_ISEGMENT_NZ}(?:/{_ISEGMENT})*"
_IPATH_NOSCHEME = rf"(?:[{_IUNRESERVED}{_SUBDELIMS}@]|{_PCT})+(?:/{_ISEGMENT})*"
_IQUERY = rf"(?:[{_IPCHAR_CC}/?{_IPRIVATE}]|{_PCT})*"
_IFRAGMENT = rf"(?:[{_IPCHAR_CC}/?]|{_PCT})*"

_IHIER_PART = (
    rf"(?://{_IAUTHORITY}{_IPATH_ABEMPTY}|{_IPATH_ABSOLUTE}|{_IPATH_ROOTLESS}|)"
)
_IRELATIVE_PART = (
    rf"(?://{_IAUTHORITY}{_IPATH_ABEMPTY}|{_IPATH_ABSOLUTE}|{_IPATH_NOSCHEME}|)"
)

IRI_RE = re.compile(
    rf"^{_SCHEME}:{_IHIER_PART}(?:\?{_IQUERY})?(?:#{_IFRAGMENT})?$"
)
IRELATIVE_REF_RE = re.compile(
    rf"^{_IRELATIVE_PART}(?:\?{_IQUERY})?(?:#{_IFRAGMENT})?$"
)


def is_absolute_iri(s: str) -> bool:
    return IRI_RE.match(s) is not None


def is_valid_iri_ref(s: str) -> bool:
    """IRI reference = absolute IRI or relative reference (RFC 3987)."""
    return IRI_RE.match(s) is not None or IRELATIVE_REF_RE.match(s) is not None


# ---------------------------------------------------------------------------
# RFC 3986 §5 reference resolution (scheme-agnostic, strict mode)
# ---------------------------------------------------------------------------

_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+\-.]*):)?"  # scheme
    r"(?://([^/?#]*))?"  # authority
    r"([^?#]*)"  # path
    r"(?:\?([^#]*))?"  # query
    r"(?:#(.*))?$",  # fragment
    re.DOTALL,
)


def split_iri(
    s: str,
) -> Tuple[Optional[str], Optional[str], str, Optional[str], Optional[str]]:
    m = _SPLIT_RE.match(s)
    assert m is not None  # the regex matches any string
    return m.group(1), m.group(2), m.group(3), m.group(4), m.group(5)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base_auth: Optional[str], base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base_auth is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i < 0:
        return ref_path
    return base_path[: i + 1] + ref_path


def relativize(base: str, iri: str, max_parents: int = 2) -> Optional[str]:
    """Inverse of :func:`resolve`: the shortest relative reference that
    resolves against ``base`` back to ``iri`` (semantics of
    `iri/src/relativize.rs:21-99`), climbing at most ``max_parents``
    ``../`` levels.  Returns None when no relative form exists (different
    scheme/authority, or too many parent levels).

    Invariant (tested): ``resolve(base, relativize(base, iri)) == iri``.
    """
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    t_scheme, t_auth, t_path, t_query, t_frag = split_iri(iri)
    if t_scheme != b_scheme or t_auth != b_auth or t_scheme is None:
        return None
    frag = f"#{t_frag}" if t_frag is not None else ""
    query = f"?{t_query}" if t_query is not None else ""
    if t_path == b_path:
        if t_query == b_query and t_frag is not None:
            return frag
        if t_query is not None:
            return query + frag
        # same path, no query to carry: '' resolves to base incl. its query
        if b_query is None:
            return frag if t_frag is not None else ""
        return None
    b_dirs = b_path.split("/")[:-1]
    t_segs = t_path.split("/")
    # longest common directory prefix
    common = 0
    while (
        common < len(b_dirs)
        and common < len(t_segs) - 1
        and b_dirs[common] == t_segs[common]
    ):
        common += 1
    ups = len(b_dirs) - common
    if ups > max_parents:
        return None
    rest = "/".join(t_segs[common:])
    rel = "../" * ups + rest
    if rel == "":
        rel = "./"
    # a rootless rel whose first segment has a ':' would parse as a scheme
    first_seg = rel.split("/", 1)[0]
    if ups == 0 and ":" in first_seg:
        rel = "./" + rel
    # dotted segments would be normalized away by resolution
    if first_seg in (".", "..") and not rel.startswith(("./", "../")):
        return None
    candidate = rel + query + frag
    return candidate if resolve(base, candidate) == iri else None


def resolve(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2-5.3 (strict)."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    if r_scheme is not None:
        t = (r_scheme, r_auth, remove_dot_segments(r_path), r_query)
    else:
        b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
        if r_auth is not None:
            t = (b_scheme, r_auth, remove_dot_segments(r_path), r_query)
        elif r_path == "":
            t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query)
        elif r_path.startswith("/"):
            t = (b_scheme, b_auth, remove_dot_segments(r_path), r_query)
        else:
            t = (
                b_scheme,
                b_auth,
                remove_dot_segments(_merge(b_auth, b_path, r_path)),
                r_query,
            )
    scheme, auth, path, query = t
    parts = []
    if scheme is not None:
        parts += [scheme, ":"]
    if auth is not None:
        parts += ["//", auth]
    parts.append(path)
    if query is not None:
        parts += ["?", query]
    if r_frag is not None:
        parts += ["#", r_frag]
    return "".join(parts)
