"""D-entailment validation: recognized-datatype ill-typed literal
detection (`reasoner/src/d_entailment.rs:22-39`) + BCP47 / IRI shape
validation columns for data-quality gates.

Produces boolean columns, not failures — ill-typed literals are legal
RDF (lexical fidelity is preserved end-to-end); D-entailment merely
*recognizes* them, and pipelines can quarantine on the flag.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sparql_fns import datatype, lex
from ..terms.model import XSD

# XSD lexical-space checks for the recognized datatypes (regex per the
# public XSD 1.1 datatype spec).
_LEXICAL_RES = {
    f"{XSD}integer": r"^[+-]?\d+$",
    f"{XSD}int": r"^[+-]?\d+$",
    f"{XSD}long": r"^[+-]?\d+$",
    f"{XSD}short": r"^[+-]?\d+$",
    f"{XSD}byte": r"^[+-]?\d+$",
    f"{XSD}nonNegativeInteger": r"^\+?\d+$",
    f"{XSD}decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    f"{XSD}double": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    f"{XSD}float": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    f"{XSD}boolean": r"^(true|false|1|0)$",
    f"{XSD}date": r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$",
    f"{XSD}dateTime": (
        r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
    ),
}


def is_ill_typed_parts(term: Column, dt: Column, l: Column) -> Column:
    """:func:`is_ill_typed` over pre-computed datatype/lexical columns —
    callers that already materialized ``datatype(term)`` / ``lex(term)``
    (the SPARQL comparison layer binds them as temp columns to keep
    whole-stage codegen under janino's 64 KB method limit) pass them in
    so the big decode trees are not re-inlined here."""
    # group datatypes that share a lexical regex: fewer CASE branches →
    # smaller generated code (this probe is inlined per comparison
    # operand in the SPARQL eq path)
    by_rx: dict = {}
    for d, rx in _LEXICAL_RES.items():
        by_rx.setdefault(rx, []).append(d)
    expr = F.lit(False)
    for rx, dts in by_rx.items():
        cond = (dt == dts[0]) if len(dts) == 1 else dt.isin(dts)
        expr = F.when(cond, ~l.rlike(rx)).otherwise(expr)
    return F.when(term.startswith('"'), expr).otherwise(F.lit(False))


def is_ill_typed(term: Column) -> Column:
    """True iff the term is a literal of a recognized datatype whose
    lexical form is outside the datatype's lexical space."""
    return is_ill_typed_parts(term, datatype(term), lex(term))


def ill_typed_literals(triples: DataFrame) -> DataFrame:
    """All distinct ill-typed literal terms in a graph."""
    from ..operators.graph_ops import atoms

    t = atoms(triples).filter(F.col("kind") == 2).select("term").distinct()
    return t.filter(is_ill_typed(F.col("term")))


# ---------------------------------------------------------------------------
# SPARQL D-entailment value normalization (reasoner/src/d_entailment.rs:
# Sparql recognizes the xsd numeric tower + boolean + dateTime + string;
# ill-typed literals are an ERROR, and literals are compared by VALUE —
# 1, 01, "1"^^xsd:int and 1.0 all share the decimal value space).
# ---------------------------------------------------------------------------


class IllTypedError(ValueError):
    pass


_DECIMAL_FAMILY_RANGES = {
    # datatype → (min, max) or None for unbounded; lexical must be integer
    # digits unless noted
    "integer": None,
    "long": (-(2**63), 2**63 - 1),
    "int": (-(2**31), 2**31 - 1),
    "short": (-(2**15), 2**15 - 1),
    "byte": (-(2**7), 2**7 - 1),
    "nonNegativeInteger": (0, None),
    "positiveInteger": (1, None),
    "negativeInteger": (None, -1),
    "nonPositiveInteger": (None, 0),
    "unsignedLong": (0, 2**64 - 1),
    "unsignedInt": (0, 2**32 - 1),
    "unsignedShort": (0, 2**16 - 1),
    "unsignedByte": (0, 2**8 - 1),
}

_INT_RE = _re.compile(r"^[+-]?\d+$")
_DEC_RE = _re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
# inf/nan case-insensitively, like the reference's recognizer (Rust
# f64 parsing in sophia's Sparql D — test.rs:41-42 uses "+inf"/"nan")
_FLT_RE = _re.compile(
    r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?(?i:inf)|(?i:nan))$"
)
_BOOL_MAP = {"true": "true", "1": "true", "false": "false", "0": "false"}
_DT_RE = _re.compile(
    r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
)


def _canon_decimal(lex_s: str) -> str:
    from decimal import Decimal

    d = Decimal(lex_s)
    if d == d.to_integral_value():
        return str(int(d))
    s = format(d.normalize(), "f")
    return s


def _canon_float(lex_s: str) -> str:
    low = lex_s.lower()
    if low in ("inf", "+inf"):
        return "INF"
    if low == "-inf":
        return "-INF"
    if low == "nan":
        return "NaN"
    return repr(float(lex_s))


def d_normalize(enc: str) -> str:
    """Value-canonical form of a canonical term under SPARQL D-entailment
    (test battery `reasoner/src/test.rs:160-260`): decimal-family
    literals collapse to one value key, double/float to theirs, booleans
    to true/false, timezoned dateTimes to the UTC instant.  Raises
    :class:`IllTypedError` for recognized datatypes with lexicals
    outside the lexical space or value range.  Recurses into triple
    terms."""
    if enc.startswith("<<("):
        from ..functions.triple_terms import split_triple_term

        parts = split_triple_term(enc)
        if parts is None:
            return enc
        s, p, o = (d_normalize(x) for x in parts)
        return f"<<( {s} {p} {o} )>>"
    if not enc.startswith('"'):
        return enc
    m = _re.match(r'^"((?:[^"\\]|\\.)*)"\^\^<([^>]*)>$', enc)
    if m is None:
        return enc  # plain / language-tagged: already canonical
    lex_s, dt = m.group(1), m.group(2)
    if not dt.startswith(XSD):
        return enc
    typ = dt[len(XSD):]
    try:
        if typ == "decimal":
            if not _DEC_RE.match(lex_s):
                raise IllTypedError(enc)
            return f'"\x01dec:{_canon_decimal(lex_s)}"'
        if typ in _DECIMAL_FAMILY_RANGES:
            if not _INT_RE.match(lex_s):
                raise IllTypedError(enc)
            v = int(lex_s)
            rng = _DECIMAL_FAMILY_RANGES[typ]
            if rng is not None:
                lo, hi = rng
                if (lo is not None and v < lo) or (hi is not None and v > hi):
                    raise IllTypedError(enc)
            return f'"\x01dec:{v}"'
        if typ in ("double", "float"):
            if not _FLT_RE.match(lex_s):
                raise IllTypedError(enc)
            return f'"\x01{typ}:{_canon_float(lex_s)}"'
        if typ == "boolean":
            if lex_s not in _BOOL_MAP:
                raise IllTypedError(enc)
            return f'"\x01bool:{_BOOL_MAP[lex_s]}"'
        if typ == "dateTime":
            if not _DT_RE.match(lex_s):
                raise IllTypedError(enc)
            from datetime import datetime, timezone

            body = lex_s
            if body.endswith("Z"):
                body = body[:-1] + "+00:00"
            try:
                dtv = datetime.fromisoformat(body)
            except ValueError:
                raise IllTypedError(enc)
            if dtv.tzinfo is not None:
                return f'"\x01dtz:{dtv.astimezone(timezone.utc).isoformat()}"'
            return f'"\x01dtn:{dtv.isoformat()}"'
    except IllTypedError:
        raise
    except (ValueError, ArithmeticError):
        raise IllTypedError(enc)
    return enc


_ILL_MARK = "\x00illtyped:"


def d_normalize_column_batch(series):
    """pandas helper: normalize a series of canonical terms; ill-typed
    terms map to a marker the caller turns into an error (a pandas UDF
    cannot usefully raise)."""
    out = []
    for enc in series:
        if enc is None:
            out.append(None)
            continue
        try:
            out.append(d_normalize(enc))
        except IllTypedError:
            out.append(_ILL_MARK + enc)
    return out
