"""Triple-term (RDF 1.2 quoted triple) component accessors.

SUBJECT()/PREDICATE()/OBJECT() (`sparql/src/function.rs:405-419`,
`api/src/term.rs:273`) over the canonical ``<<( s p o )>>`` encoding.
Splitting cannot be a regex: literals may contain ``)>>`` and triple
terms nest, so the split reuses the N-Triples tokenizer (handles string
escapes) with a nesting counter.  Exposed as Arrow-batched pandas UDFs —
triple terms are rare in web data, so the Python hop is off the hot
path; everything else in the function library stays JVM-side.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.ntparser import TOKEN_RE


def split_triple_term(enc: Optional[str]) -> Optional[Tuple[str, str, str]]:
    """``<<( s p o )>>`` → (s, p, o) canonical encodings, else None."""
    if not enc or not enc.startswith("<<("):
        return None
    toks = []
    i, n = 0, len(enc)
    while i < n:
        m = TOKEN_RE.match(enc, i)
        if m is None:
            return None
        if m.lastgroup not in ("ws", "comment"):
            toks.append((m.lastgroup, m.start(), m.end()))
        i = m.end()
    terms: list[str] = []
    depth = 0
    span_start = None  # start offset of an in-flight nested tt at depth 1
    k = 0
    while k < len(toks):
        kind, a, b = toks[k]
        if kind == "tt_open":
            if depth == 1:
                span_start = a
            depth += 1
        elif kind == "tt_close":
            depth -= 1
            if depth == 1 and span_start is not None:
                terms.append(enc[span_start:b])
                span_start = None
            elif depth == 0:
                if k != len(toks) - 1:
                    return None  # trailing garbage
                break
            elif depth < 0:
                return None
        elif depth == 1:
            if kind in ("iri", "bnode", "var"):
                terms.append(enc[a:b])
            elif kind == "string":
                end = b
                if k + 1 < len(toks) and toks[k + 1][0] == "langdir":
                    end = toks[k + 1][2]
                    k += 1
                elif (
                    k + 2 < len(toks)
                    and toks[k + 1][0] == "dtsep"
                    and toks[k + 2][0] == "iri"
                ):
                    end = toks[k + 2][2]
                    k += 2
                terms.append(enc[a:end])
            else:
                return None
        k += 1
    if depth != 0 or len(terms) != 3:
        return None
    return (terms[0], terms[1], terms[2])


def _component(series: pd.Series, idx: int) -> pd.Series:
    out = []
    for enc in series:
        parts = split_triple_term(enc)
        out.append(parts[idx] if parts else None)
    return pd.Series(out, dtype="object")


_UDFS: dict = {}


def _udf(idx: int):
    # lazy: building a pandas_udf at module-import time would require an
    # active SparkSession (absent when executors unpickle this module)
    if idx not in _UDFS:
        from pyspark.sql.types import StringType

        def make(i):
            def fn(s: pd.Series) -> pd.Series:
                return _component(s, i)

            return fn

        _UDFS[idx] = pandas_udf(make(idx), StringType())
    return _UDFS[idx]


def tt_subject(term: Column) -> Column:
    return _udf(0)(term)


def tt_predicate(term: Column) -> Column:
    return _udf(1)(term)


def tt_object(term: Column) -> Column:
    return _udf(2)(term)
