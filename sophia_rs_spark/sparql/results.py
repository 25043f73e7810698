"""SPARQL Query Results formats: JSON, XML, CSV and TSV writers.

Emits the W3C ``application/sparql-results+json`` /
``application/sparql-results+xml`` documents for a bindings DataFrame
(SELECT) or a boolean (ASK), matching the reference's results model
(`sparql_client/src/results.rs:16-147`): term objects are tagged
``uri`` / ``literal`` / ``bnode`` / ``triple``; literals carry
``xml:lang`` (and ``its:dir`` for directional language strings, RDF 1.2)
or ``datatype``.  CSV/TSV follow sparql11-results-csv-tsv.

These are driver-side serializers over collected bindings — result sets
a human asks for are small; bulk output goes through the parquet /
N-Quads sinks.  The term decoder reuses the canonical-encoding
tokenizer (escapes, nested triple terms).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional
from xml.sax.saxutils import escape as _x

from pyspark.sql import DataFrame

from ..functions.triple_terms import split_triple_term
from ..terms.model import XSD, unescape

_SRJ_HEAD = "http://www.w3.org/2005/sparql-results#"


def term_to_json(enc: Optional[str]) -> Optional[Dict[str, Any]]:
    """Canonical term encoding → results-JSON term object
    (results.rs:58-82 ``Term``/``Literal``)."""
    if enc is None:
        return None
    if not isinstance(enc, str):
        # plain computed value (BIND of arithmetic etc.): plain literal
        if isinstance(enc, bool):
            return {
                "type": "literal",
                "value": "true" if enc else "false",
                "datatype": f"{XSD}boolean",
            }
        if isinstance(enc, int):
            return {"type": "literal", "value": str(enc), "datatype": f"{XSD}integer"}
        if isinstance(enc, float):
            return {"type": "literal", "value": repr(enc), "datatype": f"{XSD}double"}
        enc = str(enc)
    if enc.startswith("<<("):
        parts = split_triple_term(enc)
        if parts is None:
            return {"type": "literal", "value": enc}
        s, p, o = parts
        return {
            "type": "triple",
            "value": {
                "subject": term_to_json(s),
                "predicate": term_to_json(p),
                "object": term_to_json(o),
            },
        }
    if enc.startswith("<"):
        return {"type": "uri", "value": enc[1:-1]}
    if enc.startswith("_:"):
        return {"type": "bnode", "value": enc[2:]}
    if enc.startswith('"'):
        close = _closing_quote(enc)
        lex = unescape(enc[1:close])
        suffix = enc[close + 1 :]
        if suffix.startswith("^^<"):
            return {"type": "literal", "value": lex, "datatype": suffix[3:-1]}
        if suffix.startswith("@"):
            tag = suffix[1:]
            if "--" in tag:
                tag, dir_ = tag.rsplit("--", 1)
                return {
                    "type": "literal",
                    "value": lex,
                    "xml:lang": tag,
                    "its:dir": dir_,
                }
            return {"type": "literal", "value": lex, "xml:lang": tag}
        return {"type": "literal", "value": lex}
    # plain string value from an expression — simple literal
    return {"type": "literal", "value": enc}


def _closing_quote(enc: str) -> int:
    i = 1
    while i < len(enc):
        if enc[i] == "\\":
            i += 2
            continue
        if enc[i] == '"':
            return i
        i += 1
    return len(enc) - 1


def bindings_to_json(
    df: DataFrame, variables: Optional[List[str]] = None
) -> Dict[str, Any]:
    """SELECT results → ``application/sparql-results+json`` document."""
    cols = variables or df.columns
    bindings = []
    for row in df.collect():
        b = {}
        for c in cols:
            t = term_to_json(row[c])
            if t is not None:
                b[c] = t
        bindings.append(b)
    return {"head": {"vars": list(cols)}, "results": {"bindings": bindings}}


def boolean_to_json(value: bool) -> Dict[str, Any]:
    """ASK result → results-JSON boolean document (results.rs:18-24)."""
    return {"head": {}, "boolean": bool(value)}


def to_json_str(doc: Dict[str, Any]) -> str:
    return json.dumps(doc, ensure_ascii=False)


# ---------------------------------------------------------------------------
# XML (https://www.w3.org/TR/rdf-sparql-XMLres/)
# ---------------------------------------------------------------------------


def _term_xml(t: Dict[str, Any]) -> str:
    kind = t["type"]
    if kind == "uri":
        return f"<uri>{_x(t['value'])}</uri>"
    if kind == "bnode":
        return f"<bnode>{_x(t['value'])}</bnode>"
    if kind == "triple":
        v = t["value"]
        return (
            "<triple>"
            f"<subject>{_term_xml(v['subject'])}</subject>"
            f"<predicate>{_term_xml(v['predicate'])}</predicate>"
            f"<object>{_term_xml(v['object'])}</object>"
            "</triple>"
        )
    attrs = ""
    if "xml:lang" in t:
        attrs += f' xml:lang="{_x(t["xml:lang"])}"'
        if "its:dir" in t:
            attrs += f' its:dir="{_x(t["its:dir"])}"'
    elif "datatype" in t:
        attrs += f' datatype="{_x(t["datatype"])}"'
    return f"<literal{attrs}>{_x(t['value'])}</literal>"


def bindings_to_xml(df: DataFrame, variables: Optional[List[str]] = None) -> str:
    """SELECT results → ``application/sparql-results+xml`` document."""
    cols = variables or df.columns
    out = ['<?xml version="1.0"?>']
    out.append(
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#" '
        'xmlns:its="http://www.w3.org/2005/11/its">'
    )
    out.append(
        "<head>" + "".join(f'<variable name="{_x(c)}"/>' for c in cols) + "</head>"
    )
    out.append("<results>")
    for row in df.collect():
        cells = []
        for c in cols:
            t = term_to_json(row[c])
            if t is not None:
                cells.append(f'<binding name="{_x(c)}">{_term_xml(t)}</binding>')
        out.append("<result>" + "".join(cells) + "</result>")
    out.append("</results></sparql>")
    return "".join(out)


def boolean_to_xml(value: bool) -> str:
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        "<head></head>"
        f"<boolean>{'true' if value else 'false'}</boolean></sparql>"
    )


# ---------------------------------------------------------------------------
# CSV / TSV (https://www.w3.org/TR/sparql11-results-csv-tsv/)
# ---------------------------------------------------------------------------


def _csv_cell(t: Optional[Dict[str, Any]]) -> str:
    if t is None:
        return ""
    if t["type"] == "bnode":
        v = "_:" + t["value"]
    elif t["type"] == "triple":
        v = json.dumps(t["value"], ensure_ascii=False)
    else:
        v = t["value"]
    if any(ch in v for ch in ',"\n\r'):
        return '"' + v.replace('"', '""') + '"'
    return v


def bindings_to_csv(df: DataFrame, variables: Optional[List[str]] = None) -> str:
    cols = variables or df.columns
    lines = [",".join(cols)]
    for row in df.collect():
        lines.append(",".join(_csv_cell(term_to_json(row[c])) for c in cols))
    return "\r\n".join(lines) + "\r\n"


def csv_lines_df(df: DataFrame, order: Optional[List[str]] = None) -> DataFrame:
    """Distributed results-CSV sink: bindings DataFrame → one row per
    CSV line ``(line_no int, line string)``, header at line 0.

    The per-cell transform (sparql11-results-csv-tsv §3: lexical forms,
    ``_:`` bnodes, RFC-4180 quoting) runs as an Arrow-batched pandas UDF
    over the executors — reuses the same tested ``term_to_json`` /
    ``_csv_cell`` logic as the driver-side writer, but scales with the
    result set.  ``order`` gives the columns that define line order
    (sorted by canonical encoding); the single-partition window that
    assigns ``line_no`` is fine because *serialized result sets* are
    small relative to the corpus (bulk output goes through parquet/NQ
    sinks).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window

    def _cell_fn(s: pd.Series) -> pd.Series:
        return s.map(lambda enc: _csv_cell(term_to_json(enc)))

    _cell_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _cell = pandas_udf(_cell_fn, "string")

    cols = df.columns
    keys = order or cols
    body = df.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.concat_ws(",", *[_cell(F.col(c)) for c in cols]).alias("line"),
    )
    w = Window.orderBy(*[f"__k{i}" for i in range(len(keys))])
    body = body.select(F.row_number().over(w).alias("line_no"), "line")
    header = df.sparkSession.createDataFrame(
        [(0, ",".join(cols))], "line_no int, line string"
    )
    return header.unionByName(body)


def _tsv_cell(row_val: Optional[str]) -> str:
    if row_val is None:
        return ""
    # TSV keeps the full canonical (Turtle-like) encoding
    return str(row_val).replace("\t", "\\t").replace("\n", "\\n")


def bindings_to_tsv(df: DataFrame, variables: Optional[List[str]] = None) -> str:
    cols = variables or df.columns
    lines = ["\t".join("?" + c for c in cols)]
    for row in df.collect():
        lines.append("\t".join(_tsv_cell(row[c]) for c in cols))
    return "\n".join(lines) + "\n"
