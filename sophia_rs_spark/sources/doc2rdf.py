"""Deterministic web-page synthesis from the ``documents`` table.

The driver provides relational test tables, not web pages; the north
rule's input is ``pages(url, warc_ts, html, text, lang)``.  This module
derives a deterministic pages table from ``documents`` **entirely with
JVM column expressions** (no Python in the hot path): each document
becomes an HTML page embedding an N-Triples payload describing the
document (lang, source, n_chars, md5) — so the *entire*
extract→parse→materialize pipeline has a relational oracle: the same
(s, p, o) strings are derivable straight from the base table in SQL.

Used by ``__spark_entry__.entry`` (flagship) and the kg_* gate queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EX = "http://example.org/"
VOC = EX + "voc#"
DOC_PREFIX = EX + "doc/"
SRC_PREFIX = EX + "src/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _payload_col() -> F.Column:
    """The 4-line N-Triples payload, built from document columns."""
    s = F.concat(F.lit(f"<{DOC_PREFIX}"), F.col("doc_id").cast("string"), F.lit(">"))
    lines = [
        F.concat(s, F.lit(f' <{VOC}lang> "'), F.col("lang"), F.lit('".')),
        F.concat(
            s, F.lit(f" <{VOC}source> <{SRC_PREFIX}"), F.col("source"), F.lit(">.")
        ),
        F.concat(
            s,
            F.lit(f' <{VOC}nchars> "'),
            F.col("n_chars").cast("string"),
            F.lit(f'"^^<{XSD_INT}>.'),
        ),
        F.concat(s, F.lit(f' <{VOC}md5> "'), F.expr("md5(text)"), F.lit('".')),
    ]
    return F.concat_ws("\n", *lines)


def _html_escape(c: F.Column) -> F.Column:
    """&, <, > → entities (matches html.escape(quote=False); & first)."""
    return F.replace(
        F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")),
        F.lit(">"),
        F.lit("&gt;"),
    )


def doc_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages DataFrame
    with the canonical pages schema; fully JVM-side (codegen)."""
    url = F.concat(
        F.lit("https://docs.example.org/doc/"), F.col("doc_id").cast("string")
    )
    payload = _payload_col()
    html = F.concat(
        F.lit(
            '<!DOCTYPE html>\n<html lang="en"><head><meta charset="utf-8">'
            "<title>doc</title></head><body>\n"
        ),
        F.lit('<pre data-format="nt">'),
        _html_escape(payload),
        F.lit("</pre>\n</body></html>"),
    )
    return documents.select(
        url.alias("url"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        payload.alias("text"),
        F.col("lang").alias("lang"),
    )


def doc_triples_oracle_sql() -> str:
    """DuckDB SQL producing the same (s, p, o) rows straight from the
    base table — the oracle for the full extract pipeline."""
    s = "'<" + DOC_PREFIX + "' || CAST(doc_id AS VARCHAR) || '>'"
    return f"""
SELECT {s} AS s, '<{VOC}lang>' AS p, '"' || lang || '"' AS o FROM documents
UNION ALL
SELECT {s} AS s, '<{VOC}source>' AS p, '<{SRC_PREFIX}' || source || '>' AS o FROM documents
UNION ALL
SELECT {s} AS s, '<{VOC}nchars>' AS p,
       '"' || CAST(n_chars AS VARCHAR) || '"^^<{XSD_INT}>' AS o FROM documents
UNION ALL
SELECT {s} AS s, '<{VOC}md5>' AS p, '"' || md5(text) || '"' AS o FROM documents
""".strip()
