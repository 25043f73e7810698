"""DESCRIBE — concise-bounded-description, reference-faithful.

Mirrors `sparql/src/exec/describe_iter.rs:40-115` (behavior pinned by
the DESCRIBE battery in `sparql/src/test.rs:2352-2455`):

- triples mentioning a described term in SUBJECT or OBJECT position are
  included (symmetric CBD);
- blank nodes appearing in included triples — including blank nodes
  INSIDE triple terms — are described transitively;
- reifications ride along: a triple whose object is the triple term
  ``<<( s p o )>>`` of an included triple is included too (that is how
  RDF 1.2 annotations `{| ... |}` surface), and its reifier expands
  further if it is a blank node;
- terms mentioned only INSIDE an (unasserted) triple term do not pull
  that triple in.

Each round is a pair of semi-joins over the triples table keyed by the
(small) frontier, so the loop is frontier-sized, not corpus-sized.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tt_bnodes(enc: str, out: List[str]) -> None:
    from ..functions.triple_terms import split_triple_term

    parts = split_triple_term(enc)
    if parts is None:
        return
    for p in parts:
        if p.startswith("_:"):
            out.append(p)
        elif p.startswith("<<("):
            _tt_bnodes(p, out)


def _bnode_terms(df: DataFrame) -> DataFrame:
    """Blank nodes in s/o of the given triples, including inside triple
    terms (split-based — literals whose text merely contains '_:' do
    not false-positive)."""
    direct = (
        df.select(F.col("s").alias("term"))
        .unionByName(df.select(F.col("o").alias("term")))
        .filter(F.col("term").startswith("_:"))
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            found: List[str] = []
            for col in ("s", "o"):
                for enc in pdf[col]:
                    if enc and enc.startswith("<<("):
                        _tt_bnodes(enc, found)
            yield pd.DataFrame({"term": found})

    inside = df.select("s", "o").mapInPandas(extract, schema="term string")
    return direct.unionByName(inside).distinct()


def describe(triples: DataFrame, seeds: DataFrame, max_iter: int = 20) -> DataFrame:
    """CBD of the seed terms (column ``term``) over triples (s, p, o)."""
    visited = seeds.select(F.col("term")).distinct().localCheckpoint(eager=True)
    frontier = visited
    out = None
    # triple terms of triples included in the previous round (for the
    # reification pull); starts empty
    prev_tts = None
    for _ in range(max_iter):
        parts = []
        if frontier is not None:
            parts.append(
                triples.join(
                    frontier.withColumnRenamed("term", "s"), "s", "left_semi"
                )
            )
            parts.append(
                triples.join(
                    frontier.withColumnRenamed("term", "o"), "o", "left_semi"
                )
            )
        if prev_tts is not None:
            parts.append(triples.join(prev_tts, "o", "left_semi"))
        step = parts[0]
        for p in parts[1:]:
            step = step.unionByName(p)
        step = step.dropDuplicates(["s", "p", "o"])
        if out is not None:
            step = step.join(out, ["s", "p", "o"], "left_anti")
        step = step.localCheckpoint(eager=True)
        if step.isEmpty():
            break
        out = step if out is None else out.unionByName(step).localCheckpoint(eager=True)
        # next round: new bnodes (incl. inside tts) + reification keys
        bnodes = _bnode_terms(step)
        new = bnodes.join(visited, "term", "left_anti").localCheckpoint(eager=True)
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new if not new.isEmpty() else None
        prev_tts = step.select(
            F.concat(
                F.lit("<<( "), "s", F.lit(" "), "p", F.lit(" "), "o", F.lit(" )>>")
            ).alias("o")
        ).distinct()
        if frontier is None and prev_tts is None:
            break
    if out is None:
        return triples.limit(0).select("s", "p", "o")
    return out.select("s", "p", "o").dropDuplicates(["s", "p", "o"])
