"""DESCRIBE — concise-bounded-description via blank-node closure.

Mirrors `sparql/src/exec/describe_iter.rs:40-115`: starting from the
result terms, include every triple whose subject is a described term,
then transitively follow blank nodes in BOTH directions (objects that
are bnodes get described too; bnodes reached as subjects pull their
triples) until the frontier is empty — the iterative frontier join from
SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe(triples: DataFrame, seeds: DataFrame, max_iter: int = 20) -> DataFrame:
    """CBD of the seed terms (column ``term``) over triples (s, p, o)."""
    visited = seeds.select(F.col("term")).distinct().localCheckpoint(eager=True)
    frontier = visited
    out = None
    for _ in range(max_iter):
        # triples whose subject is in the frontier
        step = triples.join(
            frontier.withColumnRenamed("term", "s"), "s", "left_semi"
        )
        out = step if out is None else out.unionByName(step)
        # new blank nodes reachable from those triples (either position)
        bnodes = (
            step.select(F.col("o").alias("term"))
            .filter(F.col("term").startswith("_:"))
            .unionByName(
                step.select(F.col("s").alias("term")).filter(
                    F.col("term").startswith("_:")
                )
            )
            .distinct()
        )
        new = bnodes.join(visited, "term", "left_anti").localCheckpoint(eager=True)
        if new.limit(1).count() == 0:
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    assert out is not None
    return out.dropDuplicates(["s", "p", "o"])
