"""Entity linking & owl:sameAs canonicalization (north-star operators).

sophia has no distributed equivalent; the semantics come from the north
rule: owl:sameAs bridges between IRIs form undirected components; every
member is rewritten to the component's canonical id (the minimum member
in canonical-string order — deterministic, cluster-size-independent).

Algorithm: iterative min-label propagation over the symmetrized edge
list — a driver-side loop of DataFrame joins with ``localCheckpoint``
per iteration to cut lineage (SURVEY.md §4 "iterative fixpoints").
Iterations = O(longest chain); sameAs chains in web data are short.
At 100 TB scale the same loop applies with persisted intermediate
tables; AQE handles the shrinking frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OWL_SAMEAS = "<http://www.w3.org/2002/07/owl#sameAs>"


def sameas_edges(triples: DataFrame) -> DataFrame:
    """Extract owl:sameAs edges from a triples DataFrame."""
    return triples.filter(F.col("p") == OWL_SAMEAS).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )


def connected_components(
    edges: DataFrame, max_iter: int = 50, checkpoint_every: int = 1
) -> DataFrame:
    """(src, dst) undirected edges → (member, comp) with comp = min member
    of the component (canonical-string order).

    Deterministic for any partitioning: min is order-insensitive.
    """
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = (
        und.select(F.col("src").alias("member"))
        .distinct()
        .withColumn("comp", F.col("member"))
    )
    und = und.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for i in range(max_iter):
        # neighbor minimum: for each vertex, min comp among its neighbors
        nbr_min = (
            und.join(labels, und["dst"] == labels["member"], "inner")
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["member"] == nbr_min["src"], "left_outer")
            .select(
                "member",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "member")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("member", "comp")


def canonicalize_entities(
    triples: DataFrame, components: DataFrame, rewrite_g: bool = False
) -> DataFrame:
    """Rewrite s/o (and optionally g) through the canonical-id map.

    The component map is small relative to the triple table (only linked
    entities appear) → broadcast joins, no shuffle of the triple table.
    """
    comp = F.broadcast(components)
    out = (
        triples.join(
            comp.withColumnRenamed("member", "s").withColumnRenamed("comp", "_cs"),
            "s",
            "left_outer",
        )
        .join(
            comp.withColumnRenamed("member", "o").withColumnRenamed("comp", "_co"),
            "o",
            "left_outer",
        )
        .select(
            F.coalesce("_cs", "s").alias("s"),
            "p",
            F.coalesce("_co", "o").alias("o"),
            *[c for c in triples.columns if c not in ("s", "p", "o")],
        )
    )
    return out
