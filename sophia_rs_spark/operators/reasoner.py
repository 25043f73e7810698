"""Forward-chaining RDFS entailment as DataFrame joins (SURVEY.md §2.9).

Re-expresses sophia's ``reasoner`` crate rulesets (Simple/RDF/RDFS,
`reasoner/src/ruleset/_rdfs.rs:32-99`): the same rule battery — rdfs2
(domain), rdfs3 (range), rdfs5/rdfs11 (subPropertyOf/subClassOf
transitive closure), rdfs7 (property inheritance), rdfs9 (class
inheritance) — each rule a distributed join; saturation is a driver-side
loop-until-no-new-rows (sophia's ``while changed`` at `_rdfs.rs:57-97`),
with the small schema tables (subClassOf/subPropertyOf/domain/range)
broadcast so instance-side rules never shuffle the big triple table.

Vocabulary-axiom preparation (``prepare_rdf_vocab``/``prepare_rdfs_
vocab``) and container-membership rules are out of scope for round 1;
the core class/property entailment (the rules with data-scale impact)
is complete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..terms.model import RDF, RDFS

T_TYPE = f"<{RDF}type>"
T_SUBCLASS = f"<{RDFS}subClassOf>"
T_SUBPROP = f"<{RDFS}subPropertyOf>"
T_DOMAIN = f"<{RDFS}domain>"
T_RANGE = f"<{RDFS}range>"
T_MEMBER = f"<{RDFS}member>"
T_CMP = f"<{RDFS}ContainerMembershipProperty>"
T_DATATYPE = f"<{RDFS}Datatype>"
T_LITERAL_CLS = f"<{RDFS}Literal>"
_CONTAINER_PRED_RE = f"^<{RDF}_[0-9]+>$"


def _pairs(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(F.col("p") == pred).select("s", "o")


def transitive_closure(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Transitive closure of an (s, o) relation by iterated doubling:
    O(log(path length)) joins (vs sophia's one-step-per-iteration inner
    loops, `_rdfs.rs:73-78,85-90`)."""
    closure = pairs.distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        nxt = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.o") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
        )
        new_closure = closure.unionByName(nxt).distinct().localCheckpoint(eager=True)
        if new_closure.count() == closure.count():
            return new_closure
        closure = new_closure
    return closure


# Axiomatic triples of the RDF/RDFS vocabularies (rdf12-semantics §9;
# the prepare_rdf_vocab/prepare_rdfs_vocab step, _rdfs.rs:38-40) — the
# subset with inferential effect through our rule battery.
_AXIOMS = [
    (f"<{RDF}type>", f"<{RDFS}domain>", f"<{RDFS}Resource>"),
    (f"<{RDF}type>", f"<{RDFS}range>", f"<{RDFS}Class>"),
    (f"<{RDFS}domain>", f"<{RDFS}range>", f"<{RDFS}Class>"),
    (f"<{RDFS}range>", f"<{RDFS}range>", f"<{RDFS}Class>"),
    (f"<{RDFS}subClassOf>", f"<{RDFS}domain>", f"<{RDFS}Class>"),
    (f"<{RDFS}subClassOf>", f"<{RDFS}range>", f"<{RDFS}Class>"),
    (f"<{RDFS}subPropertyOf>", f"<{RDF}type>", f"<{RDF}Property>"),
    (f"<{RDF}first>", f"<{RDF}type>", f"<{RDF}Property>"),
    (f"<{RDF}rest>", f"<{RDF}type>", f"<{RDF}Property>"),
    (f"<{RDFS}member>", f"<{RDF}type>", f"<{RDF}Property>"),
    (f"<{RDF}nil>", f"<{RDF}type>", f"<{RDF}List>"),
    (f"<{RDFS}Datatype>", f"<{RDFS}subClassOf>", f"<{RDFS}Class>"),
]


def rdfs_saturate(
    triples: DataFrame, max_iter: int = 10, with_axioms: bool = False
) -> DataFrame:
    """RDFS-saturate a triples DataFrame (s, p, o) → saturated triples.

    Schema-level closures (rdfs5/rdfs11) run first; the instance-level
    rules (rdfs2/3/7/9) then reach fixpoint — one outer loop handles the
    (rare) case where inferred triples feed the schema again.

    ``with_axioms=True`` seeds the RDF/RDFS vocabulary axioms (sophia's
    ``prepare_*_vocab``); off by default so data-only entailment stays
    oracle-comparable.
    """
    if with_axioms:
        spark = triples.sparkSession
        ax = spark.createDataFrame(_AXIOMS, "s string, p string, o string")
        triples = triples.select("s", "p", "o").unionByName(ax)
    out = triples.select("s", "p", "o").distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        n_before = out.count()

        # rdfs5 / rdfs11: transitive closures of the schema relations
        subprop = transitive_closure(_pairs(out, T_SUBPROP))
        subclass = transitive_closure(_pairs(out, T_SUBCLASS))
        domain = _pairs(out, T_DOMAIN)
        range_ = _pairs(out, T_RANGE)

        bc = F.broadcast  # schema sides are tiny vs the instance data

        new_parts = []
        # closure triples themselves are entailed
        new_parts.append(
            subprop.select("s", F.lit(T_SUBPROP).alias("p"), "o")
        )
        new_parts.append(
            subclass.select("s", F.lit(T_SUBCLASS).alias("p"), "o")
        )
        # rdfs7: (s p1 o) & (p1 subPropertyOf p2) → (s p2 o)
        new_parts.append(
            out.join(
                bc(subprop.withColumnRenamed("s", "p").withColumnRenamed("o", "p2")),
                "p",
            ).select("s", F.col("p2").alias("p"), "o")
        )
        # rdfs2: (s p o) & (p domain C) → (s rdf:type C)
        new_parts.append(
            out.join(
                bc(domain.withColumnRenamed("s", "p").withColumnRenamed("o", "C")),
                "p",
            ).select("s", F.lit(T_TYPE).alias("p"), F.col("C").alias("o"))
        )
        # rdfs3: (s p o) & (p range C) → (o rdf:type C); literals excluded
        new_parts.append(
            out.join(
                bc(range_.withColumnRenamed("s", "p").withColumnRenamed("o", "C")),
                "p",
            )
            .filter(~F.col("o").startswith('"'))
            .select(F.col("o").alias("s"), F.lit(T_TYPE).alias("p"), F.col("C").alias("o"))
        )
        # rdfs9: (x type C1) & (C1 subClassOf C2) → (x type C2)
        types = out.filter(F.col("p") == T_TYPE).select("s", F.col("o").alias("C1"))
        new_parts.append(
            types.join(
                bc(subclass.withColumnRenamed("s", "C1").withColumnRenamed("o", "C2")),
                "C1",
            ).select("s", F.lit(T_TYPE).alias("p"), F.col("C2").alias("o"))
        )
        # container membership (rdfs_membership_properties, _rdfs.rs:52):
        # rdf:_N used as predicate → typed ContainerMembershipProperty
        used_cmp = (
            out.filter(F.col("p").rlike(_CONTAINER_PRED_RE))
            .select(F.col("p").alias("s"))
            .distinct()
        )
        new_parts.append(
            used_cmp.select("s", F.lit(T_TYPE).alias("p"), F.lit(T_CMP).alias("o"))
        )
        # rdfs12: (p type ContainerMembershipProperty) → (p subPropertyOf rdfs:member)
        cmp_props = out.filter(
            (F.col("p") == T_TYPE) & (F.col("o") == T_CMP)
        ).select("s")
        new_parts.append(
            cmp_props.select(
                "s", F.lit(T_SUBPROP).alias("p"), F.lit(T_MEMBER).alias("o")
            )
        )
        # rdfs13: (x type rdfs:Datatype) → (x subClassOf rdfs:Literal)
        dts = out.filter((F.col("p") == T_TYPE) & (F.col("o") == T_DATATYPE)).select("s")
        new_parts.append(
            dts.select(
                "s", F.lit(T_SUBCLASS).alias("p"), F.lit(T_LITERAL_CLS).alias("o")
            )
        )

        new = new_parts[0]
        for part in new_parts[1:]:
            new = new.unionByName(part)
        out2 = out.unionByName(new).distinct().localCheckpoint(eager=True)
        if out2.count() == n_before:
            return out2
        out = out2
    return out


def entails(graph: DataFrame, query: DataFrame) -> bool:
    """`ReasonableGraph::entails` (`reasoner/src/_graph_impl.rs:91-99`):
    after saturation, the query graph is entailed iff it is a subset —
    left_anti join empty.  (Bnode-free queries only, as in round 1.)"""
    saturated = rdfs_saturate(graph)
    missing = query.select("s", "p", "o").join(
        saturated, ["s", "p", "o"], "left_anti"
    )
    return missing.limit(1).count() == 0
