"""SPARQL algebra over DataFrames (SURVEY.md §2.5).

sophia evaluates BGPs with a left-deep index-nested-loop "bind join" in
textual order with no reordering (`sparql/src/bgp.rs:13-204`, TODO at
:19-33).  Here each triple pattern is an aliased scan of the triples
DataFrame and shared variables become equi-join keys — Catalyst then
reorders joins, broadcasts small sides and pushes the constant filters
into the scans, which is strictly stronger than the reference's
strategy.

Supported algebra (dispatcher parity with `sparql/src/exec.rs:125-181`):
BGP, Join, LeftJoin (OPTIONAL + expr), Filter, Union, Extend (BIND),
Minus (incl. the disjoint-domain rule), Values, OrderBy, Project,
Distinct, Reduced, Slice, Group/aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Var:
    name: str


def v(name: str) -> Var:
    return Var(name)


PatternTerm = Union[Var, str]  # variable or constant canonical encoding
Pattern = Tuple[PatternTerm, PatternTerm, PatternTerm]


def match_pattern(triples: DataFrame, pattern: Sequence[PatternTerm]) -> DataFrame:
    """One triple pattern → bindings DataFrame (one column per variable).

    Constants become pushed-down filters; repeated variables within the
    pattern become intra-row equality filters (e.g. ``?x <p> ?x``)."""
    cols = ["s", "p", "o", "g"][: len(pattern)]
    df = triples
    seen: dict[str, str] = {}
    projections: List[Column] = []
    for pos, term in zip(cols, pattern):
        if isinstance(term, Var):
            if term.name in seen:
                df = df.filter(F.col(pos) == F.col(seen[term.name]))
            else:
                seen[term.name] = pos
                projections.append(F.col(pos).alias(term.name))
        else:
            df = df.filter(F.col(pos) == term)
    return df.select(*projections) if projections else df.select()


def join_bindings(
    left: DataFrame, right: DataFrame, nullable: Sequence[str] = ()
) -> DataFrame:
    """SPARQL Join: binding compatibility (`sparql/src/exec.rs:484-518`).

    Shared variables that are guaranteed bound on both sides become plain
    equi-join keys (the fast path — hash join, Catalyst-reorderable).
    Variables listed in ``nullable`` may be UNBOUND on either side (UNDEF
    in VALUES, the optional side of OPTIONAL, asymmetric UNION branches):
    SPARQL compatibility treats unbound as a wildcard, so those become
    ``l IS NULL OR r IS NULL OR l = r`` join conditions and the output
    binding is ``coalesce(l, r)``.  Plain NULL equi-keys would silently
    drop such rows."""
    shared = [c for c in left.columns if c in right.columns]
    if not shared:
        return left.crossJoin(right)
    compat = [c for c in shared if c in set(nullable)]
    if not compat:
        return left.join(right, shared, "inner")
    eq = [c for c in shared if c not in set(compat)]
    la, ra = left.alias("l"), right.alias("r")
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"l.{c}").isNull()
            | F.col(f"r.{c}").isNull()
            | (F.col(f"l.{c}") == F.col(f"r.{c}"))
            for c in compat
        ],
        reduce(
            lambda a, b: a & b,
            [F.col(f"l.{c}") == F.col(f"r.{c}") for c in eq],
            F.lit(True),
        ),
    )
    out = la.join(ra, cond, "inner")
    keep = [
        (
            F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
            if c in compat
            else F.col(f"l.{c}").alias(c)
        )
        for c in left.columns
    ] + [F.col(f"r.{c}").alias(c) for c in right.columns if c not in shared]
    return out.select(*keep)


def bgp(triples: DataFrame, patterns: Sequence[Sequence[PatternTerm]]) -> DataFrame:
    """Basic graph pattern → bindings (self-join chain; Catalyst reorders)."""
    return reduce(join_bindings, (match_pattern(triples, p) for p in patterns))


def optional(
    left: DataFrame,
    right: DataFrame,
    condition: Optional[Column] = None,
    nullable: Sequence[str] = (),
) -> DataFrame:
    """LeftJoin / OPTIONAL (`sparql/src/exec.rs:520-551`): left-outer join
    on shared variables, with the optional filter expression folded into
    the join condition (not applied after — SPARQL LeftJoin semantics).
    ``nullable`` marks shared vars that may be unbound on either side —
    joined with compatibility semantics (see :func:`join_bindings`)."""
    shared = [c for c in left.columns if c in right.columns]
    compat = [c for c in shared if c in set(nullable)]
    if condition is None and not compat:
        if shared:
            return left.join(right, shared, "left_outer")
        return left.crossJoin(right)  # degenerate; rare
    la, ra = left.alias("l"), right.alias("r")
    cond = condition if condition is not None else F.lit(True)
    for c in shared:
        if c in compat:
            cond = cond & (
                F.col(f"l.{c}").isNull()
                | F.col(f"r.{c}").isNull()
                | (F.col(f"l.{c}") == F.col(f"r.{c}"))
            )
        else:
            cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    out = la.join(ra, cond, "left_outer")
    keep = [
        (
            F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
            if c in compat
            else F.col(f"l.{c}").alias(c)
        )
        for c in left.columns
    ] + [F.col(f"r.{c}").alias(c) for c in right.columns if c not in shared]
    return out.select(*keep)


def minus(
    left: DataFrame, right: DataFrame, nullable: Sequence[str] = ()
) -> DataFrame:
    """SPARQL MINUS (`sparql/src/exec.rs:754-790`): anti-join on shared
    vars; when domains are disjoint NOTHING is removed (≠ plain anti-join
    — the edge case SURVEY.md §2.5 flags).

    ``nullable`` shared vars may be UNBOUND on either side (UNDEF,
    post-OPTIONAL): MINUS removes a left row iff some right row is
    COMPATIBLE (unbound = wildcard) AND their bound domains overlap —
    same semantics as :func:`join_bindings`, anti-joined."""
    shared = [c for c in left.columns if c in right.columns]
    if not shared:
        return left
    compat = [c for c in shared if c in set(nullable)]
    if not compat:
        # fast path: all shared vars bound both sides → equi anti-join
        return left.join(right.select(*shared).distinct(), shared, "left_anti")
    la = left.alias("l")
    ra = right.select(*shared).distinct().alias("r")
    conds = [
        F.col(f"l.{c}").isNull()
        | F.col(f"r.{c}").isNull()
        | (F.col(f"l.{c}") == F.col(f"r.{c}"))
        for c in compat
    ] + [F.col(f"l.{c}") == F.col(f"r.{c}") for c in shared if c not in compat]
    # dom(l) ∩ dom(r) ≠ ∅ — compatibility with NO overlap does not remove
    overlap = reduce(
        lambda a, b: a | b,
        [F.col(f"l.{c}").isNotNull() & F.col(f"r.{c}").isNotNull() for c in shared],
    )
    cond = reduce(lambda a, b: a & b, conds) & overlap
    return la.join(ra, cond, "left_anti").select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns]
    )


def union_bindings(a: DataFrame, b: DataFrame) -> DataFrame:
    """SPARQL Union (`exec.rs:627-650`): concat with unified variable set,
    absent vars unbound (NULL)."""
    return a.unionByName(b, allowMissingColumns=True)


def values(spark: SparkSession, names: Sequence[str], rows: Sequence[Sequence]) -> DataFrame:
    """VALUES inline data (`exec.rs:792-824`)."""
    schema = ", ".join(f"{n} string" for n in names)
    return spark.createDataFrame([tuple(r) for r in rows], schema)


def extend(df: DataFrame, var: str, expr: Column) -> DataFrame:
    """Extend / BIND (`exec.rs:709-752`); rebinding is an error."""
    if var in df.columns:
        raise ValueError(f"variable ?{var} already bound")
    return df.withColumn(var, expr)


def exists_filter(
    left: DataFrame,
    right: DataFrame,
    negated: bool = False,
    nullable: Sequence[str] = (),
    right_nullable: Sequence[str] = (),
) -> DataFrame:
    """FILTER (NOT) EXISTS (`sparql/src/expression.rs:60`) — correlated
    subquery as a left-semi/anti join on shared variables.

    ``nullable`` shared vars may be UNBOUND on the LEFT (bound only in
    a prior OPTIONAL, UNDEF, …): §18.6 substitution only substitutes
    BOUND variables, so an unbound outer var leaves the subpattern
    variable free — those join with compatibility semantics
    (``l IS NULL OR r IS NULL OR l = r``) instead of plain equality,
    which would read EXISTS as false for every NULL row.
    ``right_nullable`` marks vars the SUBPATTERN may leave unbound (its
    own OPTIONAL): a NULL right value is a wildcard too.

    Scale shape: guaranteed-bound shared vars stay plain equi-keys.
    When only the left side can be NULL, rows whose compat vars are all
    bound take the equi hash join and only the NULL-carrying minority
    pays the non-equi compatibility join — without the split the whole
    left side would degrade to a nested-loop against the distinct
    subpattern solutions."""
    shared = [c for c in left.columns if c in right.columns]
    how = "left_anti" if negated else "left_semi"
    if not shared:
        n = right.limit(1).count()
        keep = (n == 0) if negated else (n > 0)
        return left if keep else left.limit(0)
    lnull, rnull = set(nullable), set(right_nullable)
    compat = [c for c in shared if c in lnull or c in rnull]
    rsel = right.select(*shared).distinct()
    if not compat:
        return left.join(rsel, shared, how)

    def _compat_join(lf):
        la, ra = lf.alias("l"), rsel.alias("r")
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"l.{c}").isNull()
                | F.col(f"r.{c}").isNull()
                | (F.col(f"l.{c}") == F.col(f"r.{c}"))
                for c in compat
            ],
            reduce(
                lambda a, b: a & b,
                [
                    F.col(f"l.{c}") == F.col(f"r.{c}")
                    for c in shared
                    if c not in set(compat)
                ],
                F.lit(True),
            ),
        )
        return la.join(ra, cond, how)

    if any(c in rnull for c in compat):
        # the subpattern itself may bind NULL (wildcard) — a plain
        # equi join would drop those matches even for bound left rows
        return _compat_join(left)
    all_bound = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in compat]
    )
    eq_part = left.filter(all_bound).join(rsel, shared, how)
    return eq_part.unionByName(_compat_join(left.filter(~all_bound)))


# --- solution modifiers -----------------------------------------------------


def order_by(df: DataFrame, *keys: Column) -> DataFrame:
    return df.orderBy(*keys)


def project(df: DataFrame, names: Sequence[str]) -> DataFrame:
    return df.select(*names)


def distinct(df: DataFrame) -> DataFrame:
    return df.dropDuplicates()


def reduced(df: DataFrame) -> DataFrame:
    # Reduced allows any amount of dedup; full dedup is spec-compliant
    # (`exec.rs:575-595` dedups adjacent only).
    return df.dropDuplicates()


def slice_(df: DataFrame, offset: int = 0, limit: Optional[int] = None) -> DataFrame:
    out = df.offset(offset) if offset else df
    return out.limit(limit) if limit is not None else out


def ask(df: DataFrame) -> bool:
    """ASK (`exec.rs:215-225`)."""
    return bool(df.limit(1).take(1))


def construct(
    df: DataFrame, templates: Sequence[Sequence[PatternTerm]]
) -> DataFrame:
    """CONSTRUCT (`sparql/src/exec/construct_iter.rs`): instantiate triple
    templates per binding, drop rows with unbound slots, dedup."""
    parts = []
    for s, p, o in templates:
        cols = [
            (
                F.col(t.name)
                if isinstance(t, Var)
                else (t if isinstance(t, Column) else F.lit(t))
            ).alias(pos)
            for t, pos in ((s, "s"), (p, "p"), (o, "o"))
        ]
        part = df.select(*cols).filter(
            F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
        )
        parts.append(part)
    return reduce(lambda a, b: a.unionByName(b), parts).dropDuplicates()
