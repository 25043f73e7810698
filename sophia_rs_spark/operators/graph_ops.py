"""Graph/Dataset query & mutation operators (SURVEY.md §2.4).

Thin DataFrame builders re-expressing sophia's ``Graph``/``Dataset`` API
(`api/src/graph.rs`, `api/src/dataset.rs`) over a quads DataFrame with
columns ``s, p, o`` (+ nullable ``g``).  Index selection (sophia's
SPO/POS/OSP BTreeSets, `inmem/src/graph.rs:161-260`) is replaced by
Catalyst predicate pushdown + partition pruning; these builders stay
declarative so those optimizations apply.

Matchers (`api/src/term/matcher/_trait.rs`): a position matcher is
- None        → Any
- str         → constant term (canonical encoding)
- list[str]   → any-of (IN)
- Column      → arbitrary boolean expression over the position column
- callable    → position-independent matcher: called with the column
                name, returns a boolean Column (the factories below:
                ``not_`` `_not.rs:7`, ``of_kind`` `_trait.rs:127`,
                ``with_datatype`` `_datatype_matcher.rs:28`,
                ``with_language`` `_language_tag_matcher.rs:29`)
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Matcher = Union[None, str, Iterable[str], Column, Callable[[str], Column]]

DEFAULT_GRAPH = object()  # sentinel: match the default graph (g IS NULL)


def _cond(col: str, m: Matcher) -> Optional[Column]:
    if m is None:
        return None
    if isinstance(m, Column):
        return m
    if isinstance(m, str):
        return F.col(col) == m
    if callable(m):
        return m(col)
    return F.col(col).isin(list(m))


def _apply(df: DataFrame, col: str, m: Matcher) -> DataFrame:
    c = _cond(col, m)
    return df if c is None else df.filter(c)


# --- matcher factories (position-independent, like sophia's) ---------------


def not_(m: Matcher) -> Callable[[str], Column]:
    """`Not` matcher (`matcher/_not.rs:7`)."""
    return lambda col: ~_cond(col, m)


def of_kind(kind: str) -> Callable[[str], Column]:
    """Match by term kind (`matcher/_trait.rs:127`):
    'iri' | 'literal' | 'bnode' | 'triple' | 'variable'."""
    from ..functions import sparql_fns as FN

    code = {"bnode": 0, "iri": 1, "literal": 2, "triple": 3, "variable": 4}[kind]
    return lambda col: FN.kind(F.col(col)) == code


def with_datatype(dt_iri: str) -> Callable[[str], Column]:
    """Match literals by datatype (`matcher/_datatype_matcher.rs:28`),
    including the implicit xsd:string / rdf:langString rules."""
    from ..functions import sparql_fns as FN

    return lambda col: FN.datatype(F.col(col)) == dt_iri


def with_language(tag: str) -> Callable[[str], Column]:
    """Match language-tagged literals by BCP47 basic range
    (`matcher/_language_tag_matcher.rs:29`): exact tag or prefix-dash."""
    from ..functions import sparql_fns as FN

    t = tag.lower()
    return lambda col: (
        (F.lower(FN.lang(F.col(col))) == t)
        | F.lower(FN.lang(F.col(col))).startswith(t + "-")
    )


def triples_matching(
    df: DataFrame, s: Matcher = None, p: Matcher = None, o: Matcher = None
) -> DataFrame:
    """`Graph::triples_matching` (`api/src/graph.rs:160`)."""
    out = _apply(df, "s", s)
    out = _apply(out, "p", p)
    out = _apply(out, "o", o)
    return out


def quads_matching(
    df: DataFrame,
    s: Matcher = None,
    p: Matcher = None,
    o: Matcher = None,
    g: Matcher = None,
) -> DataFrame:
    """`Dataset::quads_matching` (`api/src/dataset.rs:165`); ``g=DEFAULT_GRAPH``
    matches the default graph (NULL)."""
    out = triples_matching(df, s, p, o)
    if g is DEFAULT_GRAPH:
        return out.filter(F.col("g").isNull())
    return _apply(out, "g", g)


def contains(df: DataFrame, s: str, p: str, o: str) -> bool:
    """`Graph::contains` (`api/src/graph.rs:177`) — limit-1 existence probe."""
    return bool(triples_matching(df, s, p, o).limit(1).take(1))


def subjects(df: DataFrame, distinct: bool = True) -> DataFrame:
    out = df.select("s")
    return out.distinct() if distinct else out


def predicates(df: DataFrame, distinct: bool = True) -> DataFrame:
    out = df.select("p")
    return out.distinct() if distinct else out


def objects(df: DataFrame, distinct: bool = True) -> DataFrame:
    out = df.select("o")
    return out.distinct() if distinct else out


def atoms(df: DataFrame) -> DataFrame:
    """All term occurrences flattened (`Graph::iris/blank_nodes/...`,
    `api/src/graph.rs:254-312`): explode positions, tag kind."""
    cols = ["s", "p", "o"] + (["g"] if "g" in df.columns else [])
    t = df.select(F.explode(F.array(*cols)).alias("term")).filter(
        F.col("term").isNotNull()
    )
    from ..plans.extract import _term_kind_col

    return t.withColumn("kind", _term_kind_col(F.col("term")))


def terms_of_kind(df: DataFrame, kind: int) -> DataFrame:
    return atoms(df).filter(F.col("kind") == kind).select("term").distinct()


def graph_names(ds: DataFrame) -> DataFrame:
    """`Dataset::graph_names` (`api/src/dataset.rs:267`)."""
    return ds.select("g").filter(F.col("g").isNotNull()).distinct()


def graph_view(ds: DataFrame, name: Optional[str]) -> DataFrame:
    """`Dataset::graph(name)` (`api/src/dataset.rs:349`); None = default."""
    if name is None:
        return ds.filter(F.col("g").isNull()).drop("g")
    return ds.filter(F.col("g") == name).drop("g")


def union_graph(ds: DataFrame) -> DataFrame:
    """`Dataset::union_graph` (`api/src/dataset.rs:365`) — duplicates
    preserved (graph semantics allow them)."""
    return ds.drop("g")


def partial_union_graph(ds: DataFrame, names: Iterable[Optional[str]]) -> DataFrame:
    """`partial_union_graph(selector)` (`api/src/dataset.rs:357`)."""
    names = list(names)
    cond = F.col("g").isin([n for n in names if n is not None])
    if any(n is None for n in names):
        cond = cond | F.col("g").isNull()
    return ds.filter(cond).drop("g")


def as_dataset(graph: DataFrame) -> DataFrame:
    """`Graph::as_dataset` (`api/src/graph.rs:315`)."""
    return graph.withColumn("g", F.lit(None).cast("string"))


# --- mutation (batch semantics; `MutableGraph`, api/src/graph.rs:385-474) ---


def insert_all(df: DataFrame, new: DataFrame, set_graph: bool = True) -> DataFrame:
    out = df.unionByName(new, allowMissingColumns=True)
    if set_graph:
        cols = [c for c in ("s", "p", "o", "g") if c in out.columns]
        out = out.dropDuplicates(cols)
    return out


def remove_all(df: DataFrame, gone: DataFrame) -> DataFrame:
    cols = [c for c in ("s", "p", "o", "g") if c in gone.columns and c in df.columns]
    # null-safe keys: the default graph is NULL and must still match
    l, r = df.alias("l"), gone.select(*cols).alias("r")
    cond = None
    for c in cols:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        cond = eq if cond is None else (cond & eq)
    return l.join(r, cond, "left_anti")


def remove_matching(
    df: DataFrame, s: Matcher = None, p: Matcher = None, o: Matcher = None
) -> DataFrame:
    """`remove_matching` (`api/src/dataset.rs:573`) = keep the complement."""
    return df.exceptAll(triples_matching(df, s, p, o))


def retain_matching(
    df: DataFrame, s: Matcher = None, p: Matcher = None, o: Matcher = None
) -> DataFrame:
    return triples_matching(df, s, p, o)
