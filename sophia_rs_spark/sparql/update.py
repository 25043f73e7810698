"""SPARQL 1.1 Update front-end (sparql11-update) — functional
graph-store semantics over an immutable quads DataFrame.

BEYOND the reference: sophia_rs has no update evaluator (mutation there
is the Graph/Dataset API — `api/src/dataset.rs` ``MutableDataset``,
whose DataFrame twins live in :mod:`sophia_rs_spark.operators.
graph_ops`); this front-end drives the same bulk operations from
SPARQL Update text, reusing the query parser/evaluator for the WHERE
machinery.

Spark-first semantics: a dataset is a quads DataFrame ``(s, p, o, g)``
with ``g IS NULL`` for the default graph, and every operation returns
a NEW DataFrame — no in-place store.  Set semantics without full-table
dedup: inserts union only the rows NOT already present (a null-safe
anti-join whose small side is the inserted batch — no shuffle of the
big table), deletes are null-safe anti-joins.  At 100 TB an update
touches the dataset once per operation, never re-sorts it.

Supported (sparql11-update §3.1-§3.2): INSERT DATA, DELETE DATA,
DELETE WHERE, [WITH] DELETE/INSERT … [USING [NAMED]] WHERE, LOAD
[SILENT] [INTO GRAPH], CLEAR/DROP/CREATE [SILENT], ADD/MOVE/COPY
[SILENT], ';'-separated sequences sharing one prologue scope.

Blank-node minting: labels in INSERT DATA are renamed to fresh labels
deterministically derived from the operation text (re-running the same
update is idempotent — the functional-store analogue of "fresh per
execution"); bnodes in an INSERT template mint one fresh node per
solution like CONSTRUCT.  Bnodes are rejected in DELETE DATA, DELETE
templates and DELETE WHERE, as the spec requires.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import parser as A
from .parser import SparqlError

QCOLS = ["s", "p", "o", "g"]

#: (s, p, o, g) with terms, Vars, or None (g None = default graph)
QuadT = Tuple[object, object, object, Optional[str]]


# ---------------------------------------------------------------------------
# operation AST
# ---------------------------------------------------------------------------


@dataclass
class InsertData:
    quads: List[QuadT]


@dataclass
class DeleteData:
    quads: List[QuadT]


@dataclass
class DeleteWhere:
    quads: List[QuadT]
    group: A.Group


@dataclass
class Modify:
    delete: List[QuadT]
    insert: List[QuadT]
    where: A.Group
    with_graph: Optional[str] = None
    using: List[str] = field(default_factory=list)
    using_named: List[str] = field(default_factory=list)


@dataclass
class Load:
    iri: str
    into_graph: Optional[str] = None
    silent: bool = False


@dataclass
class GraphMgmt:
    """CLEAR / DROP / CREATE — target ∈ {("graph", iri), "default",
    "named", "all"}.  DROP ≡ CLEAR and CREATE is a no-op: graphs have
    no existence apart from their quads in a quad-table store."""

    verb: str
    target: object
    silent: bool = False


@dataclass
class GraphCopy:
    """ADD / MOVE / COPY [SILENT] src TO dst (src/dst: "default" or a
    graph IRI)."""

    verb: str
    src: object
    dst: object
    silent: bool = False


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class _UP(A._P):
    def parse_update(self) -> List[object]:
        ops: List[object] = []
        while True:
            # prologue may precede any operation (shared scope)
            while True:
                if self.kw("PREFIX"):
                    p = self.next()
                    if p[0] != "pname":
                        raise SparqlError("expected prefix name")
                    ns = (
                        p[1][:-1]
                        if p[1].endswith(":")
                        else p[1].partition(":")[0]
                    )
                    i = self.next()
                    if i[0] != "iri":
                        raise SparqlError("expected IRI in PREFIX")
                    self.prefixes[ns] = A.unescape(i[1][1:-1])
                    continue
                if self.kw("BASE"):
                    i = self.next()
                    self.base = A.unescape(i[1][1:-1])
                    continue
                break
            if self.peek() is None:
                break
            ops.append(self._operation())
            if not self.op(";"):
                if self.peek() is not None:
                    t = self.peek()
                    raise SparqlError(
                        f"expected ';' between update operations, got {t[1]!r}"
                    )
                break
        return ops

    # -- operations --------------------------------------------------------

    def _operation(self):
        if self.kw("INSERT"):
            if self.kw("DATA"):
                return InsertData(self._quad_block(allow_vars=False))
            ins = self._quad_block(allow_vars=True, forbid="paths")
            return self._modify_tail([], ins)
        if self.kw("DELETE"):
            if self.kw("DATA"):
                q = self._quad_block(allow_vars=False)
                self._no_bnodes(q, "DELETE DATA")
                return DeleteData(q)
            if self.kw("WHERE"):
                t = self.peek()
                if t is None or t[:2] != ("op", "{"):
                    raise SparqlError("expected quad pattern after DELETE WHERE")
                grp = self.parse_group()
                q = self._group_quads(grp, allow_vars=True)
                self._no_bnodes(q, "DELETE WHERE")
                return DeleteWhere(q, grp)
            dels = self._quad_block(allow_vars=True, forbid="paths")
            self._no_bnodes(dels, "a DELETE template")
            ins: List[QuadT] = []
            if self.kw("INSERT"):
                ins = self._quad_block(allow_vars=True, forbid="paths")
            return self._modify_tail(dels, ins)
        if self.kw("WITH"):
            g = self.parse_term(allow_var=False)
            op = self._operation()
            if not isinstance(op, Modify):
                raise SparqlError("WITH applies to DELETE/INSERT … WHERE")
            op.with_graph = g
            return op
        if self.kw("LOAD"):
            silent = self.kw("SILENT")
            iri = self.parse_term(allow_var=False)
            into = None
            if self.kw("INTO"):
                self.expect_kw("GRAPH")
                into = self.parse_term(allow_var=False)
            return Load(iri, into, silent)
        for verb in ("CLEAR", "DROP", "CREATE"):
            if self.kw(verb):
                silent = self.kw("SILENT")
                return GraphMgmt(verb.lower(), self._graph_ref(), silent)
        for verb in ("ADD", "MOVE", "COPY"):
            if self.kw(verb):
                silent = self.kw("SILENT")
                src = self._graph_or_default()
                self.expect_kw("TO")
                dst = self._graph_or_default()
                return GraphCopy(verb.lower(), src, dst, silent)
        t = self.peek()
        raise SparqlError(f"unknown update operation at {t[1]!r}")

    def _modify_tail(self, dels, ins) -> Modify:
        using, using_named = [], []
        while self.kw("USING"):
            if self.kw("NAMED"):
                using_named.append(self.parse_term(allow_var=False))
            else:
                using.append(self.parse_term(allow_var=False))
        self.expect_kw("WHERE")
        return Modify(dels, ins, self.parse_group(), None, using, using_named)

    def _graph_ref(self):
        if self.kw("GRAPH"):
            return ("graph", self.parse_term(allow_var=False))
        if self.kw("DEFAULT"):
            return "default"
        if self.kw("NAMED"):
            return "named"
        if self.kw("ALL"):
            return "all"
        raise SparqlError("expected GRAPH <iri> | DEFAULT | NAMED | ALL")

    def _graph_or_default(self):
        if self.kw("DEFAULT"):
            return "default"
        self.kw("GRAPH")  # optional keyword before the IRI
        return ("graph", self.parse_term(allow_var=False))

    # -- quad blocks -------------------------------------------------------

    def _quad_block(self, *, allow_vars: bool, forbid: str = "") -> List[QuadT]:
        t = self.peek()
        if t is None or t[:2] != ("op", "{"):
            raise SparqlError("expected '{' opening a quad block")
        grp = self.parse_group()
        return self._group_quads(grp, allow_vars=allow_vars)

    def _group_quads(self, grp: A.Group, *, allow_vars: bool) -> List[QuadT]:
        """Flatten a parsed group into template quads; anything beyond
        triples and constant-named GRAPH blocks is a syntax error in a
        quad block."""
        out: List[QuadT] = []

        # triple terms in a TEMPLATE quad block are CONSTRUCTION, like
        # in CONSTRUCT templates: fold the lowered TTermPattern records
        # back into TTerm nodes in the slots
        ttmap = {
            e.var.name: e
            for e in grp.elements
            if isinstance(e, A.TTermPattern)
        }

        def fold(t):
            if isinstance(t, A.Var) and t.name in ttmap:
                r = ttmap[t.name]
                return A.TTerm(fold(r.s), fold(r.p), fold(r.o))
            return t

        def _vars_in(term):
            if isinstance(term, A.TTerm):
                for x in (term.s, term.p, term.o):
                    yield from _vars_in(x)
            elif isinstance(term, A.Var):
                yield term

        def add(tp, g):
            if isinstance(tp.p, A.PathExpr):
                raise SparqlError("property paths are not allowed in quads")
            s, p, o = fold(tp.s), tp.p, fold(tp.o)
            for term in (s, p, o):
                for var in _vars_in(term):
                    if not allow_vars:
                        raise SparqlError(
                            f"variable ?{var.name} not allowed in ground quads"
                        )
            out.append((s, p, o, g))

        for el in grp.elements:
            if isinstance(el, A.TriplePattern):
                add(el, None)
            elif isinstance(el, A.TTermPattern):
                pass  # folded into its slot via ttmap
            elif isinstance(el, A.GraphClause):
                # QuadsNotTriples ::= 'GRAPH' VarOrIri '{' … '}' — a
                # variable graph name is legal wherever variables are
                # (DELETE WHERE / modify templates), instantiated per
                # solution; ground DATA blocks still need a constant
                if isinstance(el.name, A.Var) and not allow_vars:
                    raise SparqlError(
                        "GRAPH in a ground quad block needs a constant IRI"
                    )
                ttmap.update(
                    (e.var.name, e)
                    for e in el.group.elements
                    if isinstance(e, A.TTermPattern)
                )
                for inner in el.group.elements:
                    if isinstance(inner, A.TTermPattern):
                        continue
                    if not isinstance(inner, A.TriplePattern):
                        raise SparqlError(
                            "only triples allowed inside GRAPH of a quad block"
                        )
                    add(inner, el.name)
            else:
                raise SparqlError(
                    f"{type(el).__name__} not allowed in a quad block"
                )
        return out

    @staticmethod
    def _no_bnodes(quads: List[QuadT], where: str):
        def chk(term):
            if isinstance(term, A.TTerm):
                for x in (term.s, term.p, term.o):
                    chk(x)
            elif isinstance(term, str) and term.startswith("_:"):
                raise SparqlError(f"blank nodes not allowed in {where}")

        for s, p, o, _g in quads:
            for term in (s, p, o):
                chk(term)


def parse_update(text: str, base: Optional[str] = None) -> List[object]:
    return _UP(text, base).parse_update()


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------


def _quads_df(spark: SparkSession, quads: List[QuadT]) -> DataFrame:
    rows = [(s, p, o, g) for s, p, o, g in quads]
    return spark.createDataFrame(rows, "s string, p string, o string, g string")


def _minus(a: DataFrame, b: DataFrame, *, small: bool = False) -> DataFrame:
    """Set difference on all four columns, null-safe in g (the default
    graph is ``g IS NULL``).  ``small=True`` marks b as a ground-quad
    batch (bounded by the update text length): the hint matters because
    a local batch has no size statistics, so without it the planner
    assumes it is huge and sort-merge-joins — shuffling the whole
    store."""
    la, rb = a.alias("l"), b.alias("r")
    if small:
        rb = F.broadcast(rb)
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in QCOLS],
    )
    return la.join(rb, cond, "left_anti").select(
        *[F.col(f"l.{c}").alias(c) for c in QCOLS]
    )


def _union_set(
    base: DataFrame, add: DataFrame, *, small: bool = False
) -> DataFrame:
    """base ∪ add under set semantics without re-deduplicating or
    shuffling base.

    The membership probe is shaped so the (100 TB) store is always the
    STREAM side: ``base LEFT SEMI add`` scans base once against the
    (typically tiny, broadcastable) insert batch and emits at most
    |add| rows; the final anti-join then runs between two small frames.
    The naive ``add LEFT ANTI base`` would put the store on the build
    side — never broadcastable — forcing a full shuffle of the store on
    every INSERT.  ``small=True`` (ground INSERT DATA batches, bounded
    by the update text) adds the broadcast hint the planner cannot
    infer for a statistics-free local batch; instantiated template
    batches are left to AQE's runtime decision."""
    add = add.dropDuplicates()
    la, rb = base.alias("l"), add.alias("r")
    if small:
        rb = F.broadcast(rb)
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in QCOLS],
    )
    present = la.join(rb, cond, "left_semi").select(
        *[F.col(f"l.{c}").alias(c) for c in QCOLS]
    )
    return base.unionByName(_minus(add, present, small=True))


def _graph_cond(target):
    if target == "default":
        return F.col("g").isNull()
    if target == "named":
        return F.col("g").isNotNull()
    if target == "all":
        return F.lit(True)
    # null-safe: rows of the default graph (g IS NULL) must evaluate
    # FALSE here, not NULL — ~NULL would silently drop them
    return F.col("g").eqNullSafe(F.lit(target[1]))


def _graph_exists(dataset: DataFrame, target) -> bool:
    """Existence probe for the §3.2.x non-SILENT error semantics.  In
    the quads-table model a named graph exists iff it holds at least
    one quad; DEFAULT/NAMED/ALL targets always exist (the default graph
    is always present, NAMED/ALL name no specific graph)."""
    if not isinstance(target, tuple):
        return True
    return bool(
        dataset.filter(_graph_cond(target)).limit(1).take(1)
    )


def _fresh_labels(quads: List[QuadT], salt: str) -> List[QuadT]:
    """INSERT DATA bnode labels → fresh labels derived from the
    operation text (idempotent re-execution; see module docstring)."""
    h = hashlib.sha256(salt.encode()).hexdigest()[:12]

    def ren(t):
        if isinstance(t, str) and t.startswith("_:"):
            return f"_:u{h}x{t[2:]}"
        return t

    return [(ren(s), ren(p), ren(o), g) for s, p, o, g in quads]


def _select_all(dataset: DataFrame, group: A.Group, from_graphs, from_named):
    from .eval import evaluate

    q = A.Query("select", [], [], group)
    q.from_graphs = list(from_graphs)
    q.from_named = list(from_named)
    return evaluate(dataset, q)


def _instantiate(
    bindings: DataFrame,
    quads: List[QuadT],
    default_g: Optional[str],
    mint_bnodes: bool,
) -> DataFrame:
    """Template quads × solutions → ground quads DataFrame (CONSTRUCT
    semantics: solutions with an unbound template variable contribute
    nothing; template bnodes mint one fresh node per solution)."""
    spark = bindings.sparkSession
    sol_cols = [F.col(c) for c in bindings.columns] or [F.lit(0)]

    def inst(t):
        if isinstance(t, A.TTerm):
            # triple term in a template: construct per solution
            # (TRIPLE semantics — invalid kinds → NULL → row skipped)
            from ..functions import sparql_fns as FN

            return FN.triple_term(inst(t.s), inst(t.p), inst(t.o))
        if isinstance(t, A.Var):
            if t.name in bindings.columns:
                return F.col(t.name)
            return F.lit(None).cast("string")
        if mint_bnodes and isinstance(t, str) and t.startswith("_:"):
            return F.concat(
                F.lit(f"_:ut{t[2:]}x"),
                F.lower(F.hex(F.xxhash64(*sol_cols))),
            )
        return F.lit(t)

    parts = []
    for s, p, o, g in quads:
        gv = g if g is not None else default_g
        cols = [
            inst(s).alias("s"),
            inst(p).alias("p"),
            inst(o).alias("o"),
            (inst(gv) if gv is not None else F.lit(None)).cast("string").alias("g"),
        ]
        part = bindings.select(*cols).filter(
            F.col("s").isNotNull()
            & F.col("p").isNotNull()
            & F.col("o").isNotNull()
        )
        if isinstance(gv, A.Var):
            # variable graph name: an unbound ?g (or one bound to a
            # literal or triple term — not valid graph names)
            # contributes nothing; NULL here would silently mean
            # "default graph".  Only IRIs and bnodes qualify.
            part = part.filter(
                F.col("g").isNotNull()
                & (F.col("g").startswith("_:")
                   | (F.col("g").startswith("<")
                      & ~F.col("g").startswith("<<(")))
            )
        parts.append(part)
    if not parts:
        return _quads_df(spark, [])
    return reduce(lambda x, y: x.unionByName(y), parts).dropDuplicates()


def _default_loader(spark: SparkSession, iri: str) -> DataFrame:
    """LOAD's document loader: local file IRIs/paths, format from the
    extension, parsed DISTRIBUTED through the extraction pipeline.
    Injectable via ``update(..., loader=…)`` for remote documents."""
    from ..plans.extract import extract_quads

    url = iri[1:-1] if iri.startswith("<") else iri
    path = url[len("file://") :] if url.startswith("file://") else url
    ext = path.rsplit(".", 1)[-1].lower()
    fmt = {
        "nt": "nt",
        "nq": "nq",
        "ttl": "ttl",
        "turtle": "ttl",
        "trig": "trig",
        "rdf": "rdfxml",
        "rdfxml": "rdfxml",
        "xml": "rdfxml",
        "jsonld": "jsonld",
        "json": "jsonld",
    }.get(ext)
    if fmt is None:
        raise SparqlError(f"LOAD: cannot guess format of {url!r}")
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()
    pages = spark.createDataFrame(
        [(url, text, fmt)], "url string, text string, fmt string"
    )
    quads = extract_quads(pages, from_html=False)
    bad = quads.where(quads["error"].isNotNull()).limit(1).collect()
    if bad:
        raise SparqlError(f"LOAD: parse error in {url!r}: {bad[0]['error']}")
    return quads.select("s", "p", "o", "g")


Loader = Callable[[SparkSession, str], DataFrame]


def _apply(dataset: DataFrame, op, loader: Loader, salt: str) -> DataFrame:
    spark = dataset.sparkSession
    if isinstance(op, InsertData):
        return _union_set(
            dataset, _quads_df(spark, _fresh_labels(op.quads, salt)),
            small=True,
        )
    if isinstance(op, DeleteData):
        return _minus(dataset, _quads_df(spark, op.quads), small=True)
    if isinstance(op, DeleteWhere):
        bindings = _select_all(dataset, op.group, [], [])
        return _minus(
            dataset, _instantiate(bindings, op.quads, None, mint_bnodes=False)
        )
    if isinstance(op, Modify):
        where = op.where
        if op.with_graph is not None and not op.using and not op.using_named:
            # WITH <g>: the pattern matches against g unless it already
            # scopes itself with GRAPH (nested GRAPH overrides)
            where = A.Group([A.GraphClause(op.with_graph, where)])
        bindings = _select_all(dataset, where, op.using, op.using_named)
        dels = _instantiate(
            bindings, op.delete, op.with_graph, mint_bnodes=False
        )
        ins = _instantiate(bindings, op.insert, op.with_graph, mint_bnodes=True)
        # both templates are instantiated against the ORIGINAL state;
        # deletes apply first (sparql11-update §3.1.3)
        return _union_set(_minus(dataset, dels), ins)
    if isinstance(op, Load):
        try:
            quads = loader(spark, op.iri)
            if "g" not in quads.columns:
                quads = quads.withColumn("g", F.lit(None).cast("string"))
            if op.into_graph is not None:
                quads = quads.withColumn("g", F.lit(op.into_graph))
            quads = quads.select(*QCOLS)
            quads.schema  # force analysis so errors surface here
        except Exception as ex:
            if op.silent:
                return dataset
            raise SparqlError(f"LOAD {op.iri} failed: {ex}") from ex
        return _union_set(dataset, quads)
    if isinstance(op, GraphMgmt):
        if op.verb == "create":
            # existence model: a graph exists iff it holds quads, so
            # CREATE of an absent graph is a no-op; §3.2.1 still makes
            # non-SILENT CREATE of an EXISTING graph an error
            if not op.silent and _graph_exists(dataset, op.target):
                raise SparqlError(
                    f"CREATE: graph {op.target[1]} already exists"
                )
            return dataset
        # §3.2.2-3.2.3: non-SILENT CLEAR/DROP of a nonexistent named
        # graph is an error (DEFAULT/NAMED/ALL targets always succeed)
        if not op.silent and not _graph_exists(dataset, op.target):
            raise SparqlError(
                f"{op.verb.upper()}: graph {op.target[1]} does not exist"
            )
        return dataset.filter(~_graph_cond(op.target))
    if isinstance(op, GraphCopy):
        # §3.2.5-3.2.7: ADD/MOVE/COPY FAIL when the SOURCE named graph
        # does not exist (the default graph always exists); SILENT
        # suppresses the error and the failed operation changes nothing
        # (it must NOT still replace the destination)
        if not _graph_exists(dataset, op.src):
            if op.silent:
                return dataset
            raise SparqlError(
                f"{op.verb.upper()}: source graph {op.src[1]} does not exist"
            )
        src_g = None if op.src == "default" else op.src[1]
        dst_g = None if op.dst == "default" else op.dst[1]
        if src_g == dst_g:
            return dataset  # ADD/MOVE/COPY g TO g are no-ops (§3.2.5)
        src_part = dataset.filter(_graph_cond(op.src)).withColumn(
            "g", F.lit(dst_g).cast("string")
        )
        if op.verb == "add":
            return _union_set(dataset, src_part)
        rest = dataset.filter(~_graph_cond(op.dst))  # dst is REPLACED
        if op.verb == "move":
            rest = rest.filter(~_graph_cond(op.src))
        return rest.unionByName(src_part)
    raise SparqlError(f"unknown update operation {op!r}")


def update(
    dataset: DataFrame, text: str, *, loader: Optional[Loader] = None
) -> DataFrame:
    """Apply a SPARQL Update string to a quads DataFrame ``(s, p, o,
    g)`` (``g IS NULL`` = default graph) and return the new dataset.
    Operations separated by ``;`` run in sequence, each seeing the
    previous one's result (sparql11-update §3)."""
    from .eval import _tune_codegen_limits

    _tune_codegen_limits(dataset.sparkSession)
    for c in QCOLS:
        if c not in dataset.columns:
            if c == "g":
                dataset = dataset.withColumn("g", F.lit(None).cast("string"))
            else:
                raise SparqlError(f"dataset is missing column {c!r}")
    dataset = dataset.select(*QCOLS)
    ld = loader if loader is not None else _default_loader
    for i, op in enumerate(parse_update(text)):
        dataset = _apply(dataset, op, ld, salt=f"{text}#{i}")
    return dataset
