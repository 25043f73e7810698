"""Build a SPARQL query from a PATTERN GRAPH — the reference's
query-from-graph wrapper (`sparql/src/wrapper/_graph_to_query.rs:18-25`:
``prepare_ask_from_triples`` / ``prepare_select_from_triples`` /
``prepare_construct_from_triples``), closing the last SURVEY.md §2 row.

The input is an iterable of ``(s, p, o)`` triples whose components are
either canonical term strings (``<iri>``, ``"lit"``, ``"lit"@en``,
``_:label``), SPARQL variables (an :class:`~.parser.Var` or a string
``"?name"``), or a nested 3-tuple for a triple term.  Mapping (mirrors
``prepare_term_pattern`` / ``prepare_named_node_pattern`` /
``prepare_escaped_triple_term_pattern``):

* subject/object: IRIs, literals, variables map directly; a blank node
  becomes the variable ``__<label>`` (an existential — query bnodes
  never match by identity); a triple term with variables lowers to a
  slot variable + destructuring record exactly like the text parser.
* predicate: IRIs and variables map directly; a blank node becomes
  ``__<label>``; a LITERAL (not a legal predicate pattern) becomes a
  minted variable constrained by ``FILTER sameTerm(?v, lit)``; a triple
  term becomes a minted variable destructured through
  ``BIND(SUBJECT(?v) …)`` / ``sameTerm`` filters.

The result is a parsed :class:`~.parser.Query` that evaluates through
the regular engine (:func:`~.eval.evaluate`), or use the one-call
:func:`query_from_graph`.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple, Union

from . import parser as A
from .parser import SparqlError

TermIn = Union[str, A.Var, Tuple[object, object, object]]


class _Builder:
    def __init__(self) -> None:
        self.patterns: List[A.TriplePattern] = []
        self.pending: List[A.TTermPattern] = []
        self.binds: List[A.Bind] = []
        self.filters: List[A.Expr] = []
        self._n = 0
        self._ttn = 0
        self.user_vars: List[str] = []

    def mint(self) -> A.Var:
        self._n += 1
        return A.Var(f"#gq{self._n}")

    def _seen(self, name: str) -> None:
        if not name.startswith(("#", "__")) and name not in self.user_vars:
            self.user_vars.append(name)

    # -- term positions ----------------------------------------------------

    def term_pattern(self, t: TermIn):
        """Subject/object position (``prepare_term_pattern``)."""
        if isinstance(t, A.Var):
            self._seen(t.name)
            return t
        if isinstance(t, tuple):
            return self._lower_tterm(t)
        if not isinstance(t, str) or not t:
            raise SparqlError(f"not a term: {t!r}")
        if t.startswith("?") or t.startswith("$"):
            self._seen(t[1:])
            return A.Var(t[1:])
        if t.startswith("_:"):
            return A.Var(f"#bn{t[2:]}")
        if t.startswith("<<("):
            return t  # ground triple term: matches by identity
        return t

    def predicate_pattern(self, t: TermIn):
        """Predicate position (``prepare_named_node_pattern``)."""
        if isinstance(t, A.Var):
            self._seen(t.name)
            return t
        if isinstance(t, str):
            if t.startswith("?") or t.startswith("$"):
                self._seen(t[1:])
                return A.Var(t[1:])
            if t.startswith("_:"):
                return A.Var(f"#bn{t[2:]}")
            if t.startswith("<") and not t.startswith("<<("):
                return t
        # literal or triple term in predicate position: minted var +
        # constraint (the grammar has no pattern form for these)
        v = self.mint()
        if isinstance(t, tuple):
            self._escaped_tterm(v, t)
        elif isinstance(t, str):
            self.filters.append(
                A.Expr(
                    "call",
                    ("SAMETERM", [A.Expr("var", (v.name,)), A.Expr("term", (t,))]),
                )
            )
        else:
            raise SparqlError(f"not a term: {t!r}")
        return v

    # -- triple terms ------------------------------------------------------

    def _lower_tterm(self, t: tuple):
        """Triple term in s/o pattern position — same lowering as the
        text parser (`parser.py _lower_pattern_term`): ground components
        collapse to the canonical string, otherwise a ``#ttN`` slot var
        + destructuring record (drained after the BGP matches)."""
        if len(t) != 3:
            raise SparqlError(f"triple term needs 3 components: {t!r}")
        s, p, o = (self.term_pattern(x) for x in t)
        if all(isinstance(x, str) for x in (s, p, o)):
            return f"<<( {s} {p} {o} )>>"
        self._ttn += 1
        v = A.Var(f"#gqtt{self._ttn}")
        self.pending.append(A.TTermPattern(v, s, p, o))
        return v

    def _escaped_tterm(self, var: A.Var, spo: tuple) -> None:
        """Triple term in PREDICATE position: destructure the minted
        var with SUBJECT/PREDICATE/OBJECT accessors
        (``prepare_escaped_triple_term_pattern``)."""
        if len(spo) != 3:
            raise SparqlError(f"triple term needs 3 components: {spo!r}")
        for part, fn in zip(spo, ("SUBJECT", "PREDICATE", "OBJECT")):
            acc = A.Expr("call", (fn, [A.Expr("var", (var.name,))]))
            if isinstance(part, tuple):
                v2 = self.mint()
                self.binds.append(A.Bind(acc, v2))
                self._escaped_tterm(v2, part)
                continue
            e2 = self._expr(part)
            if e2.op == "var":
                self.binds.append(A.Bind(acc, A.Var(e2.args[0])))
            else:
                self.filters.append(A.Expr("call", ("SAMETERM", [acc, e2])))

    def _expr(self, t: TermIn) -> A.Expr:
        """Ground term / variable → expression (``prepare_expr``)."""
        if isinstance(t, A.Var):
            self._seen(t.name)
            return A.Expr("var", (t.name,))
        if isinstance(t, str):
            if t.startswith("?") or t.startswith("$"):
                self._seen(t[1:])
                return A.Expr("var", (t[1:],))
            if t.startswith("_:"):
                return A.Expr("var", (f"#bn{t[2:]}",))
            return A.Expr("term", (t,))
        raise SparqlError(f"not a term: {t!r}")


def _algebra(triples: Iterable[Tuple[TermIn, TermIn, TermIn]]) -> Tuple[A.Group, _Builder]:
    b = _Builder()
    for s, p, o in triples:
        b.patterns.append(
            A.TriplePattern(
                b.term_pattern(s), b.predicate_pattern(p), b.term_pattern(o)
            )
        )
    elements: List[object] = list(b.patterns)
    elements.extend(b.pending)
    elements.extend(b.binds)
    elements.extend(A.Filter(f) for f in b.filters)
    return A.Group(elements), b


def select_from_triples(triples: Iterable[Tuple[TermIn, TermIn, TermIn]]) -> A.Query:
    """SELECT query over the pattern graph — projects the user-named
    variables (minted/bnode-derived ones stay hidden, matching the
    reference's SELECT-* over a BGP whose bnodes are not variables).

    Bnode placeholders are minted as '#bn…' (a '#' name is impossible
    in a SPARQL VARNAME), so even the all-ground/bnode-only case —
    where ``user_vars`` is empty and the query evaluates as SELECT * —
    keeps them hidden: the SELECT * projection drops '#'-prefixed
    existential columns."""
    group, b = _algebra(triples)
    return A.Query("select", list(b.user_vars), [], group)


def ask_from_triples(triples: Iterable[Tuple[TermIn, TermIn, TermIn]]) -> A.Query:
    group, _b = _algebra(triples)
    return A.Query("ask", [], [], group)


def construct_from_triples(triples: Iterable[Tuple[TermIn, TermIn, TermIn]]) -> A.Query:
    """CONSTRUCT whose template IS the pattern BGP (``find_bgp``)."""
    group, b = _algebra(triples)
    q = A.Query("construct", [], [], group)
    q.template = list(b.patterns)
    return q


def query_from_graph(dataset, triples, form: str = "select"):
    """One-call convenience: build the query and evaluate it against a
    triples/quads DataFrame.  ``form`` ∈ {select, ask, construct}."""
    from .eval import evaluate

    builder = {
        "select": select_from_triples,
        "ask": ask_from_triples,
        "construct": construct_from_triples,
    }.get(form)
    if builder is None:
        raise SparqlError(f"unknown query form {form!r}")
    return evaluate(dataset, builder(triples))
