"""SPARQL 1.1/1.2 subset parser → algebra AST.

Supported (the operator surface of SURVEY.md §2.5 that our evaluator
implements): PREFIX/BASE prologue, SELECT [DISTINCT|REDUCED] (vars|*),
ASK, CONSTRUCT {template}, WHERE groups with triple patterns (``;``/``,``
sugar, ``a``, literal sugar, blank-node property lists, collection
sugar), FILTER (comparisons, logical ops, arithmetic,
IN, EXISTS/NOT EXISTS, and the builtin functions the engine provides),
OPTIONAL, MINUS, UNION, BIND, VALUES, GRAPH ?g/<iri>, property-path
atoms (``p+``, ``p*``, ``p?``, ``^p``, ``p1/p2``, ``p1|p2``), GROUP BY +
aggregates (COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT/SAMPLE), ORDER BY
ASC/DESC, LIMIT/OFFSET, trailing VALUES clause.

The AST is plain dataclasses; evaluation lives in ``eval.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

from ..terms.iri import resolve, split_iri
from ..terms.model import RDF, XSD, escape_literal, unescape

RDF_TYPE_T = f"<{RDF}type>"


class SparqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class PathExpr:
    """Property-path: op in {pred, seq, alt, inv, star, plus, opt, neg}."""

    op: str
    args: tuple


@dataclass(frozen=True)
class TTerm:
    """SPARQL 1.2 triple term ``<<( s p o )>>`` with at least one
    variable/bnode component (ground ones collapse to their canonical
    term string at parse time).  In a PATTERN it lowers to a fresh
    ``#ttN`` slot variable plus a :class:`TTermPattern` destructuring
    record; in an EXPRESSION it lowers to a ``TRIPLE(s, p, o)`` call
    (spargebra sparql-12 ExprTripleTerm, `sparql/src/test.rs:674-696`)."""

    s: Union[Var, str, "TTerm"]
    p: Union[Var, str, "TTerm"]
    o: Union[Var, str, "TTerm"]


@dataclass
class TTermPattern:
    """Destructuring constraint: the binding of ``var`` must be a
    triple term whose components match s/p/o (binding their variables).
    Emitted by lowering a :class:`TTerm` in subject/object position."""

    var: Var
    s: Union[Var, str]
    p: Union[Var, str]
    o: Union[Var, str]


@dataclass
class TriplePattern:
    s: Union[Var, str]
    p: Union[Var, str, PathExpr]
    o: Union[Var, str]


@dataclass
class Filter:
    expr: "Expr"


@dataclass
class Optional_:
    group: "Group"


@dataclass
class Minus:
    group: "Group"


@dataclass
class Union_:
    left: "Group"
    right: "Group"


@dataclass
class Bind:
    expr: "Expr"
    var: Var


@dataclass
class Values:
    names: List[str]
    rows: List[List[Optional[str]]]


@dataclass
class GraphClause:
    name: Union[Var, str]
    group: "Group"


@dataclass
class ServiceClause:
    """SERVICE [SILENT] <endpoint> { … } (sparql11-federated-query).
    ``text`` is the RAW source of the group body — it is sent to the
    remote endpoint verbatim (wrapped in SELECT * plus the query's
    prologue), so the engine never needs an AST→text serializer;
    ``group`` is the parsed form (variable analysis, validation)."""

    endpoint: Union[Var, str]
    group: "Group"
    text: str
    prefixes: dict
    base: Optional[str]
    silent: bool = False


@dataclass
class SubGroup:
    group: "Group"


@dataclass
class SubSelect:
    query: "Query"


@dataclass
class Group:
    elements: List[object] = field(default_factory=list)


@dataclass
class Expr:
    """op: var | term | call | cmp | and | or | not | arith | in | exists"""

    op: str
    args: tuple


@dataclass
class Aggregate:
    fn: str  # count/sum/avg/min/max/group_concat/sample
    arg: Optional[Expr]  # None = COUNT(*)
    distinct: bool = False
    sep: str = " "
    alias: str = ""


@dataclass
class Query:
    form: str  # select | ask | construct
    variables: List[str]  # projected (select); [] = *
    select_exprs: List[Tuple[Expr, str]]  # (expr AS alias) projections
    where: Group
    distinct: bool = False
    group_by: List[str] = field(default_factory=list)
    aggregates: List[Aggregate] = field(default_factory=list)
    having: Optional[Expr] = None
    order_by: List[Tuple[Expr, bool]] = field(default_factory=list)  # (expr, asc)
    limit: Optional[int] = None
    offset: int = 0
    template: List[TriplePattern] = field(default_factory=list)  # construct
    from_graphs: List[str] = field(default_factory=list)  # FROM <g>
    from_named: List[str] = field(default_factory=list)  # FROM NAMED <g>
    group_exprs: List[Tuple[Expr, str]] = field(default_factory=list)  # GROUP BY (e AS ?v)
    post_values: Optional["Values"] = None  # trailing VALUES clause


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_PN_CHARS_BASE = (
    "A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u02ff\u0370-\u037d"
    "\u037f-\u1fff\u200c-\u200d\u2070-\u218f\u2c00-\u2fef\u3001-\ud7ff"
    "\uf900-\ufdcf\ufdf0-\ufffd\U00010000-\U000effff"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + r"0-9\-\u00b7\u0300-\u036f\u203f-\u2040"
_PN_PREFIX = rf"[{_PN_CHARS_BASE}](?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"
_PLX = r"%[0-9A-Fa-f]{2}|\\[_~.!$&'()*+,;=/?#@%-]"
_PN_LOCAL = (
    rf"(?:[{_PN_CHARS_U}:0-9]|{_PLX})"
    rf"(?:(?:[{_PN_CHARS}.:]|{_PLX})*(?:[{_PN_CHARS}:]|{_PLX}))?"
)

_KEYWORDS = (
    "PREFIX|BASE|SELECT|ASK|CONSTRUCT|DESCRIBE|WHERE|FILTER|OPTIONAL|MINUS|UNION|"
    "BIND|VALUES|GRAPH|DISTINCT|REDUCED|ORDER|GROUP|HAVING|BY|ASC|DESC|"
    "FROM|NAMED|SERVICE|SILENT|"
    "INSERT|DELETE|DATA|LOAD|INTO|CLEAR|DROP|CREATE|ADD|MOVE|COPY|TO|"
    "WITH|USING|DEFAULT|ALL|"
    "LIMIT|OFFSET|AS|IN|NOT|EXISTS|UNDEF|"
    "COUNT|SUM|AVG|MIN|MAX|GROUP_CONCAT|SAMPLE|SEPARATOR|"
    "REGEX|STR|LANG|DATATYPE|BOUND|IRI|URI|STRLEN|UCASE|LCASE|CONTAINS|"
    "STRSTARTS|STRENDS|SUBSTR|REPLACE|CONCAT|ABS|CEIL|FLOOR|ROUND|"
    "ISIRI|ISURI|ISBLANK|ISLITERAL|ISNUMERIC|COALESCE|IF|"
    "MD5|SHA1|SHA256|SHA384|SHA512|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|"
    "TIMEZONE|TZ|NOW|LANGMATCHES|SAMETERM|STRBEFORE|STRAFTER|ENCODE_FOR_URI|"
    "LANGDIR|HASLANGDIR|HASLANG|STRLANGDIR|STRLANG|STRDT|BNODE|"
    "TRIPLE|SUBJECT|PREDICATE|OBJECT|ISTRIPLE|A"
)

TOKEN_RE = re.compile(
    rf"""(?x)
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><(?:[^\x00-\x20<>"{{}}|^`\\]|\\u[0-9A-Fa-f]{{4}}|\\U[0-9A-Fa-f]{{8}})*>)
    | (?P<ttopen><<\()
    | (?P<ttclose>\)>>)
    | (?P<var>[?$][{_PN_CHARS_U}0-9][{_PN_CHARS_U}0-9]*)
    | (?P<longstring>\"\"\"(?:[^"\\]|\\.|"(?!\"\")|""(?!"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!'')|''(?!'))*''')
    | (?P<string>"(?:[^"\\\n\r]|\\.)*"|'(?:[^'\\\n\r]|\\.)*')
    | (?P<langdir>@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--(?:ltr|rtl))?)
    | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<bnode>_:[{_PN_CHARS_U}0-9](?:[{_PN_CHARS}.]*[{_PN_CHARS}])?)
    | (?P<kw>(?i:{_KEYWORDS})(?![{_PN_CHARS}:]))
    | (?P<boolean>(?i:true|false)(?![{_PN_CHARS}:]))
    | (?P<pname>(?:{_PN_PREFIX})?:(?:{_PN_LOCAL})?)
    | (?P<dtsep>\^\^)
    | (?P<op>&&|\|\||!=|<=|>=|[=<>!*/+\-|^?;,.(){{}}\[\]])
    """
)


def _tokenize(text: str):
    toks = []
    i, n = 0, len(text)
    while i < n:
        m = TOKEN_RE.match(text, i)
        if m is None:
            raise SparqlError(f"unexpected character {text[i]!r} at {i}")
        k = m.lastgroup
        if k not in ("ws", "comment"):
            toks.append((k, m.group(0), i))
        i = m.end()
    return toks


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


class _P:
    def __init__(self, text: str, base: Optional[str] = None):
        self.text = text
        self.toks = _tokenize(text)
        self.pos = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.bnode_ctr = 0
        self._anon = 0
        self._ttn = 0
        self._pending: List[TriplePattern] = []

    def peek(self, k: int = 0):
        j = self.pos + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query")
        self.pos += 1
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t is not None and t[0] == "kw" and t[1].upper() == word:
            self.next()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.kw(word):
            t = self.peek()
            raise SparqlError(f"expected {word}, got {t[1] if t else 'EOF'}")

    def op(self, sym: str) -> bool:
        t = self.peek()
        if t is not None and t[0] == "op" and t[1] == sym:
            self.next()
            return True
        return False

    def expect_op(self, sym: str):
        if not self.op(sym):
            t = self.peek()
            raise SparqlError(f"expected {sym!r}, got {t[1] if t else 'EOF'}")

    # -- terms ---------------------------------------------------------------

    def _iri(self, raw: str) -> str:
        iri = unescape(raw[1:-1])
        if split_iri(iri)[0] is None and self.base:
            iri = resolve(self.base, iri)
        return f"<{iri}>"

    def _pname(self, raw: str, pos: int) -> str:
        ns, _, local = raw.partition(":")
        if ns not in self.prefixes:
            raise SparqlError(f"undeclared prefix {ns!r}: at {pos}")
        local = re.sub(r"\\([_~.!$&'()*+,;=/?#@%-])", r"\1", local)
        return f"<{self.prefixes[ns]}{local}>"

    def parse_term(self, *, allow_var=True) -> Union[Var, str]:
        t = self.next()
        k, raw, pos = t
        if k == "var":
            if not allow_var:
                raise SparqlError(f"variable not allowed at {pos}")
            return Var(raw[1:])
        if k == "iri":
            return self._iri(raw)
        if k == "pname":
            return self._pname(raw, pos)
        if k == "bnode":
            return raw
        if k in ("string", "longstring"):
            lex = unescape(raw[1:-1] if k == "string" else raw[3:-3])
            nxt = self.peek()
            if nxt is not None and nxt[0] == "langdir":
                self.next()
                tag = nxt[1][1:]
                if "--" in tag:
                    tag, d = tag.rsplit("--", 1)
                    return f'"{escape_literal(lex)}"@{tag.lower()}--{d}'
                return f'"{escape_literal(lex)}"@{tag.lower()}'
            if nxt is not None and nxt[0] == "dtsep":
                self.next()
                dt = self.parse_term(allow_var=False)
                if dt == f"<{XSD}string>":
                    return f'"{escape_literal(lex)}"'
                return f'"{escape_literal(lex)}"^^{dt}'
            return f'"{escape_literal(lex)}"'
        if k == "integer":
            return f'"{raw}"^^<{XSD}integer>'
        if k == "decimal":
            return f'"{raw}"^^<{XSD}decimal>'
        if k == "double":
            return f'"{raw}"^^<{XSD}double>'
        if k == "boolean":
            return f'"{raw.lower()}"^^<{XSD}boolean>'
        if k == "kw" and raw.upper() == "A":
            return RDF_TYPE_T
        if k == "ttopen":
            # SPARQL 1.2 triple term <<( s p o )>> — ground components
            # collapse to the canonical encoding (terms/model.py:227);
            # otherwise a TTerm node for context-specific lowering
            s = self.parse_term(allow_var=allow_var)
            p = self.parse_term(allow_var=allow_var)
            o = self.parse_term(allow_var=allow_var)
            t2 = self.next()
            if t2 is None or t2[0] != "ttclose":
                raise SparqlError(f"expected ')>>' closing a triple term")
            # bnode labels in query patterns are existential VARIABLES
            # (§4.1.4) — they keep the term non-ground
            if all(
                isinstance(x, str) and not x.startswith("_:")
                for x in (s, p, o)
            ):
                return f"<<( {s} {p} {o} )>>"
            if not allow_var:
                raise SparqlError("variables not allowed in this triple term")
            return TTerm(s, p, o)
        if k == "op" and raw == "[":
            # [] and [ props ] = anonymous bnode pattern — a fresh
            # existential variable; a non-empty property list expands to
            # extra triple patterns buffered in self._pending and
            # drained by _parse_triples_into (sparql11-query §4.1.4 /
            # BlankNodePropertyListPath)
            self._anon += 1
            # '#' cannot appear in a VARNAME: never collides with a
            # user variable; dropped from SELECT * (eval._select_df)
            bvar = Var(f"#anon{self._anon}")
            if self.op("]"):
                return bvar
            while True:
                pp = self.parse_path()
                while True:
                    oo = self._lower_pattern_term(self.parse_term())
                    self._pending.append(TriplePattern(bvar, pp, oo))
                    if not self.op(","):
                        break
                if not self.op(";"):
                    break
                nt = self.peek()
                if nt is not None and nt[0] == "op" and nt[1] == "]":
                    break
            self.expect_op("]")
            return bvar
        if k == "op" and raw == "(":
            # CollectionPath sugar: ( e1 e2 ... ) expands to an
            # rdf:first/rdf:rest chain of fresh existential variables,
            # () is rdf:nil (sparql11-query §4.1.4)
            if self.op(")"):
                return f"<{RDF}nil>"
            items = []
            while not self.op(")"):
                items.append(self._lower_pattern_term(self.parse_term()))
            head = None
            prev = None
            for it in items:
                self._anon += 1
                node = Var(f"#anon{self._anon}")
                if head is None:
                    head = node
                else:
                    self._pending.append(
                        TriplePattern(prev, f"<{RDF}rest>", node)
                    )
                self._pending.append(TriplePattern(node, f"<{RDF}first>", it))
                prev = node
            self._pending.append(
                TriplePattern(prev, f"<{RDF}rest>", f"<{RDF}nil>")
            )
            return head
        raise SparqlError(f"bad term {raw!r} at {pos}")

    # -- property paths --------------------------------------------------------

    def parse_path(self) -> Union[Var, str, PathExpr]:
        """pathAlternative := pathSeq ('|' pathSeq)*"""
        left = self._path_seq()
        while self.op("|"):
            right = self._path_seq()
            left = PathExpr("alt", (left, right))
        return left

    def _path_seq(self):
        left = self._path_elt()
        while self.op("/"):
            right = self._path_elt()
            left = PathExpr("seq", (left, right))
        return left

    def _path_elt(self):
        inv = False
        if self.op("^"):
            inv = True
        t = self.peek()
        if t is not None and t[0] == "op" and t[1] == "(":
            self.next()
            p = self.parse_path()
            self.expect_op(")")
        elif t is not None and t[0] == "op" and t[1] == "!":
            # PathNegatedPropertySet: bare `!iri`, `!^iri`, or
            # `!( m1 | ... )` with '^'-prefixed and `a` members; the
            # algebra translation splits forward and inverse members —
            # !(p|^q) ≡ NPS({p}) UNION ^NPS({q}) (sparql11-query §18.2,
            # spargebra's desugaring, which the reference consumes)
            self.next()

            def _nps_member():
                minv = self.op("^")
                mt = self.peek()
                if mt is not None and mt[0] == "kw" and mt[1].upper() == "A":
                    self.next()
                    return minv, RDF_TYPE_T
                return minv, self.parse_term(allow_var=False)

            members = []
            if self.op("("):
                if not self.op(")"):
                    members.append(_nps_member())
                    while self.op("|"):
                        members.append(_nps_member())
                    self.expect_op(")")
            else:
                members.append(_nps_member())
            fwd = tuple(i for v, i in members if not v)
            invs = tuple(i for v, i in members if v)
            if invs and fwd:
                p = PathExpr(
                    "alt",
                    (
                        PathExpr("neg", fwd),
                        PathExpr("inv", (PathExpr("neg", invs),)),
                    ),
                )
            elif invs:
                p = PathExpr("inv", (PathExpr("neg", invs),))
            else:
                p = PathExpr("neg", fwd)
        else:
            k, raw, pos = t if t else (None, "EOF", -1)
            if k == "var":
                self.next()
                p = Var(raw[1:])
            elif k == "kw" and raw.upper() == "A":
                self.next()
                p = RDF_TYPE_T
            elif k in ("iri", "pname"):
                p = self.parse_term(allow_var=False)
            else:
                raise SparqlError(f"bad path element {raw!r} at {pos}")
        nxt = self.peek()
        if nxt is not None and nxt[0] == "op" and nxt[1] in ("*", "+", "?"):
            # only treat as modifier when it isn't a following variable
            self.next()
            mod = {"*": "star", "+": "plus", "?": "opt"}[nxt[1]]
            p = PathExpr(mod, (p,))
        if inv:
            p = PathExpr("inv", (p,))
        return p

    # -- expressions -----------------------------------------------------------

    def parse_expr(self) -> Expr:
        return self._or_expr()

    def _or_expr(self):
        left = self._and_expr()
        while self.op("||"):
            left = Expr("or", (left, self._and_expr()))
        return left

    def _and_expr(self):
        left = self._not_expr()
        while self.op("&&"):
            left = Expr("and", (left, self._not_expr()))
        return left

    def _not_expr(self):
        if self.op("!"):
            return Expr("not", (self._not_expr(),))
        t = self.peek()
        if t is not None and t[0] == "kw" and t[1].upper() == "NOT":
            self.next()
            self.expect_kw("EXISTS")
            g = self.parse_group()
            return Expr("not_exists", (g,))
        if t is not None and t[0] == "kw" and t[1].upper() == "EXISTS":
            self.next()
            g = self.parse_group()
            return Expr("exists", (g,))
        return self._cmp_expr()

    def _cmp_expr(self):
        left = self._add_expr()
        t = self.peek()
        if t is not None and t[0] == "op" and t[1] in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            right = self._add_expr()
            return Expr("cmp", (t[1], left, right))
        if t is not None and t[0] == "kw" and t[1].upper() == "IN":
            self.next()
            self.expect_op("(")
            items = []
            if not self.op(")"):
                items.append(self.parse_expr())
                while self.op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
            return Expr("in", (left, tuple(items)))
        if (
            t is not None
            and t[0] == "kw"
            and t[1].upper() == "NOT"
            and self.peek(1) is not None
            and self.peek(1)[0] == "kw"
            and self.peek(1)[1].upper() == "IN"
        ):
            self.next()
            self.next()
            self.expect_op("(")
            items = [self.parse_expr()]
            while self.op(","):
                items.append(self.parse_expr())
            self.expect_op(")")
            return Expr("not", (Expr("in", (left, tuple(items))),))
        return left

    def _add_expr(self):
        left = self._mul_expr()
        while True:
            t = self.peek()
            if t is not None and t[0] == "op" and t[1] in ("+", "-"):
                self.next()
                left = Expr("arith", (t[1], left, self._mul_expr()))
            elif (
                t is not None
                and t[0] in ("integer", "decimal", "double")
                and t[1][0] in "+-"
            ):
                # AdditiveExpression's NumericLiteralPositive/Negative
                # branch (sparql11-query grammar [116]): ?x+1 lexes the
                # +1 as one signed literal meaning x + 1; the literal
                # may continue multiplicatively (?x+1*2 = x + 1*2)
                k, raw, _pos = self.next()
                sign, mag = t[1][0], t[1][1:].lstrip("+")
                dt = {"integer": "integer", "decimal": "decimal", "double": "double"}[k]
                rhs = Expr("term", (f'"{mag}"^^<{XSD}{dt}>',))
                while True:
                    nt = self.peek()
                    if nt is not None and nt[0] == "op" and nt[1] in ("*", "/"):
                        self.next()
                        rhs = Expr("arith", (nt[1], rhs, self._unary_expr()))
                    else:
                        break
                left = Expr("arith", (sign, left, rhs))
            else:
                return left

    def _mul_expr(self):
        left = self._unary_expr()
        while True:
            t = self.peek()
            if t is not None and t[0] == "op" and t[1] in ("*", "/"):
                self.next()
                left = Expr("arith", (t[1], left, self._unary_expr()))
            else:
                return left

    def _unary_expr(self):
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end in expression")
        k, raw, pos = t
        if k == "op" and raw == "(":
            self.next()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if k == "op" and raw == "-":
            self.next()
            return Expr("neg", (self._unary_expr(),))
        if k == "var":
            self.next()
            return Expr("var", (raw[1:],))
        if k == "kw" and raw.upper() == "NOT":
            # NotExistsFunc is a BuiltInCall, i.e. a primary expression
            # (sparql11 grammar [121]/[126]) — e.g. ORDER BY NOT EXISTS {…}
            self.next()
            self.expect_kw("EXISTS")
            return Expr("not_exists", (self.parse_group(),))
        if k == "kw" and raw.upper() == "EXISTS":
            self.next()
            return Expr("exists", (self.parse_group(),))
        if k == "kw":
            fn = raw.upper()
            self.next()
            self.expect_op("(")
            args = []
            sep = None
            dflag = False
            if fn in self._AGG_FNS and self.kw("DISTINCT"):
                dflag = True  # COUNT(DISTINCT ?x) etc.
            if not self.op(")"):
                if fn == "COUNT" and self.op("*"):
                    args = []
                else:
                    args.append(self.parse_expr())
                    while self.op(","):
                        args.append(self.parse_expr())
                if fn == "GROUP_CONCAT" and self.op(";"):
                    self.expect_kw("SEPARATOR")
                    self.expect_op("=")
                    sraw = self.next()
                    sep = unescape(sraw[1][1:-1])
                self.expect_op(")")
            if sep is not None or dflag:
                return Expr("call", (fn, tuple(args), sep, dflag))
            return Expr("call", (fn, tuple(args)))
        # term constant — or an xsd:* constructor cast call
        # (function.rs:426-451 Custom(iri) dispatch)
        term = self.parse_term()
        if isinstance(term, Var):
            return Expr("var", (term.name,))
        if isinstance(term, TTerm):
            # ExprTripleTerm (sparql-12): constructs the term from the
            # current bindings — exactly the TRIPLE() builtin
            def conv(x):
                if isinstance(x, TTerm):
                    return Expr(
                        "call", ("TRIPLE", (conv(x.s), conv(x.p), conv(x.o)))
                    )
                if isinstance(x, Var):
                    return Expr("var", (x.name,))
                return Expr("term", (x,))

            return Expr("call", ("TRIPLE", (conv(term.s), conv(term.p), conv(term.o))))
        if (
            isinstance(term, str)
            and term.startswith("<http://www.w3.org/2001/XMLSchema#")
            and self.op("(")
        ):
            typ = term[len("<http://www.w3.org/2001/XMLSchema#"):-1]
            arg = self.parse_expr()
            self.expect_op(")")
            return Expr("call", (f"XSD:{typ}", (arg,)))
        return Expr("term", (term,))

    # -- groups ------------------------------------------------------------

    def parse_group(self) -> Group:
        self.expect_op("{")
        g = Group()
        # GroupGraphPattern ::= '{' ( SubSelect | GroupGraphPatternSub ) '}'
        # — SELECT directly after '{' is a subselect (e.g. GRAPH ?g { SELECT … })
        t0 = self.peek()
        if t0 is not None and t0[0] == "kw" and t0[1].upper() == "SELECT":
            q = self.parse_query_body()
            self.expect_op("}")
            g.elements.append(SubSelect(q))
            return g
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("unterminated group")
            if t[0] == "op" and t[1] == "}":
                self.next()
                return g
            if t[0] == "kw":
                word = t[1].upper()
                if word == "FILTER":
                    self.next()
                    need_paren = self.peek() and self.peek()[0] == "op" and self.peek()[1] == "("
                    if need_paren:
                        self.expect_op("(")
                        g.elements.append(Filter(self.parse_expr()))
                        self.expect_op(")")
                    else:
                        g.elements.append(Filter(self.parse_expr()))
                    self.op(".")
                    continue
                if word == "OPTIONAL":
                    self.next()
                    g.elements.append(Optional_(self.parse_group()))
                    self.op(".")
                    continue
                if word == "MINUS":
                    self.next()
                    g.elements.append(Minus(self.parse_group()))
                    self.op(".")
                    continue
                if word == "BIND":
                    self.next()
                    self.expect_op("(")
                    e = self.parse_expr()
                    self.expect_kw("AS")
                    v = self.next()
                    if v[0] != "var":
                        raise SparqlError("expected variable after AS")
                    self.expect_op(")")
                    g.elements.append(Bind(e, Var(v[1][1:])))
                    self.op(".")
                    continue
                if word == "VALUES":
                    self.next()
                    g.elements.append(self._parse_values())
                    self.op(".")
                    continue
                if word == "GRAPH":
                    self.next()
                    name = self.parse_term()
                    g.elements.append(GraphClause(name, self.parse_group()))
                    self.op(".")
                    continue
                if word == "SERVICE":
                    self.next()
                    silent = False
                    t2 = self.peek()
                    if (
                        t2 is not None
                        and t2[0] == "kw"
                        and t2[1].upper() == "SILENT"
                    ):
                        self.next()
                        silent = True
                    name = self.parse_term()
                    t2 = self.peek()
                    if t2 is None or t2[:2] != ("op", "{"):
                        raise SparqlError("expected group after SERVICE")
                    start = t2[2]
                    grp = self.parse_group()
                    end = self.toks[self.pos - 1][2]  # the closing '}'
                    g.elements.append(
                        ServiceClause(
                            name,
                            grp,
                            self.text[start + 1 : end],
                            dict(self.prefixes),
                            self.base,
                            silent,
                        )
                    )
                    self.op(".")
                    continue
            if t[0] == "op" and t[1] == "{":
                nxt = self.peek(1)
                if nxt is not None and nxt[0] == "kw" and nxt[1].upper() == "SELECT":
                    self.next()  # consume '{'
                    q = self.parse_query_body()
                    self.expect_op("}")
                    g.elements.append(SubSelect(q))
                    self.op(".")
                    continue
                sub = self.parse_group()
                if self.kw("UNION"):
                    right = self.parse_group()
                    u = Union_(sub, right)
                    while self.kw("UNION"):
                        u = Union_(Group([u]), self.parse_group())
                    g.elements.append(u)
                else:
                    g.elements.append(SubGroup(sub))
                self.op(".")
                continue
            # triples block
            self._parse_triples_into(g)
            # at most one '.' separator (a second stray dot is a
            # syntax error per the grammar)
            self.op(".")
        return g

    def _parse_values(self) -> Values:
        t = self.peek()
        names: List[str] = []
        if t is not None and t[0] == "var":
            names = [self.next()[1][1:]]
            self.expect_op("{")
            rows = []
            while not self.op("}"):
                rows.append([self._values_cell()])
            return Values(names, rows)
        self.expect_op("(")
        while not self.op(")"):
            v = self.next()
            if v[0] != "var":
                raise SparqlError("expected variable in VALUES")
            names.append(v[1][1:])
        self.expect_op("{")
        rows = []
        while not self.op("}"):
            self.expect_op("(")
            row = []
            while not self.op(")"):
                row.append(self._values_cell())
            if len(row) != len(names):
                raise SparqlError(
                    f"VALUES row arity {len(row)} != {len(names)} variables"
                )
            rows.append(row)
        return Values(names, rows)

    def _values_cell(self) -> Optional[str]:
        t = self.peek()
        if t is not None and t[0] == "kw" and t[1].upper() == "UNDEF":
            self.next()
            return None
        term = self.parse_term(allow_var=False)
        return term

    def _lower_pattern_term(self, t):
        """Lower a TTerm in subject/object PATTERN position: a fresh
        '#ttN' slot variable + a TTermPattern destructuring record in
        self._pending (drained after the triples block, so the slot
        var is already matched when the record evaluates).  Nested
        triple terms lower inside-out; the evaluator retries records
        whose slot var is bound by a later record's destructure."""
        if not isinstance(t, TTerm):
            return t
        s = self._lower_pattern_term(t.s)
        p = self._lower_pattern_term(t.p)
        o = self._lower_pattern_term(t.o)
        self._ttn += 1
        v = Var(f"#tt{self._ttn}")
        self._pending.append(TTermPattern(v, s, p, o))
        return v

    def _parse_triples_into(self, g: Group):
        pend0 = len(self._pending)
        s = self._lower_pattern_term(self.parse_term())
        t = self.peek()
        # `[ props ] .` standalone: a subject-position property list
        # with no following predicate list is a complete triples block
        standalone = len(self._pending) > pend0 and (
            t is None or (t[0] == "op" and t[1] in (".", "}"))
        )
        if not standalone:
            while True:
                p = self.parse_path()
                while True:
                    o = self._lower_pattern_term(self.parse_term())
                    g.elements.append(TriplePattern(s, p, o))
                    if not self.op(","):
                        break
                if not self.op(";"):
                    break
                t = self.peek()
                if t is None or (t[0] == "op" and t[1] in (".", "}")):
                    break
        if self._pending:
            g.elements.extend(self._pending)
            self._pending = []

    # -- query forms ---------------------------------------------------------

    def parse_query(self) -> Query:
        while True:
            if self.kw("PREFIX"):
                p = self.next()
                if p[0] != "pname":
                    raise SparqlError("expected prefix name")
                ns = p[1][:-1] if p[1].endswith(":") else p[1].partition(":")[0]
                i = self.next()
                if i[0] != "iri":
                    raise SparqlError("expected IRI in PREFIX")
                self.prefixes[ns] = unescape(i[1][1:-1])
                continue
            if self.kw("BASE"):
                i = self.next()
                self.base = unescape(i[1][1:-1])
                continue
            break

        if self.kw("ASK"):
            from_graphs, from_named = self._parse_dataset_clauses()
            self.kw("WHERE")  # optional
            q = Query("ask", [], [], self.parse_group())
            q.from_graphs = from_graphs
            q.from_named = from_named
            self._check_end()
            return q
        if self.kw("DESCRIBE"):
            # DESCRIBE (var | iri)+ (WHERE group)?
            targets = []
            while True:
                t = self.peek()
                if t is None:
                    break
                if t[0] == "var":
                    self.next()
                    targets.append(Var(t[1][1:]))
                elif t[0] in ("iri", "pname", "ttopen"):
                    targets.append(self.parse_term(allow_var=False))
                else:
                    break
            from_graphs, from_named = self._parse_dataset_clauses()
            where = Group()
            if self.kw("WHERE") or (
                self.peek() is not None
                and self.peek()[0] == "op"
                and self.peek()[1] == "{"
            ):
                where = self.parse_group()
            q = Query("describe", [], [], where)
            q.from_graphs = from_graphs
            q.from_named = from_named
            q.template = [
                TriplePattern(t, RDF_TYPE_T, t) for t in targets
            ]  # reuse template slot to carry targets
            self._check_end()
            return q
        if self.kw("CONSTRUCT"):
            t0 = self.peek()
            if t0 is not None and t0[0] == "op" and t0[1] == "{":
                tmpl_group = self.parse_group()
                # a TTermPattern in a TEMPLATE is not a destructuring
                # match — it's term CONSTRUCTION per solution: fold the
                # lowered records back into TTerm nodes in the slots
                # (the evaluator instantiates them via FN.triple_term)
                ttmap = {
                    e.var.name: e
                    for e in tmpl_group.elements
                    if isinstance(e, TTermPattern)
                }

                def _fold(t):
                    if isinstance(t, Var) and t.name in ttmap:
                        r = ttmap[t.name]
                        return TTerm(_fold(r.s), _fold(r.p), _fold(r.o))
                    return t

                template = [
                    TriplePattern(_fold(e.s), e.p, _fold(e.o))
                    for e in tmpl_group.elements
                    if isinstance(e, TriplePattern)
                ]
                from_graphs, from_named = self._parse_dataset_clauses()
                self.kw("WHERE")  # optional before the group
                q = Query(
                    "construct", [], [], self.parse_group(), template=template
                )
            else:
                # short form (sparql11-query §10.2.3): CONSTRUCT
                # [DatasetClause] WHERE { TriplesTemplate? } — the
                # pattern doubles as the template, so it must be plain
                # triples
                from_graphs, from_named = self._parse_dataset_clauses()
                self.expect_kw("WHERE")
                grp = self.parse_group()
                # TTermPattern records stay in the WHERE group as
                # destructuring matches; the template reuses their slot
                # variables directly (bound by the group, so the
                # matched triple term is emitted verbatim)
                if not all(
                    isinstance(e, (TriplePattern, TTermPattern))
                    for e in grp.elements
                ):
                    raise SparqlError(
                        "CONSTRUCT WHERE short form allows only triple patterns"
                    )
                template = [e for e in grp.elements if isinstance(e, TriplePattern)]
                q = Query("construct", [], [], grp, template=template)
            q.from_graphs = from_graphs
            q.from_named = from_named
            self._parse_modifiers(q)
            self._check_end()
            return q
        q = self.parse_query_body()
        self._check_end()
        return q

    def _check_end(self):
        t = self.peek()
        if t is not None:
            raise SparqlError(f"trailing tokens: {t[1]!r}")

    def parse_query_body(self) -> Query:
        """SELECT query (projection + where + modifiers), reusable as a
        subquery — stops before tokens it doesn't own (e.g. the
        enclosing '}')."""
        self.expect_kw("SELECT")
        distinct = self.kw("DISTINCT") or (self.kw("REDUCED") and True)
        variables: List[str] = []
        select_exprs: List[Tuple[Expr, str]] = []
        aggregates: List[Aggregate] = []
        if self.op("*"):
            pass
        else:
            while True:
                t = self.peek()
                if t is None:
                    raise SparqlError("unexpected end in SELECT")
                if t[0] == "var":
                    self.next()
                    variables.append(t[1][1:])
                    continue
                if t[0] == "op" and t[1] == "(":
                    self.next()
                    e = self.parse_expr()
                    sep = " "
                    # GROUP_CONCAT(...; SEPARATOR="x")
                    if self.op(";"):
                        self.expect_kw("SEPARATOR")
                        self.expect_op("=")
                        sraw = self.next()
                        sep = unescape(sraw[1][1:-1])
                    self.expect_kw("AS")
                    v = self.next()
                    if v[0] != "var":
                        raise SparqlError("expected variable after AS")
                    self.expect_op(")")
                    alias = v[1][1:]
                    agg = self._as_aggregate(e, alias, sep)
                    if agg is not None:
                        aggregates.append(agg)
                        variables.append(alias)
                    else:
                        select_exprs.append((e, alias))
                        variables.append(alias)
                    continue
                break
        from_graphs, from_named = self._parse_dataset_clauses()
        if self.kw("WHERE"):
            where = self.parse_group()
        else:
            where = self.parse_group()
        q = Query(
            "select",
            variables,
            select_exprs,
            where,
            distinct=distinct,
            aggregates=aggregates,
        )
        q.from_graphs = from_graphs
        q.from_named = from_named
        self._parse_modifiers(q)
        # trailing ValuesClause (sparql11-query §18.2.4.6: joined after
        # aggregation/HAVING, before projection)
        if self.kw("VALUES"):
            q.post_values = self._parse_values()
        # §18.2.4.1 aggregate hoisting: an aggregate call EMBEDDED in a
        # SELECT expression, HAVING condition, or ORDER BY key (e.g.
        # HAVING(COUNT(?v) > 1), SELECT (SUM(?x)+1 AS ?y), ORDER BY
        # DESC(SUM(?v))) is replaced by a fresh internal variable and
        # computed by the Group step like any declared aggregate.  '#'
        # names cannot be written as ?vars, so they never collide; the
        # evaluator hides '#'-columns from the final projection.
        self._hoist_embedded_aggregates(q, aggregates)
        # grouped-query projection rule (§18.2.4.4 / w3c syntax tests
        # agg08, group06): once grouping/aggregation is in play, a plain
        # projected variable must be a group key
        if aggregates or q.group_by or q.group_exprs:
            derived = (
                {a.alias for a in aggregates}
                | {al for _, al in select_exprs}
                | {al for _, al in q.group_exprs}
            )
            keys = set(q.group_by) | {al for _, al in q.group_exprs}
            if q.post_values is not None:
                # trailing-VALUES vars join AFTER aggregation
                # (§18.2.4.6) — they are in scope for projection
                keys |= set(q.post_values.names)
            for v in variables:
                if v not in derived and v not in keys:
                    raise SparqlError(
                        f"variable ?{v} is projected but neither grouped "
                        "nor aggregated"
                    )
        return q

    def _parse_dataset_clauses(self):
        """FROM <g> (composed ad-hoc default graph — exec.rs:108-117) and
        FROM NAMED <g> dataset clauses."""
        from_graphs: List[str] = []
        from_named: List[str] = []
        while self.kw("FROM"):
            named = self.kw("NAMED")
            t = self.next()
            if t[0] == "iri":
                g = self._iri(t[1])
            elif t[0] == "pname":
                g = self._pname(t[1], t[2])
            else:
                raise SparqlError(f"expected IRI after FROM at {t[2]}")
            (from_named if named else from_graphs).append(g)
        return from_graphs, from_named

    _AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}

    def _contains_agg(self, x) -> bool:
        if isinstance(x, Expr):
            if x.op == "call" and x.args and x.args[0] in self._AGG_FNS:
                return True
            return any(self._contains_agg(a) for a in x.args)
        if isinstance(x, (tuple, list)):
            return any(self._contains_agg(a) for a in x)
        return False

    def _hoist_embedded_aggregates(self, q: Query, aggregates: List[Aggregate]):
        counter = [len(aggregates)]

        def hoist(e):
            if isinstance(e, (tuple, list)):
                out = [hoist(x) for x in e]
                return tuple(out) if isinstance(e, tuple) else out
            if not isinstance(e, Expr):
                return e  # Group (EXISTS body), str, None — untouched
            agg = self._as_aggregate(e, "", " ")
            if agg is not None:
                for a in aggregates:  # reuse an identical aggregate
                    if (a.fn, a.arg, a.distinct, a.sep) == (
                        agg.fn,
                        agg.arg,
                        agg.distinct,
                        agg.sep,
                    ):
                        return Expr("var", (a.alias,))
                agg.alias = f"#a{counter[0]}"
                counter[0] += 1
                aggregates.append(agg)
                return Expr("var", (agg.alias,))
            if e.op in ("var", "term"):
                return e
            return Expr(e.op, hoist(e.args))

        q.select_exprs = [(hoist(e), al) for e, al in q.select_exprs]
        if q.having is not None:
            q.having = hoist(q.having)
        q.order_by = [(hoist(e), asc) for e, asc in q.order_by]

    def _as_aggregate(self, e: Expr, alias: str, sep: str) -> Optional[Aggregate]:
        if e.op == "call" and e.args[0] in self._AGG_FNS:
            fn, args = e.args[0], e.args[1]
            if len(e.args) > 2 and e.args[2] is not None:
                sep = e.args[2]  # GROUP_CONCAT(...; SEPARATOR="x")
            distinct = bool(e.args[3]) if len(e.args) > 3 else False
            arg = args[0] if args else None
            if self._contains_agg(arg):
                raise SparqlError("aggregate calls cannot be nested")
            return Aggregate(fn.lower(), arg, distinct, sep, alias)
        return None

    def _parse_modifiers(self, q: Query):
        if self.kw("GROUP"):
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if t is not None and t[0] == "var":
                    self.next()
                    q.group_by.append(t[1][1:])
                elif t is not None and t[0] == "op" and t[1] == "(":
                    # GROUP BY (expr AS ?v) / (expr) — computed group key
                    self.next()
                    e = self.parse_expr()
                    if self.kw("AS"):
                        v = self.next()
                        if v[0] != "var":
                            raise SparqlError(
                                "expected variable after AS in GROUP BY"
                            )
                        galias = v[1][1:]
                    else:
                        # unnamed key: synthetic '#' column (hidden from
                        # SELECT *, not referenceable — per the grammar)
                        self._anon += 1
                        galias = f"#gk{self._anon}"
                    self.expect_op(")")
                    q.group_exprs.append((e, galias))
                    q.group_by.append(galias)
                elif (
                    t is not None
                    and t[0] == "kw"
                    and t[1].upper()
                    not in ("HAVING", "ORDER", "LIMIT", "OFFSET", "VALUES")
                ):
                    # GroupCondition := BuiltInCall (bare, e.g.
                    # GROUP BY STR(?x)) — grouped but not projectable
                    self._anon += 1
                    galias = f"#gk{self._anon}"
                    q.group_exprs.append((self._unary_expr(), galias))
                    q.group_by.append(galias)
                else:
                    break
        if self.kw("HAVING"):
            # HavingCondition+ : bracketted expressions or bare
            # built-in calls; multiple conditions conjoin
            conds = []
            while True:
                t = self.peek()
                if t is not None and t[0] == "op" and t[1] == "(":
                    self.next()
                    conds.append(self.parse_expr())
                    self.expect_op(")")
                elif (
                    t is not None
                    and t[0] == "kw"
                    and t[1].upper() not in ("ORDER", "LIMIT", "OFFSET", "VALUES")
                ):
                    conds.append(self._unary_expr())
                else:
                    break
            if not conds:
                raise SparqlError("HAVING requires at least one condition")
            having = conds[0]
            for c in conds[1:]:
                having = Expr("and", (having, c))
            q.having = having
        if self.kw("ORDER"):
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if t is None:
                    break
                if t[0] == "kw" and t[1].upper() in ("ASC", "DESC"):
                    asc = t[1].upper() == "ASC"
                    self.next()
                    self.expect_op("(")
                    e = self.parse_expr()
                    self.expect_op(")")
                    q.order_by.append((e, asc))
                elif t[0] == "var":
                    self.next()
                    q.order_by.append((Expr("var", (t[1][1:],)), True))
                elif t[0] == "op" and t[1] == "(":
                    # OrderCondition := ... | BrackettedExpression
                    self.next()
                    e = self.parse_expr()
                    self.expect_op(")")
                    q.order_by.append((e, True))
                elif t[0] == "kw" and t[1].upper() not in ("LIMIT", "OFFSET"):
                    # OrderCondition := Constraint (bare BuiltInCall,
                    # e.g. ORDER BY STR(?x)) — only LIMIT/OFFSET can
                    # follow the order conditions
                    q.order_by.append((self._unary_expr(), True))
                else:
                    break
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.kw("LIMIT"):
                q.limit = int(self.next()[1])
            if self.kw("OFFSET"):
                q.offset = int(self.next()[1])


def parse_query(text: str, base: Optional[str] = None) -> Query:
    return _P(text, base).parse_query()
