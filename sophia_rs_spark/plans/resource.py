"""Resource-centric API: typed getters + traversal over a triples DataFrame.

Spark re-expression of sophia's ``resource`` crate
(`resource/src/resource.rs`): a :class:`Resource` wraps (dataset,
subject) and exposes typed getters (``get_iri``/``get_str``/``get_int``/
``get_all``…), neighbour navigation (``get_resource``) and pre-order
traversal.  Error taxonomy mirrors `resource/src/resource.rs`'s
``ResourceError``: ``NoValueFor`` vs ``UnexpectedKind``.

Access pattern: the subject's triples are fetched ONCE per resource
(one filtered collect — a resource's out-edges are few) and memoised;
traversal batches each BFS level into a single IN-filtered collect, so
depth-k traversal costs k jobs, not k×fanout.  This is an interactive /
driver-side convenience API — bulk work belongs in the DataFrame ops.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..terms.model import unescape


class ResourceError(ValueError):
    """kind ∈ {'no_value', 'unexpected_kind'} (resource.rs error enum)."""

    def __init__(self, kind: str, msg: str):
        super().__init__(msg)
        self.kind = kind


def _lex_of(enc: str) -> str:
    if not enc.startswith('"'):
        raise ResourceError("unexpected_kind", f"not a literal: {enc}")
    i = 1
    while i < len(enc):
        if enc[i] == "\\":
            i += 2
            continue
        if enc[i] == '"':
            break
        i += 1
    return unescape(enc[1:i])


class Resource:
    """A subject-centred view: ``Resource(triples_df, "<http://x/s>")``."""

    def __init__(self, triples: DataFrame, subject: str):
        self.df = triples
        self.subject = subject
        self._props: Optional[Dict[str, List[str]]] = None

    # -- fetch ---------------------------------------------------------------

    def _properties(self) -> Dict[str, List[str]]:
        if self._props is None:
            rows = (
                self.df.filter(F.col("s") == self.subject)
                .select("p", "o")
                .collect()
            )
            props: Dict[str, List[str]] = {}
            for r in rows:
                props.setdefault(r["p"], []).append(r["o"])
            for vs in props.values():
                vs.sort()  # deterministic (canonical-string order)
            self._props = props
        return self._props

    def predicates(self) -> List[str]:
        return sorted(self._properties())

    # -- getters (resource.rs typed get_* family) ----------------------------

    def get_term(self, pred: str) -> str:
        vs = self._properties().get(pred)
        if not vs:
            raise ResourceError("no_value", f"no value for {pred} on {self.subject}")
        return vs[0]

    def get_term_opt(self, pred: str) -> Optional[str]:
        vs = self._properties().get(pred)
        return vs[0] if vs else None

    def get_all(self, pred: str) -> List[str]:
        return list(self._properties().get(pred, []))

    def get_iri(self, pred: str) -> str:
        t = self.get_term(pred)
        if not t.startswith("<"):
            raise ResourceError("unexpected_kind", f"{pred}: expected IRI, got {t}")
        return t[1:-1]

    def get_str(self, pred: str) -> str:
        return _lex_of(self.get_term(pred))

    def get_int(self, pred: str) -> int:
        t = self.get_term(pred)
        lex = _lex_of(t)
        try:
            return int(lex)
        except ValueError:
            raise ResourceError(
                "unexpected_kind", f"{pred}: not an integer literal: {t}"
            )

    def get_float(self, pred: str) -> float:
        try:
            return float(_lex_of(self.get_term(pred)))
        except ValueError:
            raise ResourceError("unexpected_kind", f"{pred}: not numeric")

    def get_bool(self, pred: str) -> bool:
        lex = _lex_of(self.get_term(pred))
        if lex in ("true", "1"):
            return True
        if lex in ("false", "0"):
            return False
        raise ResourceError("unexpected_kind", f"{pred}: not an xsd:boolean")

    def get_resource(self, pred: str) -> "Resource":
        """Follow an IRI/bnode-valued edge to the neighbour resource."""
        t = self.get_term(pred)
        if t.startswith('"'):
            raise ResourceError(
                "unexpected_kind", f"{pred}: literal value cannot be a resource"
            )
        return Resource(self.df, t)

    def get_all_resources(self, pred: str) -> List["Resource"]:
        return [
            Resource(self.df, t)
            for t in self.get_all(pred)
            if not t.startswith('"')
        ]

    # -- typed term introspection ---------------------------------------------

    def types(self) -> List[str]:
        rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        return self.get_all(rdf_type)

    # -- traversal (resource.rs pre-order walk) -------------------------------

    def traverse(
        self, max_depth: int = 3, max_nodes: int = 10_000
    ) -> Iterator[Tuple[int, str, "Resource"]]:
        """Pre-order traversal of the outgoing subgraph: yields
        (depth, subject, resource).  Each BFS level is ONE IN-filtered
        collect over the dataset — not one job per node."""
        seen = {self.subject}
        yield (0, self.subject, self)
        frontier = [self.subject]
        depth = 0
        while frontier and depth < max_depth and len(seen) < max_nodes:
            depth += 1
            rows = (
                self.df.filter(F.col("s").isin(frontier))
                .filter(~F.col("o").startswith('"'))
                .select("s", "o")
                .distinct()
                .collect()
            )
            nxt = sorted({r["o"] for r in rows} - seen)
            # pre-fetch the whole level's property maps in one job
            level_rows = (
                self.df.filter(F.col("s").isin(nxt)).select("s", "p", "o").collect()
                if nxt
                else []
            )
            props_by_s: Dict[str, Dict[str, List[str]]] = {}
            for r in level_rows:
                props_by_s.setdefault(r["s"], {}).setdefault(r["p"], []).append(
                    r["o"]
                )
            for subj in nxt:
                if len(seen) >= max_nodes:
                    break
                seen.add(subj)
                res = Resource(self.df, subj)
                res._props = {
                    p: sorted(vs) for p, vs in props_by_s.get(subj, {}).items()
                }
                yield (depth, subj, res)
            frontier = nxt

    def __repr__(self) -> str:  # pragma: no cover
        return f"Resource({self.subject})"
