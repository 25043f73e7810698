"""SPARQL text front-end: parse a query string, compile to DataFrames.

The reference delegates query-string parsing to the external
``spargebra`` crate and implements only the evaluator
(`sparql/src/wrapper.rs:9,38`); we do the same split — this package is
OUR parser for the SPARQL subset the engine evaluates, compiling to the
operators in :mod:`sophia_rs_spark.operators.bgp` et al.
"""

from .parser import SparqlError, parse_query
from .eval import evaluate, query
from .client import SparqlClient, set_service_transport
from .update import parse_update, update
from .graph_query import (
    ask_from_triples,
    construct_from_triples,
    query_from_graph,
    select_from_triples,
)

__all__ = [
    "parse_query",
    "evaluate",
    "query",
    "SparqlError",
    "SparqlClient",
    "set_service_transport",
    "parse_update",
    "update",
    "ask_from_triples",
    "construct_from_triples",
    "select_from_triples",
    "query_from_graph",
]
