"""D-entailment validation: recognized-datatype ill-typed literal
detection (`reasoner/src/d_entailment.rs:22-39`) + BCP47 / IRI shape
validation columns for data-quality gates.

Produces boolean columns, not failures — ill-typed literals are legal
RDF (lexical fidelity is preserved end-to-end); D-entailment merely
*recognizes* them, and pipelines can quarantine on the flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sparql_fns import datatype, lex
from ..terms.model import XSD

# XSD lexical-space checks for the recognized datatypes (regex per the
# public XSD 1.1 datatype spec).
_LEXICAL_RES = {
    f"{XSD}integer": r"^[+-]?\d+$",
    f"{XSD}int": r"^[+-]?\d+$",
    f"{XSD}long": r"^[+-]?\d+$",
    f"{XSD}short": r"^[+-]?\d+$",
    f"{XSD}byte": r"^[+-]?\d+$",
    f"{XSD}nonNegativeInteger": r"^\+?\d+$",
    f"{XSD}decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    f"{XSD}double": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    f"{XSD}float": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    f"{XSD}boolean": r"^(true|false|1|0)$",
    f"{XSD}date": r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$",
    f"{XSD}dateTime": (
        r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
    ),
}


def is_ill_typed(term: Column) -> Column:
    """True iff the term is a literal of a recognized datatype whose
    lexical form is outside the datatype's lexical space."""
    dt = datatype(term)
    l = lex(term)
    expr = F.lit(False)
    for d, rx in _LEXICAL_RES.items():
        expr = F.when(dt == d, ~l.rlike(rx)).otherwise(expr)
    return F.when(term.startswith('"'), expr).otherwise(F.lit(False))


def ill_typed_literals(triples: DataFrame) -> DataFrame:
    """All distinct ill-typed literal terms in a graph."""
    from ..operators.graph_ops import atoms

    t = atoms(triples).filter(F.col("kind") == 2).select("term").distinct()
    return t.filter(is_ill_typed(F.col("term")))
