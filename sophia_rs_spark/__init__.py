"""sophia_rs_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of
``pchampin/sophia_rs`` (RDF 1.2 data model, Turtle-family parsing, IRI
resolution, term interning, graph/dataset operations, canonicalization,
entailment) as a distributed extract-link-canonicalize DataFrame pipeline
over Common-Crawl-style web-page tables.

Layout:
- ``terms``      — pure-Python/pandas term core: canonical N-Triples
                   encoding, escapes, IRI resolution, BCP47, xxhash64.
- ``sources``    — parsers (N-Triples/N-Quads/Turtle/TriG/JSON-LD), HTML
                   extraction, deterministic page synthesis, direct mapping.
- ``operators``  — graph/dataset ops, BGP compiler, linking/connected
                   components, dedup, similarity, text stats, reasoner, c14n.
- ``functions``  — Spark Column helpers (term encode/decode, skolem ids).
- ``plans``      — end-to-end pipeline orchestration, lineage, checkpoints.
- ``streaming``  — Structured Streaming ingestion (optional mode).
"""

__version__ = "0.1.0"
