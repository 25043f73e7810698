"""Skew handling for head predicates / head IRIs (SURVEY.md §4 item 1).

Common-Crawl-style graphs are Zipf-skewed: ``rdf:type`` and a handful
of schema.org predicates dominate, and hub IRIs (popular entities)
concentrate join keys.  Catalyst's AQE skew-join splits oversized
partitions at runtime (enabled in our sessions); this module adds the
two explicit mitigations AQE cannot apply:

- :func:`salted_repartition` — spread one hot *grouping* key across
  ``n_salts`` partitions before stateful per-key work.
- :func:`salted_join` — replicate the small side ``n_salts``× and salt
  the big side's key, so a shuffle join on a hot key uses every
  executor instead of one straggler.  Use when the small side is too
  big to broadcast (else just ``F.broadcast``).

Both are deterministic (xxhash64 salt) and preserve exact results
(tested against the unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, n_parts: int, n_salts: int = 16) -> DataFrame:
    """Repartition by (key, salt) — hot keys spread over n_salts partitions.
    Salt is a deterministic hash of the whole row's s column when present
    (stable across runs), else a per-row spread."""
    spread_col = "s" if "s" in df.columns and key != "s" else df.columns[0]
    return df.repartition(
        n_parts, F.col(key), F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small ON key`` with the big side's hot keys
    salted and the small side replicated ``n_salts``×.

    Result is exactly the plain join's result (row multiset)."""
    spark = big.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns if c != key]), F.lit(n_salts)
        ).cast("int"),
    )
    small_s = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
