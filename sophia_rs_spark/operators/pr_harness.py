"""Precision/Recall scoring harness (FIXTURES.md §3, BASELINE.json).

P = |emitted ∩ golden| / |emitted|, R = |emitted ∩ golden| / |golden|,
joined on (url, s, p, o, g) canonical strings — with RDFC-1.0
relabeling per url first, so residual blank-node label differences
between two correct extractions don't count as errors (the
isomorphism-tolerant comparison of `isomorphism/src/dataset.rs:24-55`).
Target: P ≥ 0.95 AND R ≥ 0.95.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .c14n import canonicalize_by_url

_COLS = ["url", "s", "p", "o", "g"]


def _normalize(df: DataFrame, c14n: bool) -> DataFrame:
    out = df
    if "g" not in out.columns:
        out = out.withColumn("g", F.lit(None).cast("string"))
    out = out.select(*_COLS)
    if c14n:
        out = canonicalize_by_url(out)
    # null-safe join key for the default graph
    return out.select(
        "url", "s", "p", "o", F.coalesce("g", F.lit("")).alias("g")
    ).dropDuplicates(_COLS)


def precision_recall(
    emitted: DataFrame, golden: DataFrame, *, c14n: bool = True
) -> dict:
    """→ {precision, recall, n_emitted, n_golden, n_common, pass_095}."""
    e = _normalize(emitted, c14n)
    g = _normalize(golden, c14n)
    n_e = e.count()
    n_g = g.count()
    n_c = e.join(g, _COLS, "inner").count()
    p = n_c / n_e if n_e else 1.0
    r = n_c / n_g if n_g else 1.0
    return {
        "precision": p,
        "recall": r,
        "n_emitted": n_e,
        "n_golden": n_g,
        "n_common": n_c,
        "pass_095": p >= 0.95 and r >= 0.95,
    }


def diff(emitted: DataFrame, golden: DataFrame, *, c14n: bool = True):
    """(false_positives, false_negatives) DataFrames for debugging."""
    e = _normalize(emitted, c14n)
    g = _normalize(golden, c14n)
    return e.join(g, _COLS, "left_anti"), g.join(e, _COLS, "left_anti")
