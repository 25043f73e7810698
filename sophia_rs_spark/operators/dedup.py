"""Deduplication operators for large-scale document pipelines.

First-class components of the engine (driver brief: exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).  All
are pure built-in-function compositions (JVM-side, codegen) — no Python
UDFs — and every hash is deterministic (md5/xxhash64), so results are
identical across runs and cluster sizes and reproducible in the DuckDB
oracle.

Scale notes (100 TB): exact dedup shuffles only (fingerprint, doc_id);
MinHash shuffles (band, minhash) signatures — constant per document;
the LSH self-join is banded so the join key cardinality stays bounded;
SimHash is a single aggregation per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5 content fingerprint per document."""
    return docs.select(id_col, F.expr(f"md5({text_col})").alias("fp"))


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: (fp, n, keep_id=min id) for groups >1."""
    return (
        exact_fingerprints(docs, text_col, id_col)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n") > 1)
    )


def word_shingles(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """k-word shingles: (doc_id, shingle); documents shorter than k words
    are dropped (same rule as the oracle)."""
    d = docs.select(id_col, F.split(F.col(text_col), " ").alias("t")).filter(
        F.size("t") >= k
    )
    pos = d.select(
        id_col, F.col("t"), F.explode(F.sequence(F.lit(1), F.size("t") - (k - 1))).alias("i")
    )
    parts = [F.element_at("t", F.col("i") + j) for j in range(k)]
    return pos.select(id_col, F.concat_ws(" ", *parts).alias("shingle"))


def minhash_signatures(
    docs: DataFrame, bands: int = 4, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Banded MinHash: per (doc, band) the min md5 over seeded shingles.
    One row per document per band — the LSH signature table."""
    sh = word_shingles(docs, k, text_col, id_col)
    spark = docs.sparkSession
    band_df = spark.range(bands).select(F.col("id").cast("int").alias("band"))
    seeded = sh.crossJoin(F.broadcast(band_df))
    return seeded.groupBy(id_col, "band").agg(
        F.min(
            F.md5(
                F.concat(
                    F.col("band").cast("string"), F.lit(":"), F.col("shingle")
                ).cast("binary")
            )
        ).alias("minhash")
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate candidates: pairs sharing any (band, minhash) bucket."""
    a, b = signatures.alias("a"), signatures.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles for candidate pairs:
    (doc_a, doc_b, inter, uni, jacc_permille).  Integer permille keeps
    the result float-free (oracle-hashable)."""
    sh = word_shingles(docs, k, text_col, id_col).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.withColumnRenamed(id_col, "doc_a")
    b = sh.withColumnRenamed(id_col, "doc_b")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
            F.floor(F.col("inter") * 1000 / (F.col("na") + F.col("nb") - F.col("inter")))
            .cast("bigint")
            .alias("jacc_permille"),
        )
    )
    return out


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over whitespace tokens: per bit, the majority vote
    of token md5 bits; output as a 60-char '0'/'1' string (portable —
    no bigint/hex dialect differences vs the SQL oracle).

    bit b of a token = bit (b mod 4) of hex nibble (b div 4) of md5.
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = toks.select(id_col, F.md5(F.col("tok").cast("binary")).alias("hx"))
    bits = (
        h.select(id_col, "hx", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b"))
        .withColumn(
            "nib",
            F.expr("instr('0123456789abcdef', substring(hx, cast(b / 4 as int) + 1, 1)) - 1"),
        )
        .withColumn(
            "bit",
            F.floor(F.col("nib") / F.pow(F.lit(2.0), (F.col("b") % 4).cast("double"))).cast("int")
            % 2,
        )
    )
    votes = bits.groupBy(id_col, "b").agg(
        F.sum("bit").alias("ones"), F.count(F.lit(1)).alias("n")
    )
    return (
        votes.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "b",
                        F.when(F.col("ones") * 2 >= F.col("n"), F.lit("1"))
                        .otherwise(F.lit("0"))
                        .alias("c"),
                    )
                )
            ).alias("arr")
        )
        .select(
            id_col,
            F.concat_ws("", F.transform("arr", lambda s: s["c"])).alias("simhash"),
        )
    )
