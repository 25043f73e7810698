"""End-to-end extract pipeline: fixture pages → HTML extraction → parse →
quads → graph/term tables.  Covers the byte-identical extraction
invariant (BASELINE.json:15) and the P/R≥0.95 golden comparison."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.sources.fixtures import (
    ALL_CASES,
    F1_NT,
    expected_skolemized,
    fixture_pages,
    tiled_pages,
)
from sophia_rs_spark.sources.html_extract import (
    extract_payloads,
    extract_text,
    synthesize_html,
)
from sophia_rs_spark.plans.extract import (
    extract_quads,
    graph_table,
    lineage,
    pages_df,
    split_quarantine,
    term_table,
)


class TestHtmlExtract:
    def test_roundtrip_pre(self):
        payloads = [("nt", '<x:s> <x:p> "a<b>&c".'), ("ttl", "<a> <b> <c>.")]
        html = synthesize_html("http://u/1", payloads)
        assert extract_payloads(html) == payloads

    def test_roundtrip_jsonld(self):
        payloads = [("jsonld", '{"@id": "x:s", "name": "a & b"}')]
        html = synthesize_html("http://u/1", payloads)
        assert extract_payloads(html) == payloads

    def test_byte_identical_invariant_on_fixture_corpus(self):
        pdf = fixture_pages()
        for _, row in pdf.iterrows():
            assert extract_text(row["html"]) == row["text"], row["case"]

    def test_multiline_payload(self):
        text = "<x:s> <x:p> <x:o>.\n<x:s2> <x:p> <x:o>."
        html = synthesize_html("u", [("nt", text)])
        assert extract_text(html) == text

    def test_ignores_other_markup(self):
        html = (
            "<html><body><p>hello &amp; junk</p><script>var x=1;</script>"
            '<pre>no format attr</pre><pre data-format="nt">&lt;a&gt; &lt;b&gt; &lt;c&gt;.</pre></body></html>'
        )
        assert extract_payloads(html) == [("nt", "<a> <b> <c>.")]


@pytest.fixture(scope="module")
def corpus_quads(spark):
    pages = pages_df(spark, fixture_pages())
    quads = extract_quads(pages, from_html=True)
    quads.cache()
    yield quads
    quads.unpersist()


class TestExtractPipeline:
    def test_quarantine_counts(self, corpus_quads):
        good, bad = split_quarantine(corpus_quads)
        expected_errors = sum(c.error_lines for c in ALL_CASES)
        assert bad.count() == expected_errors
        assert good.filter(F.col("s").isNull()).count() == 0

    def test_golden_precision_recall(self, spark, corpus_quads):
        """P/R vs hand-derived goldens must be 1.0 on the fixture corpus
        (target ≥0.95, BASELINE.json)."""
        pdf = fixture_pages()
        golden = []
        count_only = {}  # url -> expected_count
        for i, case in enumerate(ALL_CASES):
            url = pdf.iloc[i]["url"]
            if case.expected is None:
                count_only[url] = case.expected_count
                continue
            for q in expected_skolemized(case, url):
                golden.append((url, *q))
        golden_df = spark.createDataFrame(
            golden, "url string, s string, p string, o string, g string"
        )
        good, _ = split_quarantine(corpus_quads)
        # count-only cases (bnode-heavy Turtle/TriG): exact count per url
        if count_only:
            got_counts = {
                r["url"]: r["n"]
                for r in good.groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()
                if r["url"] in count_only
            }
            for url, exp in count_only.items():
                assert got_counts.get(url, 0) == exp, (url, got_counts.get(url), exp)
        # null-safe on g: default graph is NULL on both sides
        emitted = good.filter(~F.col("url").isin(list(count_only))).select(
            "url", "s", "p", "o", F.coalesce("g", F.lit("")).alias("g")
        )
        golden_df = golden_df.withColumn("g", F.coalesce("g", F.lit("")))
        cols = ["url", "s", "p", "o", "g"]
        n_emitted = emitted.count()
        n_golden = golden_df.count()
        n_common = emitted.join(golden_df, cols, "inner").count()
        precision = n_common / n_emitted
        recall = n_common / n_golden
        assert precision == 1.0, (n_common, n_emitted)
        assert recall == 1.0, (n_common, n_golden)

    def test_graph_table_set_semantics(self, spark):
        pages = pages_df(
            spark,
            fixture_pages([F1_NT[3], F1_NT[3]]),  # same triple, two pages
        )
        quads = extract_quads(pages)
        good, _ = split_quarantine(quads)
        g = graph_table(good, set_graph=True)
        assert g.count() == 1  # deduped across pages
        assert graph_table(good, set_graph=False).count() == 2

    def test_term_table_ids_deterministic(self, spark, corpus_quads):
        good, _ = split_quarantine(corpus_quads)
        t1 = term_table(good)
        # term_id equals xxhash64 of the canonical string — recomputable
        chk = t1.withColumn("rid", F.xxhash64("term")).filter(
            F.col("term_id") != F.col("rid")
        )
        assert chk.count() == 0
        # ids unique per term
        assert t1.count() == t1.select("term_id").distinct().count()

    def test_kind_discriminants(self, spark, corpus_quads):
        good, _ = split_quarantine(corpus_quads)
        kinds = {
            r["kind"]
            for r in term_table(good).select("kind").distinct().collect()
        }
        assert kinds <= {0, 1, 2, 3, 4}
        assert {0, 1, 2, 3} <= kinds  # corpus has bnodes, iris, literals, ttterms

    def test_lineage_checksum_stable_across_partitionings(self, spark):
        pages = pages_df(spark, tiled_pages(64))
        q1 = extract_quads(pages.repartition(2))
        q2 = extract_quads(pages.repartition(8))
        agg = lambda q: (
            lineage("x", q)
            .agg(
                F.sum("n_rows").alias("n"),
                F.expr("bit_xor(checksum)").alias("chk"),
            )
            .collect()[0]
        )
        r1, r2 = agg(q1), agg(q2)
        assert r1["n"] == r2["n"]
        assert r1["chk"] == r2["chk"]

    def test_parallelism_invariance(self, spark):
        """Same quads regardless of partition count — the determinism half
        of the two-cluster-size rule."""
        pages = pages_df(spark, tiled_pages(50))
        a = extract_quads(pages.repartition(1)).sort("url", "line", "s").collect()
        b = extract_quads(pages.repartition(7)).sort("url", "line", "s").collect()
        assert a == b


def test_microdata_pages_through_pipeline(spark):
    """F7: Microdata pages flow through extract_quads(microdata=True);
    text invariant holds (no pre/script payloads → text='')."""
    import datetime as dt
    import pandas as pd

    html = (
        '<!DOCTYPE html><html><body>'
        '<div itemscope itemid="http://e/me" itemtype="https://schema.org/Person">'
        '<span itemprop="name">Alice</span></div></body></html>'
    )
    pdf = pd.DataFrame(
        {
            "url": ["https://m.example.org/p/1"],
            "warc_ts": [dt.datetime(2026, 1, 1)],
            "html": [html.encode()],
            "text": [""],
            "lang": ["en"],
        }
    )
    from sophia_rs_spark.sources.html_extract import extract_text

    assert extract_text(html) == ""  # byte-identical invariant for F7 pages
    pages = pages_df(spark, pdf)
    good, bad = split_quarantine(extract_quads(pages, microdata=True))
    rows = {(r["s"], r["p"], r["o"]) for r in good.collect()}
    assert (
        "<http://e/me>",
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
        "<https://schema.org/Person>",
    ) in rows
    assert ("<http://e/me>", "<https://schema.org/name>", '"Alice"') in rows
    assert bad.count() == 0
