"""Checkpoint-resumable pipeline tests: manifests, resume-without-
recompute, dependency invalidation, owl:sameAs canonicalization flow."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.plans.extract import pages_df
from sophia_rs_spark.plans.pipeline import load_manifest, run_pipeline, run_stage
from sophia_rs_spark.sources.fixtures import FixtureCase, fixture_pages

SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

CASES = [
    FixtureCase(
        "p1",
        "nt",
        "<x:a> <x:p> <x:o>.\n"
        f"<x:a> <{SAMEAS}> <x:b>.\n"
        f"<x:b> <{SAMEAS}> <x:c>.",
        [],
    ),
    FixtureCase("p2", "nt", "<x:c> <x:q> <x:o2>.", []),
    FixtureCase("p3", "nt", "bad line", [], error_lines=1),
]


@pytest.fixture()
def pages(spark):
    return pages_df(spark, fixture_pages(CASES))


def test_pipeline_end_to_end(spark, pages, tmp_path):
    wd = str(tmp_path / "wd")
    out = run_pipeline(spark, pages, wd)
    # sameAs chain a-b-c: canonical id is min = <x:a>
    comp = {r["member"]: r["comp"] for r in out["components"].collect()}
    assert comp == {"<x:a>": "<x:a>", "<x:b>": "<x:a>", "<x:c>": "<x:a>"}
    # triples rewritten through the component map
    canon = {(r["s"], r["p"], r["o"]) for r in out["canonical_quads"].collect()}
    assert ("<x:a>", "<x:q>", "<x:o2>") in canon  # <x:c> rewritten to <x:a>
    assert ("<x:a>", f"<{SAMEAS}>", "<x:a>") in canon
    # quarantine captured the bad page
    assert out["quarantine"].count() == 1
    # lineage covers graph + terms stages
    stages = {r["stage"] for r in out["lineage"].collect()}
    assert stages == {"graph", "terms"}
    # manifests written for every stage
    for stage in ("extract", "components", "canonicalize", "graph", "terms"):
        man = load_manifest(wd, stage)
        assert man is not None and man["rows"] >= 0 and "checksum" in man


def test_pipeline_resume_skips_recompute(spark, pages, tmp_path):
    wd = str(tmp_path / "wd")
    run_pipeline(spark, pages, wd)
    man1 = load_manifest(wd, "extract")

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(3).select(F.col("id").cast("string").alias("s"))

    # same stage name + satisfied manifest → compute not called
    df = run_stage(spark, wd, "extract", compute)
    assert calls["n"] == 0
    assert df.count() == man1["rows"]


def test_stage_dependency_invalidation(spark, tmp_path):
    wd = str(tmp_path / "wd")
    a1 = run_stage(spark, wd, "a", lambda: spark.range(5).select(F.col("id")))
    b1 = run_stage(
        spark, wd, "b", lambda: spark.range(2).select(F.col("id")), deps=("a",)
    )
    # recompute a with different content → b must recompute
    run_stage(
        spark, wd, "a", lambda: spark.range(7).select(F.col("id")), force=True
    )
    calls = {"n": 0}

    def compute_b():
        calls["n"] += 1
        return spark.range(4).select(F.col("id"))

    b2 = run_stage(spark, wd, "b", compute_b, deps=("a",))
    assert calls["n"] == 1
    assert b2.count() == 4


def test_manifest_checksum_partition_independent(spark, tmp_path):
    wd = str(tmp_path / "wd")
    df = spark.range(100).select(F.col("id").cast("string").alias("s"))
    run_stage(spark, wd, "x1", lambda: df.repartition(2))
    run_stage(spark, wd, "x2", lambda: df.repartition(13))
    m1, m2 = load_manifest(wd, "x1"), load_manifest(wd, "x2")
    assert m1["checksum"] == m2["checksum"]
    assert m1["rows"] == m2["rows"]


def test_f9_linking_fixture_components(spark, tmp_path):
    """F9 golden components: extract sameAs bridges across pages →
    connected components must equal the hand-derived golden set."""
    from sophia_rs_spark.operators.linking import connected_components, sameas_edges
    from sophia_rs_spark.plans.extract import extract_quads, split_quarantine
    from sophia_rs_spark.sources.fixtures import linking_fixture

    pages_pdf, golden = linking_fixture()
    pages = pages_df(spark, pages_pdf)
    good, bad = split_quarantine(extract_quads(pages, from_html=True))
    assert bad.count() == 0
    comp = connected_components(sameas_edges(good))
    got = {(r["comp"], r["member"]) for r in comp.collect()}
    assert got == set(golden)
