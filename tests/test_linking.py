"""Connected-components / canonicalization tests: min-label vs the
alternating large-star/small-star scale path, and the broadcast-fallback
regimes of canonicalize_entities."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.linking import (
    canonicalize_entities,
    connected_components,
    connected_components_alternating,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _as_map(df):
    return {r["member"]: r["comp"] for r in df.collect()}


class TestAlternatingCC:
    def test_small_graph_same_as_minlabel(self, spark):
        pairs = [
            ("<b>", "<a>"), ("<c>", "<b>"), ("<e>", "<d>"),
            ("<f>", "<f2>"), ("<f2>", "<f3>"), ("<f3>", "<a>"),
        ]
        e = _edges(spark, pairs)
        assert _as_map(connected_components_alternating(e)) == _as_map(
            connected_components(e)
        )

    def test_long_chain_fewer_iterations(self, spark):
        # 1k-node chain: min-label needs O(n) rounds (capped), alternating O(log n)
        n = 1000
        pairs = [(f"<n{i:04d}>", f"<n{i+1:04d}>") for i in range(n - 1)]
        e = _edges(spark, pairs).repartition(8)
        st_alt = {}
        alt = _as_map(connected_components_alternating(e, stats=st_alt))
        assert len(set(alt.values())) == 1
        assert set(alt.values()) == {"<n0000>"}
        assert len(alt) == n
        assert st_alt["iterations"] <= 12, st_alt
        # min-label on a short sub-chain for equality check (full 1k chain
        # would need 1k rounds)
        sub = _edges(spark, pairs[:16])
        st_ml = {}
        ml = _as_map(connected_components(sub, stats=st_ml))
        alt_sub = _as_map(connected_components_alternating(sub))
        assert ml == alt_sub

    def test_two_components_and_star(self, spark):
        pairs = [("<hub>", f"<s{i}>") for i in range(50)] + [("<x>", "<y>")]
        e = _edges(spark, pairs)
        alt = _as_map(connected_components_alternating(e))
        assert alt["<x>"] == alt["<y>"] == "<x>"
        assert {alt[f"<s{i}>"] for i in range(50)} == {"<hub>"}


class TestCanonicalizeBroadcastRegimes:
    def _setup(self, spark):
        t = spark.createDataFrame(
            [("<a>", "<p>", "<b>"), ("<b>", "<p>", "<c>")],
            "s string, p string, o string",
        )
        comp = spark.createDataFrame(
            [("<b>", "<a>"), ("<c>", "<a>")], "member string, comp string"
        )
        return t, comp

    def test_broadcast_regime_plan(self, spark):
        t, comp = self._setup(spark)
        out = canonicalize_entities(t, comp, broadcast=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        rows = {(r["s"], r["o"]) for r in out.collect()}
        assert rows == {("<a>", "<a>"), ("<a>", "<a>")} or rows == {("<a>", "<a>")}

    def test_shuffle_regime_plan(self, spark):
        t, comp = self._setup(spark)
        out = canonicalize_entities(t, comp, broadcast=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan or "AdaptiveSparkPlan" in plan
        # values identical in both regimes
        ref = canonicalize_entities(t, comp, broadcast=True)
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))

    def test_auto_small_map_broadcasts(self, spark):
        t, comp = self._setup(spark)
        out = canonicalize_entities(t, comp)  # auto: 2 rows → broadcast
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


def test_fixpoint_one_driver_action_per_round(spark):
    """The min-label loop costs ONE driver action (job) per round: the
    lazy localCheckpoint materializes inside the changed-count job
    (r2 VERDICT perf finding — driver-barrier latency amplifies on a
    busy cluster, so checkpoint+isEmpty per round was 2× the barriers)."""
    from sophia_rs_spark.operators.linking import connected_components

    chain = [(f"<n{i}>", f"<n{i+1}>") for i in range(8)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    sc = spark.sparkContext
    # AQE materializes every shuffle stage as its own job — disable it
    # so jobs ≈ driver actions and the count is a meaningful proxy
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-fixpoint-jobs", "job-count probe")
    try:
        stats = {}
        labels = connected_components(edges, stats=stats)
        rows = labels.collect()
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    jobs = sc.statusTracker().getJobIdsForGroup("cc-fixpoint-jobs")
    iters = stats["iterations"]
    # budget: 2 eager setup checkpoints + 1 job/round + the final collect
    assert len(jobs) <= iters + 4, (len(jobs), iters)
    # and the answer is still right: one component rooted at <n0>
    assert {r["comp"] for r in rows} == {"<n0>"}
    assert len(rows) == 9
