"""Resource-centric API (resource/src/resource.rs re-expression)."""

import pytest

from sophia_rs_spark.plans.resource import Resource, ResourceError

NS = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        (f"<{NS}alice>", f"<{NS}name>", '"Alice"', None),
        (f"<{NS}alice>", f"<{NS}age>", f'"42"^^<{XSD}integer>', None),
        (f"<{NS}alice>", f"<{NS}active>", f'"true"^^<{XSD}boolean>', None),
        (f"<{NS}alice>", f"<{NS}score>", f'"3.5"^^<{XSD}double>', None),
        (f"<{NS}alice>", f"<{NS}knows>", f"<{NS}bob>", None),
        (f"<{NS}alice>", f"<{NS}knows>", f"<{NS}carol>", None),
        (f"<{NS}alice>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{NS}Person>", None),
        (f"<{NS}bob>", f"<{NS}name>", '"Bob"', None),
        (f"<{NS}bob>", f"<{NS}knows>", f"<{NS}dave>", None),
        (f"<{NS}dave>", f"<{NS}name>", '"Dave"', None),
        (f"<{NS}carol>", f"<{NS}name>", '"Carol"', None),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    df.cache().count()
    yield df
    df.unpersist()


class TestGetters:
    def test_typed_getters(self, data):
        r = Resource(data, f"<{NS}alice>")
        assert r.get_str(f"<{NS}name>") == "Alice"
        assert r.get_int(f"<{NS}age>") == 42
        assert r.get_bool(f"<{NS}active>") is True
        assert r.get_float(f"<{NS}score>") == 3.5
        assert r.get_iri(f"<{NS}knows>") == f"{NS}bob"  # min in canonical order
        assert r.types() == [f"<{NS}Person>"]
        assert len(r.get_all(f"<{NS}knows>")) == 2

    def test_error_taxonomy(self, data):
        r = Resource(data, f"<{NS}alice>")
        with pytest.raises(ResourceError) as e:
            r.get_str(f"<{NS}missing>")
        assert e.value.kind == "no_value"
        with pytest.raises(ResourceError) as e:
            r.get_int(f"<{NS}name>")
        assert e.value.kind == "unexpected_kind"
        with pytest.raises(ResourceError) as e:
            r.get_iri(f"<{NS}name>")
        assert e.value.kind == "unexpected_kind"
        assert r.get_term_opt(f"<{NS}missing>") is None

    def test_follow_resource(self, data):
        r = Resource(data, f"<{NS}alice>")
        bob = r.get_resource(f"<{NS}knows>")
        assert bob.get_str(f"<{NS}name>") == "Bob"
        with pytest.raises(ResourceError):
            r.get_resource(f"<{NS}name>")


class TestTraversal:
    def test_preorder_bfs(self, data):
        r = Resource(data, f"<{NS}alice>")
        walked = list(r.traverse(max_depth=3))
        by_depth = {}
        for depth, subj, res in walked:
            by_depth.setdefault(depth, []).append(subj)
        assert by_depth[0] == [f"<{NS}alice>"]
        assert set(by_depth[1]) == {f"<{NS}bob>", f"<{NS}carol>", f"<{NS}Person>"}
        assert by_depth[2] == [f"<{NS}dave>"]
        # level prefetch populated the property maps (no extra jobs needed)
        dave = [res for d, s, res in walked if s == f"<{NS}dave>"][0]
        assert dave.get_str(f"<{NS}name>") == "Dave"

    def test_depth_and_node_caps(self, data):
        r = Resource(data, f"<{NS}alice>")
        assert max(d for d, _, _ in r.traverse(max_depth=1)) == 1
        assert len(list(r.traverse(max_nodes=2))) <= 3
