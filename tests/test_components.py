"""Connected components / dup-cluster finisher (etl_ray/ops/components.py)."""

import ray.data as rd

from etl_ray.ops.components import connected_components, dup_clusters


def test_components_basic_graphs(ray_session):
    # chain a-b-c-d + triangle e-f-g + isolated pair h-i
    edges = rd.from_items([
        {"id_a": "b", "id_b": "a"}, {"id_a": "b", "id_b": "c"},
        {"id_a": "c", "id_b": "d"}, {"id_a": "e", "id_b": "f"},
        {"id_a": "f", "id_b": "g"}, {"id_a": "e", "id_b": "g"},
        {"id_a": "i", "id_b": "h"},
    ])
    out = connected_components(edges).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "e": "e", "f": "e", "g": "e", "h": "h", "i": "h"}


def test_components_long_path_pointer_jumping(ray_session):
    # path of 16 nodes collapses to one component in O(log n) rounds
    edges = rd.from_items(
        [{"id_a": f"n{i:02d}", "id_b": f"n{i + 1:02d}"} for i in range(15)])
    out = connected_components(edges).to_pandas()
    assert set(out["component"]) == {"n00"}
    assert len(out) == 16


def test_components_int_ids_preserve_dtype(ray_session):
    # int ids: numeric (not lexicographic) min is the canonical label
    edges = rd.from_items([{"id_a": 10, "id_b": 2}, {"id_a": 2, "id_b": 30}])
    out = connected_components(edges).to_pandas()
    assert out["component"].dtype.kind == "i"
    assert set(out["component"]) == {2}


def test_dup_clusters_keep_flags(ray_session):
    edges = rd.from_items([
        {"id_a": "b", "id_b": "a"}, {"id_a": "b", "id_b": "c"},
        {"id_a": "c", "id_b": "d"}, {"id_a": "e", "id_b": "f"},
        {"id_a": "f", "id_b": "g"}, {"id_a": "e", "id_b": "g"},
        {"id_a": "i", "id_b": "h"},
    ])
    kl = dup_clusters(edges).to_pandas().sort_values("doc_id")
    assert list(kl[kl["keep"]]["doc_id"]) == ["a", "e", "h"]
    assert list(kl[~kl["keep"]]["doc_id"]) == ["b", "c", "d", "f", "g", "i"]
