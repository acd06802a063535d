"""operators/graph — connected components + dedup keep-one.

Contract: component = min reachable id (chains, cycles, cliques,
singletons, direction-agnostic duplicate edges); a long chain converges
well inside the round bound (pointer jumping); dedup_keep_one keeps
exactly the component minima with surviving rows byte-identical."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import graph as G


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical form
    comp = {}
    for i in ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _edges_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a string, id_b string")


def test_cc_matches_union_find_random_graph(spark):
    rng = np.random.RandomState(7)
    ids = [f"v{i:03d}" for i in range(120)]
    pairs = [
        (ids[rng.randint(120)], ids[rng.randint(120)]) for _ in range(90)
    ]
    # duplicates + reversed edges must not matter
    pairs += [(b, a) for a, b in pairs[:20]] + pairs[:10]
    verts = spark.createDataFrame([(i,) for i in ids], "id string")
    got = {
        r.id: r.component
        for r in G.connected_components(
            _edges_df(spark, pairs), vertices=verts
        ).collect()
    }
    assert got == _union_find(ids, pairs)
    # singletons present as their own component
    isolated = set(ids) - {x for p in pairs for x in p}
    assert isolated and all(got[i] == i for i in isolated)


def test_cc_long_chain_converges_fast(spark):
    n = 200  # diameter 199; pointer jumping must close it in <= 30 rounds
    ids = [f"c{i:04d}" for i in range(n)]
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    got = {
        r.id: r.component
        for r in G.connected_components(_edges_df(spark, pairs)).collect()
    }
    assert set(got.values()) == {ids[0]} and len(got) == n


def test_cc_without_vertices_only_edge_ids(spark):
    pairs = [("a", "b"), ("c", "d"), ("b", "c"), ("x", "y")]
    got = {
        r.id: r.component
        for r in G.connected_components(_edges_df(spark, pairs)).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"
    }


def test_cc_round_bound_raises(spark):
    pairs = [(f"n{i}", f"n{i+1}") for i in range(8)]
    with pytest.raises(RuntimeError):
        G.connected_components(_edges_df(spark, pairs), max_rounds=1)


def test_dedup_keep_one(spark):
    rows = [(f"id{i}", f"payload-{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    pairs = _edges_df(spark, [("id0", "id1"), ("id1", "id2"), ("id4", "id5")])
    got = {
        (r.image_id, r.caption)
        for r in G.dedup_keep_one(df, pairs).collect()
    }
    assert got == {("id0", "payload-0"), ("id3", "payload-3"), ("id4", "payload-4")}


def test_cc_releases_superseded_checkpoints(spark):
    """Block-manager hygiene: a multi-round CC run must not leave one
    persistent RDD per round behind — only the final state (the
    result's backing checkpoint) may remain."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # a 40-node chain needs several pointer-jump rounds
    pairs = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(40)]
    out = G.connected_components(_edges_df(spark, pairs))
    assert out.count() == 41
    after = jsc.getPersistentRDDs().size()
    # tolerance 1: the final comp checkpoint backs the returned frame
    assert after - before <= 1, f"leaked {after - before} persistent RDDs"
