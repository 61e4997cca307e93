"""PageRank (operators/graph.py) vs a straight-line numpy power
iteration, including sink nodes and disconnected vertices."""

from __future__ import annotations

from asset_prices_parquet_saver_spark.operators.graph import pagerank

EDGES = [  # (src, dst, w): b is a sink, d is disconnected
    ("a", "b", 2.0),
    ("a", "c", 1.0),
    ("c", "a", 1.0),
    ("c", "b", 3.0),
]
NODES = ["a", "b", "c", "d"]


def _reference(iterations: int, d: float = 0.85) -> dict[str, float]:
    out = {}
    for s, _, w in EDGES:
        out[s] = out.get(s, 0.0) + w
    r = {v: 1.0 / len(NODES) for v in NODES}
    for _ in range(iterations):
        nxt = {v: (1.0 - d) / len(NODES) for v in NODES}
        for s, t, w in EDGES:
            nxt[t] += d * r[s] * (w / out[s])
        r = nxt
    return r


def test_matches_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string, w double")
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, nodes, iterations=3).collect()
    }
    ref = _reference(3)
    assert set(got) == set(NODES)
    for v in NODES:
        assert abs(got[v] - ref[v]) < 1e-12, (v, got[v], ref[v])
    # sinks keep teleport-only mass; disconnected nodes too
    assert abs(got["d"] - (1.0 - 0.85) / 4) < 1e-12


def test_mass_is_conserved_without_sinks(spark):
    """On a sink-free graph total rank stays 1 (the simple variant only
    leaks mass through sinks)."""
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    total = sum(
        r["rank"] for r in pagerank(edges, nodes, iterations=4).collect()
    )
    assert abs(total - 1.0) < 1e-12


def test_pagerank_until_converges_to_fixed_point(spark):
    from asset_prices_parquet_saver_spark.operators.graph import pagerank_until

    edges = spark.createDataFrame(EDGES, "src string, dst string, w double")
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    converged = {
        r["node"]: r["rank"]
        for r in pagerank_until(edges, nodes, tol=1e-10).collect()
    }
    # the fixed point: one more exact iteration moves nothing
    ref = _reference(200)
    for v in NODES:
        assert abs(converged[v] - ref[v]) < 1e-8, (v, converged[v], ref[v])


def test_empty_vertex_set_raises(spark):
    import pytest

    edges = spark.createDataFrame([], "src string, dst string, w double")
    nodes = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError, match="empty vertex set"):
        pagerank(edges, nodes, iterations=1)


def test_zero_weight_out_edges_treated_as_dangling(spark):
    """A src whose weights sum to 0 must behave exactly like a sink
    (w/0 would otherwise yield NULL contributions that silently vanish
    from the sums): same ranks as the graph with those edges absent."""
    edges = spark.createDataFrame(
        EDGES + [("b", "a", 0.0)], "src string, dst string, w double"
    )
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, nodes, iterations=3).collect()
    }
    ref = _reference(3)  # reference has no b-edges at all
    for v in NODES:
        assert abs(got[v] - ref[v]) < 1e-12, (v, got[v], ref[v])


# ----------------------------------- triangle counting

def test_triangle_counts_single_triangle_plus_tail(spark):
    from asset_prices_parquet_saver_spark.operators import graph

    # triangle a-b-c plus a dangling edge c-d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    out = {r.vertex: r.n_triangles for r in graph.triangle_counts(edges).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_canonicalizes_direction_and_dupes(spark):
    from asset_prices_parquet_saver_spark.operators import graph

    # same triangle given with mixed directions, duplicates, self-loop
    edges = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "b"), ("a", "c"), ("a", "a")],
        ["src", "dst"],
    )
    out = {r.vertex: r.n_triangles for r in graph.triangle_counts(edges).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_k4_has_three_per_vertex(spark):
    from itertools import combinations

    from asset_prices_parquet_saver_spark.operators import graph

    edges = spark.createDataFrame(
        list(combinations(["a", "b", "c", "d"], 2)), ["src", "dst"]
    )
    out = {r.vertex: r.n_triangles for r in graph.triangle_counts(edges).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


# ---------------------------------------------------------------------
# khop_min_hops: multi-source bounded BFS
# ---------------------------------------------------------------------

from asset_prices_parquet_saver_spark.operators import graph  # noqa: E402


def _bfs_frames(spark):
    # chain a->b->c->d plus shortcut a->c, cycle d->a, isolated e<-f
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"),
         ("f", "e")],
        ["src", "dst"],
    )
    starts = spark.createDataFrame([("a",), ("f",)], ["node"])
    return edges, starts


def test_khop_min_hops_shortest_and_bound(spark):
    edges, starts = _bfs_frames(spark)
    out = {
        (r.start, r.node): r.hops
        for r in graph.khop_min_hops(edges, starts, 2).collect()
    }
    # shortcut wins: c at 1 hop, d at 2; b at 1; cycle back to a
    # is suppressed (a already visited at 0)
    assert out == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2,
        ("f", "f"): 0, ("f", "e"): 1,
    }


def test_khop_zero_and_early_exit(spark):
    edges, starts = _bfs_frames(spark)
    zero = graph.khop_min_hops(edges, starts, 0).collect()
    assert {(r.start, r.node, r.hops) for r in zero} == {
        ("a", "a", 0), ("f", "f", 0)
    }
    # k far beyond the diameter: early exit, still the closure
    big = graph.khop_min_hops(edges, starts, 50).collect()
    assert max(r.hops for r in big) == 2


def test_khop_brute_force_random(spark):
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    e = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)})
    adj = {}
    for s, d in e:
        adj.setdefault(s, []).append(d)
    k = 3

    def bfs(start):
        dist = {start: 0}
        frontier = [start]
        for i in range(1, k + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in dist:
                        dist[v] = i
                        nxt.append(v)
            frontier = nxt
        return dist

    want = {
        (s, n): h for s in nodes[:4] for n, h in bfs(s).items()
    }
    edges = spark.createDataFrame(e, ["src", "dst"])
    starts = spark.createDataFrame([(n,) for n in nodes[:4]], ["node"])
    got = {
        (r.start, r.node): r.hops
        for r in graph.khop_min_hops(edges, starts, k).collect()
    }
    assert got == want


# ---------------------------------------------------------------------
# min_label_propagation: fixed-round synchronous min-label
# ---------------------------------------------------------------------


def test_label_propagation_components_within_rounds(spark):
    # two components: chain a-b-c-d (diameter 3) and pair x-y
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    out = {
        r.node: r.label
        for r in graph.min_label_propagation(edges, 3).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x"}


def test_label_propagation_round_bound_semantics(spark):
    # one round only: d is 3 hops from a, so it sees only c's initial
    # label; labels are min-of-neighborhood, not components yet
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    out = {
        r.node: r.label
        for r in graph.min_label_propagation(edges, 1).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "b", "d": "c"}


def test_label_propagation_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(14)]
    e = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(16)})
    e = [(a, b) for a, b in e if a != b]
    k = 3
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(k):
        labels = {
            n: min([labels[n]] + [labels[m] for m in adj[n]])
            for n in adj
        }
    edges = spark.createDataFrame(e, ["src", "dst"])
    got = {
        r.node: r.label
        for r in graph.min_label_propagation(edges, k).collect()
    }
    assert got == labels
