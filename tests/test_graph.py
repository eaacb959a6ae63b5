"""Graph operators: fixed-point PageRank, connected components,
near-dup cluster assignment — fastpath vs distributed equivalence and
hand-checkable semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from search_engine_skillbox_ray import config

from .conftest import requires_solo_ray
from search_engine_skillbox_ray.pipelines.graph import (
    connected_components,
    near_dup_clusters,
    pagerank,
)


def _sorted_df(ds, cols):
    df = ds.to_pandas()
    return df[list(cols)].sort_values(list(cols)).reset_index(drop=True)


# --------------------------------------------------------------- pagerank
@pytest.fixture(scope="module")
def edges(ray_session):
    """Small digraph with a hub, a chain, a dangling sink and a
    duplicate edge (must be collapsed)."""
    rows = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"),  # e is dangling (no out-edges)
        ("a", "b"),  # duplicate
        ("f", "c"),  # f has no in-edges
    ]
    return rd.from_items(
        [{"src_url": s, "dst_url": d} for s, d in rows]
    ).repartition(3)


def _pagerank_sql_reference(edge_rows, iterations=5, dn=85, dd=100, scale=10**12):
    vals = ", ".join(f"('{s}', '{d}')" for s, d in edge_rows)
    ctes = [f"""edges AS (
  SELECT DISTINCT src_url AS s, dst_url AS d
  FROM (VALUES {vals}) t(src_url, dst_url)),
nodes AS (SELECT s AS u FROM edges UNION SELECT d FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT s AS u, count(*)::BIGINT AS od FROM edges GROUP BY s),
r0 AS (SELECT u, CAST({scale} AS BIGINT) // (SELECT n FROM nn) AS r FROM nodes)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""c{i} AS (
  SELECT e.d AS u, SUM(r.r // o.od) AS c
  FROM edges e JOIN r{i - 1} r ON r.u = e.s JOIN outdeg o ON o.u = e.s
  GROUP BY e.d),
r{i} AS (
  SELECT n.u,
         CAST(({dd - dn} * (CAST({scale} AS BIGINT) // (SELECT n FROM nn))) // {dd}
              + ({dn} * COALESCE(c.c, 0)) // {dd} AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{i} c ON c.u = n.u)""")
    q = "WITH " + ",\n".join(ctes) + f"\nSELECT u AS url, r AS pagerank FROM r{iterations}"
    return (
        duckdb.connect().execute(q).fetchdf()
        .sort_values(["url"]).reset_index(drop=True)
    )


def test_pagerank_matches_sql_reference(edges):
    got = _sorted_df(pagerank(edges), ("url", "pagerank"))
    exp = _pagerank_sql_reference(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("d", "e"), ("a", "b"), ("f", "c")]
    )
    pd.testing.assert_frame_equal(got, exp[["url", "pagerank"]], check_dtype=False)
    # mass sanity: every rank positive, hub c outranks leaf e
    r = dict(zip(got["url"], got["pagerank"]))
    assert all(v > 0 for v in r.values())
    assert r["c"] > r["e"]
    assert r["f"] == min(r.values())  # no in-edges → base only


@requires_solo_ray
def test_pagerank_distributed_matches_fastpath(edges, monkeypatch):
    fast = _sorted_df(pagerank(edges), ("url", "pagerank"))
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _sorted_df(pagerank(edges), ("url", "pagerank"))
    pd.testing.assert_frame_equal(fast, dist)


def test_pagerank_empty(ray_session):
    import pyarrow as pa

    empty = rd.from_arrow(pa.table({
        "src_url": pa.array([], pa.string()), "dst_url": pa.array([], pa.string()),
    }))
    assert pagerank(empty).count() == 0


# ----------------------------------------------- connected components
@pytest.fixture(scope="module")
def pair_ds(ray_session):
    """Three components: a chain 1-2-3-4 (tests multi-hop propagation),
    a triangle 10-11-12 with a redundant edge, and an isolated pair."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (7, 20)]
    return rd.from_items(
        [{"doc_a": a, "doc_b": b} for a, b in pairs]
    ).repartition(3)


EXPECTED_COMPONENTS = {
    1: 1, 2: 1, 3: 1, 4: 1,
    10: 10, 11: 10, 12: 10,
    7: 7, 20: 7,
}


def test_components_fastpath(pair_ds):
    df = connected_components(pair_ds).to_pandas()
    got = dict(zip(df["node"], df["rep"]))
    assert got == EXPECTED_COMPONENTS


@requires_solo_ray
def test_components_distributed(pair_ds, monkeypatch):
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    df = connected_components(pair_ds).to_pandas()
    got = dict(zip(df["node"], df["rep"]))
    assert got == EXPECTED_COMPONENTS


def test_components_long_chain(ray_session):
    """64-node chain: multi-round convergence incl. pointer jumping."""
    pairs = [{"doc_a": i, "doc_b": i + 1} for i in range(63)]
    df = connected_components(rd.from_items(pairs).repartition(4)).to_pandas()
    assert (df["rep"] == 0).all() and len(df) == 64


def test_components_empty(ray_session):
    import pyarrow as pa

    empty = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
    }))
    assert connected_components(empty).count() == 0


# ------------------------------------------------- near-dup clusters
def test_near_dup_clusters_assignment(pair_ds):
    docs = rd.from_items([{"doc_id": i, "text": "x"} for i in range(25)])
    df = near_dup_clusters(docs, pair_ds).to_pandas()
    got = dict(zip(df["doc_id"], df["rep_id"]))
    assert len(df) == 25
    for i in range(25):
        assert got[i] == EXPECTED_COMPONENTS.get(i, i)
    # keep-one-per-cluster filter = rep_id == doc_id
    keep = {d for d, r in got.items() if d == r}
    assert {2, 3, 4, 11, 12, 20}.isdisjoint(keep)
    assert {0, 1, 5, 6, 7, 10}.issubset(keep)


@requires_solo_ray
def test_near_dup_clusters_distributed(pair_ds, monkeypatch):
    docs = rd.from_items([{"doc_id": i, "text": "x"} for i in range(25)])
    fast = near_dup_clusters(docs, pair_ds).to_pandas()
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = near_dup_clusters(docs, pair_ds).to_pandas()
    f = fast.sort_values("doc_id").reset_index(drop=True)
    d = dist.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(f, d)


# ----------------------------------------------- HITS hubs/authorities
def test_hits_semantics(edges):
    """Hand-checkable shape on the small fixture: every node gets a row,
    L1 totals stay ~scale, pure sinks have hub 0, pure sources have
    authority 0."""
    from search_engine_skillbox_ray.pipelines.graph import hits

    df = hits(edges, iterations=3, scale=10**9).to_pandas()
    e = edges.to_pandas()
    nodes = set(e["src_url"]) | set(e["dst_url"])
    assert set(df["url"]) == nodes
    srcs, dsts = set(e["src_url"]), set(e["dst_url"])
    r = df.set_index("url")
    for u in nodes - srcs:  # no out-edges → no hub mass
        assert r.loc[u, "hub"] == 0
    for u in nodes - dsts:  # no in-edges → no authority mass
        assert r.loc[u, "authority"] == 0
    assert 0 < df["hub"].sum() <= 10**9
    assert 0 < df["authority"].sum() <= 10**9


@requires_solo_ray
def test_hits_distributed_matches_fastpath(edges, monkeypatch):
    from search_engine_skillbox_ray.pipelines.graph import hits

    fast = _sorted_df(hits(edges), ("url", "hub", "authority"))
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _sorted_df(hits(edges), ("url", "hub", "authority"))
    pd.testing.assert_frame_equal(fast, dist)


def test_triangle_counts_vs_bruteforce(ray_session, monkeypatch):
    """Per-node triangle counts equal the brute-force triple scan on a
    random graph with duplicated/reversed input edges (BOTH the driver
    fastpath and the forced-distributed wedge path); int-node graphs
    keep their type and the out_col rename."""
    import itertools

    import numpy as np
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.graph import triangle_counts

    rng = np.random.default_rng(5)
    nodes = [f"n{i:02d}" for i in range(16)]
    edges = set()
    for _ in range(50):
        a, b = rng.choice(16, 2, replace=False)
        edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    exp = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            exp[a] += 1
            exp[b] += 1
            exp[c] += 1
    exp = {n: v for n, v in exp.items() if adj[n]}
    rows = [{"src_url": a, "dst_url": b} for a, b in edges]
    rows += [{"src_url": b, "dst_url": a} for a, b in list(edges)[:15]]  # dups/reverses
    got = triangle_counts(rd.from_items(rows)).to_pandas()
    assert dict(zip(got["url"], got["n_triangles"])) == exp

    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = triangle_counts(rd.from_items(rows)).to_pandas()
    assert dict(zip(dist["url"], dist["n_triangles"])) == exp
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 10**9)

    irows = [{"doc_a": a, "doc_b": b}
             for a, b in [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (3, 4), (5, 6)]]
    g2 = triangle_counts(
        rd.from_items(irows), src_col="doc_a", dst_col="doc_b", out_col="doc_id"
    ).to_pandas()
    assert dict(zip(g2["doc_id"], g2["n_triangles"])) == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}


def test_adamic_adar_vs_bruteforce(ray_session, monkeypatch):
    """AA scores equal the brute-force common-neighbour scan on a random
    graph with duplicated/reversed edges — fastpath AND forced-
    distributed path; existing edges are excluded; the degree cap
    excludes wedge centres above it on both sides."""
    import itertools

    import numpy as np
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.graph import adamic_adar_pairs

    rng = np.random.default_rng(9)
    nodes = [f"n{i:02d}" for i in range(14)]
    edges = set()
    for _ in range(30):
        a, b = rng.choice(14, 2, replace=False)
        edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cap = 5  # binds for some hubs in this graph
    exp = {}
    for a, b in itertools.combinations(nodes, 2):
        if (a, b) in edges:
            continue
        s = sum(
            1.0 / np.log(len(adj[z]))
            for z in adj[a] & adj[b]
            if 2 <= len(adj[z]) <= cap
        )
        if s > 0:
            exp[(a, b)] = round(s, 6)

    rows = [{"src_url": a, "dst_url": b} for a, b in edges]
    rows += [{"src_url": b, "dst_url": a} for a, b in list(edges)[:10]]
    got = adamic_adar_pairs(
        rd.from_items(rows), src_col="src_url", dst_col="dst_url",
        out_a="url_a", out_b="url_b", max_center_degree=cap,
    ).to_pandas()
    assert {
        (r.url_a, r.url_b): r.aa_score for r in got.itertuples()
    } == exp

    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = adamic_adar_pairs(
        rd.from_items(rows), src_col="src_url", dst_col="dst_url",
        out_a="url_a", out_b="url_b", max_center_degree=cap,
    ).to_pandas()
    assert {
        (r.url_a, r.url_b): r.aa_score for r in dist.itertuples()
    } == exp


@requires_solo_ray
def test_ppr_distributed_matches_fastpath(ray_session, monkeypatch):
    """Personalized PageRank: the distributed node/edge-join path must
    reproduce the driver fastpath bit-for-bit (integer arithmetic)."""
    import ray.data as rd

    from search_engine_skillbox_ray import config
    from search_engine_skillbox_ray.pipelines.graph import personalized_pagerank

    edges = rd.from_items(
        [
            {"src_url": "a", "dst_url": "b"},
            {"src_url": "b", "dst_url": "c"},
            {"src_url": "c", "dst_url": "a"},
            {"src_url": "a", "dst_url": "c"},
            {"src_url": "d", "dst_url": "a"},
        ]
    )
    fast = (
        personalized_pagerank(edges, ["a"], iterations=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = (
        personalized_pagerank(edges, ["a"], iterations=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert fast.equals(dist)
    # teleport concentrates mass on/near the seed
    r = dict(zip(fast["url"], fast["ppr"]))
    assert r["a"] > r["d"]


def test_ppr_seed_outside_graph_is_empty(ray_session):
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.graph import personalized_pagerank

    edges = rd.from_items([{"src_url": "a", "dst_url": "b"}])
    out = personalized_pagerank(edges, ["zzz"]).to_pandas()
    assert (out["ppr"] == 0).all()


@requires_solo_ray
def test_katz_distributed_matches_fastpath(ray_session, monkeypatch):
    import ray.data as rd

    from search_engine_skillbox_ray import config
    from search_engine_skillbox_ray.pipelines.graph import katz_centrality

    edges = rd.from_items(
        [
            {"src_url": "a", "dst_url": "b"},
            {"src_url": "b", "dst_url": "c"},
            {"src_url": "c", "dst_url": "a"},
            {"src_url": "a", "dst_url": "c"},
            {"src_url": "d", "dst_url": "c"},
        ]
    )
    fast = (
        katz_centrality(edges, iterations=4)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = (
        katz_centrality(edges, iterations=4)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert fast.equals(dist)
    r = dict(zip(fast["url"], fast["katz"]))
    # c has two inbound edges incl. from the well-fed a — highest; d has none
    assert r["c"] > r["b"] and r["d"] == min(r.values())
