"""Connected-components cluster assignment (plans.dedup.near_dup_clusters)."""

from __future__ import annotations

import couchwarehouse_spark.plans.all  # noqa: F401  (populate registry)
from couchwarehouse_spark.plans.registry import QUERIES

from .conftest import SF_SMOKE


def _union_find_components(edges):
    """Independent in-test oracle: exact components via union-find."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for v in list(parent):
        comps.setdefault(find(v), set()).add(v)
    return comps


def test_clusters_partition_pair_graph_vertices(spark):
    pairs = QUERIES["ngram_jaccard_pairs"](spark, SF_SMOKE).toPandas()
    clusters = QUERIES["near_dup_clusters"](spark, SF_SMOKE).toPandas()
    vertices = set(pairs["doc_a"]) | set(pairs["doc_b"])
    # every vertex lands in exactly one cluster
    assert clusters["cluster_size"].sum() == len(vertices)
    # every cluster has >= 2 members (it exists because of >= 1 edge)
    assert (clusters["cluster_size"] >= 2).all()
    # canonical ids are themselves vertices
    assert set(clusters["cluster_id"]) <= vertices
    # Exact-component check against an independent union-find on the
    # same edges: identical (canonical_id -> size) mapping. Catches
    # label-propagation truncation (a split component) that the
    # size-only assertions above would miss.
    comps = _union_find_components(
        zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist())
    )
    expected = {min(members): len(members) for members in comps.values()}
    got = dict(zip(clusters["cluster_id"].tolist(), clusters["cluster_size"].tolist()))
    assert got == expected


def test_distributed_lane_matches_driver_lane(spark, monkeypatch):
    """Force the label-propagation loop (bound = 0 ⇒ no driver
    fast-path) and require the identical cluster map — the distributed
    lane is the 100 TB path and must never drift from union-find."""
    import couchwarehouse_spark.plans.dedup as dedup

    fast = QUERIES["near_dup_clusters"](spark, SF_SMOKE).toPandas()
    monkeypatch.setattr(dedup, "CC_DRIVER_EDGE_BOUND", -1)
    dist = QUERIES["near_dup_clusters"](spark, SF_SMOKE).toPandas()
    to_map = lambda df: dict(  # noqa: E731
        zip(df["cluster_id"].tolist(), df["cluster_size"].tolist())
    )
    assert to_map(dist) == to_map(fast)
