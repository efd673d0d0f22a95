"""PageRank (operators/graph.py): hand-checkable ranks on a tiny graph,
partition invariance, dangling-node handling."""

import pytest

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.graph import pagerank


@pytest.fixture(scope="module")
def edges(spark):
    # 1 and 2 both point at 3; 3 points at 1; 4 is dangling (in-degree and
    # out-degree via one edge in, none out)
    rows = [(1, 3), (2, 3), (3, 1), (1, 4)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_hub_ranks_highest_and_base_term_for_no_inlinks(spark, edges):
    pr = {r.node: r.pr for r in pagerank(edges, n_iter=3).collect()}
    assert set(pr) == {1, 2, 3, 4}
    assert pr[3] == max(pr.values())       # the hub
    assert pr[2] == pytest.approx(0.15 / 4)  # no in-links: pure base term
    # rank mass stays bounded: each value in (0, 1)
    assert all(0 < v < 1 for v in pr.values())


def test_partition_invariant_and_duplicate_edges_collapse(spark, edges):
    a = sorted(map(tuple, pagerank(edges, n_iter=2).collect()))
    dup = edges.union(edges).repartition(7)
    b = sorted(map(tuple, pagerank(dup, n_iter=2).collect()))
    assert a == b
