"""Executed-plan hygiene for the round-3 search/ranking tier: the properties
PLANS.md claims must hold in the actual physical plan, not just by intent."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.search import (
    bm25_topk,
    grouped_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"spark merge vector w{i % 7} w{i % 11} filler text", f"s{i % 3}", 40 + i % 9)
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_is_topk_not_window(docs):
    import re

    plan = _plan(bm25_topk(docs, ["spark", "vector"], k=10))
    assert "TakeOrderedAndProject" in plan
    # no Window operator node anywhere (ranking is bounded-heap top-k)
    assert not re.search(r"(?m)^[\s:+-]*Window\b", plan)
    # the query-term filter exists as its own operator (it runs in the scan
    # stage below the postings exchange — the map-side pushdown PLANS.md
    # documents; the exchanges above it belong to the aggregate/join stages)
    assert re.search(r"Filter .*term.* IN \(spark,vector\)", plan)


def test_grouped_topk_no_single_partition_exchange(docs):
    import re

    plan = _plan(grouped_topk(docs, "source", "n_chars", 3, "doc_id"))
    assert "Exchange SinglePartition" not in plan
    # exactly two Window operator NODES (phase 1 group+shard, phase 2 group),
    # counted as nodes, not as occurrences of the word in expression text
    nodes = re.findall(r"(?m)^[\s:+-]*Window\b", plan)
    assert len(nodes) == 2, plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed 8-ways on the join key at write time: the
    sort-merge join must read the buckets co-located — NO Exchange anywhere
    below the join (the aggregate above it may still shuffle its 5 groups)."""
    import re

    from pandora_apache_avro_idl_to_apache_parquet_spark.queries import (
        _bucketed_tables,
    )

    o_name, c_name = _bucketed_tables(spark, "/root/testdata/sf0.001")
    o, c = spark.table(o_name), spark.table(c_name)
    j = o.hint("merge").join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    n = j.count()
    assert n == spark.table(o_name).count()  # every order has a customer

def test_quota_sample_plan_is_two_phase_sharded(docs):
    """quota_sample routes through the grouped_topk discipline: a hot stratum
    must spread over shards — two Window nodes, each partitioned by more than
    just the stratum in phase 1, and no single-partition exchange."""
    import re

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        quota_sample,
    )

    out = quota_sample(docs.withColumn("doc_id", F.col("doc_id").cast("string")),
                       "source", "doc_id", 3)
    plan = _plan(out)
    assert "Exchange SinglePartition" not in plan
    nodes = re.findall(r"(?m)^[\s:+-]*Window\b", plan)
    assert len(nodes) == 2, plan
    # phase 1 partitions by (source, __gtk_shard): the shard column appears
    # in a Window partition spec
    assert "__gtk_shard" in plan

def test_interleave_mix_rank_is_bucketed(docs):
    """interleave_mix's per-stratum rank is two-phase: the Window partitions
    by (stratum, bucket) — 256-way parallel even for one dominant stratum —
    and no single-partition exchange exists."""
    import re

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        interleave_mix,
    )

    out = interleave_mix(
        docs.withColumn("doc_id", F.col("doc_id").cast("string")),
        "source", "doc_id", weights={"s0": 3, "s1": 1, "s2": 2},
    )
    plan = _plan(out)
    assert "Exchange SinglePartition" not in plan
    nodes = re.findall(r"(?m)^[\s:+-]*Window\b", plan)
    assert len(nodes) == 1, plan
    assert "__b" in plan  # bucket column in the window partition spec
