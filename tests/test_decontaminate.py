"""Benchmark decontamination (operators/dedup.decontaminate): exact-overlap
semantics and the broadcast-semi-join scale shape."""

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
    decontaminate,
)

W8 = "one two three four five six seven eight"


def _docs(spark):
    rows = [
        (1, f"prefix {W8} suffix words here"),       # shares the 8-gram
        (2, "totally different content with no overlap at all whatsoever"),
        (3, W8),                                     # exact copy of the gram
        (4, "short doc"),                            # < k words: whole text
        (5, "short doc"),                            # dup of a short bench doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_drops_exactly_the_overlapping_docs(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(100, f"intro {W8} outro"), (101, "short doc")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in decontaminate(docs, bench, k=8).collect()}
    # 1 and 3 share the 8-gram; 4 and 5 equal the short benchmark doc's
    # whole-text shingle; only 2 survives
    assert kept == {2}


def test_decontaminate_self_benchmark_drops_the_slice(spark):
    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") == 2)
    kept = {r.doc_id for r in decontaminate(docs, bench, k=8).collect()}
    assert 2 not in kept and {1, 3} <= kept


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs = _docs(spark)
    bench = docs.limit(1)
    plan = (
        decontaminate(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the shingle semi-join must be broadcast (corpus shingles never
    # shuffle); only doc-id joins may exchange
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan.replace(
        "BroadcastNestedLoopJoin", ""
    )
    assert "SortMergeJoin LeftSemi" not in plan
