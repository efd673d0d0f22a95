"""Deterministic Lloyd's k-means (operators/similarity.kmeans_train):
partition invariance, the Lloyd monotonicity property (mean total distance
never increases with more iterations), and sane cluster shapes."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.similarity import (
    kmeans_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    # four well-separated blobs on axes of a 8-dim space, 50 points each
    rows = []
    for i in range(200):
        blob = i % 4
        base = [0.0] * 8
        base[blob * 2] = 10.0
        jitter = ((i * 2654435761) % 1000) / 5000.0  # deterministic, small
        base[blob * 2 + 1] = jitter
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_separated_blobs_recovered(emb):
    out = kmeans_train(emb, k=4, n_iter=3)
    # points of one blob land in one cluster: 4 clusters x 50 members
    sizes = sorted(
        r["count"] for r in out.groupBy("cid").count().collect()
    )
    # init picks vec_id 0..3 = one seed per blob, so recovery is exact
    assert sizes == [50, 50, 50, 50]
    purity = (
        out.withColumn("blob", (F.col("vec_id") % 4).cast("int"))
        .groupBy("cid").agg(F.countDistinct("blob").alias("b")).collect()
    )
    assert all(r.b == 1 for r in purity)


def test_partition_invariant(emb):
    a = sorted(map(tuple, kmeans_train(emb, k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_train(emb.repartition(13), k=4, n_iter=2).collect()))
    assert a == b


def test_lloyd_monotone_total_distance(emb):
    prev = None
    for it in (1, 2, 3):
        tot = (
            kmeans_train(emb, k=4, n_iter=it)
            .agg(F.sum("dist").alias("t")).collect()[0].t
        )
        if prev is not None:
            assert tot <= prev + 1e-6
        prev = tot
