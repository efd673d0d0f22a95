"""Salted join: result identity with the unsalted join across join types on
skewed data, salt spread of the hot key, and validation."""

import pytest

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 2000 rows on key 1 (the hot key), 10 rows each on keys 2..20
    hot = spark.range(2000).select(F.lit(1).alias("k"), F.col("id").alias("rid"))
    cold = (
        spark.range(190)
        .select((F.col("id") % 19 + 2).cast("int").alias("k"),
                (F.col("id") + 10_000).alias("rid"))
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    # keys 1..15 present; 16..20 unmatched on the big side
    return spark.range(1, 16).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("nm"),
    )


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_equals_plain(spark, skewed, dim, how):
    plain = skewed.join(dim, "k", how)
    salted = salted_join(skewed, dim, on="k", row_key=["rid"], n_salt=8, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_hot_key_spreads_over_salts(spark, skewed):
    from pandora_apache_avro_idl_to_apache_parquet_spark.functions.hashing import (
        spark_md5_long,
    )

    # recompute the operator's salt expression shape directly: 2000 hot rows
    # must occupy every one of the 8 salt lanes with no lane > 2x fair share
    inner = "concat_ws(':', '42', cast(rid as string))"
    salts = skewed.where(F.col("k") == 1).select(
        F.expr(f"cast(({spark_md5_long(inner)}) % 8 as int)").alias("s")
    )
    counts = {r.s: r.c for r in salts.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * (2000 / 8)


def test_salted_join_validation(spark, skewed, dim):
    with pytest.raises(ValueError, match="how"):
        salted_join(skewed, dim, on="k", row_key=["rid"], how="full")
    with pytest.raises(ValueError, match="row_key"):
        salted_join(skewed, dim, on="k", row_key=[])


def test_salted_join_plan_shuffles_on_salt(spark, skewed, dim):
    # with broadcast off, the equi-join must hash-partition on (k, __salt) —
    # the hot key's rows land on n_salt reducers by construction
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(skewed, dim, on="k", row_key=["rid"], n_salt=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "__salt" in plan.split("Scan")[0], plan[:2000]


def test_bloom_probe_plan_no_shuffle_on_probed_side(spark, skewed):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = spark.range(100).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", n_bits=2048)
    probed = bloom_probe(skewed.select(F.col("rid").alias("v")), "v", bloom,
                         n_bits=2048)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the probed side joins the one-row bloom via broadcast; Exchanges are
    # fine inside the bloom BUILD subtree (sketch-sized groupBys) but the
    # probe branch — between the join node and its BroadcastExchange —
    # must be shuffle-free
    lines = plan.splitlines()
    start = next(i for i, ln in enumerate(lines) if "BroadcastNestedLoopJoin" in ln)
    end = next(i for i in range(start, len(lines)) if "BroadcastExchange" in lines[i])
    probe_branch = lines[start + 1:end]
    assert not any("Exchange" in ln for ln in probe_branch), "\n".join(probe_branch)
