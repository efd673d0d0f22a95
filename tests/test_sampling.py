"""Sampling / data-mix operators (operators/sampling.py).

These are the reproducibility-critical pieces of a training-data pipeline:
every property below is one a 100-TB run depends on — determinism across
partitionings, exact permutation semantics, and the runaway-weight guard.
"""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
    hash_fraction,
    hash_sample,
    shuffle_rank,
    stratified_sample,
    upsample_by_weight,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"doc{i:04d}", ["a", "b", "c", "d"][i % 4], i) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id string, source string, n int")


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, seed=5).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), "doc_id", 0.3, seed=5).collect()
    }
    assert a == b and 0 < len(a) < 400


def test_hash_sample_rate_roughly_honored(docs):
    n = hash_sample(docs, "doc_id", 0.5, seed=1).count()
    assert 140 <= n <= 260  # 400 draws, p=.5: well within 6 sigma


def test_hash_sample_seeds_decorrelated(docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, seed=1).collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, seed=2).collect()}
    assert a != b


def test_hash_sample_rate_bounds(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 400


def test_stratified_rates_per_stratum(docs):
    out = stratified_sample(
        docs, "source", "doc_id", rates={"a": 1.0, "b": 0.0}, default_rate=0.5
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("a") == 100  # rate 1.0 keeps every row
    assert "b" not in by_src  # rate 0.0 drops the stratum
    for s in ("c", "d"):  # default rate applies to unnamed strata
        assert 20 <= by_src.get(s, 0) <= 80


def test_stratified_bad_rate(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, "source", "doc_id", rates={"a": -0.1})


def test_shuffle_rank_is_exact_md5_permutation(spark, docs):
    out = shuffle_rank(docs.select("doc_id"), "doc_id", seed=3).collect()
    import hashlib

    expect = sorted(
        (hashlib.md5(f"3:{r.doc_id}".encode()).hexdigest(), r.doc_id)
        for r in docs.select("doc_id").collect()
    )
    want = {d: i for i, (_, d) in enumerate(expect)}
    assert {r.doc_id: r.pos for r in out} == want


def test_shuffle_rank_dense_and_partition_invariant(docs):
    base = docs.select("doc_id")
    a = {r.doc_id: r.pos for r in shuffle_rank(base, "doc_id", seed=9).collect()}
    b = {
        r.doc_id: r.pos
        for r in shuffle_rank(base.repartition(13), "doc_id", seed=9).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(400))  # dense 0..n-1, no gaps


def test_shuffle_rank_no_single_partition_window(docs):
    plan = shuffle_rank(docs.select("doc_id"), "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_shuffle_rank_bucket_validation(docs):
    with pytest.raises(ValueError):
        shuffle_rank(docs, "doc_id", n_buckets=100)


def test_upsample_multiplicity_and_copy_idx(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 3)], "k string, w int"
    )
    rows = upsample_by_weight(df, "w").select("k", "copy_idx").collect()
    got = sorted((r.k, r.copy_idx) for r in rows)
    assert got == [("b", 1), ("c", 1), ("c", 2), ("c", 3)]


def test_upsample_guard_raises_on_runaway_weight(spark):
    df = spark.createDataFrame([("a", 10_000)], "k string, w int")
    with pytest.raises(Exception, match="max_weight"):
        upsample_by_weight(df, "w", max_weight=1000).count()


def test_interleave_mix_exact_stride_keys(spark, docs):
    import hashlib

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        interleave_mix,
    )

    out = interleave_mix(docs, "source", "doc_id",
                         weights={"a": 1, "b": 2, "c": 4}, seed=9)
    got = {(r.doc_id): r.mix_key for r in out.collect()}
    # recompute expected keys: per-source md5 order, (2i-1)*lcm/w
    rows = [(r.doc_id, r.source) for r in docs.collect() if r.source in "abc"]
    expect = {}
    for s, w in (("a", 1), ("b", 2), ("c", 4)):
        members = sorted(
            (int(hashlib.md5(f"9:{d}".encode()).hexdigest()[:8], 16), d)
            for d, src in rows if src == s
        )
        for i, (_, d) in enumerate(members, start=1):
            expect[d] = (2 * i - 1) * (4 // w)
    assert got == expect
    # stratum d has no weight: dropped entirely
    assert all(src != "d" for src in
               {r.source for r in out.select("source").distinct().collect()})


def test_interleave_mix_validation(spark, docs):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        interleave_mix,
    )

    with pytest.raises(ValueError):
        interleave_mix(docs, "source", "doc_id", weights={"a": -1})
    with pytest.raises(ValueError):
        interleave_mix(docs, "source", "doc_id", weights={"a": 0})


def test_weighted_sample_topk_bias_and_determinism(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 1000.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample_topk(df, "w", "doc_id", k=50, seed=3)
    picked = [r.doc_id for r in out.collect()]
    assert len(picked) == len(set(picked)) == 50  # exact size, no replacement
    # 100 heavy rows (1000x weight) should dominate the sample
    assert sum(1 for d in picked if d < 100) >= 40
    again = [
        r.doc_id
        for r in weighted_sample_topk(df.repartition(9), "w", "doc_id",
                                      k=50, seed=3).collect()
    ]
    assert picked == again  # partition-invariant, deterministic
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Window" not in plan


def test_interleave_mix_non_string_strata(spark):
    """The driver base-offsets frame keeps the strata column's own dtype —
    int strata crashed the round-4 two-phase rewrite before the fix."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        interleave_mix,
    )

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "doc_id long, src int"
    )
    out = interleave_mix(df, "src", "doc_id", {0: 2, 1: 1})
    got = out.collect()
    assert len(got) == 200  # stratum 2 dropped (weight absent)
    keys = [r.mix_key for r in got]
    assert len(set(keys)) == len(keys)


def test_quota_sample_preserves_user_columns(spark):
    """quota_sample must not clobber caller columns that collide with its
    internal helper names (rnk / __h were eaten before the fix)."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
        quota_sample,
    )

    df = spark.createDataFrame(
        [(f"d{i}", "s", i, 0.5) for i in range(50)],
        "doc_id string, source string, rnk long, __h double",
    )
    out = quota_sample(df, "source", "doc_id", 10)
    assert out.columns == ["doc_id", "source", "rnk", "__h"]
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["__h"] == 0.5 for r in rows)
    assert {r.rnk for r in rows} <= set(range(50))  # original values intact
