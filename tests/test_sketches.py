"""Sketch operators: accuracy bounds, partition-order independence, and the
structural guarantees (CMS never underestimates, quantile error ≤ bin width)."""

import pytest

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
    cms_frequency,
    histogram_quantile,
    hll_distinct,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 5000 rows, 1000 distinct keys, two groups
    return spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def test_hll_within_expected_error(spark, keyed):
    # m=256 -> relative standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma
    out = {r.g: r.est_distinct for r in
           hll_distinct(keyed, ["g"], "k", p=8).collect()}
    for g in ("0", "1"):
        assert abs(out[g] - 500) / 500 < 0.26, out


def test_hll_partition_order_independent(spark, keyed):
    a = hll_distinct(keyed.repartition(1), ["g"], "k", p=8).collect()
    b = hll_distinct(keyed.repartition(16, "v"), ["g"], "k", p=8).collect()
    assert sorted((r.g, r.est_distinct) for r in a) == sorted(
        (r.g, r.est_distinct) for r in b
    )


def test_hll_linear_counting_small_range(spark):
    # 30 distinct << 2.5*m: the linear-counting branch must engage and be
    # near-exact (m * ln(m / V) with V large)
    df = spark.range(30).select(F.lit("x").alias("g"), F.col("id").alias("k"))
    [row] = hll_distinct(df, ["g"], "k", p=8).collect()
    assert abs(row.est_distinct - 30) < 3


def test_quantile_error_bounded_by_bin(spark, keyed):
    # v is uniform over 0..96; with 97+ bins each quantile is exact to one bin
    got = {r.quantile: r.approx_value for r in
           histogram_quantile(keyed, "v", [0.25, 0.5, 0.75], n_bins=97).collect()}
    exact = {0.25: 24, 0.5: 48, 0.75: 72}
    width = 96 / 97
    for q, e in exact.items():
        assert abs(got[q] - e) <= width + 1e-9, (q, got[q], e)


def test_quantile_constant_column(spark):
    df = spark.range(10).select(F.lit(7.0).alias("x"))
    [row] = histogram_quantile(df, "x", [0.5], n_bins=8).collect()
    assert row.bin == 0 and row.approx_value == 8.0  # lo + 1*width, width=1 guard


def test_cms_never_underestimates_and_is_tight_when_sparse(spark, keyed):
    out = cms_frequency(keyed, "k", width=4096, depth=4).collect()
    assert len(out) == 1000
    assert all(r.cms_est >= r.exact_cnt for r in out)
    # 1000 keys in 4x4096 cells: collisions essentially vanish under min()
    assert sum(r.cms_est == r.exact_cnt for r in out) >= 990


def test_cms_partition_order_independent(spark, keyed):
    a = cms_frequency(keyed.repartition(1), "k", width=64, depth=2).collect()
    b = cms_frequency(keyed.repartition(16, "v"), "k", width=64, depth=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bloom_no_false_negatives_and_some_fps(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = spark.range(500).select((F.col("id") * 2).alias("v"))  # evens < 1000
    bloom = bloom_build(members, "v", n_bits=1024, n_hashes=3)
    probe = spark.range(1000).select(F.col("id").alias("v"))
    got = {r.v: r.maybe_member for r in
           bloom_probe(probe, "v", bloom, n_bits=1024, n_hashes=3).collect()}
    # every member answers yes
    assert all(got[v] for v in range(0, 1000, 2))
    # 500*3 hashes in 1024 bits -> load ~1.5, FP ~40%: some odd values hit,
    # but far from all (the filter is informative)
    fps = sum(got[v] for v in range(1, 1000, 2))
    assert 0 < fps < 450, fps


def test_bloom_partition_order_independent(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
        bloom_build,
    )

    members = spark.range(300).select(F.col("id").alias("v"))
    a = bloom_build(members.repartition(1), "v", n_bits=2048).first()[0]
    b = bloom_build(members.repartition(16), "v", n_bits=2048).first()[0]
    assert a == b


def test_bloom_empty_build_rejects_everything(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    empty = spark.range(0).select(F.col("id").alias("v"))
    bloom = bloom_build(empty, "v", n_bits=1024)
    probe = spark.range(10).select(F.col("id").alias("v"))
    out = bloom_probe(probe, "v", bloom, n_bits=1024).collect()
    assert len(out) == 10 and not any(r.maybe_member for r in out)


def test_decontaminate_bloom_matches_exact(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    benchmark = docs.where(F.col("doc_id") % 7 == 0)
    exact = {r.doc_id for r in decontaminate(docs, benchmark, k=8).collect()}
    # deliberately tiny filter (512 bits) so false positives are plentiful:
    # the exact verify must erase them all
    bloomed = {r.doc_id for r in
               decontaminate_bloom(docs, benchmark, k=8, n_bits=512,
                                   n_hashes=2).collect()}
    assert bloomed == exact


def test_grouped_quantile_matches_per_group_exact(spark, keyed):
    # within each g, v is uniform 0..96 -> per-group medians align to ~48
    out = histogram_quantile(keyed, "v", [0.5], n_bins=97, group_cols=["g"])
    got = {(r.g, r.quantile): r.approx_value for r in out.collect()}
    assert set(k[0] for k in got) == {"0", "1"}
    for (g, _), v in got.items():
        assert abs(v - 48) <= 2, (g, v)


def test_hll_merge_equals_direct_even_with_overlap(spark, keyed):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sketches import (
        hll_merge,
        hll_partial,
    )

    direct = {(r.g, r.est_distinct) for r in
              hll_distinct(keyed, ["g"], "k", p=8).collect()}
    # disjoint slices by v-range
    sliced = keyed.withColumn("slc", (F.col("v") < 50).cast("int"))
    merged = {(r.g, r.est_distinct) for r in
              hll_merge(hll_partial(sliced, ["g", "slc"], "k", p=8),
                        ["g"], p=8).collect()}
    assert merged == direct
    # overlapping partials (full table twice) — register max is idempotent
    p1 = hll_partial(keyed, ["g"], "k", p=8)
    twice = {(r.g, r.est_distinct) for r in
             hll_merge(p1.unionByName(p1), ["g"], p=8).collect()}
    assert twice == direct
