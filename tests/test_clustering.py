"""Z-order clustering keys (operators/clustering.py): Morton interleave
correctness vs a pure-python reference, and the payoff — a 2-D range query
over a z-ordered store prunes chunks on BOTH columns' zone maps where a
single-key sort prunes ~nothing."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.clustering import (
    zorder_bounds,
    zorder_key,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    column_range_filter,
    decode_table,
    encode_table,
    read_table_chunks,
)


def _morton_ref(vals, bits):
    z = 0
    n = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    # bounds (0, 2^bits - 1) make quantization the identity, isolating the
    # bit interleave itself
    bits = 4
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    got = df.select(
        "x", "y", zorder_key({"x": (0, 15), "y": (0, 15)}, bits=bits).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["x"], r["y"]], bits), (r["x"], r["y"])


def test_zorder_key_nulls_and_degenerate_bounds(spark):
    df = spark.createDataFrame([(None, 5), (3, 5), (100, 5)], "x int, y int")
    out = df.select(zorder_key({"x": (0, 10), "y": (5, 5)}, bits=3).alias("z"))
    zs = [r["z"] for r in out.collect()]
    assert zs[0] == 0          # null -> origin
    assert zs[2] == zs[1] or zs[2] == _morton_ref([7, 0], 3)  # clamped to max
    with pytest.raises(ValueError, match="exceeds int64"):
        zorder_key({"a": (0, 1), "b": (0, 1)}, bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key({})


def test_zorder_store_prunes_2d_ranges(spark, tmp_path):
    # 90k rows on a 300x300 grid; both layouts get identical rows
    df = spark.range(90000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 300).cast("int").alias("x"),
        (F.col("id") / 300).cast("int").alias("y"),
    )
    bounds = zorder_bounds(df, ["x", "y"])
    assert bounds == {"x": (0, 299), "y": (0, 299)}

    z_dir, flat_dir = str(tmp_path / "z"), str(tmp_path / "flat")
    encode_table(df.withColumn("zkey", zorder_key(bounds)), z_dir,
                 key_cols=["zkey", "rid"], n_parts=4, chunk_rows=512)
    # baseline: sorted by rid = y-major order; chunks span tiny y ranges
    # but the FULL x range, so x predicates prune nothing
    encode_table(df, flat_dir, key_cols=["rid"], n_parts=4, chunk_rows=512)

    z_chunks = read_table_chunks(spark, z_dir)
    f_chunks = read_table_chunks(spark, flat_dir)
    total_z, total_f = z_chunks.count(), f_chunks.count()

    # the 1-D-hostile query: narrow in x, unconstrained in y. The y-major
    # layout keeps ~every chunk; z-order chunks cover small rectangles so
    # the x zone map alone prunes most of them
    col_pred = column_range_filter("x", 40, 60)
    assert f_chunks.filter(col_pred).count() >= total_f - 2
    surv_z_col = z_chunks.filter(col_pred).count()
    assert surv_z_col <= total_z // 2, (surv_z_col, total_z)

    # 2-D box: both dims prune on the z layout, beating 1-D pruning
    box = column_range_filter("x", 40, 60) & column_range_filter("y", 40, 60)
    surv_z = z_chunks.filter(box).count()
    assert surv_z <= f_chunks.filter(box).count()
    assert surv_z <= total_z // 8, (surv_z, total_z)

    # pruning never changes the answer
    row_filter = F.col("x").between(40, 60) & F.col("y").between(40, 60)
    got = (decode_table(spark, z_dir, columns=["rid", "x", "y"],
                        chunk_filter=box).filter(row_filter))
    want = df.filter(row_filter)
    assert sorted(r["rid"] for r in got.collect()) == \
        sorted(r["rid"] for r in want.collect())
