"""Clause-mode MERGE (round 5): the full Delta MERGE surface on the encoded
store — conditional in-place matched UPDATE, matched DELETE, gated inserts,
ambiguity rejection — all the same copy-on-write + one-atomic-entry protocol
as the upsert default (which must stay bit-for-bit unchanged)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    decode_table,
    encode_table,
    merge_table,
)


@pytest.fixture()
def out_dir():
    out = tempfile.mkdtemp(prefix="merge_clause_")
    shutil.rmtree(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _base(spark, out_dir, n=300):
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )
    encode_table(df, out_dir, key_cols=["id"], n_parts=3)
    return df


def test_matched_update_in_place(spark, out_dir):
    _base(spark, out_dir)
    src = spark.range(50, 120).select(
        F.col("id"), (F.col("id") * 100.0).alias("bonus"))
    res = merge_table(
        spark, out_dir, src,
        when_matched_update={"val": F.col("t.val") + F.col("s.bonus")},
        when_not_matched_condition=F.lit(False),
    )
    assert res["rows_updated"] == 70 and res["rows_deleted"] == 0
    got = {r.id: r.val for r in decode_table(spark, out_dir).collect()}
    assert len(got) == 300  # nothing inserted or deleted
    assert got[60] == 60 * 1.5 + 6000.0
    assert got[10] == 15.0  # untouched
    # grp column untouched on updated rows
    grps = {r.id: r.grp for r in decode_table(spark, out_dir).collect()}
    assert grps[60] == 60 % 7


def test_matched_update_with_condition(spark, out_dir):
    _base(spark, out_dir)
    src = spark.range(0, 300).select(F.col("id"), F.lit(1.0).alias("delta"))
    res = merge_table(
        spark, out_dir, src,
        when_matched_update={"val": F.col("t.val") + F.col("s.delta")},
        when_matched_condition=F.col("t.grp") == 3,
        when_not_matched_condition=F.lit(False),
    )
    want_updated = len([i for i in range(300) if i % 7 == 3])
    assert res["rows_updated"] == want_updated
    got = {r.id: r.val for r in decode_table(spark, out_dir).collect()}
    assert got[3] == 3 * 1.5 + 1.0
    assert got[4] == 4 * 1.5  # condition failed → unchanged


def test_matched_delete_and_gated_insert(spark, out_dir):
    _base(spark, out_dir)
    src = spark.range(250, 360).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2.0).alias("val"))
    res = merge_table(
        spark, out_dir, src,
        when_matched_delete=True,
        when_matched_condition=F.col("s.val") > 560.0,  # ids > 280
        when_not_matched_condition=F.col("s.id") < 320,  # inserts 300..319
    )
    assert res["rows_deleted"] == len([i for i in range(281, 300)])
    got = {r.id for r in decode_table(spark, out_dir).collect()}
    assert 290 not in got and 281 not in got  # deleted
    assert 280 in got and 260 in got          # matched, condition failed
    assert 310 in got and 319 in got          # gated inserts landed
    assert 320 not in got and 350 not in got  # insert condition pruned
    v = {r.id: r.val for r in decode_table(spark, out_dir).collect()}
    assert v[310] == 620.0 and v[260] == 260 * 1.5


def test_duplicate_source_keys_reject_for_matched_action(spark, out_dir):
    _base(spark, out_dir)
    dup = spark.createDataFrame(
        [(10, 1.0), (10, 2.0)], "id long, delta double")
    with pytest.raises(ValueError, match="duplicate key tuples"):
        merge_table(spark, out_dir, dup,
                    when_matched_update={"val": F.col("s.delta")})


def test_insert_missing_columns_reject_unless_gated_off(spark, out_dir):
    _base(spark, out_dir)
    src = spark.range(250, 320).select(
        F.col("id"), F.lit(5.0).alias("delta"))  # lacks grp/val
    with pytest.raises(ValueError, match="needed for inserts"):
        merge_table(spark, out_dir, src,
                    when_matched_update={"val": F.col("s.delta")})
    # same source is fine when inserts are gated off
    res = merge_table(spark, out_dir, src,
                      when_matched_update={"val": F.col("s.delta")},
                      when_not_matched_condition=F.lit(False))
    assert res["rows_updated"] == 50
    assert decode_table(spark, out_dir).count() == 300


def test_default_upsert_unchanged(spark, out_dir):
    df = _base(spark, out_dir)
    src = spark.range(290, 310).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        F.lit(-1.0).alias("val"))
    res = merge_table(spark, out_dir, src)
    assert res["rows_replaced"] == 10
    got = {r.id: r.val for r in decode_table(spark, out_dir).collect()}
    assert len(got) == 310
    assert got[295] == -1.0 and got[305] == -1.0
    assert got[100] == 150.0


def test_clause_merge_on_struct_table(spark, out_dir):
    """Clause conditions and assignments address the ORIGINAL struct shape."""
    df = spark.range(0, 100).select(
        F.col("id"),
        F.struct((F.col("id") % 5).cast("int").alias("a"),
                 F.concat(F.lit("v"), F.col("id")).alias("b")).alias("meta"),
    )
    encode_table(df, out_dir, key_cols=["id"], n_parts=2)
    src = spark.range(40, 60).select(F.col("id"))
    res = merge_table(
        spark, out_dir, src,
        when_matched_update={"meta": F.struct(
            (F.col("t.meta.a") + 100).cast("int").alias("a"),
            F.concat(F.col("t.meta.b"), F.lit("!")).alias("b"),
        )},
        when_matched_condition=F.col("t.meta.a") == 2,
        when_not_matched_condition=F.lit(False),
    )
    assert res["rows_updated"] == len([i for i in range(40, 60) if i % 5 == 2])
    got = {r.id: r.meta for r in decode_table(spark, out_dir).collect()}
    assert got[42].a == 102 and got[42].b == "v42!"
    assert got[43].a == 3 and got[43].b == "v43"
    assert got[7].a == 2  # outside source → untouched
