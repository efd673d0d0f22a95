"""Row-level lifecycle of the generic table store: metadata-only stats
(`table_stats`), copy-on-write DELETE (`delete_where`) and MERGE upsert
(`merge_table`) — the Delta row-level contract (DELETE FROM / MERGE INTO)
over the reference's commit-log protocol (DeltaLake.fs:176-444), plus the
row-provenance decode (`meta_cols`) they build on."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    committed_files,
    log_versions,
    vacuum,
    write_commit_log,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    decode_table,
    delete_where,
    encode_table,
    merge_table,
    table_stats,
)


def _mk(spark, out, n=5000, parts=4):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("grp"),
        (F.col("id") * 1.5).alias("amt"),
        F.concat(F.lit("s"), (F.col("id") % 11).cast("string")).alias("tag"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("maybe"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=parts, chunk_rows=512)
    return df


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------------------------------- provenance


def test_meta_cols_row_provenance(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    dec = decode_table(spark, out, columns=["k"],
                       meta_cols=["run", "part_id", "__src_file"])
    assert dec.columns == ["k", "run", "part_id", "__src_file"]
    assert dec.count() == df.count()
    files = {r["__src_file"] for r in dec.select("__src_file").distinct().collect()}
    assert files == set(committed_files(out))
    assert {r["run"] for r in dec.select("run").distinct().collect()} == {"r0"}
    with pytest.raises(ValueError, match="collides"):
        decode_table(spark, out, meta_cols=["k"])
    with pytest.raises(ValueError, match="unknown meta column"):
        decode_table(spark, out, meta_cols=["k__payload"])


# ------------------------------------------------------------ table_stats


def test_table_stats_matches_decoded_aggregates(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    got = {r["column"]: r for r in table_stats(spark, out).collect()}
    exp = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k"), F.max("k"), F.min("amt"), F.max("amt"),
        F.min("tag"), F.max("tag"),
        F.sum(F.when(F.col("maybe").isNull(), 1).otherwise(0)).alias("mn"),
        F.min("maybe"), F.max("maybe"),
    ).collect()[0]
    assert set(got) == {"k", "grp", "amt", "tag", "maybe"}
    for c in got.values():
        assert c["n_rows"] == exp["n"]
    assert got["k"]["n_nulls"] == 0
    assert got["maybe"]["n_nulls"] == exp["mn"]
    assert got["k"]["min_value"] == str(exp["min(k)"])
    assert got["k"]["max_value"] == str(exp["max(k)"])
    assert got["tag"]["min_value"] == exp["min(tag)"]
    assert got["tag"]["max_value"] == exp["max(tag)"]
    assert got["maybe"]["min_value"] == str(exp["min(maybe)"])
    assert float(got["amt"]["max_value"]) == exp["max(amt)"]


def test_table_stats_plan_reads_no_payload(spark, tmp_path):
    out = str(tmp_path / "t")
    _mk(spark, out)
    plan = table_stats(spark, out, columns=["k", "amt"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "__payload" not in plan and "__valid" not in plan
    assert "MapInArrow" not in plan  # pure scan+agg, no decode kernel


def test_table_stats_counts_evolved_column_as_all_null(spark, tmp_path):
    out = str(tmp_path / "t")
    df = spark.range(100).select(F.col("id").alias("k"))
    encode_table(df, out, key_cols=["k"], n_parts=2)
    df2 = spark.range(100, 150).select(
        F.col("id").alias("k"),
        F.when(F.col("id") >= 0, F.col("id").cast("double")).alias("extra"),
    )
    encode_table(df2, out, key_cols=["k"], n_parts=2, run="r1")
    got = {r["column"]: r for r in table_stats(spark, out).collect()}
    assert got["extra"]["n_rows"] == 150
    assert got["extra"]["n_nulls"] == 100  # pre-evolution chunks
    assert float(got["extra"]["min_value"]) == 100.0


# ------------------------------------------------------------ delete_where


def test_delete_where_exact_and_atomic(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    before_files = set(committed_files(out))
    v_before = max(log_versions(out))

    res = delete_where(spark, out, F.col("grp") >= 90)
    want = df.filter(~(F.col("grp") >= 90))
    assert res["rows_deleted"] == df.filter(F.col("grp") >= 90).count() > 0
    assert _rows(decode_table(spark, out)) == _rows(want)

    # exactly ONE new log entry; as_of the old version still sees all rows
    assert max(log_versions(out)) == v_before + 1
    assert _rows(decode_table(spark, out, as_of=v_before)) == _rows(df)

    # grp is spread across every chunk -> every file matched and was rewritten
    after_files = set(committed_files(out))
    assert res["files_removed"] == len(before_files)
    assert after_files.isdisjoint(before_files)

    # write_commit_log must NOT resurrect removed or rewrite files
    assert write_commit_log(out, pds=date(2026, 1, 1)) is None
    # removed files reclaimable
    assert set(vacuum(out, min_age_sec=0)) == before_files


def test_delete_where_null_condition_rows_survive(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    # maybe is null for ~6/7 of rows: condition NULL -> row survives
    res = delete_where(spark, out, F.col("maybe") % 2 == 0)
    want = df.filter(~F.coalesce(F.col("maybe") % 2 == 0, F.lit(False)))
    assert res["rows_deleted"] == df.count() - want.count() > 0
    assert _rows(decode_table(spark, out)) == _rows(want)


def test_delete_where_untouched_files_not_rewritten(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    before = set(committed_files(out))
    # key-targeted delete: zone maps put k==3 in one file's chunks only
    res = delete_where(spark, out, F.col("k") == 3,
                       condition_cols=["k"])
    assert res["rows_deleted"] == 1
    assert res["files_removed"] == 1 and res["files_rewritten"] == 1
    after = set(committed_files(out))
    assert len(before & after) == len(before) - 1  # others untouched
    assert _rows(decode_table(spark, out)) == _rows(df.filter(F.col("k") != 3))


def test_delete_where_noop_and_uncommitted(spark, tmp_path):
    out = str(tmp_path / "t")
    _mk(spark, out)
    v = max(log_versions(out))
    res = delete_where(spark, out, F.col("grp") > 10**9)
    assert res == {"rows_deleted": 0, "files_rewritten": 0,
                   "files_removed": 0, "log": None}
    assert max(log_versions(out)) == v  # no entry appended
    with pytest.raises(ValueError, match="committed table"):
        delete_where(spark, str(tmp_path / "nope"), F.lit(True))


def test_dml_matched_file_cap_fails_fast(spark, tmp_path, monkeypatch):
    """A broad predicate matching more files than DML_MAX_MATCHED_FILES must
    fail BEFORE any rewrite/commit — the detect-phase collect is the
    driver-OOM hazard being guarded (VERDICT r04 item 3)."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators import (
        table as tbl,
    )

    out = str(tmp_path / "t")
    df = _mk(spark, out, n=2000, parts=4)
    v = max(log_versions(out))
    monkeypatch.setattr(tbl, "DML_MAX_MATCHED_FILES", 2)
    with pytest.raises(ValueError, match="DML_MAX_MATCHED_FILES"):
        delete_where(spark, out, F.col("grp") >= 0)  # matches all 4 files
    assert max(log_versions(out)) == v  # nothing committed
    assert _rows(decode_table(spark, out)) == _rows(df)
    # a targeted statement under the cap still goes through
    res = delete_where(spark, out, F.col("k") == 3, condition_cols=["k"])
    assert res["rows_deleted"] == 1
    assert _rows(decode_table(spark, out)) == _rows(df.filter(F.col("k") != 3))


def test_delete_all_rows_leaves_valid_empty_table(spark, tmp_path):
    out = str(tmp_path / "t")
    _mk(spark, out, n=400, parts=2)
    # deleting every row removes both files with no replacement adds
    res = delete_where(spark, out, F.lit(True))
    assert res["files_rewritten"] == 0 and res["files_removed"] == 2
    assert decode_table(spark, out).count() == 0
    assert committed_files(out) == []


# ------------------------------------------------------------- merge_table


def test_merge_updates_and_inserts(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    updates = df.filter(F.col("k") % 500 == 0).withColumn(
        "amt", F.col("amt") * 10)
    inserts = df.filter(F.col("k") < 5).withColumn(
        "k", F.col("k") + 1_000_000)
    source = updates.unionByName(inserts)

    res = merge_table(spark, out, source)
    assert res["rows_replaced"] == updates.count() > 0
    want = df.join(source.select("k"), "k", "left_anti").unionByName(source)
    assert _rows(decode_table(spark, out)) == _rows(want)

    # re-merging the same source is a semantic no-op on content
    merge_table(spark, out, source)
    assert _rows(decode_table(spark, out)) == _rows(want)


def test_merge_insert_only_and_schema_mismatch(spark, tmp_path):
    out = str(tmp_path / "t")
    df = _mk(spark, out)
    fresh = df.limit(3).withColumn("k", F.col("k") + 777_000)
    res = merge_table(spark, out, fresh)
    assert res["rows_replaced"] == 0 and res["files_removed"] == 0
    assert decode_table(spark, out).count() == df.count() + 3
    with pytest.raises(ValueError, match="schema must match"):
        merge_table(spark, out, df.drop("tag"))
    with pytest.raises(ValueError, match="schema must match"):
        merge_table(spark, out, df.withColumn("amt", F.col("amt").cast("float")))


# ------------------------------------------------------------ update_where


def test_update_where_applies_assignments_pre_image(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        update_where,
    )

    out = str(tmp_path / "t")
    df = _mk(spark, out)
    res = update_where(
        spark, out, F.col("grp") < 10,
        {"amt": F.col("amt") * 2 + F.col("grp"), "tag": F.lit("hit")},
        condition_cols=["grp"],
    )
    hit = F.col("grp") < 10
    want = df.select(
        "k", "grp",
        F.when(hit, F.col("amt") * 2 + F.col("grp")).otherwise(F.col("amt"))
        .cast("double").alias("amt"),
        F.when(hit, F.lit("hit")).otherwise(F.col("tag")).alias("tag"),
        "maybe",
    )
    assert res["rows_updated"] == df.filter(hit).count() > 0
    assert _rows(decode_table(spark, out)) == _rows(want)


def test_update_where_rejects_key_and_unknown_columns(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        update_where,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=200, parts=1)
    with pytest.raises(ValueError, match="key columns cannot be assigned"):
        update_where(spark, out, F.lit(True), {"k": F.lit(0)})
    with pytest.raises(ValueError, match="not in table"):
        update_where(spark, out, F.lit(True), {"nope": F.lit(0)})
    res = update_where(spark, out, F.col("grp") > 10**9, {"amt": F.lit(0.0)})
    assert res["rows_updated"] == 0 and res["log"] is None


# -------------------------------------------------------------- table_diff


def test_table_diff_append_only_fast_path(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        table_diff,
    )

    out = str(tmp_path / "t")
    df = spark.range(300).select(F.col("id").alias("k"),
                                 (F.col("id") % 3).cast("int").alias("g"))
    encode_table(df, out, key_cols=["k"], n_parts=2)
    v0 = max(log_versions(out))
    df2 = spark.range(300, 450).select(F.col("id").alias("k"),
                                       (F.col("id") % 3).cast("int").alias("g"))
    encode_table(df2, out, key_cols=["k"], n_parts=2, run="r1")
    v1 = max(log_versions(out))
    d = table_diff(spark, out, v0, v1)
    assert {r["_change_type"] for r in d.select("_change_type").distinct().collect()} == {"insert"}
    assert _rows(d.drop("_change_type")) == _rows(df2)
    # fast path: append-only diff must not run a comparison pass
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "ExceptAll" not in plan and "exceptall" not in plan.lower()
    # empty range
    assert table_diff(spark, out, v1, v1).count() == 0


def test_table_diff_delete_and_update_images(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        table_diff,
        update_where,
    )

    out = str(tmp_path / "t")
    df = _mk(spark, out, n=1000, parts=2)
    v0 = max(log_versions(out))
    delete_where(spark, out, F.col("k") < 10, condition_cols=["k"])
    update_where(spark, out, F.col("k") == 500, {"tag": F.lit("changed")},
                 condition_cols=["k"])
    v2 = max(log_versions(out))
    d = table_diff(spark, out, v0, v2)
    by_type = {
        r["_change_type"]: r["count"]
        for r in d.groupBy("_change_type").count().collect()
    }
    # 10 deleted rows + old image of the updated row; new image inserted
    assert by_type == {"delete": 11, "insert": 1}
    ins = d.filter(F.col("_change_type") == "insert").collect()[0]
    assert ins["k"] == 500 and ins["tag"] == "changed"


def test_table_diff_compaction_is_content_neutral(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        compact_table,
        table_diff,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=500, parts=2)
    v0 = max(log_versions(out))
    for r in ("a", "b", "c"):
        encode_table(
            spark.range(3).select((F.col("id") + 10_000).alias("k"),
                                  F.lit(1).cast("int").alias("grp"),
                                  F.lit(0.0).alias("amt"),
                                  F.lit("x").alias("tag"),
                                  F.lit(None).cast("long").alias("maybe")),
            out, key_cols=["k"], n_parts=1, run=r,
        )
    compact_table(out, max_group_bytes=1 << 30)
    v1 = max(log_versions(out))
    d = table_diff(spark, out, v0, v1)
    # the three tiny appends show as inserts; the compaction rewrite does not
    assert d.filter(F.col("_change_type") == "delete").count() == 0
    assert d.filter(F.col("_change_type") == "insert").count() == 9
    with pytest.raises(ValueError, match="versions must be"):
        table_diff(spark, out, 999, None)
