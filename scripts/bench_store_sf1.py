#!/usr/bin/env python3
"""sf1 bench slice for the store/DataSource tier (VERDICT r04 #9).

Driver timing is all sf0.1, where fixed job overhead dominates and the
pruning tiers (zone maps, partition pruning, blooms, metadata-only stats)
can't show their value. This script stages a deterministic sf1 (10x sf0.1:
key-shifted copies of lineitem/events/documents, small dims verbatim), runs
the store-tier queries against it, and prints ONE JSON line in the
BENCH_local format:

    python scripts/bench_store_sf1.py [sf0.1_dir] [sf1_dir]

Timing convention: one untimed warm pass first (it also populates the /tmp
encode caches the queries stage through), then two timed passes; the JSON
reports the min (steady state). NEVER delete the staged dirs between runs —
bulk deletes TRIM-storm this sandbox (session memory:
sandbox-discard-trim-storms)."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pandora_sf1"
COPIES = 10

# the store/DataSource tier: full-scan store queries vs the pruning tiers
STORE_QUERIES = [
    "table_encode_roundtrip",   # full decode: the no-pruning baseline
    "table_q1",                 # selective decode (7 of 13 lanes) + agg
    "table_sql_agg",            # SQL over registered store views
    "table_sql_where",          # predicate through the view
    "table_selective_stats",    # column-pruned decode
    "table_lookup_range",       # two-level zone-map pruning
    "table_bloom_lookup",       # per-chunk bloom + zone pruning
    "table_stats_pushdown",     # metadata-only (no payload read at all)
    "table_partition_pruning",  # pds date-partition pruning
    "doc_lookup",               # point lookup on the documents store
]


def stage_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, "_STAGED")
    if os.path.exists(marker):
        return
    t0 = time.time()
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    shift_ok = int(li.agg(F.max("l_orderkey")).collect()[0][0]) + 1
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    shift_ev = int(ev.agg(F.max("event_id")).collect()[0][0]) + 1
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    shift_doc = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1

    def tenfold(df, fn):
        out = None
        for k in range(COPIES):
            part = fn(df, k)
            out = part if out is None else out.unionByName(part)
        return out

    tenfold(li, lambda d, k: d.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(k * shift_ok))
    ).coalesce(8).write.mode("overwrite").parquet(
        os.path.join(DST, "lineitem.parquet"))
    tenfold(ev, lambda d, k: d.withColumn(
        "event_id", F.col("event_id") + F.lit(k * shift_ev))
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(DST, "events.parquet"))
    tenfold(docs, lambda d, k: d.withColumn(
        "doc_id", F.col("doc_id") + F.lit(k * shift_doc))
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "embeddings"):
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite").parquet(os.path.join(DST, f"{t}.parquet"))
    open(marker, "w").write("ok\n")
    print(f"staged sf1 in {time.time() - t0:.1f}s", file=sys.stderr)


def main() -> None:
    from pandora_apache_avro_idl_to_apache_parquet_spark.session import get_spark

    import __spark_entry__ as entry_mod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="store-sf1-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    stage_sf1(spark)

    queries = entry_mod.queries()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in STORE_QUERIES:
        fn = queries[name]
        rows[name] = fn(spark, DST).count()  # warm: stages encode caches
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, DST).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}s rows={rows[name]}", file=sys.stderr)
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "store_tier_sf1_total_sec", "value": total, "unit": "sec",
        "queries": times, "rows": rows, "sf": 1.0, "copies_of_sf0.1": COPIES,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
