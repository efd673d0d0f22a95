"""Local mirror of the driver's correctness gate.

Runs every entry in ``__spark_entry__.queries()`` against its
``oracle_sql()`` on the same sf-dir parquet: compares row count, sorted
column names/dtypes, and an order-insensitive value hash. Use while iterating:

    python scripts/oracle_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO list->tuple coercion: the driver's canonicalizer
    # sort_values-crashes on list cells ("unhashable type"), so the local
    # gate must be exactly as strict — queries must emit scalar columns.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 9))
            elif isinstance(v, (np.integer,)):
                vals.append(int(v))
            elif isinstance(v, np.floating):
                vals.append(round(float(v), 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pandora_apache_avro_idl_to_apache_parquet_spark.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        problems = []
        if len(a) != len(b):
            problems.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        else:
            dt_a = [str(a[c].dtype) for c in a.columns]
            dt_b = [str(b[c].dtype) for c in b.columns]
            if dt_a != dt_b:
                problems.append(f"dtypes {list(zip(a.columns, dt_a, dt_b))}")
            if len(a) == len(b):
                va, vb = value_repr(a), value_repr(b)
                if va != vb:
                    diffs = [(x, y) for x, y in zip(va, vb) if x != y][:3]
                    problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(a)} MATCH")
    spark.stop()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
