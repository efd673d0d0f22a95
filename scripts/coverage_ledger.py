#!/usr/bin/env python3
"""Cumulative driver-oracle coverage ledger.

The driver's correctness harness emits rows for exactly the first 50 entries
of ``__spark_entry__.queries()`` each round.  This script unions every
``CORRECTNESS_r*.json`` in the repo root and reports, against the current
registry order:

  * which registered queries have EVER produced a green driver row,
  * which are scheduled in the next round's 50-slot window,
  * which registered queries have NEVER had a driver row (the rotation debt).

Run it after any reorder of ``queries.QUERIES`` so the 50-slot window is
rotated deliberately (VERDICT r03, "Next round" #1/#10).
"""
from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> int:
    from pandora_apache_avro_idl_to_apache_parquet_spark.queries import QUERIES

    registry = list(QUERIES.keys())

    ever_green: set[str] = set()
    ever_run: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ever_run.add(name)
            if row.get("hash_match") and row.get("rows_match") and row.get(
                "schema_match"
            ):
                ever_green.add(name)

    window = registry[:WINDOW]
    never_run = [q for q in registry if q not in ever_run]
    never_green = [q for q in registry if q not in ever_green]
    debt_after = [q for q in registry if q not in ever_run and q not in window]

    print(f"registered queries        : {len(registry)}")
    print(f"ever driver-run           : {len(ever_run & set(registry))}")
    print(f"ever driver-green         : {len(ever_green & set(registry))}")
    print(f"never driver-run          : {len(never_run)}")
    print(f"never driver-green        : {len(never_green)}")
    print(f"next-round window (first {WINDOW}):")
    for q in window:
        mark = "green" if q in ever_green else ("run" if q in ever_run else "NEW")
        print(f"  {q:<34} {mark}")
    if debt_after:
        print(f"STILL never-run after next round ({len(debt_after)}):")
        for q in debt_after:
            print(f"  {q}")
    else:
        print("rotation debt after next round: 0 (every registered query will "
              "have a driver row once this window runs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
