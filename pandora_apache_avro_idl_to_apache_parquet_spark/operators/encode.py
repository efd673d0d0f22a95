"""Encode pipeline: token table -> encoded chunk files + manifest + checkpoints.

Plan shape (SURVEY.md §3.4): one shuffle, everything else Arrow-vectorized
inside a grouped-map UDF:

    scan -> part_id = pmod(xxhash64(source, doc_id), n_parts)   # salted spread
         -> anti-join against completed checkpoints              # resume
         -> groupBy(part_id).applyInPandas(encode_partition)     # the only shuffle
         -> chunk parquet files (payload columns) + checkpoint markers
         -> manifest = payload-free projection of the chunk files

Scale notes (the 100 TB story):
* ``part_id`` hashes *both* source and doc_id, so a source holding 50% of rows
  spreads uniformly over all partitions — this IS the salted repartition the
  north rule asks for (AQE skew handling does not apply to grouped-map UDFs,
  SURVEY.md §4).
* Each group writes its own parquet file directly (tmp + atomic rename) and then
  its checkpoint marker, so a failed job leaves only whole-partition units; the
  next run anti-joins completed part_ids and re-encodes only the remainder —
  the reference's optimistic Delta-commit retry (A29,
  ``/root/reference/README.md:608-701``) re-expressed as idempotent
  per-partition commits.
* The manifest is never written as a separate table that can drift: it is a
  column-pruned read of the chunk files (payload columns untouched on disk).
* Payload columns are stored uncompressed inside the chunk parquet (they are
  already codec-compressed); metadata columns stay snappy.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import date

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import codecs as C
from ..functions.hashing import klondike, sha256
from ..plans.cost import encode_values, select_int_codec, select_str_codec
from ..schema import CHUNK_COLUMNS, CHUNK_SCHEMA, MANIFEST_COLUMNS, TOKENS_SCHEMA

DEFAULT_CHUNK_ROWS = 4096
DEFAULT_CHUNK_VALUES = 1 << 18
MANIFEST_ONLY_SCHEMA = CHUNK_SCHEMA  # full schema; UDF returns manifest cols + payloads


def _data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def _ckpt_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_checkpoints")


def completed_parts(out_dir: str) -> list[int]:
    d = _ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[len("part-"):-len(".json")])
        for f in os.listdir(d)
        if f.startswith("part-") and f.endswith(".json")
    )


def checkpoint_stats(out_dir: str) -> pd.DataFrame:
    rows = []
    d = _ckpt_dir(out_dir)
    for p in completed_parts(out_dir):
        with open(os.path.join(d, f"part-{p:05d}.json")) as fh:
            rows.append(json.load(fh))
    return pd.DataFrame(rows)


def _chunk_boundaries(lengths: np.ndarray, max_rows: int, max_values: int) -> list[tuple[int, int]]:
    """Greedy row-ranges such that each chunk has <= max_rows rows and
    <= max_values token values (a single huge row still gets its own chunk)."""
    n = len(lengths)
    bounds = []
    lo = 0
    cum = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
    while lo < n:
        hi_rows = min(lo + max_rows, n)
        # furthest hi with cum[hi]-cum[lo] <= max_values
        hi_vals = int(np.searchsorted(cum, cum[lo] + max_values, side="right")) - 1
        hi = max(lo + 1, min(hi_rows, hi_vals))
        bounds.append((lo, hi))
        lo = hi
    return bounds


def _encode_partition_pdf(pdf: pd.DataFrame, out_dir: str, chunk_rows: int,
                          chunk_values: int, pds: date, fail_parts=None) -> pd.DataFrame:
    """Grouped-map kernel: one part_id's rows -> chunk parquet file + manifest."""
    part_id = int(pdf["part_id"].iloc[0])
    if fail_parts and part_id in fail_parts:
        raise RuntimeError(f"injected failure for part {part_id}")
    pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)

    lengths_all = pdf["n_tok"].to_numpy(dtype=np.int32)
    tok_list = pdf["tokens"].to_list()
    values_all = (np.concatenate(tok_list).astype(np.int32, copy=False)
                  if len(tok_list) else np.zeros(0, np.int32))
    actual = np.fromiter((len(t) for t in tok_list), dtype=np.int64, count=len(tok_list))
    if not np.array_equal(actual, lengths_all.astype(np.int64)):
        bad = int(np.flatnonzero(actual != lengths_all)[0])
        raise ValueError(f"n_tok invariant violated at doc_id={pdf['doc_id'].iloc[bad]}")
    cum = np.concatenate(([0], np.cumsum(lengths_all.astype(np.int64))))

    rows: list[dict] = []
    for seq, (lo, hi) in enumerate(_chunk_boundaries(lengths_all, chunk_rows, chunk_values)):
        doc_ids = pdf["doc_id"].iloc[lo:hi]
        sources = pdf["source"].iloc[lo:hi]
        lengths = lengths_all[lo:hi]
        values = values_all[cum[lo]:cum[hi]]

        d_len, d_blob = C.strings_to_blob(doc_ids)
        s_len, s_blob = C.strings_to_blob(sources)
        payloads = {
            "doc_id": (select_str_codec(d_len, d_blob), len(d_blob) + 4 * len(d_len)),
            "source": (select_str_codec(s_len, s_blob), len(s_blob) + 4 * len(s_len)),
            "lengths": (select_int_codec(lengths), 4 * len(lengths)),
            "values": (encode_values(values, lengths), 4 * len(values)),
        }
        sha = sha256(b"".join(p for p, _ in payloads.values()))
        row = {
            "part_id": part_id,
            "chunk_seq": seq,
            "chunk_id": klondike(f"{part_id}:{seq}:".encode() + sha),
            "row_lo": lo,
            "row_hi": hi,
            "n_rows": hi - lo,
            "n_values": int(cum[hi] - cum[lo]),
            "doc_id_min": doc_ids.iloc[0],
            "doc_id_max": doc_ids.iloc[-1],
            "sha": sha,
            "pds": pds,
        }
        for col in CHUNK_COLUMNS:
            payload, raw = payloads[col]
            row[f"{col}_codec"] = C.payload_codec_name(payload)
            row[f"{col}_raw_bytes"] = raw
            row[f"{col}_enc_bytes"] = len(payload)
            row[f"{col}_payload"] = payload
        rows.append(row)

    cols = [f.name for f in CHUNK_SCHEMA.fields]
    out = pd.DataFrame(rows, columns=cols)

    # write chunk file: tmp + atomic rename, then checkpoint marker
    data_dir, ckpt_dir = _data_dir(out_dir), _ckpt_dir(out_dir)
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    table = pa.Table.from_pandas(out, preserve_index=False)
    final = os.path.join(data_dir, f"part-{part_id:05d}.parquet")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(
        table, tmp,
        compression={f"{c}_payload": "NONE" for c in CHUNK_COLUMNS} | {"__default__": "SNAPPY"},
    )
    os.replace(tmp, final)

    stats = {
        "part_id": part_id,
        "n_chunks": len(rows),
        "n_rows": int(len(pdf)),
        "n_values": int(cum[-1]),
        "enc_bytes": int(out[[f"{c}_enc_bytes" for c in CHUNK_COLUMNS]].to_numpy().sum()) if len(out) else 0,
        "raw_bytes": int(out[[f"{c}_raw_bytes" for c in CHUNK_COLUMNS]].to_numpy().sum()) if len(out) else 0,
        "status": "done",
    }
    cfinal = os.path.join(ckpt_dir, f"part-{part_id:05d}.json")
    ctmp = cfinal + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(ctmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(ctmp, cfinal)

    return out.drop(columns=[f"{c}_payload" for c in CHUNK_COLUMNS])


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    """Salted partition key: hashes (source, doc_id) so skewed sources spread."""
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64("source", "doc_id"), F.lit(n_parts)).cast("int")
    )


def encode_tokens(df: DataFrame, out_dir: str, n_parts: int = 64,
                  chunk_rows: int = DEFAULT_CHUNK_ROWS,
                  chunk_values: int = DEFAULT_CHUNK_VALUES,
                  pds: date | None = None,
                  fail_parts: set[int] | None = None) -> DataFrame:
    """Run the encode job; returns the manifest DataFrame (payload-free).

    Resume: part_ids with a checkpoint marker in ``out_dir/_checkpoints`` are
    skipped; ``fail_parts`` injects failures for the resume pytest (A29 analog).
    """
    spark = df.sparkSession
    pds = pds or date(2026, 1, 1)
    keyed = with_part_id(df, n_parts)

    done = completed_parts(out_dir)
    if done:
        done_df = spark.createDataFrame([(p,) for p in done], "part_id int")
        keyed = keyed.join(F.broadcast(done_df), "part_id", "left_anti")

    from pyspark.sql.types import StructType

    manifest_struct = StructType([f for f in CHUNK_SCHEMA.fields if not f.name.endswith("_payload")])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_partition_pdf(pdf, out_dir, chunk_rows, chunk_values, pds,
                                     fail_parts=fail_parts)

    result = keyed.groupBy("part_id").applyInPandas(kernel, schema=manifest_struct)
    # force execution with a no-file action: the manifest of record is the
    # chunk files themselves, and writing (then overwriting) an attempt
    # manifest would churn deletes — expensive on discard-mounted filesystems
    result.write.format("noop").mode("overwrite").save()
    write_commit_log(out_dir, pds)
    return read_manifest(spark, out_dir)


PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 1, "payloadFormat": 2}


def write_commit_log(out_dir: str, pds: date) -> str | None:
    """Numbered-JSONL commit log — the A28/A29 analog of the reference's
    ``_delta_log`` writer (``/root/reference/.../Pandora/Databricks/
    DeltaLake.fs:176-444``): a ``_log/<%020d>.json`` file holding one
    ``protocol`` line, one ``metaData`` line (schema + partition column), and
    one ``add`` line per data file (path, size, sha256, partitionValues).

    Index discovery mirrors the reference's fold-max-plus-one over existing
    numeric filenames (``README.md:608-645``); the write is optimistic —
    ``O_CREAT|O_EXCL`` plays the role of the reference's upload-
    with-overwrite=false, and on collision (concurrent committer) the next
    index is retried. Only files not yet referenced by earlier log entries are
    added, so re-running after resume appends exactly the new files.
    """
    from ..schema import CHUNK_SCHEMA

    data_dir, log_dir = _data_dir(out_dir), os.path.join(out_dir, "_log")
    if not os.path.isdir(data_dir):
        return None
    os.makedirs(log_dir, exist_ok=True)

    def _scan_log() -> tuple[set[str], list[int]]:
        committed: set[str] = set()
        indices: list[int] = []
        for f in sorted(os.listdir(log_dir)):
            if not f.endswith(".json"):
                continue
            indices.append(int(f[:-5]))
            with open(os.path.join(log_dir, f)) as fh:
                for line in fh:
                    entry = json.loads(line)
                    if "add" in entry:
                        committed.add(entry["add"]["path"])
        return committed, indices

    def _build_payload(committed: set[str]) -> str | None:
        new_files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet") and f not in committed
        )
        if not new_files:
            return None
        lines = [
            json.dumps({"protocol": PROTOCOL}),
            json.dumps(
                {
                    "metaData": {
                        "schemaString": CHUNK_SCHEMA.json(),
                        "partitionColumns": ["pds"],
                        "format": {"provider": "parquet"},
                    }
                }
            ),
        ]
        import hashlib

        for f in new_files:
            path = os.path.join(data_dir, f)
            with open(path, "rb") as fh:
                sha = hashlib.sha256(fh.read()).hexdigest()
            lines.append(
                json.dumps(
                    {
                        "add": {
                            "path": f,
                            "size": os.path.getsize(path),
                            "sha256": sha,
                            "partitionValues": {"pds": pds.isoformat()},
                            "dataChange": True,
                            "modificationTime": int(os.path.getmtime(path) * 1000),
                        }
                    }
                )
            )
        return "\n".join(lines) + "\n"

    committed, indices = _scan_log()
    payload = _build_payload(committed)
    if payload is None:
        return None
    idx = (max(indices) + 1) if indices else 0
    while True:  # optimistic retry on index collision (A29)
        target = os.path.join(log_dir, f"{idx:020d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # a concurrent committer won this index: re-read the log so files
            # it committed are dropped from our payload (exactly-once — the
            # 'only files not yet referenced' invariant), then try next index
            committed, indices = _scan_log()
            payload = _build_payload(committed)
            if payload is None:
                return None
            idx = max(idx + 1, (max(indices) + 1) if indices else 0)
            continue
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        return target


def read_commit_log(out_dir: str) -> list[dict]:
    """All committed entries across the numbered log files, in order."""
    log_dir = os.path.join(out_dir, "_log")
    entries: list[dict] = []
    if not os.path.isdir(log_dir):
        return entries
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".json"):
            with open(os.path.join(log_dir, f)) as fh:
                entries.extend(json.loads(line) for line in fh)
    return entries


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Manifest = payload-free projection of chunk files (column-pruned scan)."""
    return read_chunks(spark, out_dir).select(*MANIFEST_COLUMNS)


def read_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    d = _data_dir(out_dir)
    if not os.path.isdir(d) or not any(f.endswith(".parquet") for f in os.listdir(d)):
        # empty input produced no chunk files: empty frame with the chunk schema
        return spark.createDataFrame([], CHUNK_SCHEMA)
    return spark.read.parquet(d)
