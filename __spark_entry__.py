"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship encode→decode→explode round-trip on sf0.001.
``queries``/``oracle_sql`` expose every operator family from SURVEY.md §2
(columnar-encode pipeline, flatten/explode, relational coverage, dedup,
similarity search, text analysis, multimodal plumbing); the implementations
and the paired DuckDB oracle SQL live in
``pandora_apache_avro_idl_to_apache_parquet_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandora_apache_avro_idl_to_apache_parquet_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the derived token table of sf0.001, decode it, and
    return the exploded (doc_id, pos, token) rows — non-empty iff the
    round-trip reproduced every token."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.queries import q_tokens_roundtrip

    return q_tokens_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
