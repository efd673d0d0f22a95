"""Content hashing: SHA-256 + base-62 transcoding.

Analog of the reference's ``Hash.SHA256.sum`` and "Klondike" base-62 SHA-256
(43 chars ≡ 256 bits, ``/root/reference/.../Pandora/Utils/Hash.fs:9-99``), used
for deterministic chunk ids instead of the reference's random GUID ``pj_uid``
(``Parquet.fs:444-446, 778``) so tests and resume are reproducible.
"""

from __future__ import annotations

import hashlib

_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def klondike(data: bytes) -> str:
    """SHA-256 of ``data`` transcoded to base-62 (43 chars)."""
    n = int.from_bytes(hashlib.sha256(data).digest(), "big")
    out = []
    for _ in range(43):
        n, r = divmod(n, 62)
        out.append(_B62[r])
    return "".join(reversed(out))


# ---------------------------------------------------------------------------
# Cross-engine deterministic hashing (Spark ⇄ DuckDB oracle parity).
#
# The driver's correctness gate re-runs every query as ANSI SQL in DuckDB, so
# any hash used inside an oracled query must produce identical values in both
# engines. md5 is the common denominator: both emit the same lowercase hex, and
# a hex-prefix cast yields the same non-negative integer. 15 hex chars = 60
# bits (< int64), 7 hex chars = 28 bits (< int32).

def spark_md5_long(expr: str, nibbles: int = 15) -> str:
    """Spark SQL: deterministic non-negative int64 hash of a string expr."""
    return f"cast(conv(substring(md5(cast({expr} as binary)), 1, {nibbles}), 16, 10) as bigint)"


def spark_md5_int(expr: str) -> str:
    return f"cast(conv(substring(md5(cast({expr} as binary)), 1, 7), 16, 10) as int)"


def duck_md5_long(expr: str, nibbles: int = 15) -> str:
    """DuckDB SQL: same value as :func:`spark_md5_long` for the same input."""
    return f"(('0x' || substr(md5({expr}), 1, {nibbles}))::BIGINT)"


def duck_md5_int(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 7))::INTEGER)"
