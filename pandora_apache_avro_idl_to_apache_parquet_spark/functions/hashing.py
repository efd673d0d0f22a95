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
