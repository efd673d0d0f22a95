"""Skew-robust joins: explicit deterministic key salting.

A shuffled equi-join hashes each key to ONE reducer, so a hot key (the empty
document, the default user id, the one viral item) serializes on a single
task no matter how many executors exist. AQE's skew-join mitigation splits
oversized *partitions* for sort-merge joins after the fact; explicit salting
additionally (a) spreads a single hot KEY across ``n_salt`` tasks by
construction, (b) works for shuffled-hash joins and any downstream
grouped-map stage AQE cannot split (the same reason ``operators/encode.py``
salts its encode shuffle), and (c) is deterministic — partition contents
don't depend on runtime statistics, so runs are reproducible.

The trade: the small side is replicated ``n_salt`` times (executor-local
``explode``, no extra shuffle of the big side), so salt counts should stay
modest (8-32) and the small side genuinely smaller. Results are provably
identical to the unsalted join — the salt is an md5 of caller-named
disambiguator columns, never RNG, so the operator stays oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import spark_md5_long

__all__ = ["salted_join"]

_SUPPORTED = {"inner", "left", "left_outer", "left_semi", "left_anti"}


def salted_join(big: DataFrame, small: DataFrame, on: str,
                row_key: list[str], n_salt: int = 16,
                how: str = "inner", seed: int = 42) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side salted.

    ``row_key`` names big-side columns whose concatenation disambiguates
    rows *within* a key (any near-unique combination works — the salt only
    needs spread, not uniqueness); each big row gets salt
    ``md5(seed:row_key) % n_salt`` and each small row replicates to all
    ``n_salt`` salts, so the join key becomes ``(on, salt)`` and a hot key's
    rows land on ``n_salt`` reducers instead of one.

    ``how`` is restricted to big-side-preserving joins (inner/left/semi/
    anti): right/full would surface the small side's replicas as duplicate
    unmatched rows.
    """
    if how not in _SUPPORTED:
        raise ValueError(f"how={how!r} not in {sorted(_SUPPORTED)}")
    if not row_key:
        raise ValueError("row_key must name at least one big-side column")
    parts = ", ".join(f"cast({c} as string)" for c in row_key)
    inner = f"concat_ws(':', '{seed}', {parts})"
    big_s = big.withColumn(
        "__salt", F.expr(f"cast(({spark_md5_long(inner)}) % {n_salt} as int)")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
