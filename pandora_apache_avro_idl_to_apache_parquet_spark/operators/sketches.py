"""Deterministic approximate sketches: HyperLogLog distinct counts,
fixed-width-histogram quantiles, Count-Min frequency estimates.

Engine-native sketches (Spark's HLL++ `approx_count_distinct`, DuckDB's
`approx_count_distinct`, GK/t-digest percentiles) are engine-private: they
hash differently and their outputs depend on merge order, so they can never
hash-match across engines. These implementations re-derive each sketch from
first principles on md5 — every register / bucket / bin is a pure function
of the value, and every merge is a max or an *integer* sum (commutative,
associative, exactly representable), so Spark and the DuckDB oracle agree
bit-for-bit and results are independent of partitioning.

Scale shape (the 100-TB story): each sketch is a partial-aggregatable
``groupBy`` whose post-shuffle keyspace is the SKETCH size (``m`` registers,
``depth*width`` counters, ``n_bins`` bins) — not the data size. Map-side
combine collapses every partition to at most the sketch size before any
exchange, so shuffle bytes are O(groups * sketch), independent of rows.
The only windows are over sketch-sized frames (n_bins rows), never data.

HLL register sums are kept in scaled-integer space (``2^(R-rho)`` as int64,
max ``m * 2^R = 2^61``) precisely because double summation of ``2^-rho``
terms needs >53 mantissa bits and would make the estimate depend on
aggregation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import duck_md5_long, spark_md5_long

__all__ = [
    "hll_distinct",
    "hll_partial",
    "hll_merge",
    "hll_distinct_sql",
    "histogram_quantile",
    "histogram_quantile_sql",
    "cms_frequency",
    "cms_frequency_sql",
    "bloom_build",
    "bloom_probe",
    "bloom_sql_ctes",
]

_HASH_BITS = 60  # 15 md5 nibbles — the cross-engine int64 hash width


def _hll_alpha(m: int) -> float:
    # standard HLL bias-correction constants (Flajolet et al. 2007)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_partial(df: DataFrame, group_cols: list[str], col: str,
                p: int = 8, seed: int = 42) -> DataFrame:
    """Mergeable HLL state: one (group..., hll_reg, hll_rho) row per touched
    register. Because registers are a pure md5 function of the value,
    partials computed over ANY disjoint (or even overlapping) slices merge
    by register-max into exactly the state a direct pass produces — the
    pre-aggregated-sketch warehouse pattern (persist per-day partials,
    merge at query time)."""
    m = 1 << p
    W = _HASH_BITS - p
    R = W + 1
    h = spark_md5_long(f"concat('{seed}:', cast({col} as string))")
    rho = (
        f"CASE WHEN ({h}) div {m} = 0 THEN {R} "
        f"ELSE {W} - length(bin(({h}) div {m})) + 1 END"
    )
    return (
        df.groupBy(*group_cols, F.expr(f"({h}) % {m}").alias("hll_reg"))
        .agg(F.expr(f"max({rho})").alias("hll_rho"))
    )


def hll_merge(partials: DataFrame, group_cols: list[str],
              p: int = 8, out_name: str = "est_distinct") -> DataFrame:
    """Merge :func:`hll_partial` tables (register max — commutative,
    associative, idempotent, so re-merges and overlaps are safe) and emit
    the estimate per ``group_cols``; partial columns beyond ``group_cols``
    (e.g. the slice key) simply collapse."""
    regs = (
        partials.groupBy(*group_cols, "hll_reg")
        .agg(F.max("hll_rho").alias("hll_rho"))
    )
    return _hll_estimate(regs, group_cols, p, out_name)


def hll_distinct(df: DataFrame, group_cols: list[str], col: str,
                 p: int = 8, seed: int = 42,
                 out_name: str = "est_distinct") -> DataFrame:
    """HyperLogLog distinct count of ``col`` per group, from md5 bits.

    ``m = 2^p`` registers; the 60-bit md5 hash splits into register
    ``h % m`` and a ``W = 60-p``-bit suffix ``w = h div m`` whose
    leading-zero rank ``rho`` (1-based position of the highest set bit
    counted from the top, ``W+1`` when ``w = 0``) feeds the register max.
    The estimate is the classic bias-corrected harmonic mean with the
    linear-counting fallback for the small range. Two partial-aggregatable
    groupBys: (group, register) -> max(rho), then group -> estimate; the
    register sum rides an exact int64 (``2^(R-rho)`` scaled), so the result
    is partition-order-independent. Composes as
    ``hll_merge(hll_partial(df, ...))``.
    """
    return _hll_estimate(
        hll_partial(df, group_cols, col, p=p, seed=seed),
        group_cols, p, out_name,
    )


def _hll_estimate(regs: DataFrame, group_cols: list[str], p: int,
                  out_name: str) -> DataFrame:
    m = 1 << p
    R = _HASH_BITS - p + 1
    C = _hll_alpha(m) * m * m * float(2 ** R)  # numerator in scaled-int space
    est = (
        regs.groupBy(*group_cols)
        .agg(
            F.count("*").alias("__nz"),
            F.expr(f"sum(shiftleft(cast(1 as bigint), {R} - hll_rho))").alias("__s"),
        )
        .withColumn("__v", F.lit(m) - F.col("__nz"))
        .withColumn("__raw", F.lit(C) / (F.col("__s") + F.col("__v") * F.lit(1 << R)))
        .withColumn(
            out_name,
            F.round(
                F.when(
                    (F.col("__raw") <= F.lit(2.5 * m)) & (F.col("__v") > 0),
                    F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__v")),
                ).otherwise(F.col("__raw")),
                4,
            ),
        )
        .drop("__nz", "__s", "__v", "__raw")
    )
    return est


def hll_distinct_sql(table: str, group_cols: list[str], col: str,
                     p: int = 8, seed: int = 42,
                     out_name: str = "est_distinct") -> str:
    """DuckDB SQL computing the identical HLL estimate (oracle half)."""
    m = 1 << p
    W = _HASH_BITS - p
    R = W + 1
    h = duck_md5_long(f"'{seed}:' || ({col})::VARCHAR")
    rho = (
        f"CASE WHEN ({h}) // {m} = 0 THEN {R} "
        f"ELSE {W} - length(bin(({h}) // {m})) + 1 END"
    )
    g = ", ".join(group_cols)
    C = repr(_hll_alpha(m) * m * m * float(2 ** R))
    return f"""
WITH regs AS (
  SELECT {g}, ({h}) % {m} AS reg, max({rho}) AS rho
  FROM {table} GROUP BY {g}, reg
), agg AS (
  SELECT {g}, count(*) AS nz,
         sum((1::BIGINT << ({R} - rho)))::BIGINT AS s
  FROM regs GROUP BY {g}
)
SELECT {g},
       round(CASE WHEN ({C} / (s + ({m} - nz) * {1 << R})) <= {2.5 * m}
                   AND ({m} - nz) > 0
             THEN {float(m)} * ln({float(m)} / ({m} - nz))
             ELSE {C} / (s + ({m} - nz) * {1 << R}) END, 4) AS {out_name}
FROM agg
"""


# ------------------------------------------------------------------ quantile


def histogram_quantile(df: DataFrame, col: str, quantiles: list[float],
                       n_bins: int = 128,
                       group_cols: list[str] | None = None) -> DataFrame:
    """Approximate quantiles via a fixed-width histogram (deterministic,
    engine-independent — unlike GK / t-digest whose output depends on merge
    order), optionally per group. Two passes: exact (min, max, count) per
    group, then one groupBy into ``n_bins`` equal-width bins; quantile ``q``
    resolves to the upper edge of the first bin whose cumulative count
    reaches ``ceil(q * n)``. Error is bounded by one bin width. The
    cumulative window runs over ≤ n_bins rows PER GROUP (sketch-sized,
    parallel across groups), never over data; the per-group stats attach
    via an AQE-broadcastable equi-join on the group key. Returns
    (*group_cols, quantile, bin, approx_value).
    """
    g = list(group_cols or [])
    x = F.col(col).cast("double")
    aggs = [F.min(x).alias("__lo"), F.max(x).alias("__hi"), F.count(x).alias("__n")]
    stats = df.groupBy(*g).agg(*aggs) if g else df.agg(*aggs)
    with_stats = df.join(F.broadcast(stats), g) if g else df.crossJoin(F.broadcast(stats))
    binned = (
        with_stats
        .withColumn(
            "__w",
            F.when(F.col("__hi") > F.col("__lo"),
                   (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins)))
            .otherwise(F.lit(1.0)),
        )
        .withColumn(
            "bin",
            F.least(
                F.floor((x - F.col("__lo")) / F.col("__w")).cast("int"),
                F.lit(n_bins - 1),
            ),
        )
        .groupBy(*g, "bin")
        .agg(F.count("*").alias("__cnt"),
             F.first("__lo").alias("__lo"), F.first("__w").alias("__w"),
             F.first("__n").alias("__n"))
    )
    from pyspark.sql.window import Window

    cum = binned.withColumn(
        "__cum",
        F.sum("__cnt").over(Window.partitionBy(*g).orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("quantile")
    hits = (
        cum.select(*g, qs, "bin", "__cum", "__lo", "__w", "__n")
        .where(F.col("__cum") >= F.ceil(F.col("quantile") * F.col("__n")))
        .groupBy(*g, "quantile")
        .agg(F.min("bin").alias("bin"),
             F.first("__lo").alias("__lo"), F.first("__w").alias("__w"))
    )
    return (
        hits.select(
            *g,
            "quantile",
            "bin",
            F.round(F.col("__lo") + (F.col("bin") + 1) * F.col("__w"), 4)
            .alias("approx_value"),
        )
        .orderBy(*g, "quantile")
    )


def histogram_quantile_sql(table: str, col: str, quantiles: list[float],
                           n_bins: int = 128,
                           group_cols: list[str] | None = None) -> str:
    """DuckDB SQL mirror of :func:`histogram_quantile`."""
    g = list(group_cols or [])
    qs = ", ".join(f"({float(q)})" for q in quantiles)
    width = (
        f"(CASE WHEN s.hi > s.lo THEN (s.hi - s.lo) / {float(n_bins)} ELSE 1.0 END)"
    )
    gsel = "".join(f"{c}, " for c in g)
    gq = "".join(f"t.{c}, " for c in g)
    ggrp = ("GROUP BY " + ", ".join(g)) if g else ""
    son = (" AND ".join(f"s.{c} = t.{c}" for c in g)) or "TRUE"
    hon = (" AND ".join(f"s.{c} = h.{c}" for c in g)) or "TRUE"
    bin_grp = ", ".join([f"t.{c}" for c in g] + ["bin"])
    cum_part = ("PARTITION BY " + ", ".join(g)) if g else ""
    hit_grp = ", ".join([f"cum.{c}" for c in g] + ["q.quantile"])
    hsel = "".join(f"cum.{c}, " for c in g)
    return f"""
WITH stats AS (
  SELECT {gsel}min(({col})::DOUBLE) AS lo, max(({col})::DOUBLE) AS hi,
         count(({col})::DOUBLE) AS n
  FROM {table} {ggrp}
), binned AS (
  SELECT {gq}least(floor((({col})::DOUBLE - s.lo) / {width})::INTEGER,
               {n_bins - 1}) AS bin,
         count(*) AS cnt
  FROM {table} t JOIN stats s ON {son} GROUP BY {bin_grp}
), cum AS (
  SELECT {gsel}bin, sum(cnt) OVER ({cum_part} ORDER BY bin) AS c FROM binned
), q AS (
  SELECT quantile::DOUBLE AS quantile FROM (VALUES {qs}) t(quantile)
), hit AS (
  SELECT {hsel}q.quantile, min(cum.bin) AS bin
  FROM q, cum JOIN stats s ON {(" AND ".join(f"s.{c} = cum.{c}" for c in g)) or "TRUE"}
  WHERE cum.c >= ceil(q.quantile * s.n)
  GROUP BY {hit_grp}
)
SELECT {"".join(f"h.{c}, " for c in g)}h.quantile, h.bin::INTEGER AS bin,
       round(s.lo + (h.bin + 1) * {width}, 4) AS approx_value
FROM hit h JOIN stats s ON {hon}
ORDER BY {"".join(f"h.{c}, " for c in g)}h.quantile
"""


# ----------------------------------------------------------------- count-min


def cms_frequency(df: DataFrame, col: str, width: int = 256, depth: int = 4,
                  seed: int = 42) -> DataFrame:
    """Count-Min frequency estimate per distinct value of ``col``.

    Build: each row hashes into one bucket per sketch row (``depth``
    independent md5 hashes mod ``width``); counters are an integer groupBy
    over (row, bucket) — ``depth*width`` cells regardless of data size, with
    map-side combine. Estimate for a key = min over its ``depth`` buckets
    (classic CMS overestimate, never under). Returns
    (value, exact_cnt, cms_est) so the overestimate bound
    ``cms_est >= exact_cnt`` is visible in the output.
    """
    def bucket(r: int, expr: str) -> Column:
        inner = f"concat('{seed}:{r}:', cast({expr} as string))"
        return F.expr(f"({spark_md5_long(inner)}) % {width}")

    coded = df.select(
        F.col(col).alias("value"),
        F.posexplode(F.array(*[bucket(r, col) for r in range(depth)]))
        .alias("rw", "bucket"),
    )
    counters = coded.groupBy("rw", "bucket").agg(F.count("*").alias("cnt"))
    keys = (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("exact_cnt"))
        .select("value", "exact_cnt",
                F.posexplode(
                    F.array(*[bucket(r, "value") for r in range(depth)])
                ).alias("rw", "bucket"))
    )
    return (
        keys.join(F.broadcast(counters), ["rw", "bucket"])
        .groupBy("value", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .orderBy("value")
    )


def cms_frequency_sql(table: str, col: str, width: int = 256, depth: int = 4,
                      seed: int = 42) -> str:
    """DuckDB SQL mirror of :func:`cms_frequency`."""
    def bucket(r: int, expr: str) -> str:
        inner = f"'{seed}:{r}:' || ({expr})::VARCHAR"
        return f"({duck_md5_long(inner)}) % {width}"

    coded = " UNION ALL ".join(
        f"SELECT {col} AS value, {r} AS rw, {bucket(r, col)} AS bucket FROM {table}"
        for r in range(depth)
    )
    keyed = " UNION ALL ".join(
        f"SELECT value, exact_cnt, {r} AS rw, {bucket(r, 'value')} AS bucket FROM exact"
        for r in range(depth)
    )
    return f"""
WITH coded AS ({coded}),
counters AS (SELECT rw, bucket, count(*) AS cnt FROM coded GROUP BY rw, bucket),
exact AS (SELECT {col} AS value, count(*) AS exact_cnt FROM {table} GROUP BY 1),
keyed AS ({keyed})
SELECT k.value, k.exact_cnt, min(c.cnt) AS cms_est
FROM keyed k JOIN counters c ON c.rw = k.rw AND c.bucket = k.bucket
GROUP BY k.value, k.exact_cnt ORDER BY k.value
"""


# -------------------------------------------------------------- bloom filter
# Words hold 63 bits (bit = pos % 63) so no shift ever touches the int64 sign
# bit — both engines shift/AND identically with zero overflow concerns.

_BLOOM_WORD = 63


def _bloom_positions(expr: str, n_bits: int, n_hashes: int, seed: int,
                     spark: bool) -> list[str]:
    mk = spark_md5_long if spark else duck_md5_long
    out = []
    for r in range(n_hashes):
        if spark:
            inner = f"concat('{seed}:{r}:', cast({expr} as string))"
        else:
            inner = f"'{seed}:{r}:' || ({expr})::VARCHAR"
        out.append(f"(({mk(inner)}) % {n_bits})")
    return out


def bloom_build(df: DataFrame, col: str, n_bits: int = 1 << 16,
                n_hashes: int = 3, seed: int = 42) -> DataFrame:
    """Deterministic Bloom filter of ``col``'s values as ONE row holding a
    ``map<long, long>`` of 63-bit words — broadcastable membership for sets
    too large to broadcast raw (2^30 bits ≈ 128 MB of words stands in for
    gigabytes of 64-bit keys). Build is a partial-aggregatable integer
    ``bit_or`` groupBy over at most ``n_bits/63`` word keys; md5-derived
    positions make the filter identical across engines and partitionings.
    No false negatives ever; false-positive rate ≈ (1-e^(-kn/m))^k."""
    pos = _bloom_positions(col, n_bits, n_hashes, seed, spark=True)
    return (
        df.select(F.explode(F.array(*[F.expr(p) for p in pos])).alias("p"))
        .select(
            F.expr(f"p div {_BLOOM_WORD}").alias("word"),
            F.expr(f"cast(p % {_BLOOM_WORD} as int)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), bit))").alias("bits"))
        .agg(F.expr("map_from_entries(collect_list(struct(word, bits)))").alias("bloom"))
    )


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame,
                n_bits: int = 1 << 16, n_hashes: int = 3, seed: int = 42,
                out_name: str = "maybe_member") -> DataFrame:
    """Map-side membership probe against a :func:`bloom_build` row: the
    one-row word map broadcasts and each value checks its ``n_hashes``
    positions with a ``forall`` over map lookups — no row expansion, no
    shuffle, no join on the probed side."""
    pos = ", ".join(_bloom_positions(col, n_bits, n_hashes, seed, spark=True))
    check = (
        f"forall(array({pos}), p -> "
        f"(coalesce(element_at(bloom, p div {_BLOOM_WORD}), cast(0 as bigint)) "
        f"& shiftleft(cast(1 as bigint), cast(p % {_BLOOM_WORD} as int))) != 0)"
    )
    return (
        df.join(F.broadcast(bloom))
        .withColumn(out_name, F.expr(check))
        .drop("bloom")
    )


def bloom_sql_ctes(build_select: str, n_bits: int = 1 << 16,
                   n_hashes: int = 3, seed: int = 42) -> str:
    """DuckDB CTE fragment mirroring :func:`bloom_build`: emits ``bwords``
    (word, bits) from ``build_select`` (a SELECT yielding one column named
    ``v``). Probe side should LEFT JOIN ``bwords`` per position and
    ``bool_and`` the bit checks."""
    pos = _bloom_positions("v", n_bits, n_hashes, seed, spark=False)
    posed = " UNION ALL ".join(
        f"SELECT {p} AS p FROM ({build_select}) b{r}"
        for r, p in enumerate(pos)
    )
    return f"""
bpos AS ({posed}),
bwords AS (
  SELECT p // {_BLOOM_WORD} AS word,
         bit_or((1::BIGINT << (p % {_BLOOM_WORD})::INTEGER)) AS bits
  FROM bpos GROUP BY 1
)"""
