"""Bloom-filter semi-join prefilter: cut a big side's shuffle down to
(approximately) the rows that can actually join, before the exchange.

At 100 TB the dominant cost of a selective join is shuffling big-side
rows that will never match. OSS Spark can inject a runtime bloom filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, off by default and
planner-discretionary); this module is the EXPLICIT form — a
deterministic, plan-inspectable prefilter the caller controls:

1. :func:`bloom_bitmap` folds the small side's join keys into an
   ``m_bits`` bitmap stored as ONE row — a ``map<int,bigint>`` of
   non-zero 64-bit words built from ``xxhash64(key, seed_i)`` positions
   with a ``bit_or`` aggregate. Pure Catalyst; the bitmap is
   metadata-scale (≤ ``m_bits/64`` entries, ~64 KB at the default
   2^19 bits).
2. :func:`bloom_semi_prefilter` broadcasts that one row and keeps big
   rows whose k probe bits are ALL set — a map-side filter, ZERO
   shuffle on the big side (the only join is a one-row broadcast, the
   repo's standard scalar-broadcast shape). The result is a SUPERSET of
   the exact left-semi join (bloom filters have false positives, never
   false negatives — identical hash construction on both sides).
3. :func:`bloom_prefilter_join` composes prefilter + exact join: the
   result is EXACTLY the plain join (false positives are dropped by the
   join itself), but the exchange carries only survivors. That is why
   the registry query carries a FULL value oracle — the plain SQL
   join — despite the approximate filter inside.

Saturation guard: the bitmap row records its set-bit count; a fill
fraction beyond 50% means false-positive rates ≥ (1/2)^k and a
prefilter that no longer pays for its own scan — the probe raises
loudly (the drift-family contract) instead of silently degrading.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> "list[Column]":
    # xxhash64(key, seed_i): k independent positions in [0, m). Build and
    # probe share THIS function, so a small-side key can never probe an
    # unset bit (no false negatives).
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(int(m_bits)))
        for i in range(int(k_hashes))
    ]


def _validate(m_bits: int, k_hashes: int) -> None:
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 1 <= k_hashes <= 16:
        raise ValueError(f"k_hashes must be in [1, 16], got {k_hashes}")


def bloom_bitmap(
    small: DataFrame,
    key: "str | Column",
    m_bits: int = 1 << 19,
    k_hashes: int = 4,
) -> DataFrame:
    """One-row bitmap frame ``[bf: map<int,bigint>, m_bits, k_hashes,
    n_set_bits]`` over the small side's keys.

    Two metadata-scale aggregations: explode each key's k (word, bit)
    coordinates, ``bit_or`` per word (≤ m/64 groups), fold the words
    into a map. Null keys set no bits (the exact join drops them
    anyway)."""
    _validate(m_bits, k_hashes)
    c = F.col(key) if isinstance(key, str) else key
    coords = F.array(
        *[
            F.struct(
                F.floor(p / 64).cast("int").alias("word"),
                F.pmod(p, F.lit(64)).cast("int").alias("bit"),
            )
            for p in _positions(c, m_bits, k_hashes)
        ]
    )
    words = (
        small.where(c.isNotNull())
        .select(F.explode(coords).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), p.bit)")).alias("w"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "w"))).alias("bf"),
        F.coalesce(F.sum(F.bit_count("w")), F.lit(0)).cast("int").alias(
            "n_set_bits"
        ),
    ).select(
        "bf",
        F.lit(int(m_bits)).alias("m_bits"),
        F.lit(int(k_hashes)).alias("k_hashes"),
        "n_set_bits",
    )


def bloom_semi_prefilter(
    big: DataFrame,
    key: "str | Column",
    bitmap: DataFrame,
    max_fill: float = 0.5,
) -> DataFrame:
    """Keep big-side rows whose key MIGHT be in the bitmap — a strict
    superset of the exact left-semi join, computed entirely map-side:
    the bitmap row broadcasts (one-row crossJoin, the repo's scalar
    pattern) and each probe is ``bit_get`` on a map-looked-up word. No
    shuffle of ``big`` anywhere.

    The bitmap row is read driver-side once (index-meta class — the
    probe expressions need m/k at plan time); a fill fraction beyond
    ``max_fill`` raises: at ≥50% fill the filter passes ≥ (1/2)^k of
    EVERYTHING and no longer pays for itself."""
    meta = bitmap.first()
    if meta is None or meta["bf"] is None or len(meta["bf"]) == 0:
        raise ValueError(
            "bloom bitmap is empty — build it over a non-empty small side"
        )
    m_bits, k_hashes = int(meta["m_bits"]), int(meta["k_hashes"])
    fill = meta["n_set_bits"] / m_bits
    if fill > max_fill:
        raise ValueError(
            f"bloom bitmap saturated: {meta['n_set_bits']}/{m_bits} bits set "
            f"({fill:.1%} > max_fill={max_fill:.0%}); false-positive rate "
            f">= {fill ** k_hashes:.1%} — raise m_bits or skip the prefilter"
        )
    c = F.col(key) if isinstance(key, str) else key
    cond = c.isNotNull()
    for p in _positions(c, m_bits, k_hashes):
        word = F.coalesce(
            F.element_at(F.col("_bf"), F.floor(p / 64).cast("int")),
            F.lit(0).cast("bigint"),
        )
        cond = cond & (F.bit_get(word, F.pmod(p, F.lit(64))) == 1)
    probed = big.crossJoin(F.broadcast(bitmap.select(F.col("bf").alias("_bf"))))
    return probed.where(cond).drop("_bf")


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: "str | None" = None,
    m_bits: int = 1 << 19,
    k_hashes: int = 4,
) -> DataFrame:
    """Exact inner ``big JOIN small`` whose exchange carries only bloom
    survivors — result-identical to the plain join (false positives are
    eliminated by the join itself; equality-tested), shuffle volume cut
    to ~the small side's key selectivity.

    ``small`` is used twice (bitmap build + the exact join); both are
    one pass over a SMALL relation by contract. For a broadcast-sized
    ``small`` prefer a plain broadcast join — this operator targets the
    broadcast-infeasible-but-selective middle ground where the shuffle
    is the cost."""
    sk = small_key or big_key
    bitmap = bloom_bitmap(small, sk, m_bits=m_bits, k_hashes=k_hashes)
    survivors = bloom_semi_prefilter(big, big_key, bitmap)
    if sk == big_key:
        return survivors.join(small, on=big_key, how="inner")
    return survivors.join(small, survivors[big_key] == small[sk], how="inner")
