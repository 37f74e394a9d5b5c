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
   the registry query (``bloom_prefilter_supplier_revenue`` in
   ``queries.py``) carries a FULL value oracle — the plain SQL join —
   despite the approximate filter inside.

Saturation guard: the bitmap row records its set-bit count; a fill
fraction beyond 50% means false-positive rates ≥ (1/2)^k and a
prefilter that no longer pays for its own scan — the probe raises
loudly (the drift-family contract) instead of silently degrading.

Key-type contract: ``xxhash64`` hashes the BYTES of its input, so the
same numeric value at two widths hashes differently (int 5 ≠ bigint 5)
— a build/probe type mismatch would silently drop matching rows, the
one failure mode a bloom prefilter must never have.
:func:`bloom_prefilter_join` therefore widens both keys to a common
numeric type before building and probing (wider integral for two
integrals; double when either side is fractional — Spark's own
comparison coercion never considers values equal that differ after
this widening), and refuses loudly for non-widenable mixes (e.g.
string vs numeric: equality there passes through engine-version-
dependent coercion, so the caller must cast explicitly). The bitmap
row records the build key's type and :func:`bloom_semi_prefilter`
re-checks it against the probe column at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Integral widening ladder; any fractional participant widens to double
# (Spark's binary-comparison coercion for integral-vs-fractional also
# goes through double, so values the JOIN treats as equal stay equal —
# and therefore hash identically — after this cast).
_INTEGRALS = ("tinyint", "smallint", "int", "bigint")
_FRACTIONALS = ("float", "double")


def _common_key_type(big_t: str, small_t: str) -> str:
    """Spark simpleString of the type both keys are cast to before
    hashing. Identical types pass through; numeric mixes widen; anything
    else raises (the caller must align the types explicitly rather than
    inherit silent false negatives)."""
    if big_t == small_t:
        return big_t
    if big_t in _FRACTIONALS or small_t in _FRACTIONALS:
        if (big_t in _INTEGRALS + _FRACTIONALS
                and small_t in _INTEGRALS + _FRACTIONALS):
            return "double"
    if big_t in _INTEGRALS and small_t in _INTEGRALS:
        return _INTEGRALS[max(_INTEGRALS.index(big_t), _INTEGRALS.index(small_t))]
    raise ValueError(
        f"bloom prefilter keys have non-widenable types ({big_t} vs "
        f"{small_t}): xxhash64 is byte-sensitive, so a type mismatch "
        "silently drops matching rows. Cast both keys to one type first."
    )


def _positions(key: Column, m_bits: int, k_hashes: int) -> "list[Column]":
    # xxhash64(key, seed_i): k independent positions in [0, m). Build and
    # probe share THIS function, so a small-side key can never probe an
    # unset bit (no false negatives) — PROVIDED the key types match;
    # xxhash64 hashes bytes, and int 5 / bigint 5 are different bytes
    # (bloom_prefilter_join widens both sides; bloom_bitmap records its
    # build type and the probe re-checks it).
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
    anyway). The build key's resolved type rides along as ``key_type``
    so the probe can refuse a byte-incompatible key (see module
    docstring)."""
    _validate(m_bits, k_hashes)
    c = F.col(key) if isinstance(key, str) else key
    key_type = small.select(c.alias("_k")).schema[0].dataType.simpleString()
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
        F.lit(key_type).alias("key_type"),
    )


def bloom_semi_prefilter(
    big: DataFrame,
    key: "str | Column",
    bitmap: DataFrame,
    max_fill: float = 0.5,
    meta=None,
) -> DataFrame:
    """Keep big-side rows whose key MIGHT be in the bitmap — a strict
    superset of the exact left-semi join, computed entirely map-side:
    the bitmap row broadcasts (one-row crossJoin, the repo's scalar
    pattern) and each probe is ``bit_get`` on a map-looked-up word. No
    shuffle of ``big`` anywhere.

    The bitmap row is read driver-side once (index-meta class — the
    probe expressions need m/k at plan time); a fill fraction beyond
    ``max_fill`` raises: at ≥50% fill the filter passes ≥ (1/2)^k of
    EVERYTHING and no longer pays for itself. A probe key whose resolved
    type differs from the recorded build ``key_type`` also raises —
    xxhash64 is byte-sensitive, so the mismatch would silently drop
    matching rows (false negatives, the one forbidden failure mode).
    ``meta`` lets a caller that already fetched the one-row bitmap pass
    it in, so the small-side aggregation runs exactly once."""
    if meta is None:
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
    probe_type = big.select(c.alias("_k")).schema[0].dataType.simpleString()
    if meta["key_type"] is not None and probe_type != meta["key_type"]:
        raise ValueError(
            f"bloom probe key type {probe_type} != build key type "
            f"{meta['key_type']}: xxhash64 hashes bytes, so this mismatch "
            "would produce false negatives. Cast both keys to one type "
            "(bloom_prefilter_join widens automatically)."
        )
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
    is the cost.

    Both keys are widened to their common numeric type before hashing
    (see module docstring): int-keyed ``small`` against bigint-keyed
    ``big`` must probe the same bytes it built, or equal keys hash
    apart and matching rows vanish. Non-widenable type mixes raise."""
    sk = small_key or big_key
    big_t = big.select(F.col(big_key).alias("_k")).schema[0].dataType.simpleString()
    small_t = small.select(F.col(sk).alias("_k")).schema[0].dataType.simpleString()
    ct = _common_key_type(big_t, small_t)
    bitmap = bloom_bitmap(
        small, F.col(sk).cast(ct), m_bits=m_bits, k_hashes=k_hashes
    )
    # fetch the one-row bitmap ONCE: the empty check and the probe
    # expressions share it (the docstring's one-small-side-pass promise)
    meta = bitmap.first()
    if int(meta["n_set_bits"]) == 0:
        # Empty (or all-null-keyed) small side: the exact inner join is
        # empty by definition — return it with the join's schema instead
        # of probing an empty bitmap (which bloom_semi_prefilter refuses,
        # correctly, for DIRECT semi-filter use where an empty result
        # more likely means the caller built the bitmap off the wrong
        # frame).
        if sk == big_key:
            return big.limit(0).join(small, on=big_key, how="inner")
        return big.limit(0).join(small, big[big_key] == small[sk], how="inner")
    survivors = bloom_semi_prefilter(
        big, F.col(big_key).cast(ct), bitmap, meta=meta
    )
    if sk == big_key:
        return survivors.join(small, on=big_key, how="inner")
    return survivors.join(small, survivors[big_key] == small[sk], how="inner")
