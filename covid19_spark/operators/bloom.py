"""Distributed Bloom-filter membership gate — the 100 TB pre-filter.

The classic use in a training-data pipeline is decontamination at ingest:
fingerprint the holdout/benchmark corpus ONCE into a Bloom filter (MBs for
hundreds of millions of keys), broadcast it, and gate every incoming
document map-only — no join against the full holdout set per batch. Same
role as Chromium's safe-browsing prefilter or a Kafka-connect dedup gate:
zero false NEGATIVES (nothing contaminated slips through), bounded false
positives (a small over-drop, tunable via bits-per-key).

Spark-first construction, no UDFs anywhere:

- build: each key expands to ``k`` positions ``pmod(xxhash64(key, seed_i),
  m)``; positions reduce to a ``(word, bits)`` frame via the ``bit_or``
  aggregate over 64-bit masks — ONE map + one bounded exchange (≤ m/64
  rows regardless of corpus size; m is fixed by contract, so the filter
  frame is broadcast-sized BY CONSTRUCTION, the same contract class as the
  BPE vocabulary cap).
- probe: candidates expand to the same ``k`` positions, broadcast-join the
  filter frame on word index, and a per-candidate ``min(hit)`` aggregate
  ANDs the ``k`` lookups. Map + broadcast join + one keyed agg — the probe
  never shuffles the filter, and the candidate exchange carries one bit
  per (candidate, seed).

The theoretical false-positive rate is ``(1 - e^{-k·n/m})^k`` (Bloom 1970,
CACM 13(7)); ``bits_per_key=10, k=7`` ≈ 0.8 %. Determinism: xxhash64 with
fixed seeds over fixed input — same filter, same flags, on any cluster
size (fixture-pinned in the registry query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, m_bits: int, k: int, seed_base: int):
    """Array of the ``k`` bit positions of a key column (xxhash64 family,
    seeds ``seed_base .. seed_base+k-1``)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(seed_base + i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    seed_base: int = 41,
) -> DataFrame:
    """``(word, bits)`` Bloom bitmap of ``df[key_col]``: word = position
    div 64 (long), bits = OR of the 64-bit masks landing in that word.
    At most ``m_bits/64`` rows — broadcastable at any corpus size."""
    pos = F.explode(_positions(F.col(key_col), m_bits, k, seed_base)).alias("__pos")
    return (
        df.select(pos)
        .select(
            (F.col("__pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__mask)").alias("bits"))
    )


def bloom_might_contain(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    seed_base: int = 41,
) -> DataFrame:
    """``candidates`` + a ``might_contain`` boolean: true iff ALL ``k``
    probe bits are set. Guarantees: no false negatives (an indexed key
    always probes true); false positives at the Bloom rate.

    Plan: candidate → k probe rows → broadcast hash join on word →
    per-candidate ``min(hit)``. The filter side never exceeds ``m_bits/64``
    rows; the only exchange on the candidate side is the k-row fold back
    to one row per candidate."""
    probe = candidates.select(
        F.col(key_col).alias("__key"),
        F.posexplode(_positions(F.col(key_col), m_bits, k, seed_base)).alias(
            "__i", "__pos"
        ),
    ).select(
        "__key",
        "__i",
        (F.col("__pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__mask"),
    )
    hits = (
        probe.join(F.broadcast(bloom), "word", "left")
        .select(
            "__key",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__mask")) != 0).alias(
                "__hit"
            ),
        )
        .groupBy("__key")
        .agg(F.min("__hit").alias("might_contain"))
    )
    return candidates.join(
        hits.withColumnRenamed("__key", key_col), key_col, "left"
    ).fillna({"might_contain": False})


def bloom_bitmap_words(bloom: DataFrame, m_bits: int) -> list[int]:
    """Dense ``m_bits/64``-long word list of a built bitmap — a SANCTIONED
    driver collect: the frame is ≤ m_bits/64 rows BY CONSTRUCTION (the
    contract-small class; 2^18 bits → 4096 longs → KBs), independent of
    corpus size. This is how a production gate ships the filter: the
    bitmap bytes ride the task closure / broadcast, not a join."""
    words = [0] * (m_bits // 64)
    for r in bloom.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_might_contain_inline(
    candidates: DataFrame,
    bitmap_words: list[int],
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    seed_base: int = 41,
) -> DataFrame:
    """Map-ONLY Bloom probe: the bitmap rides as an ``array<long>`` literal
    and each candidate ANDs its ``k`` bit lookups in one expression — zero
    joins, zero exchanges, the true 100 TB ingest-gate shape for bitmaps
    small enough to inline (≲ 2^24 bits; above that use the broadcast-join
    ``bloom_might_contain``). Identical verdicts to the join path (pinned
    by test)."""
    lit_words = F.array(*[F.lit(w).cast("long") for w in bitmap_words])
    key = F.col(key_col)
    checks = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(seed_base + i)), F.lit(m_bits))
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        # Column-API bit probe reusing the SAME `pos` column as the word
        # index — an F.expr SQL fragment here would re-interpolate key_col
        # raw, and a name needing backticks (space/hyphen/reserved word)
        # would fail to parse or bind a different column than the word
        # lookup.  bit_get accepts a Column position (shiftleft does not).
        checks.append(
            F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1
        )
    verdict = checks[0]
    for c in checks[1:]:
        verdict = verdict & c
    return candidates.withColumn("might_contain", verdict)
