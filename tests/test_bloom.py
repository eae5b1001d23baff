"""Bloom membership gate: the zero-false-negative contract, the bounded
false-positive rate, bitmap compactness, and determinism across
partitionings."""

from pyspark.sql import functions as F

from covid19_spark.operators.bloom import bloom_build, bloom_might_contain


def _keys(spark, lo, hi, parts=4):
    return spark.range(lo, hi).repartition(parts).select(
        F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    indexed = _keys(spark, 0, 2000)
    bloom = bloom_build(indexed, "key", m_bits=1 << 15, k=7)
    flagged = bloom_might_contain(indexed, bloom, "key", m_bits=1 << 15, k=7)
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate_within_bound(spark):
    import math

    n, m, k = 2000, 1 << 15, 7
    bloom = bloom_build(_keys(spark, 0, n), "key", m_bits=m, k=k)
    outsiders = _keys(spark, 100_000, 110_000)
    fp = bloom_might_contain(outsiders, bloom, "key", m_bits=m, k=k).filter(
        F.col("might_contain")
    ).count()
    theory = (1 - math.exp(-k * n / m)) ** k
    # 3x headroom over the Bloom 1970 estimate (hash family is not the
    # idealized independent-uniform one)
    assert fp / 10_000 <= 3 * max(theory, 1e-4), (fp, theory)


def test_bitmap_is_contract_bounded(spark):
    m = 1 << 12
    bloom = bloom_build(_keys(spark, 0, 50_000), "key", m_bits=m, k=5)
    assert bloom.count() <= m // 64  # words only, regardless of corpus size


def test_deterministic_across_partitionings(spark):
    a = bloom_build(_keys(spark, 0, 500, parts=1), "key", m_bits=1 << 14)
    b = bloom_build(_keys(spark, 0, 500, parts=13), "key", m_bits=1 << 14)
    ra = {r.word: r.bits for r in a.collect()}
    rb = {r.word: r.bits for r in b.collect()}
    assert ra == rb


def test_probe_misses_empty_words(spark):
    """A candidate probing a word absent from the bitmap frame must read
    as bit-not-set (left join null path), not null-poison the AND."""
    bloom = bloom_build(_keys(spark, 0, 4), "key", m_bits=1 << 20, k=7)
    out = bloom_might_contain(
        _keys(spark, 1_000_000, 1_000_050), bloom, "key", m_bits=1 << 20, k=7
    )
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.might_contain is False for r in rows)  # sparse bitmap, no FPs here


def test_inline_probe_matches_join_probe(spark):
    from covid19_spark.operators.bloom import (
        bloom_bitmap_words,
        bloom_might_contain_inline,
    )

    m, k = 1 << 14, 5
    indexed = _keys(spark, 0, 1500)
    bloom = bloom_build(indexed, "key", m_bits=m, k=k)
    words = bloom_bitmap_words(bloom, m)
    assert len(words) == m // 64
    cands = _keys(spark, 0, 3000)
    a = {r.key: r.might_contain for r in bloom_might_contain(cands, bloom, "key", m_bits=m, k=k).collect()}
    b = {r.key: r.might_contain for r in bloom_might_contain_inline(cands, words, "key", m_bits=m, k=k).collect()}
    assert a == b
    assert all(b[f"doc:{i}"] for i in range(1500))  # no false negatives


def test_inline_probe_plan_is_map_only(spark):
    from covid19_spark.operators.bloom import (
        bloom_bitmap_words,
        bloom_might_contain_inline,
    )

    m = 1 << 12
    bloom = bloom_build(_keys(spark, 0, 100), "key", m_bits=m, k=3)
    words = bloom_bitmap_words(bloom, m)
    out = bloom_might_contain_inline(_keys(spark, 0, 200), words, "key", m_bits=m, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan.replace(
        "Exchange RoundRobin", ""
    ), plan  # repartition from _keys is the only allowed exchange


def test_inline_probe_handles_awkward_column_names(spark):
    """ADVICE r10: the probe mask is built with the Column API (no SQL
    string interpolation), so a key column whose name needs backticks in
    SQL (space, hyphen) binds correctly and matches the join path."""
    from covid19_spark.operators.bloom import (
        bloom_bitmap_words,
        bloom_might_contain_inline,
    )

    m, k = 1 << 13, 4
    indexed = _keys(spark, 0, 500)
    bloom = bloom_build(indexed, "key", m_bits=m, k=k)
    words = bloom_bitmap_words(bloom, m)
    cands = _keys(spark, 0, 1000).withColumnRenamed("key", "doc key-1")
    got = {
        r["doc key-1"]: r.might_contain
        for r in bloom_might_contain_inline(
            cands, words, "doc key-1", m_bits=m, k=k
        ).collect()
    }
    ref = {
        r.key: r.might_contain
        for r in bloom_might_contain(
            _keys(spark, 0, 1000), bloom, "key", m_bits=m, k=k
        ).collect()
    }
    assert {k_: v for k_, v in got.items()} == ref
    assert all(got[f"doc:{i}"] for i in range(500))
