"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point — 100 TB corpora can't do O(n²) anything):
- **exact**: hash-groupBy on md5(text) — one shuffle keyed by digest, skew-free
  (digests are uniform).
- **ngram Jaccard**: exact pairwise similarity *within blocking keys only*
  (caller supplies blocks); used as the verify stage after candidate
  generation, never as the discovery stage.
- **MinHash+LSH**: shingle → k minhashes → b bands; docs sharing a band
  bucket become candidate pairs. Cost is O(n·k) + band self-joins on bucket
  hashes; collision probability follows the classic (1-(1-j^r)^b) S-curve
  (Broder 1997, "On the resemblance and containment of documents"; banding
  per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).
- **SimHash**: 64-bit weighted-majority signature (Charikar 2002 similarity
  estimation); candidates share one of four 16-bit sub-bands, the
  pigeonhole band-probe of Manku/Jain/Sarma 2007 (near-dup detection for
  web crawling).

All built on built-in expressions (xxhash64, higher-order array functions) —
no Python UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from covid19_spark.operators.text import word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct text: canonical (min) id, duplicate count, digest."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    n: int = 2,
    threshold: float = 0.05,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Exact Jaccard over distinct word n-gram shingles for same-block pairs.

    The block join bounds the candidate space; at scale ``block_cols`` is an
    LSH bucket or a cheap partition key (language, length band). Empty
    ``block_cols`` is REFUSED — unblocked pairwise Jaccard is the O(n²)
    discovery stage this operator exists to avoid (use MinHash+LSH for
    discovery, this for verification).

    ``max_block`` drops blocks larger than the cap before the self-join
    (same broadcast anti-join guard as ``lsh_candidate_pairs``): a block of
    size B yields B² pairs, so one degenerate block key turns the verify
    stage quadratic. Pass ``None`` to disable (e.g. for pre-capped LSH
    buckets).
    """
    block_cols = list(block_cols)
    if not block_cols:
        raise ValueError(
            "ngram_jaccard_pairs requires non-empty block_cols: unblocked "
            "pairwise Jaccard is O(n^2); generate candidates with LSH first"
        )
    # Hash-partition by the block key BEFORE shingling: the pairwise
    # verify work downstream otherwise inherits the INPUT partitioning —
    # a small/few-file source pins the whole O(B²)-per-block stage (and
    # the tokenize) to 1-2 scan tasks (measured: the entire same-block
    # join of fuzzy_name_match ran in ONE task off a single parquet
    # split).  Same rationale as shingle_frame; the guard aggregate and
    # the self-join probe side reuse this exchange.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(n_parts, *block_cols).select(
        F.col(id_col), *[F.col(c) for c in block_cols], word_shingles(F.col(text_col), n).alias("sh")
    )
    if max_block is not None:
        oversized = (
            sh.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") > max_block)
            .select(*block_cols)
        )
        sh = sh.join(F.broadcast(oversized), block_cols, "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    n: int = 2,
    threshold: float = 0.5,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Directional Jaccard CONTAINMENT ``|A∩B| / |A|`` over distinct word
    n-gram shingles for same-block pairs — the asymmetric companion of
    ``ngram_jaccard_pairs`` (Broder 1997 distinguishes *containment* from
    *resemblance*): a short document quoted whole inside a long one scores
    containment ≈ 1 while resemblance stays low (the union dilutes it) —
    exactly the partial-duplication pairs (excerpts, quotations, boilerplate
    inclusion) a resemblance threshold misses.

    Same blocked-verify contract as the resemblance operator: empty
    ``block_cols`` refused, oversized blocks dropped via the broadcast
    anti-join guard, pairwise work only inside blocks. Emits pairs where
    ``max(containment_a_in_b, containment_b_in_a) >= threshold``, with both
    directions reported.
    """
    block_cols = list(block_cols)
    if not block_cols:
        raise ValueError(
            "containment_pairs requires non-empty block_cols: unblocked "
            "pairwise containment is O(n^2); generate candidates with LSH first"
        )
    # Same block-key repartition as ngram_jaccard_pairs — the O(B²)
    # verify stage must not inherit a 1-2-split input partitioning.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(n_parts, *block_cols).select(
        F.col(id_col), *[F.col(c) for c in block_cols], word_shingles(F.col(text_col), n).alias("sh")
    )
    if max_block is not None:
        oversized = (
            sh.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") > max_block)
            .select(*block_cols)
        )
        sh = sh.join(F.broadcast(oversized), block_cols, "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            (inter / F.size(F.col("a.sh"))).alias("containment_a_in_b"),
            (inter / F.size(F.col("b.sh"))).alias("containment_b_in_a"),
        )
        .filter(
            F.greatest(F.col("containment_a_in_b"), F.col("containment_b_in_a"))
            >= threshold
        )
    )


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    value_col: str,
    block_cols: Sequence[str],
    max_distance: int = 2,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Fuzzy-match (entity-resolution) pairs: same-block rows whose
    ``value_col`` strings are within ``max_distance`` Levenshtein edits.

    The ER companion to ``ngram_jaccard_pairs`` with the SAME blocked-verify
    contract: empty ``block_cols`` is refused (unblocked pairwise edit
    distance is the O(n²) trap), oversized blocks are dropped via the
    broadcast anti-join guard, and pairwise work only runs inside blocks.
    ``levenshtein`` is a JVM built-in (codegen, no Python), and Spark's
    three-arg form ``levenshtein(a, b, threshold)`` early-exits the DP once
    the running distance exceeds the threshold — O(k·min(len)) per pair
    instead of O(len²).
    """
    block_cols = list(block_cols)
    if not block_cols:
        raise ValueError(
            "blocked_edit_distance_pairs requires non-empty block_cols: "
            "unblocked pairwise edit distance is O(n^2); block on a cheap "
            "key (phonetic code, sorted-token prefix, LSH bucket) first"
        )
    # Block-key repartition (see ngram_jaccard_pairs): the same-block
    # pair join + Levenshtein otherwise run in the input's scan tasks —
    # one small parquet split = one task doing every comparison.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    rows = df.repartition(n_parts, *block_cols).select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.col(value_col)
    )
    if max_block is not None:
        oversized = (
            rows.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") > max_block)
            .select(*block_cols)
        )
        rows = rows.join(F.broadcast(oversized), block_cols, "left_anti")
    a = rows.alias("a")
    b = rows.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    dist = F.levenshtein(
        F.col(f"a.{value_col}"), F.col(f"b.{value_col}"), max_distance
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            dist.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )


def shingle_frame(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """``(id_col, __sh)`` — each document's distinct word-shingle array.

    The SINGLE tokenize+shingle pass the dedup pipelines share: signatures
    (``minhash_signatures_from_shingles``) and the exact-Jaccard verify stage
    both derive from this frame, so the corpus text is scanned and shingled
    exactly once per pipeline (persist the result when more than one consumer
    will evaluate it — Spark plans are trees, and an unmaterialized common
    subframe is recomputed per branch).

    The input is repartitioned by ``id_col`` BEFORE the shingle expression:
    the tokenize+shingle work is the pipeline's dominant CPU, and when this
    frame is persisted the cache build materializes in the INPUT partitioning
    — a small/few-file source would pin the whole pass (and the cached
    frame's layout) to 1-2 scan partitions (measured 2-3x pipeline
    wall-clock on local[32]). Hash-partitioning by id also pre-aligns the
    downstream signature aggregation and verify joins.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, id_col).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh")
    )


def minhash_signatures_from_shingles(
    sh_df: DataFrame,
    id_col: str,
    shingle_col: str = "__sh",
    num_hashes: int = 32,
    repartition_input: bool = False,
) -> DataFrame:
    """id → array of ``num_hashes`` minhash values, from a precomputed
    shingle-array frame (``shingle_frame``).

    Single pass: explode shingles, hash each shingle STRING once
    (``xxhash64(sh)``), then derive the k permutations by re-hashing the
    8-byte value with per-permutation seeds — k×8-byte hashes instead of
    k×full-string hashes, the dominant CPU of the signature pass (the
    string hash is materialized as its own column so it is computed exactly
    once per shingle, not relying on codegen subexpression elimination).
    Map-side combine keeps the shuffle at |docs|·k longs.

    The input is NOT repartitioned by default: the documented contract is
    that it comes from ``shingle_frame``, which already hash-partitions by
    ``id_col`` before the (usually persisted) shingle expression — and a
    second ``repartition`` here cannot be collapsed with that one across a
    persist() boundary, so every consumer of the cache would pay a full
    extra Exchange of the heavy shingle arrays (measured: dedup_pipeline_e2e
    7.5 s → 23.8 s in the r04 driver bench). Pass
    ``repartition_input=True`` only when the shingle frame arrives with
    unknown partitioning (e.g. read back from parquet) AND is skew-prone or
    pinned to too few scan partitions.

    Docs with an empty shingle array (< n tokens) get no signature row —
    identical to the direct-from-text path (explode drops empty arrays).
    """
    sh = sh_df
    if repartition_input:
        n_parts = sh_df.sparkSession.sparkContext.defaultParallelism
        sh = sh_df.repartition(n_parts, id_col)
    sh = sh.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("sh"))
    hashed = sh.select(id_col, F.xxhash64(F.col("sh")).alias("h0"))
    # SQL-text construction (one parse per agg instead of ~4 py4j
    # round-trips each — see similarity._E): same min(xxhash64(h0, i))
    # aggregates, bit-identical signatures
    mins = [
        F.expr(f"min(xxhash64(h0, {i}))").alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = hashed.groupBy(id_col).agg(*mins)
    arr = ", ".join(f"h{i}" for i in range(num_hashes))
    return sig.select(F.col(id_col), F.expr(f"array({arr})").alias("sig"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """id → array of ``num_hashes`` minhash values over word shingles.

    Thin wrapper: ``shingle_frame`` → ``minhash_signatures_from_shingles``.
    Pipelines that ALSO need the shingle arrays (verify stages) should build
    the shingle frame themselves, persist it, and call the ``_from_shingles``
    variant so the text is shingled once, not twice.
    """
    return minhash_signatures_from_shingles(
        shingle_frame(df, id_col, text_col, shingle_n), id_col, "__sh", num_hashes
    )


def band_buckets(
    sig_df: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Banded LSH bucket keys for a signature frame: (id, band, bucket) —
    one row per band, ``bucket = xxhash64`` of the band's signature slice.
    Map-only; the shared candidate-keying step of both the batch self-join
    (``lsh_candidate_pairs``) and the streaming history probe
    (``streaming/dedup_lsh_stream``)."""
    rows_per_band = num_hashes // bands
    # SQL-text construction (one parse instead of ~8 py4j round-trips per
    # band struct): same per-band xxhash64 over the same element_at slots
    band_structs = F.expr(
        "array("
        + ", ".join(
            f"named_struct('band', {bi}, 'bucket', xxhash64("
            + ", ".join(
                f"element_at(sig, {bi * rows_per_band + j + 1})"
                for j in range(rows_per_band)
            )
            + "))"
            for bi in range(bands)
        )
        + ")"
    )
    return sig_df.select(id_col, F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Band the signatures and self-join on (band, bucket-hash).

    Returns distinct candidate (doc_a, doc_b) pairs with the fraction of
    agreeing minhashes as ``est_jaccard`` (unbiased Jaccard estimator).

    ``max_bucket`` drops degenerate buckets (e.g. empty/boilerplate
    documents all hashing identically) before the self-join — a bucket of
    size B produces B² candidate pairs, so one pathological bucket turns the
    join quadratic. Dropped buckets are precisely giant duplicate clusters;
    at scale those are handled by exact-hash dedup first, then sampled.
    Pass ``None`` to disable; pass ``dropped_report=[]`` to receive a
    ``(band, bucket, bucket_size)`` frame of what the guard removed (see
    ``drop_oversized_buckets``).
    """
    pairs = lsh_candidate_pair_ids(
        sig_df, id_col, num_hashes, bands, max_bucket, dropped_report
    )
    sig_a = sig_df.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sig_df.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    scored = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return scored.select(
        "doc_a", "doc_b", (agree / F.lit(num_hashes)).alias("est_jaccard")
    )


def lsh_candidate_pair_ids(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Distinct candidate ``(doc_a, doc_b)`` id pairs from the banded
    self-join — WITHOUT the per-pair signature re-joins that score
    ``est_jaccard``.  Callers that verify candidates with exact Jaccard
    anyway (``lsh_dedup_pipeline``) must use this form: the two
    |pairs| ⋈ signatures joins are inner joins the optimizer cannot prune
    even when the estimator column is dropped, so requesting the scored
    frame and discarding the score still paid both joins.

    The band self-join carries ONLY (id, band, bucket) — thin fixed-width
    rows; one pathological bucket is removed by the ``max_bucket`` guard
    before the join (see ``lsh_candidate_pairs``).
    """
    banded = band_buckets(sig_df, id_col, num_hashes, bands)
    banded = drop_oversized_buckets(
        banded, ["band", "bucket"], max_bucket, dropped_report
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 2) -> DataFrame:
    """64-bit SimHash per doc: majority vote over shingle hash bits.

    Computed distributed: explode shingles → per-bit ±1 votes via bit tests →
    sum per doc → sign → reassemble bits. One shuffle keyed by doc id.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(n_parts, id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    def bit_mask(bit: int) -> int:
        # bit 63 must be the sign bit in a signed 64-bit literal
        return (1 << bit) if bit < 63 else -(1 << 63)

    # SQL-text construction (the 64 vote aggregates + 64-term OR chain were
    # ~8,000 py4j round-trips ≈ 1.9 s of pure plan building per call — see
    # similarity._E): same CASE/±1 sums over the same masks, bit-identical
    votes = [
        F.expr(
            f"sum(CASE WHEN (xxhash64(sh) & {bit_mask(bit)}) != 0 THEN 1 ELSE -1 END)"
        ).alias(f"b{bit}")
        for bit in range(64)
    ]
    per_doc = sh.groupBy(id_col).agg(*votes)
    or_chain = " | ".join(
        f"(CASE WHEN b{bit} > 0 THEN {bit_mask(bit)} ELSE 0 END)" for bit in range(64)
    )
    return per_doc.select(
        F.col(id_col), F.expr(f"CAST(({or_chain}) AS BIGINT)").alias("simhash")
    )


def hamming_band_keys(col: str) -> "F.Column":
    """ARRAY<STRUCT<band INT, key INT>> of the four 16-bit sub-bands of a
    signed 64-bit hash column — the ONE candidate-keying expression every
    banded Hamming probe shares (SimHash text, dHash image, audio
    fingerprint, per-frame video). Pigeonhole guarantee: a pair within
    Hamming 3 always shares at least one exact sub-band; greater distances
    are recalled probabilistically."""
    return F.expr(
        "array("
        + ", ".join(
            f"named_struct('band', {i}, "
            f"'key', shiftrightunsigned(`{col}`, {i * 16}) & 65535)"
            for i in range(4)
        )
        + ")"
    )


def oversized_bucket_report(
    banded: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """``(key_cols..., bucket_size)`` for every bucket the guard would drop —
    the observable companion of ``drop_oversized_buckets`` (VERDICT r06 task
    #3: the anti-join used to be silent, so a degenerate 100 TB corpus —
    boilerplate, silence, black frames — could lose near-dup recall with no
    signal). Same groupBy the guard itself broadcasts, so evaluating the
    report costs one aggregation over the banded frame; at scale that frame
    should be cached by the caller when both paths are consumed."""
    return (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def drop_oversized_buckets(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket: int | None,
    dropped_report: list | None = None,
) -> DataFrame:
    """Anti-join away bucket keys whose group exceeds ``max_bucket`` rows —
    the shared skew guard of every banded self-join (MinHash bucket join,
    SimHash/dHash/audio/video Hamming probes). A bucket of size B yields B²
    candidate pairs, so ONE degenerate key (boilerplate text, black/constant
    frames, digital silence — all hash identically) turns the probe
    quadratic. Oversized keys are rare by construction → the offender list
    is tiny, so a broadcast anti-join beats a window count (which would add
    a full shuffle+sort over every banded row). Dropped buckets are exactly
    giant duplicate clusters; at scale those are handled by exact-hash dedup
    first. ``None`` disables the guard.

    Observability: pass ``dropped_report=[]`` and the function appends a
    ``(key_cols..., bucket_size)`` DataFrame of the buckets it dropped, so
    callers can count/log the recall surface the guard removed instead of
    losing it silently (lazy — evaluating it re-aggregates the banded
    frame)."""
    if max_bucket is None:
        if dropped_report is not None:
            dropped_report.append(
                banded.select(*key_cols).limit(0).withColumn(
                    "bucket_size", F.lit(0).cast("long")
                )
            )
        return banded
    oversized = oversized_bucket_report(banded, key_cols, max_bucket)
    if dropped_report is not None:
        dropped_report.append(oversized)
    return banded.join(
        F.broadcast(oversized.select(*key_cols)), key_cols, "left_anti"
    )


def simhash_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Near-dup candidates: pairs sharing ≥1 of four 16-bit sub-bands, kept if
    Hamming distance ≤ ``max_hamming`` (``bit_count(a XOR b)``).

    ``max_bucket`` drops degenerate (band, key) groups before the self-join
    (see ``drop_oversized_buckets``) — without it, media corpora with many
    constant inputs (black frames, silence) would make one sub-band bucket
    hold a large corpus fraction and the probe quadratic within it. Pass
    ``dropped_report=[]`` to receive a ``(band, key, bucket_size)`` frame of
    the dropped groups instead of losing them silently."""
    bands = hamming_band_keys("simhash")
    banded = sig_df.select(id_col, "simhash", F.explode(bands).alias("bb")).select(
        id_col, "simhash", "bb.band", "bb.key"
    )
    banded = drop_oversized_buckets(banded, ["band", "key"], max_bucket, dropped_report)
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """MinHash-LSH discovery → exact-Jaccard verification: the shared
    pre-clustering stage of ``lsh_dedup_pipeline``, exposed so its plan can
    be audited end-to-end (the pipeline's own plan is truncated by the
    connected-components checkpoints).

    ``materialize=True`` evaluates the pairs eagerly (localCheckpoint) and
    releases the internal shingle/signature caches — use it when calling
    repeatedly in one session; the lazy default keeps the caches alive
    until the result is consumed (a lazy frame cannot outlive what it
    reads).

    One shingle pass: ``shingle_frame`` is persisted and feeds BOTH the
    signature derivation and the two verify-join sides, so the plan contains
    zero uncached shingle computations — every shingle expression sits under
    an ``InMemoryTableScan`` (pinned by ``test_plans.py``).

    Output: verified pairs ``(doc_a, doc_b, jaccard)`` with jaccard ≥
    ``threshold``.
    """
    verified, caches = _lsh_verified_pairs_with_handle(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket
    )
    if materialize:
        verified = verified.localCheckpoint(eager=True)
        for c in caches:
            c.unpersist()
    return verified


def lsh_verified_pairs_releasable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
) -> "tuple[DataFrame, Callable[[], None]]":
    """Lazy ``lsh_verified_pairs`` WITH a cache-release handle: returns
    ``(pairs, release)`` where ``release()`` unpersists the internal
    shingle/signature caches. The plain lazy API keeps those caches alive
    with no public handle (a lazy result cannot outlive what it reads), so
    repeated lazy calls in one session accumulate unreleasable cached
    frames (r05 advisory). Call ``release()`` after the pairs frame has
    been consumed (collected/written) — consuming it afterwards recomputes
    from scratch, still correct but paying the shingle pass again."""
    verified, caches = _lsh_verified_pairs_with_handle(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket
    )

    def release() -> None:
        for c in caches:
            c.unpersist()

    return verified, release


def _lsh_verified_pairs_with_handle(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """(verified pairs, persisted-frame handles) — the handles let a caller
    that evaluates the pairs eagerly unpersist the caches."""
    sh = shingle_frame(df, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # The signature frame is consumed FOUR times downstream (both sides of
    # the band self-join + the two per-pair sig re-joins); uncached, the
    # explode + k-hash aggregation would run once per consumer. It is thin
    # (|docs| rows of k longs) — persist it too.
    sigs = minhash_signatures_from_shingles(sh, id_col, "__sh", num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # id pairs only — the exact-Jaccard verify below supersedes the
    # est_jaccard estimator, so the scored form's two signature re-joins
    # would be pure waste (see lsh_candidate_pair_ids)
    cands = lsh_candidate_pair_ids(
        sigs, id_col, num_hashes, bands, max_bucket, dropped_report
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    verified = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"), union.alias("__u"))
        .filter((F.col("__u") > 0) & (F.col("jaccard") >= threshold))
        .drop("__u")
    )
    return verified, [sh, sigs]


def lsh_dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
    cc_algorithm: str = "label",
    dropped_report: list | None = None,
) -> DataFrame:
    """End-to-end near-duplicate removal at corpus scale: MinHash-LSH
    discovery → exact n-gram-Jaccard verification of ONLY the candidate
    pairs → connected components → per-document cluster assignment.

    This is the composition SCALING.md promises (the reference's
    DeduplicationTransformer generalized from exact-key first-wins to
    similarity clusters): no stage is quadratic in the corpus —
      1. ``shingle_frame``: ONE tokenize+shingle scan of the corpus text,
         persisted (memory-and-disk) because three consumers read it —
         the signature pass and both sides of the verify join; without the
         persist Spark's tree-shaped plans would re-shingle the corpus per
         branch, doubling the most expensive pass at 100 TB;
      2. ``minhash_signatures_from_shingles``: O(n·k) map + one
         |docs|·k-long shuffle, derived from the cached shingle arrays;
      3. ``lsh_candidate_pairs``: banded self-join on THIN (id, band,
         bucket) rows with the degenerate-bucket cap;
      4. verify: candidate pairs (≪ corpus²) join the per-doc shingle
         arrays twice — each surviving pair is scored exactly ONCE. This
         beats re-blocking ``ngram_jaccard_pairs`` on (band, bucket): that
         would replicate every doc's (large) shingle array ``bands``×
         into the self-join shuffle and verify shared-in-many-buckets
         pairs repeatedly; here the heavy arrays ship once per side and
         the pair set is already distinct.
      5. ``dedup_clusters``: min-label propagation over the verified pair
         graph only.

    Output: one row per input document — (id_col, cluster_id,
    cluster_size, is_canonical); singletons keep their own id with
    cluster_size 1. Keep policy: smallest id per cluster.

    ``dropped_report=[]`` receives the (band, bucket, bucket_size) frame of
    buckets the degenerate-cap guard removed (see ``drop_oversized_buckets``)
    — evaluate it BEFORE long-running downstream work if cost matters: the
    pipeline releases its internal caches once clustering materializes, so
    a later evaluation recomputes the banding from source (correct, one
    extra scan).
    """
    verified, caches = _lsh_verified_pairs_with_handle(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket,
        dropped_report,
    )
    clusters = dedup_clusters(
        verified.select("doc_a", "doc_b"), algorithm=cc_algorithm
    )
    # Both CC variants eagerly localCheckpoint the edge frame at entry, so by
    # now the verify join has fully materialized and nothing downstream reads
    # the shingle/signature caches — release them instead of leaking them.
    for c in caches:
        c.unpersist()
    out = df.select(F.col(id_col)).join(
        clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    return out.select(
        F.col(id_col),
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        F.coalesce(F.col("is_canonical").cast("long"), F.lit(1)).alias("is_canonical"),
    )


def _screen_batch_against_index(
    batch: DataFrame,
    c_digests: DataFrame,  # (__th)
    c_buckets: DataFrame,  # (__cid, band, bucket)
    c_shingles: DataFrame,  # (__cid, __csh)
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    threshold: float,
    max_bucket: int | None,
    containment_threshold: float | None = None,
) -> DataFrame:
    """Shared core of the incremental screen: probe a new batch against a
    corpus index given as three frames (digest set, bucket index, shingle
    store) — inline-derived by ``incremental_dedup_against_corpus``, loaded
    from parquet by ``incremental_dedup_against_index``. Returns
    ``(screen result, [internal persisted frames])`` so the public wrappers
    can release the caches when asked to materialize.

    ``c_digests`` is deduplicated on ``__th`` before the probe join: the
    persisted-index path appends digests per batch and a REPLAYED append
    duplicates digest rows; without the distinct the left join would fan out
    one output row per duplicate digest instead of flagging once."""
    c_digests = c_digests.dropDuplicates(["__th"])
    b_base = batch.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__th")
    ).join(
        c_digests.withColumn("__exact", F.lit(1)), "__th", "left"
    ).select(
        F.col(id_col), F.coalesce("__exact", F.lit(0)).cast("long").alias("is_exact_dup")
    )

    cb = c_buckets
    if max_bucket is not None:
        oversized = (
            cb.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") > max_bucket)
            .select("band", "bucket")
        )
        cb = cb.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
    # ONE shingle pass over the batch text, persisted: the signature pass and
    # the verify join both read it (the batch side is small relative to the
    # corpus, but the no-double-scan contract is the same as the e2e pipeline).
    b_shingles = shingle_frame(batch, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    b_sig = minhash_signatures_from_shingles(b_shingles, id_col, "__sh", num_hashes)
    bb = band_buckets(b_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__bid"), "band", "bucket"
    )
    cands = bb.join(cb, ["band", "bucket"]).select("__bid", "__cid").distinct()

    b_sh = b_shingles.select(
        F.col(id_col).alias("__bid"), F.col("__sh").alias("__bsh")
    )
    inter = F.size(F.array_intersect("__bsh", "__csh"))
    union = F.size(F.array_union("__bsh", "__csh"))
    scored = (
        cands.join(b_sh, "__bid")
        .join(c_shingles, "__cid")
        .select(
            "__bid",
            "__cid",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("__j"),
            F.when(F.size("__bsh") > 0, inter / F.size("__bsh"))
            .otherwise(F.lit(0.0))
            .alias("__c"),
        )
    )
    # Aggregate ONLY over verified pairs: candidate-set membership below the
    # threshold is an LSH implementation detail a SQL oracle cannot reproduce,
    # but the ≥-threshold pair set is deterministic (recall ≈ 1 at this
    # banding for the j ≥ 0.9 dups real corpora plant). A pair verifies on
    # Jaccard ≥ threshold, or — when ``containment_threshold`` is set — on
    # containment |batch∩corpus|/|batch| ≥ containment_threshold, which
    # catches a new doc that is a near-subset of an existing one even when
    # symmetric Jaccard is low (the subset mode Jaccard alone misses).
    verify_cond = F.col("__j") >= threshold
    if containment_threshold is not None:
        verify_cond = verify_cond | (F.col("__c") >= containment_threshold)
    hits = (
        scored.filter(verify_cond)
        .groupBy("__bid")
        .agg(
            F.min("__cid").alias("__ndof"),
            F.max("__j").alias("best_jaccard"),
            F.max("__c").alias("best_containment"),
        )
    )
    out = b_base.join(hits, b_base[id_col] == hits["__bid"], "left").select(
        b_base[id_col],
        "is_exact_dup",
        F.coalesce("__ndof", F.lit(-1)).cast("long").alias("near_dup_of"),
        F.coalesce("best_jaccard", F.lit(0.0)).alias("best_jaccard"),
        F.coalesce("best_containment", F.lit(0.0)).alias("best_containment"),
        (
            (F.col("is_exact_dup") == 0) & F.coalesce("__ndof", F.lit(-1)).eqNullSafe(F.lit(-1))
        ).cast("long").alias("keep"),
    )
    return out, [b_shingles]


def incremental_dedup_against_corpus(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
    containment_threshold: float | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Batch twin of the streaming LSH dedup filter
    (``streaming/dedup_lsh_stream``): screen a NEW batch of documents against
    an EXISTING deduplicated corpus without ever pairing corpus↔corpus or
    batch↔batch rows — the cost is proportional to the batch, not the corpus.

    ``materialize=True`` evaluates the screen eagerly (localCheckpoint) and
    releases the internal corpus shingle/signature and batch shingle caches
    immediately — the session-hygiene mode for the steady-state ingestion
    loop (screen batch N → append → screen batch N+1), where the lazy
    default would pin one corpus-sized cache set per screened batch until
    the session clears its cache.

    Stages (all batch-bounded):
      1. exact first-wins: anti-probe of md5(text) against the corpus digest
         set (the reference's DeduplicationTransformer semantics,
         DeduplicationTransformer.java:37-88, generalized to a second corpus);
      2. near-dup probe: batch band buckets hash-join the corpus bucket
         index on (band, bucket) — at scale the corpus side is a
         precomputed, persisted index, so only the batch is signed fresh;
      3. exact verify on candidates only: n-gram Jaccard, plus containment
         (|batch∩corpus| / |batch|) as a second verify axis when
         ``containment_threshold`` is set — that is what catches a new doc
         that is a near-subset of an existing one even when symmetric
         Jaccard is low. With the default ``containment_threshold=None``,
         pairs verify on Jaccard alone and ``best_containment`` is reported
         only for Jaccard-verified pairs.

    Output: one row per batch document —
    (id_col, is_exact_dup, near_dup_of, best_jaccard, best_containment, keep)
    where ``near_dup_of`` is the smallest corpus id among verified hits
    (-1 if none), and ``keep`` = not exact-dup and no verified hit.
    """
    c_digests = corpus.select(F.md5(F.col(text_col)).alias("__th")).distinct()
    # ONE shingle pass over the corpus text: the bucket index and the verify
    # shingle store both derive from this persisted frame (at real scale both
    # are precomputed by build_dedup_index; inline derivation must not pay a
    # second corpus scan either).
    c_sh = shingle_frame(corpus, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # The bucket index is consumed twice by the screen (the oversized-bucket
    # aggregate and the anti-joined probe side are separate branches), so an
    # uncached signature lineage would re-run the explode + k-hash
    # aggregation per branch — persist the thin (|docs| x k longs) frame,
    # mirroring the verified-pairs builder.
    c_sig = minhash_signatures_from_shingles(c_sh, id_col, "__sh", num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    c_buckets = band_buckets(c_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__cid"), "band", "bucket"
    )
    c_shingles = c_sh.select(
        F.col(id_col).alias("__cid"), F.col("__sh").alias("__csh")
    )
    out, screen_caches = _screen_batch_against_index(
        batch, c_digests, c_buckets, c_shingles,
        id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket,
        containment_threshold,
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        for c in [c_sh, c_sig, *screen_caches]:
            c.unpersist()
    return out


def build_dedup_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> None:
    """Persist the corpus dedup index the incremental screen probes — the
    write-once artifact that makes admitting a new batch O(batch) instead of
    O(corpus):

      ``{path}/digests``  — distinct md5 text digests (exact first-wins set);
      ``{path}/buckets``  — (band, bucket, id) rows PARTITIONED BY band, so a
                            probe's (band, bucket) equi-join prunes to the
                            band's files before any IO;
      ``{path}/shingles`` — (id, shingle array) for the exact-verify stage.

    The streaming twin (``streaming/dedup_lsh_stream``) maintains the same
    index incrementally per micro-batch; this is the batch bootstrap.
    """
    corpus.select(F.md5(F.col(text_col)).alias("__th")).distinct().write.mode(
        "overwrite"
    ).parquet(f"{path}/digests")
    # One shingle pass: write the shingle store first, then derive the
    # signature/bucket index by READING IT BACK — the second pass scans the
    # (already tokenized) parquet arrays, not the raw corpus text.
    sh = shingle_frame(corpus, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("__cid"), F.col("__sh").alias("__csh")
    )
    sh.write.mode("overwrite").parquet(f"{path}/shingles")
    sh_back = corpus.sparkSession.read.parquet(f"{path}/shingles").select(
        F.col("__cid").alias(id_col), F.col("__csh").alias("__sh")
    )
    sig = minhash_signatures_from_shingles(
        sh_back, id_col, "__sh", num_hashes, repartition_input=True
    )
    band_buckets(sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__cid"), "band", "bucket"
    ).write.mode("overwrite").partitionBy("band").parquet(f"{path}/buckets")


def append_to_dedup_index(
    accepted: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> None:
    """Index maintenance: after screening a batch, append the ACCEPTED
    documents' digests/buckets/shingles to the persisted index so the next
    batch screens against them too — the steady-state ingestion loop:

        screen batch N → keep survivors → append survivors to index →
        screen batch N+1 → ...

    Appends are idempotent for dedup semantics (a replayed append can only
    cause extra drops, never false accepts — same argument as the streaming
    sink). On a real deployment the parquet appends become Delta/Iceberg
    appends with the identical plan.
    """
    accepted.select(F.md5(F.col(text_col)).alias("__th")).distinct().write.mode(
        "append"
    ).parquet(f"{path}/digests")
    sh = shingle_frame(accepted, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures_from_shingles(sh, id_col, "__sh", num_hashes)
    band_buckets(sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__cid"), "band", "bucket"
    ).write.mode("append").partitionBy("band").parquet(f"{path}/buckets")
    sh.select(
        F.col(id_col).alias("__cid"), F.col("__sh").alias("__csh")
    ).write.mode("append").parquet(f"{path}/shingles")
    sh.unpersist()


def incremental_dedup_against_index(
    batch: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
    containment_threshold: float | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Screen a new batch against a PERSISTED corpus index written by
    ``build_dedup_index`` — identical output to
    ``incremental_dedup_against_corpus`` without touching corpus text at all;
    the hash parameters must match the ones the index was built with.
    ``materialize=True`` evaluates eagerly and releases the internal batch
    shingle cache (session hygiene for the ingestion loop)."""
    spark = batch.sparkSession
    out, screen_caches = _screen_batch_against_index(
        batch,
        spark.read.parquet(f"{index_path}/digests"),
        spark.read.parquet(f"{index_path}/buckets").select("__cid", "band", "bucket"),
        spark.read.parquet(f"{index_path}/shingles"),
        id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket,
        containment_threshold,
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        for c in screen_caches:
            c.unpersist()
    return out


def _compact_parquet_dir(
    spark,
    path: str,
    dedup_cols: Sequence[str],
    partition_by: str | Sequence[str] | None = None,
    file_threshold: int = 8,
    target_files: int = 1,
) -> bool:
    """Rewrite an append-only parquet directory into few large files when
    its fragment count exceeds ``file_threshold``; returns True if it
    compacted. Deduplicates on ``dedup_cols`` while rewriting (replayed
    appends leave identical rows). Write-to-temp-then-rename swap: the
    rewrite is materialized completely before the old directory is
    replaced, so a crash mid-compaction leaves either the old store or the
    new one, never a mix. Run between batches (not concurrent with an
    append — a real deployment does this as Delta/Iceberg OPTIMIZE, which
    is transactional; parquet-on-filesystem needs the maintenance window).
    """
    import glob
    import os
    import shutil

    frags = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if len(frags) <= file_threshold:
        return False
    df = spark.read.parquet(path).dropDuplicates(list(dedup_cols))
    tmp = f"{path}__compacting"
    old = f"{path}__old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    if partition_by is not None:
        # repartition BY the partition column(s): every partition's rows
        # land in one task → exactly one file per partition directory
        part_cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        df.repartition(*part_cols).write.mode("overwrite").partitionBy(
            *part_cols
        ).parquet(tmp)
    else:
        df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return True


def compact_dedup_index(
    spark, path: str, file_threshold: int = 8
) -> dict[str, bool]:
    """Maintenance job for the persisted incremental-dedup index
    (``build_dedup_index`` / ``append_to_dedup_index``): each appended batch
    adds parquet fragments to ``digests``/``buckets``/``shingles``, and probe
    cost eventually becomes file-listing/open bound rather than data bound.
    Compacts every store whose fragment count exceeds ``file_threshold``,
    deduplicating replayed-append rows in the same pass; screen results are
    unchanged (equivalence pinned by test). ``buckets`` keeps its
    partitioned-by-band layout (one file per band after compaction) so the
    probe's partition pruning is preserved.

    Returns {store: compacted?} for observability.
    """
    return {
        "digests": _compact_parquet_dir(
            spark, f"{path}/digests", ["__th"], file_threshold=file_threshold
        ),
        "buckets": _compact_parquet_dir(
            spark,
            f"{path}/buckets",
            ["__cid", "band", "bucket"],
            partition_by="band",
            file_threshold=file_threshold,
        ),
        "shingles": _compact_parquet_dir(
            spark, f"{path}/shingles", ["__cid"], file_threshold=file_threshold
        ),
    }


def _two_phase_components(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al. 2014, "Connected components in MapReduce and beyond") — the
    O(log n)-round path for adversarial long-chain graphs where min-label
    propagation needs O(diameter) rounds.

    Edge frame invariant: canonical directed ``(u, v)`` with ``u > v``
    (child → smaller parent). Per round:
      - large-star: every node connects its STRICTLY LARGER neighbors to
        the minimum of its closed neighborhood min(Γ(u) ∪ {u});
      - small-star: every node connects its smaller-or-equal neighbors
        (and itself) to its minimum neighbor.
    Both are one groupBy-min + one join over the edge frame — the same
    shuffle primitives as label propagation, but the round count is
    logarithmic in component size instead of linear in diameter. Fixpoint
    when the canonical edge set is unchanged (count + order-insensitive
    bit_xor-of-xxhash64 checksum). At fixpoint the graph is a star forest centered at
    each component's minimum node.

    Input: (u, v) pairs, u != v (either orientation). Output: (node, comp).
    """
    from pyspark.sql import Observation

    canon = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev: tuple | None = None
    for _ in range(max_iter):
        nbrs = canon.union(
            canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("__mv"))
            .select("u", F.least("u", "__mv").alias("m"))
        )
        large = (
            nbrs.filter(F.col("v") > F.col("u"))
            .join(lmins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # bit_xor (not sum) as the set checksum: order-insensitive over the
        # distinct edge set and cannot overflow under ANSI arithmetic.
        # Observed ON the checkpoint job (r14) instead of a separate
        # agg().first() action per round — metrics ride the same execution.
        obs = Observation()
        canon = small.observe(
            obs,
            F.count(F.lit(1)).alias("c"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).localCheckpoint(eager=True)
        m = obs.get
        cur = (m["c"], m["h"])
        if cur == prev:
            break
        prev = cur
    stars = (
        canon.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .union(canon.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .distinct()
    )
    # Self-loop-only nodes were dropped by the canonical filter but are
    # still their own singleton component (parity with label propagation).
    nodes = edges.select(F.col("u").alias("node")).distinct()
    return nodes.join(stars, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over an undirected edge list → ``(node,
    component)`` where ``component`` is the smallest node id reachable —
    the cluster-canonicalization stage of a dedup pipeline (near-dup pairs
    → duplicate clusters → keep one document per cluster).

    ``algorithm="label"`` (default): min-label propagation to fixpoint —
    each round joins current labels across edges and takes the per-node
    min. Dedup graphs have tiny diameters (LSH+verify emits near-cliques),
    so convergence is O(diameter) rounds ≈ 2-4; each round is one join +
    one min-agg shuffle over the *pair graph* (≪ corpus).
    ``localCheckpoint(eager=True)`` truncates lineage per round so the plan
    stays flat. The per-round fixpoint probe counts changed labels (an
    action on |nodes| rows — no data is collected).

    ``algorithm="star"``: alternating large-star/small-star (Kiveris et
    al. 2014) — same join/agg primitives, O(log n) rounds regardless of
    diameter; use for adversarial long-chain graphs (entity-resolution
    chains, citation paths) where label propagation's O(diameter) rounds
    are the scale ceiling.
    """
    if algorithm not in ("label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'label' or 'star'")
    # Checkpoint the symmetrized edge frame BEFORE branching: both variants
    # derive everything (rounds AND the final node/singleton recovery) from
    # it, so this is the single point where the caller's — possibly
    # cache-backed — edge lineage is severed. lsh_dedup_pipeline relies on
    # this to unpersist its shingle/signature caches right after this
    # function returns; the star path previously built its `nodes` frame
    # from the raw input and kept the whole verify-join lineage alive.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    if algorithm == "star":
        return _two_phase_components(sym, max_iter)
    from pyspark.sql import Observation

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Fixpoint probe rides the per-round checkpoint job as an Observation
    # (r14): min-label propagation is MONOTONE — comp(node) only ever
    # decreases (new = min(own, neighbors)) — so the exact Σcomp is
    # strictly smaller iff any label changed, and comparing consecutive
    # sums detects the fixpoint without the former per-round
    # join-new-vs-old + count() job (~0.3-0.5 s of fixed job cost per
    # round at bench scale, a full |nodes| join at cluster scale).
    # DECIMAL(38,0) keeps the sum exact for any node-id magnitude.
    prev_sum = None
    for i in range(max_iter):
        nbr = sym.join(labels, sym["v"] == labels["node"]).select(
            sym["u"].alias("node"), F.col("comp")
        )
        obs = Observation()
        new_labels = (
            (labels.union(nbr).groupBy("node").agg(F.min("comp").alias("comp")))
            .observe(obs, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        labels = new_labels
        # Round 1 always changes a label on a nonempty edge set (for every
        # edge (u,v), max(u,v)'s label drops to min(u,v) or less), so its
        # sum only seeds the comparison.
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    algorithm: str = "label",
) -> DataFrame:
    """Near-dup pairs → per-document cluster assignment with size and a
    canonical-keep flag: ``(doc_id, cluster_id, cluster_size, is_canonical)``.
    ``is_canonical`` marks the one document per cluster (smallest id) a
    curation pipeline keeps; the rest are dropped as duplicates.
    ``algorithm`` selects the connected-components strategy (see
    ``connected_components``)."""
    cc = connected_components(pairs, src=id_a, dst=id_b, algorithm=algorithm)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    # No broadcast hint on sizes: it is O(#clusters) and a pathological corpus
    # (everything near-duplicated) makes it as big as the clustered-doc set,
    # past any safe broadcast bound. AQE picks broadcast at runtime whenever
    # the aggregated frame is actually small — the common case — without
    # hard-failing the degenerate one.
    return (
        cc.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("comp")).cast("long").alias("is_canonical"),
        )
    )


def prefix_filter_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int | None = None,
) -> DataFrame:
    """EXACT all-pairs set-similarity join via prefix filtering (PPJoin
    family, Xiao et al. 2008 WWW §3; Chaudhuri et al. 2006 SSJoin) —
    the exactness-guaranteed complement to MinHash-LSH: every pair with
    word-set Jaccard ≥ ``threshold`` is returned, none missed, none
    approximate.

    The pruning theorem: order every document's distinct tokens by ONE
    global total order (document frequency ascending, then token — rarest
    first), keep only the first ``|d| - ⌈t·|d|⌉ + 1`` tokens (the prefix);
    two documents with J ≥ t MUST share a prefix token, so the candidate
    join runs on prefix tokens only. Because prefixes are the RAREST
    tokens, candidate buckets stay small by construction — the frequent
    tokens that would explode a naive token join never enter the join key.
    A size filter (``t·|a| ≤ |b| ≤ |a|/t``) prunes candidates before the
    verify stage computes exact Jaccard on the full token sets.

    Scale shape: tokenize scan → document-frequency aggregate → per-doc
    window rank → prefix self-join (rare-token buckets) → set verify on
    candidates only. Nothing is all-pairs; the verify population is the
    candidate set, which J ≥ t bounds. Returns (doc_a, doc_b, jaccard).
    """
    from covid19_spark.operators.text import tokenize

    if shingle_n is not None:
        # n-gram shingles as the set elements (``word_shingles`` — same
        # unit as the MinHash/ngram_jaccard family); essential on
        # small-vocabulary corpora where word SETS saturate (the sf
        # corpus draws from ~31 words: word-set Jaccard ≥ 0.5 holds for
        # 70% of ALL pairs, 3-gram-shingle Jaccard for ~1%)
        elems = word_shingles(F.col(text_col), shingle_n, distinct=True)
        toks = df.select(F.col(id_col), F.explode(elems).alias("tok"))
    else:
        toks = (
            df.select(
                F.col(id_col),
                F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("tok"),
            )
            .filter(F.col("tok") != "")
        )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy("__df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix = ranked.filter(
        F.col("__rn") <= F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz")) + 1
    ).select(F.col(id_col), "tok", "__sz")
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # size filter: |b| within [t·|a|, |a|/t] is necessary for J ≥ t
            & (F.col("b.__sz") >= F.lit(threshold) * F.col("a.__sz"))
            & (F.col("a.__sz") >= F.lit(threshold) * F.col("b.__sz")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sets = toks.groupBy(id_col).agg(
        F.collect_set("tok").alias("__set"), F.count(F.lit(1)).alias("__sz")
    )
    verified = (
        cands.join(
            sets.select(
                F.col(id_col).alias("doc_a"),
                F.col("__set").alias("__sa"),
                F.col("__sz").alias("__na"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("doc_b"),
                F.col("__set").alias("__sb"),
                F.col("__sz").alias("__nb"),
            ),
            "doc_b",
        )
        .withColumn("__i", F.size(F.array_intersect("__sa", "__sb")))
        .select(
            "doc_a",
            "doc_b",
            (F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def adaptive_block_assignment(
    df: DataFrame,
    key_levels: "Sequence[Column]",
    max_block: int = 10_000,
) -> DataFrame:
    """Assign each row the COARSEST blocking key whose block fits
    ``max_block`` — the escalation alternative to the drop-guard used by
    the verify operators: instead of discarding an oversized block, its
    rows re-block under the next, more specific key level (e.g. name
    prefix 1 char → 2 chars → 4 chars), so recall degrades to
    finer-grained pairing instead of to zero.

    ``key_levels``: coarse→specific key expressions; every level's block
    sizes are computed in ONE aggregate each (k levels → k
    vocabulary-sized aggregates joined back broadcast-style), then a
    single CASE picks, per row, the first level whose block fits. Rows
    whose FINEST block still exceeds the cap keep the finest key with
    ``saturated = true`` (the caller's drop/cap decision, now explicit
    and observable instead of silent).

    Output: input columns + ``block_level`` (int), ``block_key``
    (string), ``saturated``. Pairing then joins on (block_level,
    block_key): rows pair only within their ASSIGNED level — escalated
    rows never pair against the coarse block they escaped, which keeps
    the pair space bounded by ``max_block`` per block by construction.

    NULL key values at any level are mapped to the sentinel ``"\\x00null"``
    (one shared block per level) rather than dropped: plain equi-joins
    would silently lose null-keyed rows, and a downstream pairing join on
    ``block_key`` would lose them a second time.  Null-keyed rows
    therefore block together and stay subject to the same ``max_block``
    escalation as every other block.
    """
    levels = list(key_levels)
    if not levels:
        raise ValueError("adaptive_block_assignment requires at least one key level")
    out = df
    for i, expr in enumerate(levels):
        # Coalesce NULL keys to a sentinel BEFORE the size join: the per-level
        # size frame is attached with an inner equi-join, and SQL null-safe
        # equality does not apply there — a raw NULL key (e.g. a null
        # attribute in the caller's concat) would silently drop the row from
        # the output, defeating this operator's whole point of making drop
        # decisions explicit via ``saturated``.  NUL is unreachable from
        # ``cast("string")`` of real data, so no collision with user keys.
        out = out.withColumn(
            f"__k{i}", F.coalesce(expr.cast("string"), F.lit("\x00null"))
        )
    for i in range(len(levels)):
        sizes = (
            out.groupBy(f"__k{i}")
            .agg(F.count(F.lit(1)).alias(f"__s{i}"))
        )
        out = out.join(F.broadcast(sizes), f"__k{i}")
    level = None
    for i in range(len(levels)):
        cond = F.col(f"__s{i}") <= max_block
        level = F.when(cond, i) if level is None else level.when(cond, i)
    last = len(levels) - 1
    level = level.otherwise(last)
    key = None
    for i in range(len(levels)):
        key = (
            F.when(level == i, F.col(f"__k{i}"))
            if key is None
            else key.when(level == i, F.col(f"__k{i}"))
        )
    saturated = F.col(f"__s{last}") > max_block
    result = out.select(
        *[c for c in df.columns],
        level.cast("int").alias("block_level"),
        key.alias("block_key"),
        (saturated & (level == last)).alias("saturated"),
    )
    return result
