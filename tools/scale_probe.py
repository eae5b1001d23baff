"""Measured wall-time scaling of the dedup/ANN families (VERDICT r06 task #7).

Synthesizes a DETERMINISTIC 10x corpus from sf0.1 and times each family at
1x and 10x, reporting the scaling exponent alpha = log(t10/t1) / log(10)
(alpha 1.0 = linear, 2.0 = quadratic). Corpus construction preserves the
statistical shape that drives each family's cost:

- documents x10: ten replicas per doc; replica 0 keeps the original text,
  replicas 1-9 sort the doc's words by xxhash64(word, replica). Near-dup
  pairs WITHIN a replica survive (similar docs sort to near-identical
  sequences, so their shingles still overlap), pairs ACROSS replicas are
  destroyed (different sort keys -> disjoint shingle sets) — candidate-pair
  density scales linearly with the corpus, as in a real crawl.
- embeddings x10: ten replicas per vector; replica r rotates the array by
  6*r positions (norm-preserving, decorrelates across replicas, preserves
  cosine structure within one).
- media: the q_image_near_dup synthesizer parameterized by id count (the
  registry query itself caps at 250 ids BY DESIGN, so its bench time is
  scale-constant; the probe scales the underlying operators instead).

Usage: python tools/scale_probe.py [--runs 2] [--workdir /tmp/scaleprobe]
Prints one JSON line per family and a summary block to paste into
SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP_OFFSET = 10_000_000


def build_scaled_dir(spark, out_dir: str, factor: int) -> None:
    """Idempotent per table: a table already present in out_dir (e.g. from
    an earlier probe run this round) is kept, missing ones are built — the
    round-7 all-or-nothing guard skipped customer.parquet when the dir
    predated the fuzzy_name_match probe."""
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").cast("int").alias("__rep"))

    def _have(name: str) -> bool:
        return os.path.exists(f"{out_dir}/{name}.parquet")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = F.split(F.col("text"), " ")
    # Construction v2 (round 9). v1 sorted each replica's words by a
    # replica-keyed hash — which made every pair of docs sharing VOCABULARY
    # near-identical within a replica (identical sorted sequences), a
    # QUADRATIC candidate-pair blowup: measured 256 LSH pairs at 1x vs
    # 6,059,585 at 10x (23,670x for 10x docs). v2 suffixes every word with
    # the replica id and keeps order: word-shingle Jaccard between two docs
    # of the same replica is EXACTLY the original pair's Jaccard (the
    # suffix is a bijection on shingles), so within-replica pair structure
    # is preserved verbatim and cross-replica pairs are destroyed —
    # candidate-pair density truly scales linearly, as a real crawl's does.
    shuffled = F.array_join(
        F.transform(
            words,
            lambda w: F.concat(w, F.lit("_"), F.col("__rep").cast("string")),
        ),
        " ",
    )
    scaled_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__rep").cast("long") * REP_OFFSET).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(shuffled).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    if not _have("documents"):
        scaled_docs.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/documents.parquet"
        )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vec = F.col("embedding")
    shift = (F.col("__rep") * 6) % F.size(vec)
    rotated = F.when(F.col("__rep") == 0, vec).otherwise(
        F.concat(
            F.slice(vec, shift + 1, F.size(vec) - shift), F.slice(vec, 1, shift)
        )
    )
    scaled_emb = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__rep").cast("long") * REP_OFFSET).alias("vec_id"),
            rotated.alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
    )
    if not _have("embeddings"):
        scaled_emb.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/embeddings.parquet"
        )

    # customer x10 for the blocked-Levenshtein probe: replicas get fresh
    # custkeys AND names regenerated in the TPC-H "Customer#%09d" shape from
    # the new key, so the (nation, 15-char name prefix) blocking keeps its
    # real statistic — block size stays ~|thousand-key-range|/|nations| and
    # the NUMBER of blocks grows with the corpus (the linear regime a real
    # ER pipeline relies on). Replica 0 keeps the original rows verbatim.
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    new_key = F.col("c_custkey") + F.col("__rep").cast("long") * REP_OFFSET
    scaled_cust = (
        cust.crossJoin(F.broadcast(reps))
        .select(
            new_key.alias("c_custkey"),
            F.when(F.col("__rep") == 0, F.col("c_name"))
            .otherwise(F.concat(F.lit("Customer#"), F.lpad(new_key.cast("string"), 9, "0")))
            .alias("c_name"),
            *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
        )
    )
    if not _have("customer"):
        scaled_cust.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/customer.parquet"
        )

    # Relational facts xN for the correlated-subquery / skew probes (round
    # 10): replicas get fresh order/event/user keys (+rep*REP_OFFSET, the
    # same offset on BOTH sides of the orders⋈lineitem key so the join
    # fan-out is preserved verbatim), while part/supplier keys stay — so
    # per-part and per-supplier row counts grow linearly (the statistic the
    # decorrelated aggregates shuffle on), per-ORDER width stays constant
    # (the sibling-window statistic), and per-USER event counts stay
    # constant while the number of users grows (the sessionize statistic).
    # Dimension tables (part/supplier/nation/region) are NOT scaled — they
    # are dims; symlinking keeps the probe honest about broadcast sides.
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    if not _have("orders"):
        (
            orders.crossJoin(F.broadcast(reps))
            .select(
                (F.col("o_orderkey") + F.col("__rep").cast("long") * REP_OFFSET).alias("o_orderkey"),
                (F.col("o_custkey") + F.col("__rep").cast("long") * REP_OFFSET).alias("o_custkey"),
                *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/orders.parquet")
        )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if not _have("lineitem"):
        (
            li.crossJoin(F.broadcast(reps))
            .select(
                (F.col("l_orderkey") + F.col("__rep").cast("long") * REP_OFFSET).alias("l_orderkey"),
                *[c for c in li.columns if c != "l_orderkey"],
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/lineitem.parquet")
        )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if not _have("events"):
        (
            ev.crossJoin(F.broadcast(reps))
            .select(
                (F.col("event_id") + F.col("__rep").cast("long") * REP_OFFSET).alias("event_id"),
                (F.col("user_id") + F.col("__rep").cast("long") * REP_OFFSET).alias("user_id"),
                *[c for c in ev.columns if c not in ("event_id", "user_id")],
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/events.parquet")
        )
    for dim in ("part", "supplier", "nation", "region"):
        dst = f"{out_dir}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{dim}.parquet", dst)


def image_probe(spark, n_ids: int):
    """The q_image_near_dup synth+hash+probe pipeline over n_ids images
    (plus ~24% planted JPEG re-encodes), without the registry's fixed
    250-id cap."""
    import numpy as np
    import pandas as pd

    from covid19_spark.operators.jpeg import encode_jpeg
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_dhash,
        image_near_dup_pairs,
    )

    ids = spark.range(n_ids).select(F.col("id").alias("doc_id")).repartition(
        spark.sparkContext.defaultParallelism
    )

    def synth(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                rng = np.random.default_rng(d + 7_000_000)
                h, w = 24 + d % 9, 32 + d % 7
                base = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
                img = np.repeat(np.repeat(base, -(-h // 6), axis=0), -(-w // 8), axis=1)[:h, :w]
                rows.append((d, "image", "image/bmp", w, h, None, encode_bmp(img)))
                if d % 25 < 6:  # planted near-dup, same 24% rate as the registry query
                    rows.append(
                        (REP_OFFSET + d, "image", "image/jpeg", w, h, None,
                         encode_jpeg(img, quality=80))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "width", "height",
                         "duration_ms", "payload"],
            )

    media = ids.mapInPandas(synth, schema=MEDIA_SCHEMA)
    hashes = image_dhash(media, use_fake=False).cache()
    hashes.count()
    n = image_near_dup_pairs(hashes, "media_id", max_hamming=10).count()
    hashes.unpersist()
    return n



def crawl_probe(spark, sf_dir: str):
    """The crawl flagships past their fixture caps (VERDICT r09 task #5):
    drive crawl_corpus_build / crawl_shards_audit / the blocklist gate over
    the FULL documents table of ``sf_dir`` (the registry queries cap at
    400/600 ids by design, so their bench times are scale-constant; the
    probe scales the underlying pipeline the caps protect)."""
    from covid19_spark.operators.web import domain_suffixes, host_of
    from covid19_spark.plans.q_curation import crawl_corpus_build, crawl_shards_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).repartition(spark.sparkContext.defaultParallelism)

    def corpus():
        return crawl_corpus_build(docs).count()

    def shards():
        corpus_df = crawl_corpus_build(docs).select("doc_id", "clean_text")
        return crawl_shards_audit(corpus_df).count()

    def blocklist():
        blocked = ["dom3.com", "dom7.com", "s1.dom4.com", "evil.net"]
        d = F.col("doc_id")
        url = F.concat(
            F.lit("HTTPS://S"), (d % 4).cast("string"),
            F.lit(".Dom"), (d % 10).cast("string"),
            F.lit(".Com:443/p/"), d.cast("string"), F.lit("?utm_source=x"),
        )
        sfx = domain_suffixes(url)
        matched = F.filter(sfx, lambda s: s.isin(*blocked))
        return docs.select(
            "doc_id",
            host_of(url).alias("host"),
            (F.size(matched) > 0).cast("long").alias("blocked"),
            F.array_min(matched).alias("rule"),
        ).count()

    return {"crawl_to_corpus": corpus, "crawl_to_shards": shards,
            "domain_blocklist_filter": blocklist}


def timed(fn, runs: int) -> float:
    best = math.inf
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def _stage_metrics(spark) -> list[dict]:
    """Per-stage IO metrics from the live AppStatusStore (the structure
    behind the UI/REST API; populated even with spark.ui.enabled=false) —
    no listener callback server needed from Python."""
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = []
    for i in range(stages.size()):
        s = stages.apply(i)
        out.append(
            {
                "stage": s.stageId(),
                "name": s.name().split(" at ")[0][:48],
                "shuffle_read": s.shuffleReadBytes(),
                "shuffle_write": s.shuffleWriteBytes(),
                "spill_mem": s.memoryBytesSpilled(),
                "spill_disk": s.diskBytesSpilled(),
                "input": s.inputBytes(),
            }
        )
    return out


def bytes_probe(spark, name: str, sf_dir: str, n_docs: int) -> dict:
    """Shuffle/storage BYTES for one full run of a registry query (VERDICT
    r08 task #6): wall-time exponents say dedup_pipeline_e2e is exactly
    linear, so its 100 TB cost is set by CONSTANTS — bytes moved per
    document. Runs the query through a noop sink (full computation; the
    wall-time probes' ``.count()`` lets Spark prune projections, which
    would understate bytes), then reads per-stage shuffle read/write +
    spill from the AppStatusStore and the peak persisted footprint from
    the RDD storage listing (the eager localCheckpoints are still pinned
    by the returned frame's lineage at sample time)."""
    import gc
    import time as _time

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    # drain leftover storage from the PREVIOUS probe run first: the
    # ContextCleaner frees localCheckpoint blocks asynchronously, and a
    # stale block showing up in this run's rddList sample mislabels the
    # previous query's footprint as ours (seen: minhash 1x "inheriting"
    # dedup 10x's 300 MB)
    spark.catalog.clearCache()
    for _ in range(100):
        gc.collect()
        if store.rddList(True).size() == 0:
            break
        spark._jvm.System.gc()
        _time.sleep(0.1)
    before = _stage_metrics(spark)
    min_id = max((s["stage"] for s in before), default=-1) + 1
    df = QUERY_REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    rdds = store.rddList(True)
    persisted = sum(
        rdds.apply(i).memoryUsed() + rdds.apply(i).diskUsed()
        for i in range(rdds.size())
    )
    stages = [s for s in _stage_metrics(spark) if s["stage"] >= min_id]
    tot_read = sum(s["shuffle_read"] for s in stages)
    tot_write = sum(s["shuffle_write"] for s in stages)
    tot_spill = sum(s["spill_mem"] + s["spill_disk"] for s in stages)
    top = sorted(stages, key=lambda s: -s["shuffle_write"])[:5]
    del df
    spark.catalog.clearCache()
    gc.collect()
    return {
        "family": name,
        "n_docs": n_docs,
        "shuffle_read_bytes": tot_read,
        "shuffle_write_bytes": tot_write,
        "spill_bytes": tot_spill,
        "persisted_bytes": persisted,
        "shuffle_write_per_doc": round(tot_write / n_docs, 1),
        "persisted_per_doc": round(persisted / n_docs, 1),
        "n_stages": len(stages),
        "top_write_stages": [
            {"stage": s["stage"], "name": s["name"], "write": s["shuffle_write"]}
            for s in top
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/scaleprobe")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--bytes-only", action="store_true",
        help="run only the bytes probe (skip the wall-time exponent sweep)",
    )
    ap.add_argument(
        "--crawl-only", action="store_true",
        help="run only the crawl-flagship wall-time probes",
    )
    ap.add_argument(
        "--queries", nargs="*", default=None,
        help="probe only these registry queries (1x vs Nx over the scaled dir)",
    )
    args = ap.parse_args()

    spark = get_spark("scale_probe")
    x10_dir = os.path.join(args.workdir, f"x{args.factor}")
    print(f"ensuring {args.factor}x corpus at {x10_dir} ...", file=sys.stderr)
    build_scaled_dir(spark, x10_dir, args.factor)

    # Bytes, not just seconds, for the linear dedup family (r08 task #6):
    # one full noop-sink run at 1x and at Nx, per-stage shuffle bytes from
    # the status store; bytes/doc flat across scales == the constants that
    # set the 100 TB bill are scale-independent.
    if args.queries is not None:
        # arbitrary registry queries at 1x vs Nx — used round 10 for the
        # correlated-subquery / skew / unigram families
        results = {}
        for name in args.queries:
            fn = QUERY_REGISTRY[name].fn
            t1 = timed(lambda: fn(spark, SF_DIR).count(), args.runs)
            spark.catalog.clearCache()
            t10 = timed(lambda: fn(spark, x10_dir).count(), args.runs)
            spark.catalog.clearCache()
            alpha = math.log(t10 / t1) / math.log(args.factor)
            results[name] = {"t1": round(t1, 2), "t10": round(t10, 2), "alpha": round(alpha, 2)}
            print(json.dumps({"family": name, **results[name]}))
        print("\n--- SCALING.md block ---")
        print("| family | t(1x) s | t(10x) s | exponent |")
        print("|---|---|---|---|")
        for name, r in results.items():
            print(f"| {name} | {r['t1']} | {r['t10']} | {r['alpha']} |")
        return

    if args.crawl_only:
        results = {}
        probes_1x = crawl_probe(spark, SF_DIR)
        probes_Nx = crawl_probe(spark, x10_dir)
        for name in probes_1x:
            t1 = timed(probes_1x[name], args.runs)
            spark.catalog.clearCache()
            t10 = timed(probes_Nx[name], args.runs)
            spark.catalog.clearCache()
            alpha = math.log(t10 / t1) / math.log(args.factor)
            key = f"{name}(uncapped)"
            results[key] = {"t1": round(t1, 2), "t10": round(t10, 2), "alpha": round(alpha, 2)}
            print(json.dumps({"family": key, **results[key]}))
        print("\n--- SCALING.md block ---")
        print("| family | t(1x) s | t(10x) s | exponent |")
        print("|---|---|---|---|")
        for name, r in results.items():
            print(f"| {name} | {r['t1']} | {r['t10']} | {r['alpha']} |")
        return

    n1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    byte_rows = []
    for name in ("dedup_pipeline_e2e", "minhash_lsh"):
        b1 = bytes_probe(spark, name, SF_DIR, n1)
        b10 = bytes_probe(spark, name, x10_dir, n1 * args.factor)
        byte_rows.append((name, b1, b10))
        print(json.dumps({"probe": "bytes", "scale": "1x", **b1}))
        print(json.dumps({"probe": "bytes", "scale": f"{args.factor}x", **b10}))

    print("\n--- SCALING.md bytes block ---")
    print("| family | scale | docs | shuffle write | write B/doc | persisted | persisted B/doc | spill |")
    print("|---|---|---|---|---|---|---|---|")
    for name, b1, b10 in byte_rows:
        for label, b in (("1x", b1), (f"{args.factor}x", b10)):
            print(
                f"| {name} | {label} | {b['n_docs']} | {b['shuffle_write_bytes']:,} "
                f"| {b['shuffle_write_per_doc']} | {b['persisted_bytes']:,} "
                f"| {b['persisted_per_doc']} | {b['spill_bytes']:,} |"
            )
    if args.bytes_only:
        return

    results = {}
    # round-7 families + the exact-kernel heavies (VERDICT r07 task #5):
    # duplicated_spans/span_dedup pay the per-token k-gram explosion,
    # fuzzy_name_match pays blocked pairwise Levenshtein — the places a
    # 100x corpus could surprise if block sizes grew with the corpus.
    for name in (
        "minhash_lsh",
        "dedup_pipeline_e2e",
        "ivfpq_cosine_topk",
        "duplicated_spans",
        "span_dedup",
        "fuzzy_name_match",
    ):
        fn = QUERY_REGISTRY[name].fn
        t1 = timed(lambda: fn(spark, SF_DIR).count(), args.runs)
        spark.catalog.clearCache()
        t10 = timed(lambda: fn(spark, x10_dir).count(), args.runs)
        spark.catalog.clearCache()
        alpha = math.log(t10 / t1) / math.log(args.factor)
        results[name] = {"t1": round(t1, 2), "t10": round(t10, 2), "alpha": round(alpha, 2)}
        print(json.dumps({"family": name, **results[name]}))

    probes_1x = crawl_probe(spark, SF_DIR)
    probes_Nx = crawl_probe(spark, x10_dir)
    for name in probes_1x:
        t1 = timed(probes_1x[name], args.runs)
        spark.catalog.clearCache()
        t10 = timed(probes_Nx[name], args.runs)
        spark.catalog.clearCache()
        alpha = math.log(t10 / t1) / math.log(args.factor)
        key = f"{name}(uncapped)"
        results[key] = {"t1": round(t1, 2), "t10": round(t10, 2), "alpha": round(alpha, 2)}
        print(json.dumps({"family": key, **results[key]}))

    t1 = timed(lambda: image_probe(spark, 250), args.runs)
    t10 = timed(lambda: image_probe(spark, 250 * args.factor), args.runs)
    alpha = math.log(t10 / t1) / math.log(args.factor)
    results["image_near_dup(operators)"] = {
        "t1": round(t1, 2), "t10": round(t10, 2), "alpha": round(alpha, 2)
    }
    print(json.dumps({"family": "image_near_dup(operators)", **results['image_near_dup(operators)']}))

    print("\n--- SCALING.md block ---")
    print("| family | t(1x) s | t(10x) s | exponent |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['t1']} | {r['t10']} | {r['alpha']} |")
    shutil.rmtree(args.workdir, ignore_errors=True) if os.environ.get(
        "SCALE_PROBE_CLEAN"
    ) else None


if __name__ == "__main__":
    main()
