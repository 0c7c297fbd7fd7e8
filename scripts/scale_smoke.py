"""Scale smoke: run the core operator shapes on 10x the bench data and a
deliberately skewed join, writing SCALE.md with throughput numbers.

This is the local stand-in for the 100 TB question: the same plans at 10x
rows should scale ~linearly (hash aggregation, map-side partials, window
functions) and the salted join should tame a hot key that would stall one
reducer.  Regenerate with:

    python scripts/scale_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from basin_cli_spark.operators.layout import salted_join  # noqa: E402
from basin_cli_spark.queries._helpers import dec, dec_sum  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402
from basin_cli_spark.sources import load_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def timed(label, fn, rows_in, results, reps=1):
    """Time fn; with reps>1 take the min (the scaling-law rows use reps=2:
    a single cold run folds first-touch shuffle-file writes and JIT into
    the throughput claim — the r8 exact-dedup 100x row read 47s cold vs
    ~8s steady, which mis-stated the plan's scaling by 6x)."""
    best, n_out = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        n_out = fn()
        sec = time.perf_counter() - t0
        best = sec if best is None else min(best, sec)
    results.append((label, rows_in, n_out, best, rows_in / best / 1e6))


def perturbed_docs(docs, copies: int, frac: float = 0.4):
    """Replicate the document corpus with per-copy TOKEN noise so copies
    are near-duplicates, not exact ones: each token of copy c mutates
    (deterministic xxhash64 draw on (doc_id, copy, token, position))
    with probability ``frac`` by gaining a copy-specific suffix.  A
    3-word segment then survives identical across two copies with
    p = (1-frac)^6 (~4.7% at frac=0.4), so hot-segment buckets and LSH
    shingle buckets keep realistic widths instead of the copies^2
    blowup exact replication forces.  Copy 0 keeps the original text.
    All-JVM expressions: one split, one transform, one array_join."""
    d = docs.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    )
    w = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    mut = F.transform(
        w,
        lambda t, i: F.when(
            (F.col("_copy") > 0)
            & (
                F.pmod(
                    F.xxhash64(F.col("doc_id"), F.col("_copy"), t, i), 1000
                )
                < int(frac * 1000)
            ),
            F.concat(t, F.lit("~c"), F.col("_copy").cast("string")),
        ).otherwise(t),
    )
    return d.select(
        (F.col("doc_id") * copies + F.col("_copy")).alias("doc_id"),
        F.array_join(mut, " ").alias("text"),
        "lang",
        "source",
    )


def perturbed_emb(emb, copies: int, eps: float = 0.12):
    """Replicate the embedding corpus with per-copy VECTOR noise: copy c
    of vector v adds deterministic uniform noise in [-eps, eps] per
    element (xxhash64 draw on (vec_id, copy, dim)).  At eps=0.12 on the
    unit-norm 64-dim fixture the copy-to-base angle measures ~29 degrees
    (mean cosine 0.877), so sign-LSH band signatures spread across
    buckets the way a real near-dup crawl's do, instead of 100 copies
    landing in one bucket and inflating candidate pairs as copies^2.
    Copy 0 keeps the original vector.  All-JVM: one transform over the
    array column."""
    e = emb.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    )
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        + F.when(F.col("_copy") == 0, F.lit(0.0)).otherwise(
            (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("_copy"), i), 10000
                ).cast("double")
                / 10000.0
                - 0.5
            )
            * (2.0 * eps)
        ),
    )
    return e.select(
        (F.col("vec_id") * copies + F.col("_copy")).alias("vec_id"),
        pert.alias("embedding"),
        "label",
    )


def main() -> None:
    # Load gate (same doctrine as bench.py): the sandbox carries external
    # load bursts that uniformly depress every row ~3x and make the
    # scaling-law comparisons meaningless.  Poll BEFORE the Spark session
    # exists; require two consecutive below-target 1-min samples; record
    # the gate outcome in SCALE.md so a loaded capture is visibly marked.
    load_target = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_S", "300"))
    # Seeded with TWO polls a few seconds apart (same fix as bench.py):
    # an idle machine is clean after ~3s, and a wait budget shorter than
    # one 15s loop tick can still report clean.
    samples = [os.getloadavg()[0]]
    waited = 0.0

    def _two_below() -> bool:
        return (
            len(samples) >= 2
            and samples[-1] < load_target
            and samples[-2] < load_target
        )

    if wait_budget <= 0:
        # Explicit no-wait mode: gate on the ambient reading alone (same
        # accounting fix as bench.py — record the REAL sleep, skip it
        # entirely at budget 0).
        samples.append(samples[0])
    elif samples[0] < load_target:
        seed_sleep = min(3.0, max(wait_budget, 0.1))
        time.sleep(seed_sleep)
        waited += seed_sleep
        samples.append(os.getloadavg()[0])
    while not _two_below() and waited < wait_budget:
        time.sleep(15)
        waited += 15
        samples.append(os.getloadavg()[0])
    load_gate = (
        f"load gate: target {load_target}, waited {waited:.0f}s, "
        f"start {samples[-1]:.2f}, seen [{min(samples):.2f}, "
        f"{max(samples):.2f}], clean={_two_below()}"
    )
    print(load_gate)

    spark = get_spark(app_name="basin_cli_spark_scale")
    spark.range(1000).count()

    li = load_table(spark, SF_DIR, "lineitem")
    # 10x the fact table, re-keyed so copies stay distinct rows
    li10 = li.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
    ).withColumn(
        "l_orderkey", F.col("l_orderkey") * COPIES + F.col("_copy")
    ).drop("_copy")
    li10 = li10.repartition(spark.sparkContext.defaultParallelism).persist()
    n = li10.count()

    results: list[tuple] = []

    def q1():
        price, disc = dec("l_extendedprice"), dec("l_discount")
        return (
            li10.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dec_sum(dec("l_quantity"), "sum_qty"),
                dec_sum(price * (1 - disc), "sum_disc_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .count()
        )

    def dedup():
        # binary unhex(md5) key (operators/dedup.exact_dedup's form): on a
        # mostly-unique corpus the key is most of the shuffled row, and the
        # 16-byte binary cuts shuffle bytes ~40% vs the 32-char hex string
        return (
            li10.groupBy(
                F.unhex(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")))
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .count()
        )

    def topk():
        from pyspark.sql import Window as W

        w = W.partitionBy("l_returnflag").orderBy(F.desc("l_extendedprice"))
        return (
            li10.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 100)
            .count()
        )

    timed(f"q1-shape agg ({COPIES}x)", q1, n, results, reps=2)
    timed(f"exact dedup hash-agg ({COPIES}x)", dedup, n, results, reps=2)
    timed(f"top-100 per group window ({COPIES}x)", topk, n, results, reps=2)

    # Curation shapes at 10x the document corpus: shingle+MinHash LSH pair
    # generation (the near-dedup hot path) and broadcast decontamination.
    from basin_cli_spark.operators import curation as CUR
    from basin_cli_spark.operators import dedup as DD

    docs = load_table(spark, SF_DIR, "documents")
    docs10 = docs.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
    ).withColumn(
        "doc_id", F.col("doc_id") * COPIES + F.col("_copy")
    ).drop("_copy").persist()
    nd = docs10.count()

    def minhash_pairs():
        return DD.minhash_lsh_pairs(
            docs10, "text", "doc_id", n_hashes=8, band_size=2
        ).count()

    def decon():
        is_eval = F.col("doc_id") % 200 == 0
        return CUR.decontaminate(
            docs10.where(~is_eval), docs10.where(is_eval)
        ).count()

    def decon_bloom():
        is_eval = F.col("doc_id") % 200 == 0
        return CUR.bloom_decontaminate(
            docs10.where(~is_eval), docs10.where(is_eval)
        ).count()

    def incremental():
        is_new = F.col("doc_id") % 10 == 7
        return DD.incremental_dedup(
            docs10.where(is_new), docs10.where(~is_new)
        ).count()

    def dsir_select():
        from basin_cli_spark.queries.corpus_ops import _dsir_bucket

        # DSIR importance scoring at 10x docs: two tokenize passes (model
        # build + per-doc scoring), a 256-row weight broadcast, and a
        # global top-100 TakeOrderedAndProject — the q_corpus_dsir_select
        # shape minus the oracle's sorted-fold determinism tail.
        is_target = F.col("doc_id") % 20 == 0
        b = docs10.select(
            "doc_id",
            is_target.alias("is_target"),
            F.explode(DD.tokens("text")).alias("tok"),
        ).select(
            "doc_id",
            "is_target",
            _dsir_bucket("tok").alias("b"),
        )
        model = b.groupBy("b").agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.sum(F.when(~F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("cr"),
        )
        tot = model.agg(
            F.sum("ct").cast("long").alias("tt"),
            F.sum("cr").cast("long").alias("tr"),
        )
        lw = model.crossJoin(F.broadcast(tot)).select(
            "b",
            (
                F.log((F.col("ct") + 1).cast("double"))
                - F.log((F.col("tt") + 256).cast("double"))
                - F.log((F.col("cr") + 1).cast("double"))
                + F.log((F.col("tr") + 256).cast("double"))
            ).alias("w"),
        )
        scored = (
            b.where(~F.col("is_target"))
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(lw), "b")
            .groupBy("doc_id")
            .agg(F.sum(F.col("n") * F.col("w")).alias("s"))
        )
        return scored.orderBy(F.desc("s"), "doc_id").limit(100).count()

    def per_source_cap_skewed():
        # collapse 90% of the corpus into ONE source: Catalyst's native
        # WindowGroupLimit(Partial) below the Exchange bounds what each
        # map partition ships per source, so the giant source's reducer
        # task receives <= map_partitions x k rows, not 90% of the corpus
        from pyspark.sql import Window as W

        skewed = docs10.withColumn(
            "source",
            F.when(F.col("doc_id") % 10 < 9, F.lit("giant")).otherwise(
                F.col("source")
            ),
        ).select("doc_id", "source", F.md5("text").alias("_mk"))
        w = W.partitionBy("source").orderBy("_mk", "doc_id")
        return (
            skewed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 50)
            .count()
        )

    def gopher_rules():
        from basin_cli_spark.queries.corpus_ops import (
            _gopher_passes,
            _gopher_signals,
        )

        return _gopher_signals(docs10).where(_gopher_passes()).count()

    def boilerplate():
        # 10x copies make every segment trivially hot (each text repeats
        # 10 times), so raise min_docs past the copy factor to keep the
        # hot-list selective — the rewrite path still runs end to end.
        return CUR.boilerplate_scrub(
            docs10, "text", "doc_id", seg_words=3, min_docs=3 * COPIES
        ).count()

    def wav_roundtrip():
        from basin_cli_spark.operators import multimodal as MM

        return MM.audio_meta(
            MM.synthesize_audio(docs10, "text", "doc_id")
        ).count()

    def mp4_roundtrip():
        from basin_cli_spark.operators import multimodal as MM

        return MM.video_meta(
            MM.synthesize_video(docs10, "text", "doc_id")
        ).count()

    timed(f"minhash-LSH pair gen ({COPIES}x docs)", minhash_pairs, nd, results)
    timed(f"WAV container write+reparse ({COPIES}x docs)",
          wav_roundtrip, nd, results)
    timed(f"MP4 container write+reparse ({COPIES}x docs)",
          mp4_roundtrip, nd, results)
    timed(f"boilerplate segment rewrite ({COPIES}x docs)",
          boilerplate, nd, results)
    timed(f"per-source cap, 90%-skewed source ({COPIES}x docs)",
          per_source_cap_skewed, nd, results)
    timed(f"Gopher rule stack, JVM array folds ({COPIES}x docs)",
          gopher_rules, nd, results)
    timed(f"decontamination vs broadcast eval set ({COPIES}x docs)",
          decon, nd, results)
    timed(f"decontamination, Bloom-prefiltered ({COPIES}x docs)",
          decon_bloom, nd, results)
    timed(f"incremental new-vs-corpus dedup ({COPIES}x docs)",
          incremental, nd, results)
    timed(f"DSIR importance scoring + top-100 ({COPIES}x docs)",
          dsir_select, nd, results)

    def dup_ngram_folds():
        # Gopher repetition coverage as ONE narrow pass: four sorted-gram
        # run-length folds per row, no explode/shuffle/join — this row
        # checks the per-row fold cost stays linear in corpus size.
        toks = docs10.select(
            "doc_id", F.length("text").alias("n_chars"),
            DD.tokens("text").alias("__toks"),
        )
        folds = toks.select(
            "doc_id",
            *[
                DD.gram_coverage_fold(
                    DD.shingles(F.col("__toks"), k)
                ).alias(f"_f{k}")
                for k in (2, 3, 4, 5)
            ],
        )
        return folds.count()

    timed(f"Gopher repetition folds, narrow pass ({COPIES}x docs)",
          dup_ngram_folds, nd, results)

    def domain_kl():
        # per-source KL from the corpus mix: the only corpus-sized work
        # is one slim (source, token) hash-agg with map-side combine;
        # everything after is vocab-sized.
        tok = docs10.select(
            "source", F.explode(DD.tokens("text")).alias("token")
        )
        cst = tok.groupBy("source", "token").agg(
            F.count(F.lit(1)).alias("c_st")
        ).persist()
        ns = cst.groupBy("source").agg(F.sum("c_st").alias("n_s"))
        ct = cst.groupBy("token").agg(F.sum("c_st").alias("c_t"))
        nn = ct.agg(F.sum("c_t").alias("n"))
        term = (F.col("c_st").cast("double") / F.col("n_s")) * F.log(
            (F.col("c_st").cast("double") * F.col("n"))
            / (F.col("n_s").cast("double") * F.col("c_t"))
        )
        out = (
            cst.join(F.broadcast(ns), "source")
            .join(ct, "token")
            .crossJoin(F.broadcast(nn))
            .groupBy("source")
            .agg(F.sum(term).alias("kl"))
            .count()
        )
        cst.unpersist()
        return out

    timed(f"per-source KL domain audit ({COPIES}x docs)",
          domain_kl, nd, results)

    def zipf_slope():
        # per-source Zipf slope: the top-100 rank filter must ride the
        # native WindowGroupLimit(Partial) below the source-keyed
        # Exchange, so the shuffle stays ~partitions x 100 slim rows per
        # source no matter how many token types a source has.
        from pyspark.sql import Window as W

        tok = docs10.select(
            "source", F.explode(DD.tokens("text")).alias("token")
        )
        cst = tok.groupBy("source", "token").agg(
            F.count(F.lit(1)).alias("c")
        )
        r = F.row_number().over(
            W.partitionBy("source").orderBy(F.col("c").desc(), "token")
        )
        ranked = cst.select("source", "c", r.alias("r")).where(
            F.col("r") <= 100
        )
        lx = F.log(F.col("r").cast("double"))
        ly = F.log(F.col("c").cast("double"))
        return (
            ranked.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(lx).alias("sx"), F.sum(ly).alias("sy"),
                F.sum(lx * ly).alias("sxy"), F.sum(lx * lx).alias("sxx"),
            )
            .count()
        )

    timed(f"Zipf slope, native group-limit rank cut ({COPIES}x docs)",
          zipf_slope, nd, results)

    def unimax_apply():
        # UniMax mixture materialization: the allocation tail is a
        # languages-sized relation; the apply is ONE broadcast join plus a
        # stateless per-row copy-count expression — no corpus shuffle.
        from basin_cli_spark.queries.corpus_ops import (
            _unimax_alloc,
            _unimax_epochs,
        )

        eps = _unimax_alloc(docs10).select("lang", _unimax_epochs().alias("e"))
        bucket = (
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
            % 10000
        )
        return (
            docs10.join(F.broadcast(eps), "lang")
            .select(
                "doc_id",
                "lang",
                (
                    F.floor("e").cast("long")
                    + F.when(
                        bucket < (F.col("e") - F.floor("e")) * 10000, 1
                    ).otherwise(0)
                ).alias("n_copies"),
            )
            .count()
        )

    timed(f"UniMax apply, copy-count manifest ({COPIES}x docs)",
          unimax_apply, nd, results)

    def temperature_mix():
        # temperature sampling probabilities: the only corpus-sized work is
        # the per-language token hash-agg; the p^(1/tau) tail is
        # languages-sized with two 1-row scalar broadcasts.
        from basin_cli_spark.queries.corpus_ops import _lang_token_counts

        counts = _lang_token_counts(docs10)
        tot = counts.agg(F.sum("n_tok").cast("long").alias("tt"))
        w = (
            counts.where(F.col("n_tok") > 0)
            .crossJoin(F.broadcast(tot))
            .select(
                "lang",
                F.exp(
                    F.log(
                        F.col("n_tok").cast("double")
                        / F.col("tt").cast("double")
                    )
                    / 3.3
                ).alias("u"),
            )
        )
        z = w.agg(F.sum("u").alias("zsum"))
        return (
            w.crossJoin(F.broadcast(z))
            .select("lang", (F.col("u") / F.col("zsum")).alias("q"))
            .count()
        )

    timed(f"temperature language mix, tau=3.3 ({COPIES}x docs)",
          temperature_mix, nd, results)
    docs10.unpersist()

    # Embedding near-dup candidate generation at 10x vectors: band_bits
    # is sized by band_bits_for(n), so buckets stay ~64 rows and pair
    # count grows ~linearly with the corpus instead of quadratically —
    # the property that keeps this runnable at 10^9 vectors.
    from basin_cli_spark.operators import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings")
    emb10 = emb.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
    ).withColumn(
        "vec_id", F.col("vec_id") * COPIES + F.col("_copy")
    ).drop("_copy").persist()
    ne = emb10.count()

    def emb_pairs():
        bits = S.band_bits_for(ne)
        expl = emb10.select(
            "vec_id",
            F.posexplode(
                S.sign_lsh_bands(F.col("embedding"), 4, bits)
            ).alias("band", "sig"),
        )
        a, b = expl.alias("a"), expl.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .dropDuplicates(["vec_a", "vec_b"])
            .count()
        )

    timed(f"embedding sign-LSH pair gen ({COPIES}x vectors, sized bits)",
          emb_pairs, ne, results)

    # Cluster-scoped (SemDeDup) candidate generation at 10x vectors with a
    # 10x-wider codebook (k scales with the corpus so cells stay ~constant
    # width — the property that keeps within-cell verify linear).
    from basin_cli_spark.operators import kmeans as KM

    def semantic_pairs():
        k10 = 160  # k scales with corpus: cells stay ~n/k = ~125 wide
        cents = KM.init_centroids(emb10, k10, "vec_id", "embedding", seed=7)
        assigned = KM.assign_ids(emb10, cents, metric="cos").select(
            "vec_id", "cent_id"
        )
        a, b = assigned.alias("a"), assigned.alias("b")
        return (
            a.join(
                b,
                (F.col("a.cent_id") == F.col("b.cent_id"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            ).count()
        )

    timed(f"semantic-IVF cell pair gen ({COPIES}x vectors, scaled k)",
          semantic_pairs, ne, results)

    # Hard-negative triplet mining at 10x vectors: the probe set stays
    # constant-size (broadcast), so cost is one corpus scan per batch of
    # anchors — linear in corpus size, the property this row checks.
    def hard_negatives():
        return S.mine_hard_negatives(
            emb10, F.col("vec_id") < 20, k=3
        ).count()

    timed(f"hard-negative mining, 20 anchors ({COPIES}x vectors)",
          hard_negatives, ne, results)

    # Prototype-distance pruning with a DOMINANT label (90% of vectors on
    # one label) via the two-pass shape: centroid hash-agg -> per-label
    # percentile sketch (map-side partials, no per-label sort) ->
    # broadcast thresholds -> stateless filter.  The exact percent_rank
    # form would land the giant label's sort on one task; this row checks
    # the implemented escape stays linear under that skew.
    def proto_prune_2pass_skewed():
        from basin_cli_spark.queries.llm_ops import _proto_scores_df

        sk = emb10.withColumn(
            "label",
            F.when(F.col("vec_id") % 10 < 9, F.lit(99)).otherwise(
                F.col("label")
            ),
        )
        scored = _proto_scores_df(sk, repartition=False)
        th = scored.groupBy("label").agg(
            F.percentile_approx("proto_sim", 0.1, 100000).alias("lo")
        )
        return (
            scored.join(F.broadcast(th), "label")
            .where(F.col("proto_sim") >= F.col("lo"))
            .count()
        )

    timed(f"prototype 2-pass prune, 90%-skewed label ({COPIES}x vectors)",
          proto_prune_2pass_skewed, ne, results)
    def anisotropy():
        # closed-form all-pairs mean cosine: ||sum v_hat||^2 identity,
        # so ONE norm pass + ONE slim (label, dim) hash-agg covers
        # every pair at 10x vectors — no pair relation ever exists.
        # Normalize AFTER the explode (norm carried through Generate):
        # dividing inside a transform() lambda re-folds the norm per
        # element once CollapseProject inlines it.
        from basin_cli_spark.operators.similarity import norm_sq

        s1 = emb10.select(
            "label", "embedding",
            F.sqrt(norm_sq(F.col("embedding"))).alias("_n"),
        ).where(F.col("_n") > 0)
        ex = s1.select(
            "label", "_n", F.posexplode("embedding").alias("dim", "raw")
        ).select(
            "label", "dim",
            (F.col("raw").cast("double") / F.col("_n")).alias("comp"),
        )
        a1 = ex.groupBy("label", "dim").agg(
            F.sum("comp").alias("sd"), F.count(F.lit(1)).alias("cnt")
        )
        return a1.groupBy("label").agg(
            F.sum(F.col("sd") * F.col("sd")).alias("s2"),
            F.max("cnt").alias("n"),
        ).count()

    timed(f"embedding anisotropy, closed-form all-pairs ({COPIES}x vectors)",
          anisotropy, ne, results)

    def kcenter():
        # greedy farthest-point selection at 10x vectors: k-1 narrow
        # scan -> max-cos fold -> TakeOrderedAndProject passes, one slim
        # row to the driver per step — cost is k corpus scans, the
        # distributed-FPS trade this row checks stays linear.
        from basin_cli_spark.operators.similarity import kcenter_select

        return len(kcenter_select(emb10, k=4))

    timed(f"k-center FPS selection, k=4 ({COPIES}x vectors)",
          kcenter, ne, results)
    emb10.unpersist()

    # MuHash digest of 10x documents: the digest scale path — one partial
    # product per partition, driver combine (SCALE.md digest section).
    from basin_cli_spark.functions.muhash import muhash_digest

    docs10b = load_table(spark, SF_DIR, "documents").withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
    ).withColumn(
        "doc_id", F.col("doc_id") * COPIES + F.col("_copy")
    ).drop("_copy").repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    ndb = docs10b.count()

    def muhash_docs():
        muhash_digest(docs10b, "text")
        return 1

    timed(f"MuHash digest ({COPIES}x docs)", muhash_docs, ndb, results)
    docs10b.unpersist()

    # Skew: ~14% of the fact rows collapse onto ONE join key.  Broadcast
    # would sidestep skew entirely (and is the right plan when the dim
    # fits); to exercise the skew machinery we force shuffle joins and
    # compare AQE's automatic skew split against the explicit salt.
    skewed = li10.withColumn(
        "join_key", F.when(F.col("l_orderkey") % 7 == 0, F.lit(0)).otherwise(
            F.col("l_orderkey")
        )
    )
    dim = spark.range(0, 2_000_000).select(
        F.col("id").alias("d_key"), (F.col("id") % 97).alias("d_attr")
    )

    def plain_join():
        return skewed.join(dim, skewed["join_key"] == dim["d_key"]).count()

    def salted():
        return salted_join(skewed, dim, "join_key", "d_key", salt=8).count()

    timed("skewed join (broadcast dim — the right plan when it fits)",
          plain_join, n, results)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        timed("skewed shuffle join (AQE skew split)", plain_join, n, results)
        timed("skewed shuffle join (explicit salt=8)", salted, n, results)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # ---- 100x spot checks: one order closer to the target scale --------
    # A subset of the core shapes at 100x (60M fact rows / 500k docs):
    # the shapes whose scaling law is the claim (hash-agg map-side
    # partials, per-group window heaps, narrow per-row folds, skew-escaped
    # group limit, bucketed pair generation).  The embedding pair-gen and
    # boilerplate shapes are EXCLUDED here on honesty grounds: synthetic
    # 100x replication makes every row a 100-way exact duplicate, so
    # their candidate sets grow as copies^2 by construction — that
    # measures the fixture's degeneracy, not the operator (the 10x rows
    # above already carry the same caveat mildly; at 100x it dominates).
    C100 = 100
    li100 = li.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(C100)]))
    ).withColumn(
        "l_orderkey", F.col("l_orderkey") * C100 + F.col("_copy")
    ).drop("_copy").repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    n100 = li100.count()
    results100: list[tuple] = []

    def q1_100():
        price, disc = dec("l_extendedprice"), dec("l_discount")
        return (
            li100.where(
                F.col("l_shipdate")
                <= F.lit("1998-09-02").cast("timestamp_ntz")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dec_sum(dec("l_quantity"), "sum_qty"),
                dec_sum(price * (1 - disc), "sum_disc_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .count()
        )

    def dedup_100():
        return (
            li100.groupBy(
                F.unhex(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")))
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .count()
        )

    def topk_100():
        from pyspark.sql import Window as W

        w = W.partitionBy("l_returnflag").orderBy(F.desc("l_extendedprice"))
        return (
            li100.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 100)
            .count()
        )

    timed(f"q1-shape agg ({C100}x)", q1_100, n100, results100, reps=2)
    timed(f"exact dedup hash-agg ({C100}x)", dedup_100, n100, results100, reps=2)
    timed(f"top-100 per group window ({C100}x)", topk_100, n100, results100, reps=2)
    li100.unpersist()

    docs100 = docs.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(C100)]))
    ).withColumn(
        "doc_id", F.col("doc_id") * C100 + F.col("_copy")
    ).drop("_copy").repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    nd100 = docs100.count()

    def folds_100():
        toks = docs100.select(
            "doc_id", DD.tokens("text").alias("__toks")
        )
        return toks.select(
            "doc_id",
            *[
                DD.gram_coverage_fold(
                    DD.shingles(F.col("__toks"), k)
                ).alias(f"_f{k}")
                for k in (2, 3, 4, 5)
            ],
        ).count()

    def cap_100():
        from pyspark.sql import Window as W

        skewed = docs100.withColumn(
            "source",
            F.when(F.col("doc_id") % 10 < 9, F.lit("giant")).otherwise(
                F.col("source")
            ),
        ).select("doc_id", "source", F.md5("text").alias("_mk"))
        w = W.partitionBy("source").orderBy("_mk", "doc_id")
        return (
            skewed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 50)
            .count()
        )

    def gopher_100():
        from basin_cli_spark.queries.corpus_ops import (
            _gopher_passes,
            _gopher_signals,
        )

        return _gopher_signals(docs100).where(_gopher_passes()).count()

    timed(f"Gopher repetition folds, narrow pass ({C100}x docs)",
          folds_100, nd100, results100)
    timed(f"per-source cap, 90%-skewed source ({C100}x docs)",
          cap_100, nd100, results100)
    timed(f"Gopher rule stack, JVM array folds ({C100}x docs)",
          gopher_100, nd100, results100)
    docs100.unpersist()

    # ---- perturbed replicas: the pair-gen / rewrite shapes at 100x ------
    # Exact replication makes every row a copies-way duplicate, so the
    # LSH / IVF-cell / hot-segment shapes previously had NO honest 100x
    # row (candidate sets grow copies^2 by construction).  These rows use
    # seeded per-copy noise (perturbed_docs / perturbed_emb above) so
    # bucket widths stay realistic, and each shape is measured at BOTH
    # scales on the SAME perturbed generator so the 10x->100x comparison
    # is apples-to-apples.
    def emb_pairs_for(rel, n_rows):
        def run():
            bits = S.band_bits_for(n_rows)
            expl = rel.select(
                "vec_id",
                F.posexplode(
                    S.sign_lsh_bands(F.col("embedding"), 4, bits)
                ).alias("band", "sig"),
            )
            a, b = expl.alias("a"), expl.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")),
                )
                .select(
                    F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                )
                .dropDuplicates(["vec_a", "vec_b"])
                .count()
            )

        return run

    def semantic_pairs_for(rel, k):
        def run():
            cents = KM.init_centroids(rel, k, "vec_id", "embedding", seed=7)
            assigned = KM.assign_ids(rel, cents, metric="cos").select(
                "vec_id", "cent_id"
            )
            a, b = assigned.alias("a"), assigned.alias("b")
            return a.join(
                b,
                (F.col("a.cent_id") == F.col("b.cent_id"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            ).count()

        return run

    def boilerplate_for(rel):
        def run():
            return CUR.boilerplate_scrub(
                rel, "text", "doc_id", seg_words=3, min_docs=3
            ).count()

        return run

    resultsP: list[tuple] = []
    for copies in (COPIES, C100):
        embP = perturbed_emb(emb, copies).repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        neP = embP.count()
        timed(f"embedding sign-LSH pair gen ({copies}x vectors, perturbed)",
              emb_pairs_for(embP, neP), neP, resultsP, reps=2)
        timed(
            f"semantic-IVF cell pair gen ({copies}x vectors, perturbed, "
            f"k={16 * copies})",
            semantic_pairs_for(embP, 16 * copies), neP, resultsP, reps=2,
        )
        if copies == C100:
            # the production sizing (k ~ sqrt(n), the faiss rule):
            # assignment n*k shrinks 3.6x vs the constant-cell-width k,
            # cells widen to ~sqrt(n) so within-cell pairs grow — the
            # balanced point both stages share.  Measured side by side
            # with the k-grows-with-n row so the tradeoff is data, not
            # narrative.
            k_sqrt = int(neP ** 0.5)
            timed(
                f"semantic-IVF cell pair gen ({copies}x vectors, "
                f"perturbed, k=sqrt(n)={k_sqrt})",
                semantic_pairs_for(embP, k_sqrt), neP, resultsP, reps=2,
            )
        embP.unpersist()
        docsP = perturbed_docs(docs, copies).repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        ndP = docsP.count()
        timed(f"boilerplate segment rewrite ({copies}x docs, perturbed)",
              boilerplate_for(docsP), ndP, resultsP, reps=2)
        docsP.unpersist()

    lines = [
        "# SCALE — 10x smoke results",
        "",
        f"`scripts/scale_smoke.py` at `{SF_DIR}` x{COPIES} "
        f"({n:,} fact rows), local[{spark.sparkContext.defaultParallelism}].",
        f"Capture environment: {load_gate}; "
        f"load at write {os.getloadavg()[0]:.2f}.",
        "",
        "| workload | rows in | rows out | sec | K rows/s |",
        "|---|---|---|---|---|",
    ]
    for label, rows_in, n_out, sec, mrps in results:
        lines.append(
            f"| {label} | {rows_in:,} | {n_out:,} | {sec:.2f} | {mrps * 1000:,.0f} |"
        )
    lines += [
        "",
        "## 100x spot checks",
        "",
        f"Same session, {n100:,} fact rows / {nd100:,} documents.  A",
        "shape scales if its K rows/s here is within ~2x of its 10x row",
        "(per-partition work constant; only partition count grows).",
        "Pair-generation and segment-rewrite shapes are excluded from",
        "THIS table — exact replication makes every row a 100-way",
        "duplicate, so their candidate sets grow as copies^2 by",
        "construction — and measured instead in the perturbed-replica",
        "table below, where seeded per-copy noise keeps bucket widths",
        "realistic.",
        "",
        "| workload | rows in | rows out | sec | K rows/s |",
        "|---|---|---|---|---|",
    ]
    for label, rows_in, n_out, sec, mrps in results100:
        lines.append(
            f"| {label} | {rows_in:,} | {n_out:,} | {sec:.2f} | {mrps * 1000:,.0f} |"
        )
    lines += [
        "",
        "## Fifth decade — registry-query spot check (round 13)",
        "",
        "The 100x rows above measure SHAPES; round 13 adds the registry",
        "queries themselves one decade past the oracle-attested range:",
        "scripts/scale_sf10_smoke.py times the 8 most scale-sensitive",
        "REGISTRY entries at the 4th decade (.scratch/sf1/sf1c) and a",
        "full sf10-equivalent (60M lineitem via 100x replication; 500k",
        "perturbed docs / 200k noised vectors via the leg-3 generators)",
        "in one session, sink-timed, with static-plan drift reported per",
        "query.  Full table + per-ratio analysis: SCALE_sf10_spot.md.",
        "Headline: 7.21x total wall for 10x rows, no plan regressions —",
        "the only drift is q_dedup_minhash's broadcast->SMJ flip (correct",
        "at a no-longer-broadcastable signature table), and the only",
        ">10x ratios are output-density effects of the dup-dense corpus",
        "(48x / 135x more emitted pairs), not input-super-linearity.  The",
        "semantic-IVF fifth-decade codebook is trained at k~sqrt(n)=447",
        "and frozen under its per-corpus key in fixtures/codebooks.json.",
        "",
        "A SIXTH decade extends the relational core two decades past the",
        "oracle range (scripts/scale_sf100_spot.py: 600M lineitem / 100M",
        "events via 1000x replication): q1 7.31x, q6 6.05x, top-k per",
        "group 7.46x, as-of join 5.42x for 10x rows, every static plan",
        "identical — full table in SCALE_sf100_spot.md.  The corpus",
        "families' decade story intentionally ends at the 5th (their",
        "perturbed-replica near-dup density, and hence pair-verify",
        "output, grows by design faster than rows).",
        "",
        "## Fourth scale decade — sf1-equivalent contract run (round 11)",
        "",
        "The relational/window/join core is now CORRECTNESS-attested at a",
        "fourth decade, not just throughput-smoked: scripts/gen_sf1.py",
        "replicates sf0.1 10x as whole-database copies (keys remapped",
        "k*10+c so every FK edge survives — FK integrity + 2dp-grain tick",
        "pinned by tests/test_sf1_decade.py), and",
        "`python scripts/drive_contract.py .scratch/sf1 sf1` drives the",
        "31-entry SF1_SUBSET (all 22 TPC-H-shaped analytics + 5 joins +",
        "4 windows — the plans whose physical shape changes with row",
        "count) against the DuckDB oracle on 6,000,000 lineitem /",
        "1,500,000 orders / 1,000,000 events rows with the same",
        "driver-strict hash as the three committed sweeps.  Result:",
        "**31/31 OK** (CONTRACT_r11_sf1_subset.txt), ~4 min wall for both",
        "engines together on local[32].  A second leg (SF1_SUBSET_LEG2:",
        "16 aggregates + 6 set ops + 6 relational + 10 event-windows + 3",
        "events-surface — every remaining shuffle- or sort-shaped entry)",
        "is appended to the same artifact: **41/41 OK**, so 72 of the 203",
        "registry entries are attested at the fourth decade; the excluded",
        "families are row-wise map-only plans or corpus shapes with their",
        "own perturbed-replica evidence below.",
        "",
        "A third leg extends the decade to the llm/corpus families on a 10x",
        "PERTURBED corpus (scripts/gen_sf1_corpus.py: 50k near-dup documents /",
        "20k noised vectors, same seeded noise as the throughput smokes):",
        "**80/80** SF1_SUBSET_LEG3 entries oracle-attested",
        "(CONTRACT_r12_sf1_subset.txt; r11 closed at 79/80).  Both onetime",
        "exclusions were ORACLE-replay costs, not engine limits, and both",
        "are retired: q_dedup_semantic_ivf needed the frozen IVF codebook",
        "trained for the corpus key (additive gen_codebooks.py, green in",
        "164 s r11), and q_dedup_embedding_keep_one's recursive-CTE oracle",
        "re-evaluated the banded self-join per fixpoint iteration when",
        "inlined (>40 min unfinished) — MATERIALIZED hints made it",
        "feasible (attested OK in 1,635 s), and an in-round restatement of",
        "both embedding-dedup oracles as signature equi-joins (signatures",
        "computed once per vector/band from the same sign_lsh_band_sql",
        "source of truth, candidates by hash join, norms hoisted, min-label",
        "walk pruned) re-attested them hash-identical at 21.5 s / 114.9 s",
        "(contract addendum; the Spark side is untouched).  The leg",
        "surfaced two real decade bugs,",
        "both fixed and committed: ROUND's -0.0 vs 0.0 zero-sign hash split",
        "in the weighted-sample key (IEEE + 0.0 canonicalization on both",
        "engines), and the frozen-codebook lifecycle gaining additive",
        "per-corpus training (scripts/gen_codebooks.py <dir> merges new",
        "corpus keys instead of only regenerating the driver scales).",
        "",
        "The decade surfaced one real cross-engine defect the smaller",
        "fixtures could not: DuckDB's direct DECIMAL->DOUBLE cast",
        "double-rounds ((double)int128 * 10^-scale), while Spark's",
        "BigDecimal.doubleValue is correctly rounded — they diverge by",
        "1 ULP once a decimal sum needs >=16 significant digits (first",
        "hit: q1 sum_charge 27864178755.319390 -> DuckDB ...319393 vs",
        "Spark ...31939, which fails the exact-repr value hash).  Fix:",
        "every oracle-side decimal-sum cast now routes through VARCHAR",
        "(_helpers.sql_dec2dbl + all hand-rolled sites) — both engines'",
        "string->double parses are correctly rounded, so the casts are",
        "bit-identical at ANY scale; cost is per-group rows only.  The",
        "Spark side is untouched, so attested values did not move.",
        "Pinned by tests/test_sf1_decade.py::",
        "test_duckdb_varchar_route_is_correctly_rounded, including a",
        "22-sig-digit DECIMAL(38,6) case.",
        "",
        "Spark-only wall-clock across the decade (scripts/sf1_scaling.py,",
        "committed as SCALE_sf1_scaling.md): 2.31x total for 10x rows over",
        "the 31-entry subset, worst single query 5.59x (q17), windows ~1x",
        "(their user_id<40 slices are row-bounded) — every plan at or",
        "below linear; no hidden quadratic, grows-with-input broadcast,",
        "or spill appears at the fourth decade.  The four >=4x ratios are",
        "stage-profiled in SCALE_sf1_scaling.md's Profile notes",
        "(scripts/profile_sf1_ratios.py): zero spill, shuffle growth",
        "row-proportional, q17's subquery built once (no",
        "rebuild-per-probe).",
        "",
        "## Streaming 10x throughput smoke (round 12; watermark expiry measured round 13)",
        "",
        "The streaming family's state-bound claims (quality gate state is",
        "O(gates); near-dedup state is one row per SimHash bucket) were",
        "tests-plus-narrative through r11; scripts/stream_scale_smoke.py",
        "turns them into measured rows.  It re-shards the document corpus",
        "into 8 files and drains the two headline streaming shapes with",
        "maxFilesPerTrigger=2 (4 micro-batches, so state must survive",
        "batch boundaries) at sf0.1 (5k docs) and the 10x perturbed corpus",
        "(50k docs), reading rows/s and state rows/bytes from the",
        "StreamingQueryProgress:",
        "",
        "| shape | corpus | rows | batches | wall s | rows/s | state rows | state MB |",
        "|---|---|---|---|---|---|---|---|",
        "| quality_gate | sf0.1 | 5,000 | 4 | 2.94 | 1,698 | 3 | 0.02 |",
        "| near_dedup | sf0.1 | 5,000 | 4 | 4.57 | 1,093 | 2,173 | 0.57 |",
        "| quality_gate | sf1c (10x) | 50,000 | 4 | 3.82 | 13,089 | 3 | 0.02 |",
        "| near_dedup | sf1c (10x) | 50,000 | 4 | 20.0 | 2,499 | 14,334 | 4.49 |",
        "",
        "quality_gate's state is EXACTLY 3 rows (the gates) at both",
        "scales — 10x the stream moves throughput 7.7x UP (per-batch fixed",
        "costs amortize) and state not at all.  near_dedup's state is the",
        "bucket count: 14,334 rows / 4.5 MB for 50k docs (sub-linear —",
        "the perturbed corpus's near-dups collide into shared buckets),",
        "wall 4.4x for 10x rows.  The complete-mode rows hold every",
        "bucket live by construction (1-batch-visible watermark), so they",
        "are the WORST case.",
        "",
        "Round 13 measures the watermark-expiry claim instead of",
        "narrating it: the `near_dedup_wm` runs spread event time across",
        "the 8 shards (each micro-batch advances the watermark ~2 hours),",
        "key the dedup on (30-minute window, simhash), and drain in",
        "append mode — the production shape, where the watermark",
        "finalizes old windows (they emit to the sink) and EVICTS their",
        "buckets from the state store:",
        "",
        "| shape | corpus | rows in | groups emitted | peak state | final state | state/batch series |",
        "|---|---|---|---|---|---|---|",
        "| near_dedup_wm | sf0.1 | 5,000 | 4,238 | 1,231 | 128 | 1086→1218→1231→1220→128 |",
        "| near_dedup_wm | sf1c (10x) | 50,000 | 36,916 | 10,710 | 1,201 | 9666→10689→10650→10710→1201 |",
        "| near_dedup_wm | sf10c (100x, round 14) | 500,000 | 210,766 | 62,294 | 8,187 | 57830→62109→62294→61606→8187 |",
        "",
        "State PLATEAUS at the active-window working set — peak state is",
        "0.282x of the corpus-total group count (emitted + held) at sf0.1,",
        "0.281x at 10x, and 0.285x at the 500k-doc sf10c corpus (round 14,",
        "`python scripts/stream_scale_smoke.py wm .scratch/sf10c 'sf10c(100x)'`",
        "— the decade where state pressure is real: 62k live groups, 13.9 MB",
        "store), i.e. the same fraction at all three scales (the",
        "~2.2 h of event time visible to an unexpired window at any",
        "moment, out of the 8 h span), and the trailing flush batch that",
        "applies the final watermark evicts down to the last open",
        "windows.  State is window-bounded, not corpus-bounded.  The",
        "script asserts all three bounds (gate state <= gates x shuffle",
        "partitions; complete-mode bucket state <= corpus rows; windowed",
        "peak state <= 0.6x total groups) and",
        "tests/test_streaming.py::test_near_dedup_watermark_expires_state",
        "pins the expiry behavior on the same plan at fixture scale.",
        "",
        "## Perturbed replicas — pair-gen / rewrite shapes at 10x AND 100x",
        "",
        "Exact replication is degenerate for bucketed shapes, so these",
        "rows replicate with seeded per-copy noise instead",
        "(scale_smoke.perturbed_docs: each token mutates with p=0.4 per",
        "copy, so a 3-word segment survives identical across two copies",
        "with p~0.047; scale_smoke.perturbed_emb: per-element uniform",
        "noise in [-0.12, 0.12], a measured ~29 degrees of angle per copy",
        "on the unit-norm fixture — near-dup density, not exact-dup).",
        "Both scales run the SAME generator, so the 10x->100x throughput",
        "ratio is the honest scaling claim for sign-LSH pair gen,",
        "semantic-IVF cell pair gen (k grows with the corpus: 160 at 10x,",
        "1,600 at 100x, cells stay ~125 wide), and the boilerplate",
        "segment rewrite (min_docs=3, the production setting — hot",
        "density is realistic here, unlike the exact-copy 10x row above",
        "which must raise min_docs past the copy factor).  Honest limit",
        "on the semantic-IVF rows: holding cell width constant means",
        "k grows with n, so the ASSIGNMENT stage is O(n*k) — its per-row",
        "cost rises ~10x per decade by construction.  Production picks",
        "k ~ sqrt(n) (the faiss rule), balancing assignment n*k against",
        "within-cell pairs n*cell — the 100x table carries BOTH sizings",
        "side by side so the tradeoff is measured, not narrated.",
        "",
        "| workload | rows in | rows out | sec | K rows/s |",
        "|---|---|---|---|---|",
    ]
    for label, rows_in, n_out, sec, mrps in resultsP:
        lines.append(
            f"| {label} | {rows_in:,} | {n_out:,} | {sec:.2f} | {mrps * 1000:,.0f} |"
        )
    lines += [
        "",
        "The r8 watch item — exact-dedup 100x throughput halving (2,630 ->",
        "1,273 K rows/s) — is closed by two changes.  (1) Session-level AQE",
        "sizing (session.py): a 16 MB advisory partition target (default",
        "64 MB) stops AQE coalescing the ~1.6 GB binary-key shuffle into",
        "reducers whose 1.5M+-group hash maps spill; measured ~7.3-8 s",
        "steady at 60 M rows (~8,000+ K rows/s), which now exceeds the 10x",
        "rate.  Raising coalescePartitions.initialPartitionNum fixes the",
        "same spill but was measured and REJECTED: 256 initial taxes every",
        "multi-shuffle query with map-side bucket overhead (+60% on the",
        "LSH/Bloom bench trio) — .scratch/dedup_tune.py has the grid.",
        "(2) The scaling-law rows (q1/dedup/top-k at both scales) are",
        "min-of-2: a single cold first run pays shuffle-file first-touch +",
        "JIT (28-47 s at 100x) and mis-stated the plan's steady rate by ~6x.",
        "",
        "Same plans as the sf0.1 bench — throughput holds at 10x because",
        "aggregation is map-side partial and the window top-k keeps",
        "per-group heaps.  For the skewed join, broadcast is the right",
        "plan while the dim fits; with shuffle joins forced, AQE's skew",
        "split and the explicit salt are the two mitigations (timings for",
        "all three shown — salting replicates the dim `salt` times, so it",
        "only pays off when the skewed side dwarfs the other).",
        "The curation rows are per-document workloads (keyed on shingle/band buckets), so their rows/s counts corpus documents, not fact rows.",
        "",
        "The 90%-skewed per-source-cap row runs the capped window with one",
        "source holding 90% of the corpus: Catalyst's InferWindowGroupLimit",
        "plants a partial rank<=k filter below the source-keyed Exchange, so",
        "the giant source's reducer receives <= map_partitions x k rows —",
        "the plan property pinned by",
        "tests/test_plans.py::test_per_source_cap_partial_limit_before_exchange.",
        "",
        "The 90%-skewed-label prototype-prune row runs the TWO-PASS form",
        "(q_embedding_prototype_prune_2pass / q_corpus_lm_prune_2pass share",
        "the shape): per-label thresholds from a percentile sketch that",
        "partial-aggregates map-side, broadcast back, applied as a stateless",
        "filter — no per-label sort anywhere, so one label holding 90% of the",
        "corpus costs the same as a uniform one.  Plan pinned by",
        "tests/test_plans.py::test_2pass_prunes_have_no_rank_window.",
        "",
        "The WAV/MP4 rows are the real container round-trips (stdlib",
        "RIFF/ISO-BMFF writers + hand-rolled parsers) over mapInPandas —",
        "per-row Arrow-batched byte work, no shuffle; rows/s is bounded by",
        "Python bytes assembly/parse, not Spark.",
        "",
        "The Bloom-prefiltered decontamination row is SLOWER than the plain",
        "broadcast here, and that is the expected crossover, not a defect: at",
        "this scale the eval shingle set is a few thousand strings, so its",
        "broadcast is cheaper than the driver-side Bloom build plus the extra",
        "Arrow membership pass.  The bloom path wins when the eval suite's",
        "shingle set is too large to broadcast as strings (1e7+ shingles ->",
        "GBs of broadcast vs ~12 MB of bloom bits) — the regime the operator",
        "exists for; both paths return bit-identical results so the choice is",
        "purely a size threshold.",
        "",
        "## Multiset-digest throughput — the documented capability limit (round 5)",
        "",
        "The digest family is CPU-bound Python, not Spark-bound; both operators",
        "distribute perfectly (one partial per partition + a driver combine), so",
        "machine throughput = per-core rate x cores.  Measured on this container",
        "(CPython 3.11, no C bignum/EC bindings available):",
        "",
        "| digest | group | per-row cost | rows/s/core | 32-core rows/s |",
        "|---|---|---|---|---|",
        "| ECMH (functions/ecmh.py) | secp256k1 | hash-to-curve modular sqrt (~130 us `pow((p+1)/4)`) | ~4,100 | ~130K |",
        "| MuHash (functions/muhash.py) | Z_p^*, 3072-bit (RFC 3526) | one 3072-bit mulmod (~30 us) + SHAKE-256 | ~30,000 | ~950K |",
        "",
        "The round-3 \"100K rows/s/core\" bar for ECMH is RETIRED as infeasible in",
        "pure CPython: the modular sqrt is the hash-to-curve cost itself and has",
        "no batch trick (batch inversion doesn't apply; lazy/tree product",
        "reduction was measured and LOSES to sequential mulmod because CPython",
        "big-int multiplication grows superlinearly).  As of round 6 both modules",
        "TRY-IMPORT `gmpy2` (GMP bindings) and route the hot operation through it",
        "when present — the ECMH sqrt pow via `gmpy2.powmod` + `gmpy2.jacobi`,",
        "the MuHash accumulator via `mpz` mulmod and `gmpy2.invert` — for the",
        "documented ~20-40x, falling back to pure CPython bit-identically (same",
        "known-answer oracles; backend status recorded by",
        "tests/test_muhash.py::test_native_backend_status_and_digest_stability).",
        "`gmpy2` does NOT ship in this container (`HAVE_GMPY2 = False` here), so",
        "the pure-CPython numbers above remain the measured floor and are",
        "regression-guarded in tests/test_muhash.py.  Install attempt (round 11,",
        "closing the floor as evidence rather than narrative): the container has",
        "no package-index route at all — `pip download --no-deps gmpy2` fails",
        "with DNS resolution errors (`[Errno -2] Name or service not known`",
        "against the configured index) and `ERROR: No matching distribution",
        "found for gmpy2`; no wheel is present offline.  Retried round 14 per",
        "the r13 verdict: identical result (DNS `[Errno -2]` against the",
        "configured index, `No matching distribution found`) — the environment",
        "has not gained a package-index route.  The gmpy2 fast path",
        "therefore cannot be lit here under any policy; it remains the",
        "deployment-time switch (install gmpy2 on the cluster image, the",
        "try-import routes the hot ops automatically, oracles are bit-identical",
        "either way).  `coincurve` was evaluated",
        "and rejected for the EC path: it wraps libsecp256k1's ECDSA/combine",
        "surface, not hash-to-curve, and point addition is already cheap",
        "(Jacobian, no per-add inversion) — the sqrt inside the point mapping is",
        "the cost, which gmpy2 covers.",
        "",
        "MuHash (Maxwell/Wuille's rolling multiset hash, deployed in Bitcoin",
        "Core's assumeutxo) carries the exact same insert/remove/union/difference",
        "algebra as the reference's ECMH, so it is the recommended digest for",
        "100 TB jobs; ECMH remains for parity with the reference's digest role.",
        "A 100 TB corpus at ~1 KB/row is ~10^11 rows: ~36 core-days with MuHash",
        "(an hour on a 1000-core cluster) vs ~280 core-days with ECMH.",
        "The MuHash smoke row above runs the real distributed aggregate at 10x",
        "docs; its rows/s is machine-wide (32 cores busy on one small corpus",
        "pass, dominated by per-partition Python startup at this tiny scale).",
        "",
        "## q_dedup_embedding_keep_one bench variance — root cause (round 5)",
        "",
        "Stage-level profiling at sf0.1 (5 reps, cache cleared per rep):",
        "LSH pair generation 1.6-4.7 s, connected components 1.0-2.0 s,",
        "anti-join 0.4-1.2 s.  The spread is concentrated in each rep's FIRST",
        "execution after `clearCache()`: the query persists its band-signature",
        "and edge tables, so run 1 of the bench's min-of-3 pays the cold build",
        "(plus whatever sandbox load coincides with it) while runs 2-3 re-hit",
        "the plan-matched cache.  min() therefore measures the warm steady",
        "state — the number that tracks plan regressions — and the spread",
        "measures cold-build + sandbox noise by construction, not instability in",
        "the operator.  No plan change is warranted; the 8.6 s spread seen in",
        "round 4 was one loaded cold build.",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
