"""r14 probe: boilerplate-scrub hot-list pass — text-keyed distinct vs
hash-only candidate prefilter (OPTIMIZATION_r14.md "Not yet optimized"
item 2, measured here at the sf1c decade fixture).

The shipped hot list (variant A) groups by (_segh, seg) to count distinct
docs per segment: the exchange key carries the SEGMENT TEXT for every
segment row in the corpus.  Variant B first counts distinct docs per
8-byte HASH alone (16-byte exchange rows), keeps hashes with >= min_docs
(a strict superset of hot hashes — the hash-level distinct-doc count is
>= any per-string count under it), then re-runs the exact text-keyed
count over the surviving candidate rows only.  Exact same hot list by
construction; the question is whether the candidate fraction is small
enough that dropping text from the big exchange beats paying a second
pass over the segmentation lineage (a third evaluation overall, against
the docstring's two-pass doctrine).

Usage: python .scratch/hotlist_probe.py [sf_dir ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basin_cli_spark.operators import curation as C
from basin_cli_spark.session import get_spark
from basin_cli_spark.sources.tables import load_table, spread_cpu

MIN_DOCS = 3


def segs_of(d):
    return C.segment_rows(d, "text", "doc_id", 3).withColumn(
        "_segh", F.xxhash64("seg")
    )


def hot_a(segs):
    return (
        segs.where(F.col("seg").isNotNull())
        .groupBy("_segh", "seg")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= MIN_DOCS)
        .groupBy("_segh")
        .agg(F.collect_list("seg").alias("_hotsegs"))
    )


def hot_b(segs):
    s = segs.where(F.col("seg").isNotNull())
    cand = (
        s.select("_segh", "doc_id")
        .groupBy("_segh")
        .agg(F.count_distinct("doc_id").alias("_cnd"))
        .where(F.col("_cnd") >= MIN_DOCS)
        .select("_segh")
    )
    return (
        s.join(cand, "_segh")
        .groupBy("_segh", "seg")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= MIN_DOCS)
        .groupBy("_segh")
        .agg(F.collect_list("seg").alias("_hotsegs"))
    )


def scrub_with(docs, hot_fn):
    segs = segs_of(docs)
    hot = hot_fn(segs)
    j = segs.join(hot, "_segh", "left")
    is_hot = F.col("_hotsegs").isNotNull() & F.array_contains(
        "_hotsegs", F.col("seg")
    )
    return j.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~is_hot & F.col("seg").isNotNull(),
                            F.struct(F.col("seg_idx"), F.col("seg")),
                        )
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("seg").alias("n_segs"),
        F.sum(is_hot.cast("int")).alias("n_removed"),
    )


def noop_time(df, reps=3):
    best = []
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best.append(time.time() - t0)
    return min(best), sorted(best)[len(best) // 2]


def main():
    spark = get_spark("hotlist_probe")
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scratch/sf1c"]
    for sf_dir in sf_dirs:
        d = spread_cpu(load_table(spark, sf_dir, "documents"), sf_dir,
                       "documents")
        segs = segs_of(d).where(F.col("seg").isNotNull())
        n_rows = segs.count()
        n_cand_rows = (
            segs.join(
                segs.select("_segh", "doc_id")
                .groupBy("_segh")
                .agg(F.count_distinct("doc_id").alias("_cnd"))
                .where(F.col("_cnd") >= MIN_DOCS)
                .select("_segh"),
                "_segh",
            ).count()
        )
        print(f"\n== {sf_dir}: {n_rows} segment rows, "
              f"{n_cand_rows} candidate rows "
              f"({n_cand_rows / n_rows:.3f} fraction)")

        a = scrub_with(d, hot_a)
        b = scrub_with(d, hot_b)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"   row-identical check: exceptAll both ways = {diff}")
        assert diff == 0

        for tag, df in (("A text-keyed", a), ("B hash-cand", b),
                        ("A text-keyed (2nd)", a)):
            mn, md = noop_time(df)
            print(f"   {tag:22s} min {mn:.2f}s med {md:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
