"""Measured close-out of the r8/r9 boilerplate-scrub lever (r9 verdict
item #1, carried twice, closed here with committed numbers).

The lever: a left_semi probe of each doc's segment hashes against the
hot-segment list, so docs with ZERO hot segments bypass the reassembly
shuffle entirely (their clean_text is the narrow re-join of their own
segments — no join, no text shuffle).  On a real crawl most docs are
template-free and the bypass diverts nearly everything; the question is
what it does on THIS fixture.

Variants (sf0.1, local[32], load-idle, min of 2 runs each):
  A baseline — curation.boilerplate_scrub as shipped (hash-keyed left
               join + one groupBy(id) reassembly)
  B bypass   — same hot list; ids owning >=1 hot segment found with a
               left_semi + distinct; dirty docs take path A, clean docs
               take a narrow per-row passthrough; union.

MEASURED RESULT (2026-08-15, r10):
  hot-segment density: 5000/5000 sf0.1 docs own >=1 hot segment
  (dirty fraction 1.000; 362/500 = 0.724 at sf0.01)
  A baseline: 2.26 s   B bypass: 4.66 s   (min of 2, 1-min load 2.84;
  B verified row-identical to A via symmetric exceptAll)
  => the bypass diverts ZERO docs at the bench scale and pays a third
  segmentation pass plus an ids-distinct shuffle plus the semi/anti
  doc-splitting joins: a measured 2.1x REGRESSION.  The fixture's
  generator plants template sentences densely enough that at 5,000
  docs every document owns a hot segment — there is no clean-doc
  population to divert.  The lever remains the right first move on
  real crawls (most docs template-free; composes with the Bloom
  prefilter doctrine in curation.py).  Thread closed permanently:
  the operator keeps shape A; this file is the evidence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basin_cli_spark.operators import curation as C
from basin_cli_spark.session import get_spark
from basin_cli_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bypass_scrub(docs, text_col="text", id_col="doc_id", seg_words=3,
                 min_docs=3):
    """Variant B: zero-hot-segment docs skip the reassembly shuffle."""
    segs = C.segment_rows(docs, text_col, id_col, seg_words).withColumn(
        "_segh", F.xxhash64("seg")
    )
    hot = (
        segs.where(F.col("seg").isNotNull())
        .groupBy("_segh", "seg")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .groupBy("_segh")
        .agg(F.collect_list("seg").alias("_hotsegs"))
    )
    dirty_ids = (
        segs.join(hot.select("_segh"), "_segh", "left_semi")
        .select(id_col)
        .distinct()
    )
    dirty = docs.join(dirty_ids, id_col, "left_semi")
    clean = docs.join(dirty_ids, id_col, "left_anti")
    # narrow passthrough: clean_text is the doc's own segments re-joined
    w = F.filter(F.split(F.col(text_col), " "),
                 lambda t: F.length(t) > F.lit(0))
    n_seg = F.ceil(F.size(w) / F.lit(float(seg_words)))
    clean_out = clean.select(
        F.col(id_col),
        F.array_join(w, " ").alias("clean_text"),
        n_seg.alias("n_segs"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    dirty_out = C.boilerplate_scrub(dirty, text_col, id_col, seg_words,
                                    min_docs)
    return dirty_out.unionByName(clean_out)


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark(app_name="boilerplate_probe")
    d = load_table(spark, SF_DIR, "documents")

    # density: how many docs own >=1 hot segment?
    segs = C.segment_rows(d, "text", "doc_id", 3).withColumn(
        "_segh", F.xxhash64("seg"))
    hot_h = (
        segs.where(F.col("seg").isNotNull())
        .groupBy("_segh", "seg")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 3)
        .select("_segh")
    )
    n_docs = d.count()
    n_dirty = (
        segs.join(hot_h, "_segh", "left_semi").select("doc_id").distinct()
        .count()
    )
    print(f"{SF_DIR}: {n_dirty}/{n_docs} docs own >=1 hot segment "
          f"(dirty fraction {n_dirty / n_docs:.3f})")

    a = C.boilerplate_scrub(d, "text", "doc_id", 3, 3)
    b = bypass_scrub(d, "text", "doc_id", 3, 3)
    same = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )
    print(f"row-identical: {same}")

    spark.catalog.clearCache()
    ta = timed(lambda: C.boilerplate_scrub(d, "text", "doc_id", 3, 3)
               .write.format("noop").mode("overwrite").save())
    tb = timed(lambda: bypass_scrub(d, "text", "doc_id", 3, 3)
               .write.format("noop").mode("overwrite").save())
    print(f"A baseline: {ta:.2f}s   B bypass: {tb:.2f}s   "
          f"(min of 2, load {os.getloadavg()[0]:.2f})")


if __name__ == "__main__":
    main()
