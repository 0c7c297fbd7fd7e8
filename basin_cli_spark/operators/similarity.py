"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: a broadcast of the
query vector + one pass over the candidates (no shuffle until the final
top-k, which Spark plans as TakeOrderedAndProject — per-partition heaps,
only k rows move).

The scale path is sign-LSH bucketing: a 16-bit signature from the signs of
the leading dimensions partitions the corpus; a query probes only its own
bucket (1/2^16 of the data in expectation).  Both are pure Catalyst
expressions — the dot product is a sequential fold (F.aggregate over
zip_with) that DuckDB's list_reduce replays addition-for-addition, so
scores match the oracle bit-for-bit before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def cosine_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against one stored vector.

    The score is rounded before ordering so rank order is identical across
    engines (raw doubles are already bit-equal here, but ordering on the
    rounded value makes ties explicit and keyed on id).
    """
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_q_emb")
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    cand = df.where(F.col(id_col) != query_vec_id).repartition(par)
    score = F.round(cosine(F.col(vec_col), F.col("_q_emb")), round_to)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def sign_lsh_signature(vec: Column, bits: int = 16) -> Column:
    """Sign-random-projection LSH with axis-aligned planes: bit i is the
    sign of dimension i.  Cheap, deterministic, and oracle-replayable."""
    sig = None
    for i in range(bits):
        term = F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("bigint")


def sign_lsh_bands(
    vec: Column, bands: int = 4, band_bits: int = 4
) -> Column:
    """Banded sign-LSH: array of per-band signatures, band b covering
    dimensions [b*band_bits, (b+1)*band_bits).  Two vectors are join
    candidates when ANY band matches — the OR-amplified construction
    (same as MinHash banding), which keeps recall usable where a single
    wide signature (2^16 buckets) would put every vector in its own
    bucket and return nothing."""
    out = []
    for b in range(bands):
        sig = None
        for j in range(band_bits):
            i = b * band_bits + j
            term = F.when(
                F.element_at(vec, i + 1) >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        out.append(sig.cast("bigint"))
    return F.array(*out)


def cosine_topk_lsh(
    df: DataFrame,
    query_vec_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    band_bits: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """ANN via banded sign-LSH probe: candidates are vectors sharing at
    least one band with the query; exact cosine re-ranks the candidates.
    The probe is a broadcast equi-join on (band index, band signature) —
    at 100 TB the exploded band table is the shuffle/partition key, so
    the probe touches |candidates|, never the corpus."""
    with_b = df.withColumn(
        "_bands", sign_lsh_bands(F.col(vec_col), bands, band_bits)
    )
    q = with_b.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_q_emb"),
        F.posexplode("_bands").alias("_band", "_sig"),
    )
    cand = with_b.where(F.col(id_col) != query_vec_id).select(
        id_col, vec_col, F.posexplode("_bands").alias("_band", "_sig")
    )
    score = F.round(cosine(F.col(vec_col), F.col("_q_emb")), round_to)
    return (
        cand.join(F.broadcast(q), ["_band", "_sig"])
        .dropDuplicates([id_col])
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_ivf(
    df: DataFrame,
    query_vec_id: int,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 25,
    round_to: int = 6,
) -> DataFrame:
    """ANN via IVF probe: the query ranks the codebook, visits only its
    nprobe nearest inverted lists, and scores exactly inside them.  At
    100 TB the assignment's cent_id is the partition key, so a probe scans
    nprobe/|codebook| of the corpus."""
    cents = df.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
    )
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_q_emb")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cent_id",
            F.struct(
                cosine(F.col("cvec"), F.col("_q_emb")).alias("sim"),
                F.col("cent_id").alias("cent_id"),
            ).alias("sc"),
        )
        .orderBy(F.col("sc").desc())
        .limit(nprobe)
        .select("cent_id")
    )
    # IVF build + probe in ONE shuffle: score every vector against the
    # broadcast codebook, keep the argmax centroid via max(struct) while
    # carrying the vector itself with first() — no join-back to recover the
    # embedding (the naive plan's sort-merge self-join is the thing that
    # doesn't survive a 100 TB corpus).  Exact re-scoring then touches only
    # the nprobe probed lists.
    par = df.sparkSession.sparkContext.defaultParallelism
    scored = df.repartition(par).crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.struct(
            cosine(F.col(vec_col), F.col("cvec")).alias("sim"),
            F.col("cent_id").alias("cent_id"),
        ).alias("sc"),
    )
    assign = scored.groupBy(id_col).agg(
        F.max("sc")["cent_id"].alias("cent_id"),
        F.first(vec_col).alias(vec_col),
    )
    cand = assign.join(F.broadcast(probe), "cent_id", "left_semi").where(
        F.col(id_col) != query_vec_id
    )
    score = F.round(cosine(F.col(vec_col), F.col("_q_emb")), round_to)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
