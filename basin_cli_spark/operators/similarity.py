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

import math

import numpy as np
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


def random_planes(
    dim: int, n_planes: int, seed: int = 42, nnz: int = 8
) -> list[list[tuple[int, int]]]:
    """Seeded sparse random-projection hyperplanes.

    Each plane is `nnz` distinct dimensions with ±1 coefficients
    (Achlioptas-style sparse projection): cheap to evaluate, mixes many
    feature dimensions so the bit does not correlate with the scale of any
    single raw feature (the flaw of axis-aligned planes), and fully
    deterministic from (dim, n_planes, seed, nnz) — so the DuckDB oracle
    regenerates the identical planes and replays the bucketing exactly.
    """
    rng = np.random.default_rng(seed)
    planes = []
    for _ in range(n_planes):
        dims = rng.choice(dim, size=min(nnz, dim), replace=False)
        signs = rng.choice(np.array([-1, 1]), size=len(dims))
        planes.append([(int(d), int(s)) for d, s in zip(dims, signs)])
    return planes


def band_bits_for(n_rows: int, target_bucket: int = 64) -> int:
    """Size bits-per-band to the corpus: expected band-bucket size is
    n/2^bits, and per-bucket pair generation is |bucket|^2, so bits must
    GROW with the corpus — log2(n / target_bucket), clamped to [4, 30].

    At n=500 (bench fixture) this is 4 bits (16 buckets); at n=10^9 it is
    24 bits (~60-row buckets), keeping per-bucket self-join cost flat
    instead of quadratic in N.  A fixed 4-bit band at 10^9 vectors would
    make every bucket N/16 wide — all-pairs with a constant factor.
    """
    if n_rows <= 0:
        return 4
    return max(4, min(30, int(math.ceil(math.log2(max(n_rows / target_bucket, 2.0))))))


def _plane_proj(vec: Column, plane: list[tuple[int, int]]) -> Column:
    """Signed-sum projection of vec onto one sparse ±1 plane (double)."""
    proj = None
    for d, s in plane:
        term = F.element_at(vec, d + 1).cast("double")
        term = term if s > 0 else -term
        proj = term if proj is None else proj + term
    return proj


def plane_proj_sql(v: str, plane: list[tuple[int, int]]) -> str:
    """DuckDB expression replaying _plane_proj addition-for-addition."""
    parts = []
    for d, s in plane:
        parts.append(
            f"{'+' if s > 0 else '-'} CAST({v}[{d + 1}] AS DOUBLE)"
        )
    return "(0.0 " + " ".join(parts) + ")"


def sign_lsh_signature(vec: Column, bits: int = 16, dim: int = 64, seed: int = 42) -> Column:
    """Sign-random-projection LSH signature: bit i is the sign of the
    projection onto seeded sparse random plane i."""
    planes = random_planes(dim, bits, seed)
    sig = None
    for i in range(bits):
        term = F.when(
            _plane_proj(vec, planes[i]) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("bigint")


def sign_lsh_bands(
    vec: Column,
    bands: int = 4,
    band_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> Column:
    """Banded sign-LSH: array of per-band signatures, band b built from
    seeded random-projection planes [b*band_bits, (b+1)*band_bits).  Two
    vectors are join candidates when ANY band matches — the OR-amplified
    construction (same as MinHash banding), which keeps recall usable
    where a single wide signature (2^16 buckets) would put every vector
    in its own bucket and return nothing.

    Corpus sizing: pass band_bits=band_bits_for(n) so bucket width tracks
    the corpus instead of staying fixed at bench scale.  seed/dim make the
    planes deterministic for the DuckDB oracle (sign_lsh_bands_sql).
    """
    planes = random_planes(dim, bands * band_bits, seed)
    out = []
    for b in range(bands):
        sig = None
        for j in range(band_bits):
            p = planes[b * band_bits + j]
            term = F.when(
                _plane_proj(vec, p) >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        out.append(sig.cast("bigint"))
    return F.array(*out)


def sign_lsh_band_sql(
    v: str, band: int, band_bits: int = 4, dim: int = 64, seed: int = 42, bands: int = 4
) -> str:
    """DuckDB SQL for one band's signature, regenerating the SAME seeded
    planes as sign_lsh_bands — single source of truth for both engines."""
    planes = random_planes(dim, bands * band_bits, seed)
    terms = []
    for j in range(band_bits):
        p = planes[band * band_bits + j]
        terms.append(
            f"CASE WHEN {plane_proj_sql(v, p)} >= 0 THEN {1 << j} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


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
