"""Distributed Lloyd k-means for ANN codebooks (IVF lists, PQ subspaces).

The round-trip per Lloyd iteration is the textbook distributed form:

  map side   — one mapInPandas pass per partition: vectorized numpy argmin
               against the broadcast (closure-captured) centroid matrix,
               then k partial (count, sum-vector) rows per partition.
               This is the map-side combine: a partition contributes k
               rows regardless of its row count, so the driver collects
               O(partitions * k) tiny rows, never vectors.
  reduce side — the driver adds the partials and divides; the codebook is
               a model parameter of k*dim doubles (16 KB at k=16, d=64),
               so driver-side reduction is the right altitude — the same
               shape MLlib's KMeans and faiss's training loop use.

Init is deterministic and data-spread: the k rows with the smallest
xxhash64(id, seed) — a seeded uniform sample that any engine can replay,
with no RNG-library stream dependence.

Empty clusters keep their previous centroid (standard Lloyd fallback), so
k never shrinks and iteration distortion is monotone non-increasing —
tests/test_similarity_trained.py asserts both that and the trained-vs-stub
distortion win.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> np.ndarray:
    rows = df.select(vec_col).collect()
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def init_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic seeded-uniform init: k rows with the smallest
    xxhash64(id, seed).  TakeOrderedAndProject — only k rows reach the
    driver."""
    picked = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(k)
    )
    return _collect_matrix(picked, id_col, vec_col)


def _partial_sums(vec_col: str, cents: np.ndarray, metric: str):
    """mapInPandas kernel: per-batch argmin/argmax assignment + per-cluster
    (count, sum) partials.  `metric` is 'l2' (PQ) or 'cos' (IVF lists)."""
    k, dim = cents.shape
    cents_t = cents.T.copy()
    c2 = (cents * cents).sum(axis=1)
    cnorm = np.sqrt(c2)
    cnorm[cnorm == 0.0] = 1.0  # cosine denominator only; c2 stays exact

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_list()).astype(np.float64)
            scores = V @ cents_t
            if metric == "cos":
                vn = np.sqrt((V * V).sum(axis=1))
                vn[vn == 0.0] = 1.0
                assign = np.argmax(scores / vn[:, None] / cnorm[None, :], axis=1)
            else:
                # argmin L2^2 == argmax (dot - ||c||^2/2)
                assign = np.argmax(scores - 0.5 * c2[None, :], axis=1)
            counts += np.bincount(assign, minlength=k)
            np.add.at(sums, assign, V)
        out = pd.DataFrame(
            {
                "cent": np.arange(k, dtype=np.int64),
                "n": counts,
                "s": list(sums),
            }
        )
        yield out[out["n"] > 0]

    return fn


def lloyd_step(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str = "embedding",
    metric: str = "cos",
) -> np.ndarray:
    """One Lloyd iteration: distributed partial sums, driver reduce.
    Empty clusters keep their previous centroid."""
    k, dim = cents.shape
    partials = df.select(vec_col).mapInPandas(
        _partial_sums(vec_col, cents, metric),
        schema="cent long, n long, s array<double>",
    ).collect()
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, dim), dtype=np.float64)
    for row in partials:
        counts[row.cent] += row.n
        sums[row.cent] += np.asarray(row.s, dtype=np.float64)
    new = cents.copy()
    nz = counts > 0
    new[nz] = sums[nz] / counts[nz, None]
    return new


def train_kmeans(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    metric: str = "cos",
    max_train_rows: int = 1_000_000,
) -> np.ndarray:
    """Lloyd-trained codebook: deterministic init + `iters` distributed
    iterations.  Returns the (k, dim) centroid matrix.

    Codebooks are statistics of the distribution, not of every row, so
    past `max_train_rows` the training set is a DETERMINISTIC uniform
    sample (xxhash64(id, seed) threshold — any engine replays it); this
    is how faiss/ScaNN-style indexes train at corpus scale: a bounded
    sample fits the iteration budget while assignment stays full-corpus.
    At the fixtures' sizes the sample is the whole table.
    """
    n = df.count()
    train = df
    if n > max_train_rows:
        # keep ~max_train_rows rows: xxhash64 is uniform over int64
        frac = max_train_rows / n
        cut = int((2**63 - 1) * frac)
        train = df.where(
            F.abs(F.xxhash64(F.col(id_col), F.lit(seed + 1))) <= cut
        )
    cents = init_centroids(train, k, id_col, vec_col, seed)
    for _ in range(iters):
        cents = lloyd_step(train, cents, vec_col, metric)
    return cents


def distortion(
    df: DataFrame, cents: np.ndarray, vec_col: str = "embedding",
    metric: str = "cos",
) -> float:
    """Mean quantization cost: 1 - cos(v, assigned) for 'cos', squared L2
    to the assigned centroid for 'l2'.  One mapInPandas pass, scalar out."""
    k, dim = cents.shape
    cents_t = cents.T.copy()
    c2 = (cents * cents).sum(axis=1)
    cnorm = np.sqrt(c2)
    cnorm[cnorm == 0.0] = 1.0  # cosine denominator only; c2 stays exact

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tot, n = 0.0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_list()).astype(np.float64)
            scores = V @ cents_t
            if metric == "cos":
                vn = np.sqrt((V * V).sum(axis=1))
                vn[vn == 0.0] = 1.0
                sim = scores / vn[:, None] / cnorm[None, :]
                tot += (1.0 - sim.max(axis=1)).sum()
            else:
                d2 = (V * V).sum(axis=1)[:, None] - 2 * scores + c2[None, :]
                tot += d2.min(axis=1).sum()
            n += len(V)
        yield pd.DataFrame({"tot": [tot], "n": [n]})

    parts = df.select(vec_col).mapInPandas(fn, schema="tot double, n long").collect()
    tot = sum(r.tot for r in parts)
    n = sum(r.n for r in parts)
    return tot / max(n, 1)


def assign_ids(
    df: DataFrame, cents: np.ndarray, vec_col: str = "embedding",
    metric: str = "cos", out_col: str = "cent_id",
) -> DataFrame:
    """Attach the argmin/argmax centroid id — the IVF list / PQ code
    assignment.  Vectorized pandas_udf; at 100 TB this column is the
    partition key that makes a probe read nprobe/k of the corpus."""
    cents_t = cents.T.copy()
    c2 = (cents * cents).sum(axis=1)
    cnorm = np.sqrt(c2)
    cnorm[cnorm == 0.0] = 1.0  # cosine denominator only; c2 stays exact

    @F.pandas_udf("long")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        V = np.stack(vs.to_list()).astype(np.float64)
        scores = V @ cents_t
        if metric == "cos":
            vn = np.sqrt((V * V).sum(axis=1))
            vn[vn == 0.0] = 1.0
            a = np.argmax(scores / vn[:, None] / cnorm[None, :], axis=1)
        else:
            a = np.argmax(scores - 0.5 * c2[None, :], axis=1)
        return pd.Series(a.astype(np.int64))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd codebooks for product quantization: returns an
    (m, k, sub_dim) array.  Each subspace trains on the corresponding
    slice; all m trainings share each data pass? — no: subspace slices are
    independent slices of the SAME rows, so one slice projection per
    subspace is a narrow select and the m trainings reuse Spark's scan
    cache; at 16 KB per codebook the driver loop is the right altitude.
    """
    books = []
    for mi in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(
                F.transform(vec_col, lambda x: x.cast("double")),
                mi * sub_dim + 1,
                sub_dim,
            ).alias("_sub"),
        )
        books.append(
            train_kmeans(
                sub, k=k, iters=iters, id_col=id_col, vec_col="_sub",
                seed=seed + mi, metric="l2",
            )
        )
    return np.stack(books)
