"""r14 probe: q_text_fingerprint per-char interpreted fold -> vectorized
Arrow kernel (guide §4.1/§4.2; "Not yet optimized" item 6).

The fold h = (h*31 + c) mod p applied left-to-right over char codes is
identically the polynomial sum  sum_i c_i * 31^(n-i) mod p  (exact integer
identity; every intermediate fits int64: c < 128, 31^k mod p < 2^30,
products < 2^37, per-batch cumsum < 2^63 under Arrow's 2 GiB buffer cap).
The kernel reads the Arrow string column's contiguous data buffer +
offsets (guide §4.2's re-slice property) — zero per-row Python.

Usage: python .scratch/fp_arrow_proto.py [sf_dir ...]
Checks exact parity (expr fold vs kernel, exceptAll both ways + adversarial
local cases) then A/B noop timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F

from basin_cli_spark.session import get_spark
from basin_cli_spark.sources.tables import load_table, spread_cpu

P = 1_000_000_007
_POW = np.array([1], dtype=np.int64)  # 31^k mod P, grown on demand


def _pow31(n: int) -> np.ndarray:
    global _POW
    if len(_POW) < n:
        old = len(_POW)
        grown = np.empty(n, dtype=np.int64)
        grown[:old] = _POW
        h = int(_POW[-1])
        for k in range(old, n):
            h = (h * 31) % P
            grown[k] = h
        _POW = grown
    return _POW


def _fp_batch(texts: pd.Series) -> pd.Series:
    arr = pa.Array.from_pandas(texts, type=pa.string())
    if arr.null_count == len(arr):  # all-null batch: no buffers to read
        return pd.Series([None] * len(arr), index=texts.index, dtype="object")
    _, offbuf, databuf = arr.buffers()
    offsets = np.frombuffer(offbuf, dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    base = offsets[0]
    offsets = offsets - base
    total = int(offsets[-1])
    codes = np.frombuffer(databuf, dtype=np.uint8)[
        base : base + total
    ].astype(np.int64)
    lens = np.diff(offsets)
    ends = np.repeat(offsets[1:], lens)
    exp = ends - 1 - np.arange(total, dtype=np.int64)
    pw = _pow31(int(lens.max()) if len(lens) else 1)
    contrib = (codes * pw[exp]) % P
    csum = np.concatenate(([0], np.cumsum(contrib)))
    sums = (csum[offsets[1:]] - csum[offsets[:-1]]) % P
    if arr.null_count:
        out = pd.Series(sums, index=texts.index).astype("Int64")
        out[pd.isna(texts).to_numpy(dtype=bool)] = pd.NA
        return out
    return pd.Series(sums, index=texts.index, dtype="int64")


def _make_fp_udf():
    @F.pandas_udf("long")
    def _fp_udf(texts: pd.Series) -> pd.Series:
        return _fp_batch(texts)

    return _fp_udf


def fp_expr(d):
    cleaned = d.withColumn(
        "_clean", F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")
    )
    fp = F.expr(
        "aggregate(transform(sequence(1, length(_clean)), i -> ascii(substring(_clean, i, 1))), "
        "0L, (h, c) -> (h * 31 + c) % 1000000007)"
    )
    return cleaned.select(F.col("doc_id"), fp.alias("fingerprint"))


def fp_arrow(d):
    cleaned = d.withColumn(
        "_clean", F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")
    )
    return cleaned.select(
        F.col("doc_id"), _make_fp_udf()(F.col("_clean")).alias("fingerprint")
    )


def noop_time(df, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    spark = get_spark("fp_arrow_proto")

    # Adversarial local parity: empty, null, single char, long doc,
    # mixed-case/symbols (cleaned), whitespace-only.
    rows = [
        (1, ""),
        (2, None),
        (3, "a"),
        (4, "z" * 5000),
        (5, "The QUICK brown-fox 42 jumps!"),
        (6, "   "),
        (7, "abc" * 3333 + "xy"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["fingerprint"] for r in fp_expr(d).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in fp_arrow(d).collect()}
    assert a == b, (a, b)
    print(f"adversarial parity: OK ({a})")

    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1", ".scratch/sf1c"]:
        d = spread_cpu(
            load_table(spark, sf_dir, "documents"), sf_dir, "documents"
        ).where(F.col("lang") == "en")
        ex, ar = fp_expr(d), fp_arrow(d)
        diff = ex.exceptAll(ar).count() + ar.exceptAll(ex).count()
        print(f"{sf_dir}: exceptAll both ways = {diff}")
        assert diff == 0
        for tag, df in (("expr fold", ex), ("arrow kernel", ar),
                        ("expr fold (2nd)", ex)):
            mn, md = noop_time(df)
            print(f"   {tag:18s} min {mn:.3f}s med {md:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
