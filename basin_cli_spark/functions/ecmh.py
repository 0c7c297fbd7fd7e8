"""ECMH — elliptic-curve multiset hash (reference pkg/ecmh/ecmh.go:12-60).

An order-independent, incrementally-updatable dataset digest: each element
maps to a curve point (try-and-increment onto secp256k1); the digest is the
point sum.  Point addition is commutative and associative, so:

* Insert/Remove are inverses (add the point / its negation);
* Union of two multisets = sum of their digests;
* Difference = digest + negated digest;
* partial aggregation is safe — per-partition digests merge by addition,
  which is exactly how the Spark aggregate below distributes.

The reference uses ristretto255; the group differs (secp256k1 reuses this
repo's public-parameter EC code) but the algebra — and therefore the whole
API and its algebraic-property tests (reference pkg/ecmh/ecmh_test.go:14-84)
— is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from basin_cli_spark.functions.hashing import keccak256
from basin_cli_spark.functions.signing import P, _point_add

_B = 7  # secp256k1: y^2 = x^3 + 7


def _hash_to_point(data: bytes):
    """Try-and-increment: x = H(counter || data) until x^3+7 is a QR mod p.
    Expected 2 attempts; deterministic."""
    ctr = 0
    while True:
        x = int.from_bytes(keccak256(ctr.to_bytes(8, "big") + data), "big") % P
        y_sq = (pow(x, 3, P) + _B) % P
        y = pow(y_sq, (P + 1) // 4, P)  # p ≡ 3 (mod 4)
        if y * y % P == y_sq:
            return (x, min(y, P - y))  # canonical: even-ish root
        ctr += 1


def _neg(point):
    if point is None:
        return None
    x, y = point
    return (x, (P - y) % P)


class MultisetHash:
    """Insert/Remove/Union/Difference over a point accumulator —
    the reference's API (ecmh.go:12-60) re-expressed."""

    def __init__(self, point=None) -> None:
        self._point = point

    def insert(self, item: bytes) -> "MultisetHash":
        self._point = _point_add(self._point, _hash_to_point(item))
        return self

    def insert_all(self, items) -> "MultisetHash":
        for it in items:
            self.insert(it)
        return self

    def remove(self, item: bytes) -> "MultisetHash":
        self._point = _point_add(self._point, _neg(_hash_to_point(item)))
        return self

    def remove_all(self, items) -> "MultisetHash":
        for it in items:
            self.remove(it)
        return self

    def union(self, other: "MultisetHash") -> "MultisetHash":
        self._point = _point_add(self._point, other._point)
        return self

    def difference(self, other: "MultisetHash") -> "MultisetHash":
        self._point = _point_add(self._point, _neg(other._point))
        return self

    def digest(self) -> str:
        """Compressed-point hex ('empty' for the identity)."""
        if self._point is None:
            return "empty"
        x, y = self._point
        return ("03" if y & 1 else "02") + x.to_bytes(32, "big").hex()

    def __eq__(self, other) -> bool:
        return isinstance(other, MultisetHash) and self._point == other._point


def ecmh_digest(df: DataFrame, col: str) -> str:
    """Distributed multiset digest of a column.

    Map side: each partition folds its rows into one accumulator point
    (mapInPandas -> one row per partition).  Reduce side: the driver adds
    the <=numPartitions partial points.  Because addition commutes, the
    result is independent of partitioning — the property the reference's
    Union relies on (ecmh.go:41-48).
    """
    import pandas as pd

    def _partial(batches):
        acc = MultisetHash()
        n = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is not None:
                    acc.insert(str(v).encode())
                    n += 1
        if n:
            x, y = acc._point
            yield pd.DataFrame({"x": [hex(x)], "y": [hex(y)]})

    partials = df.select(col).mapInPandas(_partial, schema="x string, y string").collect()
    total = MultisetHash()
    for row in partials:
        total.union(MultisetHash((int(row.x, 16), int(row.y, 16))))
    return total.digest()


def ecmh_digest_by_group(df: DataFrame, key_col: str, col: str) -> DataFrame:
    """Per-group multiset digests: (key, digest) — e.g. one content digest
    per vault/window, so two datasets can be diffed per key by point
    subtraction (the reference's Difference, ecmh.go:45-48).

    applyInPandas groups on the key (one shuffle); each group folds to a
    single point executor-side — only |groups| digest rows return.
    """
    import pandas as pd

    def _group_digest(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = MultisetHash()
        for v in pdf[col]:
            if v is not None:
                acc.insert(str(v).encode())
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "digest": [acc.digest()]}
        )

    out_schema = f"{key_col} string, digest string"
    return (
        df.select(F.col(key_col).cast("string").alias(key_col), col)
        .groupBy(key_col)
        .applyInPandas(_group_digest, schema=out_schema)
    )
