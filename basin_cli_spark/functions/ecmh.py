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

Throughput engineering (the digest must survive a 100 TB scan):

* hash-to-point draws x-candidates from C-implemented hashlib.sha256, not
  the pure-Python keccak kept for Ethereum signing parity — the hash
  inside the point mapping is this construction's own choice (the
  reference's ristretto255 mapping likewise uses its own hash), and
  pure-Python Keccak at ~420 us/hash was 90% of the per-row cost;
* the accumulator works in Jacobian coordinates — no modular inversion
  per addition (a pow(a, -1, p) is ~15 us, ~10x the cost of the few
  Jacobian multiplications); ONE inversion happens at digest() time;
* residuosity per attempt is a GCD-style Jacobi symbol (~37 us), so the
  one expensive step — the ~130 us sqrt modular pow — runs once per row,
  not once per attempt; that pow is the pure-CPython floor, and it is
  the operation the opportunistic gmpy2 path below accelerates when a
  GMP wheel is present (see the try-import note).

Net, measured: ~860 -> ~4,100 rows/s/core (~130k rows/s on 32 cores);
the map side is embarrassingly parallel (each partition folds
independently; partials merge by point addition).  ~4,100 rows/s/core is
the DOCUMENTED capability limit for this path (SCALE.md "Multiset-digest
throughput") — the sqrt pow is irreducible in pure CPython.  For 100 TB
digest jobs use functions/muhash.py: the same multiset algebra over a
3072-bit multiplicative group at ~30K rows/s/core (one mulmod per row
instead of a modular sqrt).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from basin_cli_spark.functions.signing import P

_B = 7  # secp256k1: y^2 = x^3 + 7
_SQRT_EXP = (P + 1) // 4  # p ≡ 3 (mod 4): sqrt(a) = a^((p+1)/4)

# Opportunistic native bignum: gmpy2 (GMP) turns the ~130 us sqrt pow —
# the measured per-row floor of this path — into a few us, recovering the
# documented 20-40x where the wheel is installed.  Pure-CPython fallback
# is bit-identical (same golden digests; tests parametrize over whichever
# backends are present).  coincurve (libsecp256k1) is deliberately NOT
# used: it wraps ECDSA/combine, not hash-to-curve, and point *addition*
# is already cheap here (Jacobian, no per-add inversion) — the sqrt in
# the point mapping is the cost, and that is gmpy2's job.
try:
    import gmpy2 as _gmpy2

    HAVE_GMPY2 = True
except ImportError:  # pure-CPython fallback
    _gmpy2 = None
    HAVE_GMPY2 = False


def _sqrt_mod(a: int) -> int:
    if _gmpy2 is not None:
        return int(_gmpy2.powmod(a, _SQRT_EXP, P))
    return pow(a, _SQRT_EXP, P)


def _jacobi(a: int, n: int) -> int:
    """Jacobi symbol (a/n), n odd positive — binary-GCD-style, ~37 us,
    vs ~130 us for the Euler-criterion modular pow.  For prime n this is
    the Legendre symbol: 1 iff a is a nonzero quadratic residue.
    gmpy2's C implementation when available."""
    if _gmpy2 is not None:
        return int(_gmpy2.jacobi(a % n, n))
    a %= n
    result = 1
    while a:
        # strip all trailing zeros at once: an ODD count of 2-factors
        # flips the sign iff n ≡ ±3 (mod 8)
        tz = (a & -a).bit_length() - 1
        if tz:
            a >>= tz
            if tz & 1 and n & 7 in (3, 5):
                result = -result
        a, n = n, a
        if a & 3 == 3 and n & 3 == 3:
            result = -result
        a %= n
    return result if n == 1 else 0


def _hash_to_point(data: bytes):
    """Try-and-increment: x = H(counter || data) until x^3+7 is a QR mod p.
    Expected 2 attempts; deterministic.  Returns affine (x, y) with the
    canonical (smaller) root.

    The residuosity test per attempt is the Jacobi symbol (cheap); the
    expensive sqrt pow runs exactly once, on the successful x — expected
    cost ~1 modular pow per row instead of ~2."""
    ctr = 0
    while True:
        h = hashlib.sha256(ctr.to_bytes(8, "big") + data).digest()
        x = int.from_bytes(h, "big") % P
        y_sq = (pow(x, 3, P) + _B) % P
        if _jacobi(y_sq, P) == 1:
            y = _sqrt_mod(y_sq)
            return (x, min(y, P - y))
        ctr += 1


# -- Jacobian-coordinate group law (public textbook formulas, a=0 curve).
# A point is (X, Y, Z) with affine x = X/Z^2, y = Y/Z^3; None = identity.


def _jac_double(p):
    X1, Y1, Z1 = p
    if Y1 == 0:
        return None
    A = X1 * X1 % P
    Bv = Y1 * Y1 % P
    C = Bv * Bv % P
    D = 2 * ((X1 + Bv) * (X1 + Bv) - A - C) % P
    E = 3 * A % P
    Fv = E * E % P
    X3 = (Fv - 2 * D) % P
    Y3 = (E * (D - X3) - 8 * C) % P
    Z3 = 2 * Y1 * Z1 % P
    return (X3, Y3, Z3)


def _jac_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = Z1 * Z1 % P
    Z2Z2 = Z2 * Z2 % P
    U1 = X1 * Z2Z2 % P
    U2 = X2 * Z1Z1 % P
    S1 = Y1 * Z2 * Z2Z2 % P
    S2 = Y2 * Z1 * Z1Z1 % P
    if U1 == U2:
        if (S1 + S2) % P == 0:
            return None
        return _jac_double(p)
    H = (U2 - U1) % P
    I = 4 * H * H % P
    J = H * I % P
    r = 2 * (S2 - S1) % P
    V = U1 * I % P
    X3 = (r * r - J - 2 * V) % P
    Y3 = (r * (V - X3) - 2 * S1 * J) % P
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % P * H % P
    return (X3, Y3, Z3)


def _to_jac(affine):
    if affine is None:
        return None
    return (affine[0], affine[1], 1)


def _to_affine(jac):
    if jac is None:
        return None
    X, Y, Z = jac
    zinv = pow(Z, -1, P)
    zinv2 = zinv * zinv % P
    return (X * zinv2 % P, Y * zinv2 * zinv % P)


def _jac_neg(jac):
    if jac is None:
        return None
    X, Y, Z = jac
    return (X, (P - Y) % P, Z)


class MultisetHash:
    """Insert/Remove/Union/Difference over a point accumulator —
    the reference's API (ecmh.go:12-60) re-expressed.  The accumulator
    stays in Jacobian coordinates; digest()/equality normalize once."""

    def __init__(self, point=None) -> None:
        # accepts affine (x, y) for compat with persisted partials
        self._jac = _to_jac(point) if point is None or len(point) == 2 else point

    @property
    def _point(self):
        """Affine accumulator (compat surface for tests/partials)."""
        return _to_affine(self._jac)

    def insert(self, item: bytes) -> "MultisetHash":
        self._jac = _jac_add(self._jac, _to_jac(_hash_to_point(item)))
        return self

    def insert_all(self, items) -> "MultisetHash":
        for it in items:
            self.insert(it)
        return self

    def remove(self, item: bytes) -> "MultisetHash":
        self._jac = _jac_add(self._jac, _jac_neg(_to_jac(_hash_to_point(item))))
        return self

    def remove_all(self, items) -> "MultisetHash":
        for it in items:
            self.remove(it)
        return self

    def union(self, other: "MultisetHash") -> "MultisetHash":
        self._jac = _jac_add(self._jac, other._jac)
        return self

    def difference(self, other: "MultisetHash") -> "MultisetHash":
        self._jac = _jac_add(self._jac, _jac_neg(other._jac))
        return self

    def digest(self) -> str:
        """Compressed-point hex ('empty' for the identity)."""
        pt = _to_affine(self._jac)
        if pt is None:
            return "empty"
        x, y = pt
        return ("03" if y & 1 else "02") + x.to_bytes(32, "big").hex()

    def __eq__(self, other) -> bool:
        return isinstance(other, MultisetHash) and self._point == other._point


def _spread_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """Spread the per-row EC work across the session's cores (guide §2.5
    input skew): the fixture tables are single-row-group parquet, so a
    bare mapInPandas fold runs at the SCAN's parallelism — one task.  The
    digest is partitioning-independent (commutative point addition,
    pinned by tests/test_ecmh.py), so a deterministic hash repartition
    is free of correctness risk; xxhash64 of the data itself is stable
    under task retry (guide §2.5's rand() warning).  On a well-split
    warehouse table the exchange is the only cost — ~16 bytes + text per
    row, trivially amortized by the ~130 us/row point mapping."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, F.xxhash64(*cols))


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

    partials = (
        _spread_rows(df.select(col), [col])
        .mapInPandas(_partial, schema="x string, y string")
        .collect()
    )
    total = MultisetHash()
    for row in partials:
        total.union(MultisetHash((int(row.x, 16), int(row.y, 16))))
    return total.digest()


def ecmh_digest_by_group(df: DataFrame, key_col: str, col: str) -> DataFrame:
    """Per-group multiset digests: (key, digest) — e.g. one content digest
    per vault/window, so two datasets can be diffed per key by point
    subtraction (the reference's Difference, ecmh.go:45-48).

    Two-level fold (guide §2.3 "aggregate before you shuffle", §2.5):
    the r14-shape applyInPandas-on-the-group-key ran the ~170 us/row
    point mapping in |groups| tasks — 5 language tasks for the fixture,
    the biggest owning 41% of all rows, i.e. the EC work was serialized
    onto a handful of cores with the rest idle.  Now ONE mapInPandas
    pass folds per-(partition, group) partial POINTS at full scan
    parallelism, and only the tiny (<= partitions x groups) partial
    relation shuffles to the per-group point-sum + digest.  Point
    addition is commutative/associative, so the digest is identical
    under any regrouping (partition-independence is a pinned property,
    tests/test_ecmh.py)."""
    import pandas as pd

    def _partials(batches):
        accs: dict = {}
        for pdf in batches:
            for k, v in zip(pdf[key_col], pdf[col]):
                # track the group even when every value is NULL, so an
                # all-NULL group still surfaces with digest 'empty'
                # (exactly what the one-level group fold produced)
                acc = accs.setdefault(k, MultisetHash())
                if v is not None:
                    acc.insert(str(v).encode())
        if accs:
            pts = {k: acc._point for k, acc in accs.items()}
            yield pd.DataFrame(
                {
                    key_col: list(pts),
                    "x": [hex(p[0]) if p else None for p in pts.values()],
                    "y": [hex(p[1]) if p else None for p in pts.values()],
                }
            )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = MultisetHash()
        for x, y in zip(pdf["x"], pdf["y"]):
            if x is not None:  # identity partial (all-NULL slice)
                acc.union(MultisetHash((int(x, 16), int(y, 16))))
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "digest": [acc.digest()]}
        )

    rows = df.select(F.col(key_col).cast("string").alias(key_col), col)
    partials = _spread_rows(rows, [key_col, col]).mapInPandas(
        _partials, schema=f"{key_col} string, x string, y string"
    )
    return partials.groupBy(key_col).applyInPandas(
        _merge, schema=f"{key_col} string, digest string"
    )
