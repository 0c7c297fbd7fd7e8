"""Shared helpers for oracle-parity determinism (see queries/__init__ docs).

Rule: only *raw fixture columns* are cast double->decimal (their values are
clean 2-decimal quantities, so the cast is unambiguous in every engine).
All subsequent arithmetic stays in decimal (exact, order-independent); the
final aggregate is cast back to double.  Never cast a computed double
product to decimal — Java's BigDecimal rounds the exact binary expansion
while DuckDB rounds the shortest decimal repr, and they disagree on values
near a .005 boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"

# Per-column minimal precisions.  Any precision yields the same exact value
# (a 2-dp quantity casts losslessly into every type below), but keeping every
# *product* at <= 18 digits keeps Spark's Decimal on its compact-long fast
# path inside whole-stage codegen instead of per-row java.math.BigDecimal —
# measured ~2x on the Q1-style aggregations.  Bounds are TPC-H row-value
# invariants (per-row measures don't grow with SF): discount/tax < 1,
# quantity <= 50, prices < 1e6.  E.g. Q1's charge chain stays long-backed:
# (8,2) price x (4,2) one_minus_disc -> (13,4); x (4,2) one_plus_tax ->
# (18,6).  Sum accumulators still widen to p+10 (exact, overflow-safe at any
# SF); only the per-row arithmetic narrows.
COL_DEC = {
    "l_discount": "decimal(3,2)",
    "l_tax": "decimal(3,2)",
    "l_quantity": "decimal(6,2)",
    "l_extendedprice": "decimal(8,2)",
    "o_totalprice": "decimal(8,2)",
    "c_acctbal": "decimal(8,2)",
    "s_acctbal": "decimal(8,2)",
    "p_retailprice": "decimal(8,2)",
    "value": "decimal(8,2)",
}


def dec(c: Column | str) -> Column:
    """Exact-decimal view of a raw measure column (tight precision when the
    column's value bound is known, 18,2 otherwise)."""
    if isinstance(c, str):
        return F.col(c).cast(COL_DEC.get(c, DEC))
    return c.cast(DEC)


def one_minus(c: Column | str) -> Column:
    """``1 - frac`` as decimal(4,2) — a bare Python ``1 -`` promotes the
    literal to decimal(10,0) and the difference to (13,2), pushing any
    product past 18 digits and off the compact-long fast path."""
    return F.lit(1).cast("decimal(1,0)") - dec(c)


def one_plus(c: Column | str) -> Column:
    """``1 + frac`` as decimal(4,2) (see one_minus)."""
    return F.lit(1).cast("decimal(1,0)") + dec(c)


def dec_sum(c: Column, alias: str) -> Column:
    """SUM of a decimal expression, surfaced as double."""
    return F.sum(c).cast("double").alias(alias)


def dec_avg(c: Column, alias: str) -> Column:
    """AVG = exact decimal sum / count — avoids float-accumulation drift."""
    return (F.sum(c).cast("double") / F.count(F.lit(1))).alias(alias)


def vec_str(col: Column | str, scale: int = 6) -> Column:
    """Double-array -> canonical string (registry rule: no raw container
    output columns — a raw list crashes the driver's canonicalizer).

    Each element is assumed already rounded to ``scale`` decimal places on
    both engines; it is scaled to an integer (ROUND first — Spark's
    double->long cast truncates while DuckDB's rounds, so the cast must see
    an exact .0) and joined with ','.  Scaled integers also dodge the
    -0.0-vs-0.0 and shortest-repr formatting traps of stringifying doubles
    directly.

    NULL elements surface as an explicit 'NULL' token (Spark's
    null_replacement; COALESCE per element on the DuckDB side) — both
    engines' default join DROPS null elements, which would silently lose
    positional information and could mask an upstream bug that produced a
    NULL vector element (a [1,NULL,3] and a [1,3] vector must not
    canonicalize to the same string)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(
            c, lambda x: F.round(x * (10 ** scale), 0).cast("long").cast("string")
        ),
        ",",
        "NULL",
    )


def sql_vec_str(expr: str, scale: int = 6) -> str:
    """DuckDB replay of vec_str over a DOUBLE list expression (including
    the per-element NULL sentinel — ARRAY_TO_STRING itself drops NULLs, so
    the COALESCE must run inside the transform)."""
    return (
        f"ARRAY_TO_STRING(LIST_TRANSFORM({expr}, "
        f"x -> COALESCE(CAST(CAST(ROUND(x * {10 ** scale}) AS BIGINT) AS VARCHAR),"
        f" 'NULL')), ',')"
    )


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dec2dbl(expr: str) -> str:
    """Correctly-rounded DECIMAL -> DOUBLE for the DuckDB oracle, via a
    string intermediate.

    DuckDB's direct decimal->double cast computes (double)int128 * 10^-scale
    — TWO roundings — while Spark's goes through BigDecimal.doubleValue
    (one correctly-rounded conversion).  The casts agree up to ~15
    significant digits, but a DECIMAL sum that needs 16+ (first seen at the
    sf1 decade: q1's sum_charge = 27864178755.319390 -> DuckDB direct
    ...319393, Spark/correct ...31939) lands 1 ULP apart and fails the
    driver-strict repr() hash.  Both engines' string->double parses ARE
    correctly rounded, so routing the oracle cast through VARCHAR makes it
    bit-identical to Spark at any scale.  Applied per OUTPUT row — usually
    post-aggregation (per-group rows), but windows.py also routes per-row
    window-frame results through it, so the oracle pays the string hop
    once per result row; cheap at fixture scales, but do not lean on it
    for hot-path row volumes.  Caveat: only
    for values with adjusted exponent > -7 (money/measure sums — always
    true here); tinier decimals would print in scientific notation on the
    Spark side, though this helper never sees Spark output.
    """
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dec_sum(expr: str, alias: str) -> str:
    """expr must already be decimal-typed (use sql_dec on raw columns)."""
    return f"{sql_dec2dbl(f'SUM({expr})')} AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    return f"{sql_dec2dbl(f'SUM({expr})')} / COUNT(*) AS {alias}"
