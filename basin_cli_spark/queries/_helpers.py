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


def dec(c: Column | str) -> Column:
    """Exact-decimal view of a raw measure column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dec_sum(c: Column, alias: str) -> Column:
    """SUM of a decimal expression, surfaced as double."""
    return F.sum(c).cast("double").alias(alias)


def dec_avg(c: Column, alias: str) -> Column:
    """AVG = exact decimal sum / count — avoids float-accumulation drift."""
    return (F.sum(c).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dec_sum(expr: str, alias: str) -> str:
    """expr must already be decimal-typed (use sql_dec on raw columns)."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT(*) AS {alias}"
