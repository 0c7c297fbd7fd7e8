"""PG -> Spark type mapping.

Mirrors the reference's typeConversionMap (reference
internal/app/type_converter.go:224-286) with the deviations documented in
SURVEY.md §1.2:

* numeric(p,s) -> double (the reference is deliberately lossy here too);
* oid (unsigned) -> long (Spark has no unsigned);
* time / timetz / uuid / macaddr / json / jsonb -> string;
* interval -> struct(months, days, micros) — PG mixed intervals such as
  '1 year 2 mons 21 days 05:00:00' don't fit a single Spark interval type;
* 1-D arrays of every supported scalar, with NULL elements preserved
  (reference type_converter.go:52);
* numeric[] keeps the reference's quirk of *integer-ish* element handling
  being inconsistent with scalar numeric — we map it to array<double> and
  document the deviation.

Parameterized types are normalized by stripping (N)/(N,M) the way the
reference does (reference internal/app/db.go:341-359).  Unsupported:
enums/composites and multi-dimensional arrays (reference
internal/app/db.go:355, db_test.go:128-154, 654-676).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T


class UnsupportedTypeError(ValueError):
    """Raised for PG types the engine (like the reference) rejects."""


INTERVAL_STRUCT = T.StructType(
    [
        T.StructField("months", T.IntegerType(), True),
        T.StructField("days", T.IntegerType(), True),
        T.StructField("micros", T.LongType(), True),
    ]
)

_SCALAR: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "double precision": T.DoubleType(),
    "numeric": T.DoubleType(),  # precision deliberately dropped, like the reference
    "oid": T.LongType(),  # unsigned in PG; widened
    "macaddr": T.StringType(),
    "bytea": T.BinaryType(),
    '"char"': T.StringType(),
    "character": T.StringType(),
    "character varying": T.StringType(),
    "bpchar": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "uuid": T.StringType(),
    "date": T.DateType(),
    "time without time zone": T.StringType(),  # Spark has no TimeType
    "time with time zone": T.StringType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "interval": INTERVAL_STRUCT,
}

_PARAM_RE = re.compile(r"\(\s*\d+\s*(,\s*\d+\s*)?\)")


def normalize_pg_type(pg_type: str) -> str:
    """Strip (N)/(N,M) parameters and surrounding whitespace — the same
    normalization as the reference (internal/app/db.go:341-359)."""
    return _PARAM_RE.sub("", pg_type.strip()).strip()


def pg_to_spark(pg_type: str) -> T.DataType:
    """Map one PG type name (information_schema style) to a Spark type."""
    norm = normalize_pg_type(pg_type.lower())
    if norm.endswith("[]"):
        elem = norm[:-2]
        if elem.endswith("[]"):
            raise UnsupportedTypeError(
                f"multi-dimensional arrays are not supported: {pg_type!r}"
            )
        return T.ArrayType(pg_to_spark(elem), containsNull=True)
    if norm in _SCALAR:
        return _SCALAR[norm]
    raise UnsupportedTypeError(f"unsupported PG type: {pg_type!r}")


def schema_from_pg(
    columns: list[tuple[str, str]] | list[tuple[str, str, bool]],
) -> T.StructType:
    """Build a StructType from (name, pg_type[, nullable]) tuples — the
    engine-side analogue of the reference's TableSchema
    (reference internal/app/db.go:48-52)."""
    fields = []
    for col in columns:
        name, pg_type, *rest = col
        nullable = rest[0] if rest else True
        fields.append(T.StructField(name, pg_to_spark(pg_type), nullable))
    return T.StructType(fields)
