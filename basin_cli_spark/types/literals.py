"""PG literal parsers for values arriving through the CDC boundary.

wal2json delivers every column value as a JSON scalar; two PG shapes need
real parsing before they can be cast to Spark types (SURVEY.md §4 item 4):

* 1-D array literals: '{42,-42,NULL}', '{a,Z,NULL}'
  (reference internal/app/test_util.go:193-212);
* mixed interval strings: '1 year 2 mons 21 days 05:00:00', '-17 days'
  (reference internal/app/db_test.go:379-390).

Both are pure Catalyst expressions — no UDFs — so they run JVM-side.
Quoted array elements containing commas are out of scope (the reference's
own test vectors never exercise them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_pg_array(col: Column, element_type: T.DataType, elem_fn=None) -> Column:
    """'{a,b,NULL}' -> array<element_type> with NULL elements preserved
    (the reference keeps NULL array elements, type_converter.go:52).

    ``elem_fn`` overrides the per-element conversion for element types a
    plain cast can't produce (interval structs, bytea hex)."""
    inner = F.regexp_replace(col, r"^\{|\}$", "")
    parts = F.when(inner == "", F.array().cast("array<string>")).otherwise(
        F.split(inner, ",")
    )
    convert = elem_fn if elem_fn is not None else (
        lambda s: s.try_cast(element_type)
    )
    return F.transform(
        parts,
        lambda p: F.when(p == "NULL", F.lit(None)).otherwise(
            convert(F.regexp_replace(p, '^"|"$', ""))
        ),
    )


def parse_pg_interval(col: Column) -> Column:
    """PG interval text -> struct(months, days, micros).

    Handles the reference's test vectors: unit words (year/mons/days) in any
    combination plus an optional trailing [-]HH:MM:SS[.ffffff] clock part.
    """
    years = F.coalesce(
        F.regexp_extract(col, r"(-?\d+)\s+year", 1).try_cast("int"), F.lit(0)
    )
    months = F.coalesce(
        F.regexp_extract(col, r"(-?\d+)\s+mon", 1).try_cast("int"), F.lit(0)
    )
    days = F.coalesce(
        F.regexp_extract(col, r"(-?\d+)\s+day", 1).try_cast("int"), F.lit(0)
    )
    clock = F.regexp_extract(col, r"(-?)(\d+):(\d{2}):(\d{2})(\.(\d+))?\s*$", 0)
    sign = F.when(clock.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    hh = F.coalesce(
        F.regexp_extract(col, r"(-?)(\d+):(\d{2}):(\d{2})", 2).try_cast("long"), F.lit(0)
    )
    mm = F.coalesce(
        F.regexp_extract(col, r"(-?)(\d+):(\d{2}):(\d{2})", 3).try_cast("long"), F.lit(0)
    )
    ss = F.coalesce(
        F.regexp_extract(col, r"(-?)(\d+):(\d{2}):(\d{2})", 4).try_cast("long"), F.lit(0)
    )
    frac = F.regexp_extract(col, r"\d+:\d{2}:\d{2}\.(\d+)", 1)
    micros_frac = F.coalesce(
        F.rpad(frac, 6, "0").try_cast("long"), F.lit(0)
    )
    total_micros = sign * (
        (hh * 3600 + mm * 60 + ss) * F.lit(1000000) + micros_frac
    )
    # empty regexp_extract returns '' -> cast NULL -> coalesce 0 handled above
    return F.struct(
        (years * 12 + months).cast("int").alias("months"),
        days.cast("int").alias("days"),
        total_micros.cast("long").alias("micros"),
    )


def format_pg_interval(col: Column) -> Column:
    """struct(months, days, micros) -> PG-style interval text — the inverse
    of parse_pg_interval for the reference's vectors ('1 year 2 mons 21
    days 05:00:00', '-17 days', db_test.go:379-390).  Parts appear only
    when nonzero; the clock part always appears when micros != 0 or when
    everything is zero ('00:00:00')."""
    months, days, micros = col["months"], col["days"], col["micros"]
    years = (months / 12).cast("int")
    mons = months - years * 12
    amicros = F.abs(micros)
    hh = (amicros / 3600000000).cast("long")
    mm = ((amicros / 60000000) % 60).cast("long")
    ss = ((amicros / 1000000) % 60).cast("long")
    frac = (amicros % 1000000).cast("long")
    clock = F.concat(
        F.when(micros < 0, F.lit("-")).otherwise(F.lit("")),
        # format_string, not lpad: lpad TRUNCATES values wider than the pad
        # length (100 hours would become '10')
        F.format_string("%02d:%02d:%02d", hh, mm, ss),
        F.when(
            frac > 0, F.format_string(".%06d", frac)
        ).otherwise(F.lit("")),
    )
    unit = lambda v, word: F.when(  # noqa: E731
        v != 0, F.concat(v.cast("string"), F.lit(" " + word))
    )
    show_clock = (micros != 0) | ((months == 0) & (days == 0))
    return F.concat_ws(
        " ",
        unit(years, "year"),
        unit(mons, "mons"),
        unit(days, "days"),
        F.when(show_clock, clock),
    )
