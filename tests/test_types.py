"""Type-mapping golden tests — the engine's analogue of the reference's
CREATE TABLE codegen matrix (reference internal/app/db_test.go:16-126) and
unsupported-type rejections (db_test.go:128-154, 654-676)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from basin_cli_spark.types import (
    UnsupportedTypeError,
    normalize_pg_type,
    pg_to_spark,
    schema_from_pg,
)
from basin_cli_spark.types.literals import parse_pg_array, parse_pg_interval

GOLDEN = {
    "boolean": T.BooleanType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "double precision": T.DoubleType(),
    "numeric": T.DoubleType(),
    "numeric(10,2)": T.DoubleType(),
    "oid": T.LongType(),
    "macaddr": T.StringType(),
    "bytea": T.BinaryType(),
    '"char"': T.StringType(),
    "character": T.StringType(),
    "character(9)": T.StringType(),
    "character varying(255)": T.StringType(),
    "bpchar": T.StringType(),
    "text": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "uuid": T.StringType(),
    "date": T.DateType(),
    "time without time zone": T.StringType(),
    "time with time zone": T.StringType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
}


@pytest.mark.parametrize("pg,expected", GOLDEN.items())
def test_scalar_mapping(pg, expected):
    assert pg_to_spark(pg) == expected


@pytest.mark.parametrize("pg,elem", [
    ("integer[]", T.IntegerType()),
    ("text[]", T.StringType()),
    ("boolean[]", T.BooleanType()),
    ("double precision[]", T.DoubleType()),
    ("numeric[]", T.DoubleType()),
    ("uuid[]", T.StringType()),
    ("date[]", T.DateType()),
])
def test_array_mapping(pg, elem):
    assert pg_to_spark(pg) == T.ArrayType(elem, containsNull=True)


@pytest.mark.parametrize("pg", ["my_enum", "composite_thing", "integer[][]"])
def test_unsupported_rejected(pg):
    with pytest.raises(UnsupportedTypeError):
        pg_to_spark(pg)


def test_normalize():
    assert normalize_pg_type("numeric(10, 2)") == "numeric"
    assert normalize_pg_type("character varying(255)") == "character varying"
    assert normalize_pg_type("  text ") == "text"


def test_schema_from_pg():
    s = schema_from_pg([("id", "integer", False), ("name", "text")])
    assert s == T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
    ])


def test_interval_struct():
    s = pg_to_spark("interval")
    assert [f.name for f in s.fields] == ["months", "days", "micros"]


# --- literal parsers (reference test vectors, test_util.go:193-212,
#     db_test.go:379-390) -----------------------------------------------------

def test_parse_pg_array(spark):
    df = spark.createDataFrame(
        [("{42,-42,NULL}",), ("{}",), (None,)], ["raw"]
    ).select(parse_pg_array(F.col("raw"), T.IntegerType()).alias("arr"))
    rows = [r.arr for r in df.collect()]
    assert rows[0] == [42, -42, None]
    assert rows[1] == []
    assert rows[2] is None


def test_parse_pg_array_text(spark):
    df = spark.createDataFrame([("{a,Z,NULL}",)], ["raw"]).select(
        parse_pg_array(F.col("raw"), T.StringType()).alias("arr")
    )
    assert df.collect()[0].arr == ["a", "Z", None]


@pytest.mark.parametrize("raw,months,days,micros", [
    ("1 year", 12, 0, 0),
    ("2 mons", 2, 0, 0),
    ("21 days", 0, 21, 0),
    ("05:00:00", 0, 0, 5 * 3600 * 1_000_000),
    ("-00:00:07", 0, 0, -7 * 1_000_000),
    ("1 year 2 mons 21 days 05:00:00", 14, 21, 5 * 3600 * 1_000_000),
    ("-17 days", 0, -17, 0),
    ("00:00:00.123", 0, 0, 123_000),
])
def test_parse_pg_interval(spark, raw, months, days, micros):
    df = spark.createDataFrame([(raw,)], ["raw"]).select(
        parse_pg_interval(F.col("raw")).alias("iv")
    )
    iv = df.collect()[0].iv
    assert (iv.months, iv.days, iv.micros) == (months, days, micros)
