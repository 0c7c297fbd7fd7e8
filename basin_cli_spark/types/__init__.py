from basin_cli_spark.types.pg_types import (  # noqa: F401
    UnsupportedTypeError,
    normalize_pg_type,
    pg_to_spark,
    schema_from_pg,
)
