"""Query registry — the declared operator surface of the engine.

Every operator from SURVEY.md §2 gets a named entry here: a Spark builder
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB oracle
SQL string over the same fixture tables.  ``__spark_entry__.py`` re-exports
this registry as the driver contract.

Determinism rules (so order-insensitive value-hashes match the oracle):
* Money/measure sums go through ``DECIMAL(18,2)`` so the aggregation is
  exact and order-independent, then cast back to double (identical in both
  engines); see _helpers.dec_sum.
* Averages are expressed as exact-decimal-sum / count, never float avg.
* Genuinely float results (cosine scores, exp/log) are rounded identically
  on both sides.
* Any LIMIT/OFFSET or window function sits on a total order (unique-key
  tie-break).
* Array outputs are sorted and joined to strings (engines differ in
  container types, not values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check


QUERIES: dict[str, QuerySpec] = {}

# Runtime SQL confs every query depends on, applied defensively because the
# driver may hand us a session built by a different factory:
# * nanosAsLong — events.parquet stores TIMESTAMP(NANOS); without the flag
#   the scan itself throws (sources/tables.py then converts the long);
# * UTC session tz — timestamp casts/windows must agree with the UTC-naive
#   DuckDB oracle;
# * AQE — the planning behavior the scale design assumes.
REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a locked conf is better than a failed query


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder to the registry (wrapped so the
    session always carries REQUIRED_CONFS, whoever constructed it)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    registry."""
    from basin_cli_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        analytics_ext,
        cdc_queries,
        corpus_ops,
        events_surface,
        joins,
        llm_ops,
        relational,
        scalar_funcs,
        setops,
        sources_queries,
        streaming_queries,
        windows,
    )

    return QUERIES
