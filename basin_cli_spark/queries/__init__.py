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


# The driver's correctness gate samples the FIRST 50 registry entries, so
# iteration order is part of the contract.  Round-7 rotation: rounds 1-6
# attested 111 distinct entries; this head is drawn ENTIRELY from the 79
# that have never carried a driver CORRECTNESS row (full rotation — every
# previously-attested entry moves to the tail, still covered by the
# in-repo all-queries oracle suite).  Family spread is preserved:
# relational basics, set ops, scalar families, sources, windows,
# aggregates, streaming, dedup, text analysis, similarity/embeddings,
# curation, multimodal.  Everything else follows in registration order.
#
# r8 rotation TODO — the 42 entries still without a driver row after r7
# (everything else will then be attested): q_histogram,
# q_llm_prep_pipeline, q_sample_weighted, q_corpus_quantile_prune,
# q_text_pii_scrub, q_token_budget_pack, q_text_hash_embedding,
# q_similarity_text_hash, q_text_normalize, q_corpus_split,
# q_chunk_documents, q_vocab_oov_rate, q_array_funcs, q_hash_funcs,
# q_conditional_null, q_explode_posexplode, q_map_funcs,
# q_interval_arith, q_uuid_canonical, q_union_all, q_intersect_all,
# q_json_roundtrip, q_stream_dedup, q_stream_static_join, q_window_rank,
# q_window_lag_lead, q_window_running, q_window_moving_avg,
# q_window_sliding, q_window_percent_rank; the four swapped out for the
# r7 flagship additions: q_dedup_provenance, q_text_entropy,
# q_corpus_source_stats, q_llm_prep_pipeline_v2 (v4 composes its
# successor stages; v2's components are all individually attested); and
# the late-r7 tail additions q_stream_dsir_score, q_corpus_unimax_apply,
# q_corpus_temperature_mix, q_corpus_dup_ngram_stats, q_sample_kcenter,
# q_corpus_domain_kl, q_corpus_zipf_slope, q_embedding_anisotropy.
REPRESENTATIVE_HEAD = [
    # relational basics
    "q_like_isnull", "q_distinct", "q_limit_offset", "q_orderby_nulls",
    # set ops
    "q_union_distinct", "q_intersect", "q_except",
    # scalar function families
    "q_datetime_funcs", "q_math_funcs", "q_array_hof_fold",
    "q_regexp_extract", "q_fuzzy_prefix_match",
    # sources/sinks
    "q_orc_roundtrip", "q_in_memory_rows",
    # windows / time series
    "q_window_range_frame", "q_window_ignore_nulls",
    "q_window_nth_value", "q_session_window",
    # aggregates
    "q_approx_percentile", "q_muhash_digest_by_group",
    # streaming
    "q_stream_session_window", "q_stream_ivf_assign",
    "q_stream_dedup_within_watermark", "q_stream_stream_join",
    # deduplication
    "q_dedup_clusters", "q_dedup_source_overlap",
    # sampling / data selection (r7 flagships)
    "q_corpus_dsir_select", "q_sample_cluster_cap",
    # text analysis
    "q_text_quality_score", "q_text_fingerprint",
    "q_text_repetition", "q_text_bigram_logprob",
    # similarity / embeddings (r7: the new skew-safe 2pass prune in)
    "q_similarity_knn_label", "q_embedding_label_centroids",
    "q_embedding_prototype_prune_2pass", "q_embedding_center_normalize",
    "q_embedding_quantize",
    # curation (r7: all three new skew-safe 2pass prunes in, plus the
    # quantile-2pass pattern source; the exact quantile form stays
    # in-repo oracle-tested)
    "q_corpus_lm_prune_2pass", "q_corpus_mad_prune_2pass",
    "q_corpus_quantile_prune_2pass", "q_contamination_score",
    "q_vocab_topk", "q_tfidf_topterms", "q_corpus_unimax",
    "q_corpus_datasheet", "q_sample_stratified", "q_llm_prep_pipeline_v4",
    # multimodal plumbing (decode/frames/features UDF surface)
    "q_multimodal_decode", "q_multimodal_frames", "q_multimodal_features",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    registry, REPRESENTATIVE_HEAD first."""
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

    missing = [n for n in REPRESENTATIVE_HEAD if n not in QUERIES]
    assert not missing, f"REPRESENTATIVE_HEAD names unknown queries: {missing}"
    ordered = {n: QUERIES[n] for n in REPRESENTATIVE_HEAD}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    return ordered
