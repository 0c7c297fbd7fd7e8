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
    session always carries REQUIRED_CONFS, whoever constructed it).

    Output contract (driver-strict, enforced at run time rather than here
    because a builder's schema needs a live SparkSession): no raw
    array/map/struct output columns (use _helpers.vec_str / F.array_join),
    and every column's type class must match the oracle's Arrow schema.
    oracle.compare() rejects violations and
    tests/test_registry_contract.py walks every entry, so a rule-breaking
    registration fails the suite the first time it executes."""

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
# iteration order is part of the contract.  Round-8 rotation — the
# attestation-completion head: rounds 1-7 attested 161 distinct entries;
# this head carries (a) the 42 entries that have never had a driver
# CORRECTNESS row (everything never-attested, per the r7 TODO), (b) the 5
# entries red in CORRECTNESS_r07, all fixed this round (canonicalization/
# dtype contract violations, not wrong values — see oracle.py's hardened
# compare()), and (c) 3 re-attestation picks: q_ecmh_digest_by_group
# (its only driver rows predate its oracle, so it has never been
# hash-attested), q_datetime_funcs (oracle day_start/month_start now CAST
# AS TIMESTAMP for the dtype-class gate), and q_window_nth_value (judge-
# flagged NULL-masked int-vs-double risk; arrow-level audit says int==int,
# this row proves it under the driver).  After a green r8, cumulative
# driver attestation is 203/203.
#
# Round-9 rotation — the stale-first freshness head: CORRECTNESS r1-r8
# attestation is 203/203 cumulative with zero red latest rows, so r9
# rotates the 43 entries whose latest driver row predates round 5 (they
# predate the hardened driver-strict canonicalizer and four rounds of code
# churn: outer-join family, 17 TPC-H shapes, rollup/cube/pivot/unpivot,
# corr/covar/median, simhash/ngram-jaccard dedup, events at/latest_n,
# CDC replays) plus 7 round-5 picks whose underlying code changed since
# their last green row — q_dedup_exact (binary unhex(md5) key rework,
# commit ab673d5), keep_one/minhash (shared dedup kernels), the three
# similarity probes (operators/similarity.py churn), decontaminate (Bloom
# prefilter touched in r6).  After a green r9, no registry entry's latest
# attestation predates round 5.
#
# Round-10 rotation — the final freshness rotation (r9 verdict item #2):
# after r9, the latest-attestation distribution is {r9: 50, r8: 50,
# r7: 43, r6: 50, r5: 10}.  That head carried the 10 r5-latest entries
# plus the 40 oldest r6-latest entries; CORRECTNESS_r10 attested all 50
# green, so after r10 nothing predates round 6 and every entry has been
# re-attested under the driver-strict canonicalizer (r8+).
#
# Round-11 rotation — freshness completion, leg 1 of 2 (r10 verdict item
# #1): latest-attestation distribution after r10 is {r10: 50, r9: 50,
# r8: 50, r7: 43, r6: 10}.  This head carries the 10 entries whose latest
# driver row is still r6 plus the 40 OLDEST of the 43 r7-latest entries.
# All 43 were first attested in r7, so the age sort (first-ever
# attestation round, registry position — same key as r9/r10, computed
# from CORRECTNESS_r01..r10.json against the r10 registry order) reduces
# to registry position; the 3 entries left for r12 are the positional
# tail: q_stream_session_window, q_stream_dedup_within_watermark,
# q_stream_ivf_assign.  After a green r11, no entry's latest attestation
# predates round 7.
#
# Round-12 rotation — freshness completion, leg 2 of 2 (r11 verdict item
# #1): latest-attestation distribution after r11 is {r11: 50, r10: 50,
# r9: 50, r8: 50, r7: 3}.  This head carries the 3 entries whose latest
# driver row is still r7 (leg 1's positional tail) plus the 47 OLDEST of
# the 50 r8-latest entries, under the same age key as r9/r10/r11
# (first-ever attestation round, then registry position, computed from
# CORRECTNESS_r01..r11.json against the r11 registry order):
# q_ecmh_digest_by_group (first r1), the seven first-r7 entries, then
# the first-r8 entries in position order.  The 3 r8 leftovers for a
# hypothetical r13 leg are the positional tail: q_window_sliding,
# q_window_percent_rank, q_stream_dsir_score.  After a green r12, no
# entry's latest attestation predates round 8 — every entry's latest
# green row postdates the driver-strict canonicalizer, the width-cast
# surface, and the sql_dec2dbl oracle-cast route.
#
# Round-13 rotation — freshness completion, leg 3 (final; r12 verdict
# item #1): latest-attestation distribution after r12 is {r12: 50,
# r11: 50, r10: 50, r9: 50, r8: 3}.  This head carries the 3 entries
# whose latest driver row is still r8 (leg 2's positional tail:
# q_window_sliding, q_window_percent_rank, q_stream_dsir_score) plus the
# 47 OLDEST of the 50 r9-latest entries under the same age key as
# r9-r12 (first-ever attestation round, then registry position, computed
# from CORRECTNESS_r01..r12.json against the r12 registry order): the
# 35 first-r1 entries, the 11 first-r2 entries, then
# q_minhash_jaccard_estimate (first r4).  The 3 r9 leftovers are the
# positional tail: q_similarity_ann_multiprobe, q_dedup_keep_one,
# q_decontaminate — all three first attested r4-r5 and re-attested r9,
# i.e. already post-canonicalizer, so no further leg is required on
# freshness grounds.  After a green r13, no entry's latest attestation
# predates round 9.
#
# Round-14 rotation — STEADY-STATE POLICY (r13 verdict item #2): the
# freshness program is complete (post-r13 distribution {r13: 50, r12: 50,
# r11: 50, r10: 50, r9: 3}; nothing predates the r8 driver-strict
# canonicalizer).  From r14 on, every head is simply the 50 entries with
# the OLDEST latest-attestation under the standing age key — (latest
# driver-green round, first-ever attestation round, registry position),
# computed from all CORRECTNESS_r*.json against the previous round's
# registry order — so attestations never re-age past ~4 rounds and no
# bespoke leg design is needed.  For r14 that was the 3 r9-latest
# positional leftovers plus the 47 oldest r10-latest entries.
#
# Round-15 rotation — steady-state leg 2: post-r14 distribution is
# {r14: 50, r13: 50, r12: 50, r11: 50, r10: 3}.  This head is the 3
# r10-latest positional leftovers (q_similarity_pq_adc_trained,
# q_embedding_prototype_prune, q_similarity_hard_negatives) plus the 47
# oldest r11-latest entries under the standing age key — recomputed this
# round from CORRECTNESS_r01..r14.json against the r14 registry order.
# The 3 r11 leftovers for r16 are the positional tail:
# q_session_window, q_window_range_frame, q_window_ignore_nulls.
REPRESENTATIVE_HEAD = [
    # -- the 3 r10-latest entries (r14 leg's positional tail) --
    "q_similarity_pq_adc_trained", "q_embedding_prototype_prune",
    "q_similarity_hard_negatives",
    # -- the 47 oldest r11-latest entries --
    # first attested r6, in r14 registry-position order:
    "q_sample_per_source_cap", "q_corpus_boilerplate_scrub",
    "q_corpus_mad_prune", "q_corpus_gopher_rules", "q_llm_prep_pipeline_v3",
    "q_split_leakage", "q_corpus_rebalance", "q_corpus_shard_pack",
    "q_stream_quality_gate", "q_stream_cdc_apply",
    # first attested r7:
    "q_approx_percentile", "q_muhash_digest_by_group",
    "q_dedup_source_overlap", "q_text_quality_score", "q_text_fingerprint",
    "q_multimodal_decode", "q_multimodal_frames",
    "q_embedding_label_centroids", "q_similarity_knn_label",
    "q_embedding_prototype_prune_2pass", "q_dedup_clusters",
    "q_sample_stratified", "q_sample_cluster_cap", "q_embedding_quantize",
    "q_contamination_score", "q_corpus_mad_prune_2pass",
    "q_corpus_quantile_prune_2pass", "q_vocab_topk", "q_tfidf_topterms",
    "q_text_bigram_logprob", "q_corpus_lm_prune_2pass",
    "q_corpus_dsir_select", "q_llm_prep_pipeline_v4", "q_corpus_unimax",
    "q_corpus_datasheet", "q_like_isnull", "q_distinct", "q_limit_offset",
    "q_orderby_nulls", "q_fuzzy_prefix_match", "q_array_hof_fold",
    "q_union_distinct", "q_intersect", "q_except", "q_in_memory_rows",
    "q_orc_roundtrip", "q_stream_stream_join",
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
