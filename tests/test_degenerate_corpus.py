"""Degenerate-corpus differential tests.

The generated fixtures carry non-null, non-empty prose, so the oracle
suite never exercises the edges a real crawl is full of: NULL text,
empty strings, whitespace-only documents, single-token documents, and a
single-document corpus.  Spark and DuckDB differ in null propagation
and empty-aggregate behavior in exactly these corners, so every text
operator that claims to handle them gets a hash-for-hash differential
here (same harness as tests/test_unicode.py).

Operators documented to DROP degenerate rows (entropy and repetition
score only docs with content) are asserted through the same oracle —
both engines must drop the same rows, not merely "not crash".
"""

from __future__ import annotations

import duckdb
import pytest

from basin_cli_spark.oracle import compare
from basin_cli_spark.queries import load_all

_ROWS = [
    (0, None, "en", "src0", 0),          # NULL text
    (1, "", "en", "src1", 0),            # empty
    (2, "   ", "en", "src0", 3),         # whitespace only
    (3, "word", "en", "src1", 4),        # single token
    (4, "\t\n \n\t", "en", "src0", 6),   # exotic whitespace
    (5, "the quick brown fox jumps over the lazy dog again and again "
        "with many plain tokens to keep the statistics sane", "en",
     "src1", 113),
    (6, "the quick brown fox jumps over the lazy dog again and again "
        "with many plain tokens to keep the statistics sane", "en",
     "src0", 113),                       # exact dup of 5
    # "w3" and "w12" md5-hash to the SAME dimension (34) with OPPOSITE
    # signs (mined against operators/text.hash_embedding's nibble
    # arithmetic), so this doc's feature-hashed embedding is the exact
    # zero vector — it must be DROPPED by the norm>0 guard on both
    # engines, not ANSI-crash Spark or emit a NULL-element list in DuckDB
    (7, "w3 w12", "en", "src1", 6),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degencorpus")
    spark.createDataFrame(
        _ROWS,
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q_dedup_exact",
        "q_text_normalize",
        "q_text_token_count",
        "q_text_quality_score",
        "q_text_entropy",          # drops empty docs — both engines must
        "q_text_repetition",       # drops <3-token docs — same contract
        "q_corpus_gopher_rules",
        "q_corpus_dup_ngram_stats",
        "q_corpus_boilerplate_scrub",  # must PRESERVE degenerate rows
        "q_text_pii_scrub",
        "q_text_hash_embedding",
        "q_chunk_documents",
        "q_vocab_oov_rate",
        "q_text_bigram_logprob",
        "q_corpus_split",
    ],
)
def test_degenerate_corpus_differential(spark, degen_dir, name):
    spec = load_all()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degen_dir}/documents.parquet/*.parquet')"
    )
    ok, msg = compare(spec.fn(spark, degen_dir), con.execute(spec.oracle).arrow())
    assert ok, f"{name} diverges on degenerate corpus: {msg}"


# -- degenerate embeddings -----------------------------------------------------

def _vec(*pairs, dim=64):
    v = [0.0] * dim
    for i, x in pairs:
        v[i] = float(x)
    return v


_EMB_ROWS = [
    # label 0: vec 2 equals the GLOBAL centroid of all-label vectors? no —
    # center_normalize centers on the corpus mean; the zero vector below
    # and labels 2/3 shift it, so none of these is degenerate under
    # centering.  They anchor a normal multi-vector label for anisotropy.
    (0, _vec((0, 2.0)), 0),
    (1, _vec((1, 2.0)), 0),
    (2, _vec((0, 1.0), (1, 1.0)), 0),
    # label 1: the exact ZERO vector — no direction: anisotropy must
    # exclude it (WHERE nrm > 0 both engines); pairwise cosine against it
    # must be NULL (try_divide vs DuckDB x/0), never a job-killing
    # DIVIDE_BY_ZERO
    (3, _vec(), 1),
    # label 2: an identical pair — mean pairwise cosine exactly 1
    (4, _vec((2, 3.0), (3, 1.0)), 2),
    (5, _vec((2, 3.0), (3, 1.0)), 2),
    # label 3: singleton — n*(n-1) = 0: NULLIF/nullif must yield NULL on
    # both engines
    (6, _vec((4, 1.0), (5, 2.0), (6, 3.0)), 3),
]


@pytest.fixture(scope="module")
def degen_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenembeddings")
    spark.createDataFrame(
        _EMB_ROWS, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q_embedding_anisotropy",        # zero-norm excluded, singleton NULL
        "q_embedding_center_normalize",  # centroid-equal vector dropped
        # zero vector's cosine is NULL on both engines (try_divide vs
        # x/0), filtered by the >= 0.40 gate; the identical pair scores
        # 1.0 so the result is non-vacuous.  band_bits_for(7) = 4, the
        # same bits the static oracle replays.
        "q_dedup_embedding",
        "q_dedup_embedding_keep_one",
    ],
)
def test_degenerate_embeddings_differential(spark, degen_emb_dir, name):
    spec = load_all()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{degen_emb_dir}/embeddings.parquet/*.parquet')"
    )
    ok, msg = compare(
        spec.fn(spark, degen_emb_dir), con.execute(spec.oracle).arrow()
    )
    assert ok, f"{name} diverges on degenerate embeddings: {msg}"


def test_anisotropy_degenerate_values(spark, degen_emb_dir):
    """Beyond engine agreement, the VALUES: identical pair -> 1.0;
    singleton label -> NULL; the zero vector's label disappears."""
    rows = {
        r["label"]: r
        for r in load_all()["q_embedding_anisotropy"]
        .fn(spark, degen_emb_dir)
        .collect()
    }
    assert 1 not in rows  # zero vector excluded, label vanishes
    assert rows[2]["mean_pairwise_cos"] == pytest.approx(1.0, abs=1e-6)
    assert rows[3]["mean_pairwise_cos"] is None
    assert rows[3]["n_vecs"] == 1


def test_kcenter_degenerate_rows_and_small_corpus(spark, degen_emb_dir):
    """kcenter_select on the degenerate embeddings: the zero vector must
    never be picked (its NULL max-cos would otherwise win every argmin
    under NULLS FIRST), k > usable-rows stops early with every usable row
    picked exactly once, and far_cos stays monotone non-decreasing."""
    from basin_cli_spark.operators.similarity import kcenter_select

    e = spark.read.parquet(f"{degen_emb_dir}/embeddings.parquet")
    picks = kcenter_select(e, k=100)
    ids = [vid for _, vid, _ in picks]
    assert 3 not in ids, "the zero vector was selected"
    assert len(ids) == len(set(ids)) == 6  # 7 rows minus the zero vector
    cos = [c for _, _, c in picks[1:]]
    assert cos == sorted(cos)
