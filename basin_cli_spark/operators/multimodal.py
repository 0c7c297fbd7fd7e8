"""Multimodal (image/audio/video) column plumbing.

Media are modeled the way a 100 TB training-data pipeline stores them:
an opaque ``binary`` content column plus typed metadata columns, processed
by Arrow-batched ``mapInPandas`` / ``pandas_udf`` kernels so bytes never
cross the JVM<->Python boundary row-at-a-time.

The container has no media libraries, so the *decode kernels are
deterministic stubs* (clearly marked below): real pixel/sample decoding
raises ``NotImplementedError`` unless the caller opts into the fake
decoder, which derives metadata/features from the content bytes alone.
Everything around the kernel — schema, batch iteration, frame explosion,
fixed-dim feature vectors — is the real Spark plumbing and is what the
tests assert.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside the opaque blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def synthesize_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic fake media corpus from a text fixture: content is the
    UTF-8 bytes, media_type cycles, n_frames = 1 + id % 5.  Exists so the
    binary-column pipeline has reproducible input in a container without
    media files."""
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        mt.alias("media_type"),
        (F.col(id_col) % 5 + 1).cast("int").alias("n_frames"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_info(df: DataFrame, *, allow_stub: bool = True) -> DataFrame:
    """Per-blob decode metadata via ``mapInPandas`` (one Arrow batch at a
    time, never per-row Python).

    STUB: real decoding (PIL/libav) is unavailable in this container; the
    fake decoder derives width/height from the first sha256 bytes.  Call
    with ``allow_stub=False`` to get the honest ``NotImplementedError``.
    """
    if not allow_stub:
        raise NotImplementedError(
            "real media decode requires PIL/libav, not present in this "
            "container — rerun with allow_stub=True for the deterministic "
            "fake decoder"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sha = pdf["content"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_sha": sha,
                    # STUB decode: "dimensions" from the digest, not pixels.
                    "fake_width": sha.map(lambda h: int(h[:2], 16)).astype("int32"),
                    "fake_height": sha.map(lambda h: int(h[2:4], 16)).astype("int32"),
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, _DECODE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: one output row per kept frame (indices 0, k, 2k, …
    below n_frames), ``frame_hash = md5(content || '#' || idx)`` standing in
    for the decoded frame tensor.  A row-multiplying ``mapInPandas`` — the
    UDTF shape video pipelines need (1 video -> N frame rows)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, content, n in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                for i in range(0, int(n), every_k):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(
                            bytes(content) + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select("media_id", "content", "n_frames").mapInPandas(
        kernel, _FRAME_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = 4) -> DataFrame:
    """Fixed-dim float feature vector per blob via a scalar ``pandas_udf``
    (Arrow-batched).  STUB featurizer: bytes of md5(content) scaled to
    [0, 1] — the real model inference would slot into the same kernel."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def feats(content: pd.Series) -> pd.Series:
        return content.map(
            lambda b: [
                int.from_bytes(
                    hashlib.md5(bytes(b)).digest()[i : i + 1], "big"
                )
                / 255.0
                for i in range(dim)
            ]
        )

    return df.select("media_id", feats(F.col("content")).alias("features"))
