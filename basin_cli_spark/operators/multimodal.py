"""Multimodal (image/audio/video) column plumbing.

Media are modeled the way a 100 TB training-data pipeline stores them:
an opaque ``binary`` content column plus typed metadata columns, processed
by Arrow-batched ``mapInPandas`` / ``pandas_udf`` kernels so bytes never
cross the JVM<->Python boundary row-at-a-time.

Image decoding is DUAL-PATH: when a PIL/Pillow wheel is importable the
kernel parses real pixel dimensions; otherwise (and for bytes PIL cannot
parse) it falls back to a *deterministic stub* that derives dimensions
from the content digest — clearly labeled per row via the ``decoder``
column.  ``allow_stub=False`` demands a real decoder and raises
``NotImplementedError`` when PIL is absent.  Audio/video decode remains
stub-only (no libav in any supported image yet).  Everything around the
kernel — schema, batch iteration, frame explosion, fixed-dim feature
vectors — is the real Spark plumbing and is what the tests assert.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # container without Pillow — stub decode only
    _PILImage = None
    HAVE_PIL = False

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
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def _pil_dims(b: bytes):
    """(width, height) via Pillow, or None when the bytes aren't a
    parseable image.  ``Image.open`` on a BytesIO reads only the header —
    no full pixel decode — so this is cheap even for large blobs."""
    try:
        with _PILImage.open(io.BytesIO(b)) as im:
            return im.size
    except Exception:
        return None


def decode_info(df: DataFrame, *, allow_stub: bool = True) -> DataFrame:
    """Per-blob decode metadata via ``mapInPandas`` (one Arrow batch at a
    time, never per-row Python loop on the JVM boundary).

    Dual-path: with Pillow importable, parseable images get REAL pixel
    dimensions (``decoder='pil'``); unparseable bytes — and every blob in
    a container without Pillow — fall back to the deterministic stub that
    derives dimensions from the sha256 digest (``decoder='stub'``), so
    the output is a pure function of content in every environment.
    ``allow_stub=False`` demands a real decoder: it raises
    ``NotImplementedError`` when Pillow is absent, and marks unparseable
    blobs ``decoder='undecodable'`` with null dimensions instead of
    inventing fake ones."""
    if not allow_stub and not HAVE_PIL:
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
            if HAVE_PIL:
                dims = pdf["content"].map(lambda b: _pil_dims(bytes(b)))
            else:
                dims = pd.Series([None] * len(pdf), index=pdf.index)
            use_stub = dims.isna() & allow_stub
            width = pd.Series(
                [
                    d[0] if d is not None
                    else (int(h[:2], 16) if st else None)
                    for d, h, st in zip(dims, sha, use_stub)
                ],
                dtype="Int32",
            )
            height = pd.Series(
                [
                    d[1] if d is not None
                    else (int(h[2:4], 16) if st else None)
                    for d, h, st in zip(dims, sha, use_stub)
                ],
                dtype="Int32",
            )
            decoder = pd.Series(
                [
                    "pil" if d is not None
                    else ("stub" if st else "undecodable")
                    for d, st in zip(dims, use_stub)
                ],
                dtype="object",
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_sha": sha,
                    "width": width,
                    "height": height,
                    "decoder": decoder,
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
