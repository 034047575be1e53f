"""Multimodal column plumbing (north-star LLM-pipeline operator,
BASELINE.json): image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The image/audio decode libraries are not in this container, so the
actual decode is STUBBED (``decode_media`` raises
NotImplementedError unless a codec backend is importable) and the
Spark-side plumbing — schema, batch shape, partition flow — is real
and oracle-checked via a deterministic fake decoder whose outputs
are pure functions of the payload bytes.

Scale posture: media blobs are large; ``mapInPandas`` streams Arrow
record batches (bounded memory per batch) instead of collecting
rows, and metadata-only projections never touch the blob column
(parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..spec import QuerySpec
from ._helpers import spread

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, "
    "n_frames int, modality string"
)


def decode_media(payload: bytes) -> dict:
    """Real decode path — requires a codec backend (PIL/ffmpeg),
    which this container does not ship."""
    try:
        import PIL.Image  # noqa: F401, PLC0415
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "media decode needs a codec backend (PIL/ffmpeg); "
            "not available in this environment — use fake_decode_meta"
        ) from exc
    raise NotImplementedError("real decode wiring lands with the codec backend")


def _fake_decode_batches_fn():
    """Deterministic fake decoder: metadata as pure byte-functions.
    Stands in for the real decoder with the same batch shape.

    Returned as a closure so cloudpickle ships it BY VALUE — workers
    must not need this package importable (the driver's SparkSession
    knows nothing about our sys.path)."""

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # noqa: PLC0415 - worker-side import

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": (n_bytes % 640 + 1).astype("int32"),
                    "fake_height": (n_bytes * 7 % 480 + 1).astype("int32"),
                    "n_frames": (n_bytes % 30 + 1).astype("int32"),
                    "modality": (pdf["doc_id"] % 2).map({0: "image", 1: "video"}),
                }
            )

    return fake_decode


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture media table: the documents' text bytes as an opaque
    binary payload column (the fixtures ship no real blobs)."""
    return spread(load(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract metadata from binary payloads via
    mapInPandas (Arrow batches). The fake decoder's outputs are
    byte-deterministic, so even this Python-side path hash-matches a
    SQL oracle — proving batch shape and schema, not just row count."""
    return _media_table(spark, sf_dir).mapInPandas(
        _fake_decode_batches_fn(), schema=DECODE_SCHEMA
    )


MM_DECODE_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS fake_height,
       CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS modality
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 5th frame index per video row —
    sequence + explode (one narrow stage, rows fan out inside the
    task, nothing shuffles)."""
    meta = mm_decode_meta(spark, sf_dir)
    return (
        meta.filter(F.col("modality") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))
            ).alias("frame_idx"),
        )
        .withColumn("frame_idx", F.col("frame_idx").cast("int"))
    )


MM_FRAME_SAMPLE_ORACLE = """
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_idx
FROM (
    SELECT doc_id, octet_length(encode(text)) % 30 + 1 AS n_frames
    FROM documents WHERE doc_id % 2 = 1
)
"""


def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: target dims computed JVM-side (aspect-
    preserving fit into 224×224); the pixel work is the stubbed
    decode. Rows-only check (no oracle) — exercises the
    metadata-only projection that never reads the blob column."""
    meta = mm_decode_meta(spark, sf_dir)
    scale = F.least(
        F.lit(224) / F.col("fake_width"), F.lit(224) / F.col("fake_height")
    )
    return meta.select(
        "doc_id",
        "modality",
        F.floor(F.col("fake_width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("fake_height") * scale).cast("int").alias("target_height"),
    )


_FEAT_DIM = 8


def _feature_extract_batches_fn(dim: int = _FEAT_DIM):
    """Deterministic fake feature extractor: an ``dim``-dimensional
    embedding whose coordinates are md5-seeded hash projections of the
    payload bytes — a pure byte-function standing in for a real model
    forward pass, with the same Arrow-batched plumbing and schema.

    Coordinates are h32 / 2^32: division by a power of two is exact in
    binary floating point, so Python, Spark, and DuckDB agree
    bit-for-bit with NO rounding step (round() would diverge —
    Python rounds half-to-even, DuckDB half-away).

    Closure-wrapped so cloudpickle ships it by value (workers don't
    have this package on sys.path under the harness driver)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415 - worker-side import

        import pandas as _pd  # noqa: PLC0415

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                base = hashlib.md5(bytes(payload)).hexdigest()
                feats.append(
                    [
                        int(
                            hashlib.md5(f"{base}_{i}".encode()).hexdigest()[:8], 16
                        )
                        / 4294967296.0
                        for i in range(dim)
                    ]
                )
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return extract


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction from binary payloads: mapInPandas emits one
    array<double> embedding per blob (the shape a real vision/audio
    encoder produces), then posexplode flattens to (doc_id, dim,
    value) rows so the oracle compares scalars, not array encodings.
    The blob column is read exactly once, inside the Arrow batch."""
    embedded = _media_table(spark, sf_dir).mapInPandas(
        _feature_extract_batches_fn(), schema="doc_id long, features array<double>"
    )
    return embedded.select(
        "doc_id", F.posexplode("features").alias("dim", "value")
    ).withColumn("dim", F.col("dim").cast("int"))


MM_FEATURE_EXTRACT_ORACLE = f"""
-- md5(VARCHAR) hashes the string's UTF-8 bytes = exactly the payload
-- blob the Spark side hashes (DuckDB 1.0 has no md5(BLOB) overload)
SELECT doc_id, CAST(t.i AS INTEGER) AS dim,
       (('0x' || substring(md5(md5(text) || '_' || t.i), 1, 8))::BIGINT)
         / 4294967296.0 AS value
FROM documents, range({_FEAT_DIM}) t(i)
"""


SPECS = [
    QuerySpec("mm_decode_meta", mm_decode_meta, MM_DECODE_META_ORACLE, tags=("llm", "multimodal", "udf")),
    QuerySpec("mm_feature_extract", mm_feature_extract, MM_FEATURE_EXTRACT_ORACLE, tags=("llm", "multimodal", "udf")),
    QuerySpec("mm_frame_sample", mm_frame_sample, MM_FRAME_SAMPLE_ORACLE, tags=("llm", "multimodal")),
    QuerySpec("mm_resize_stub", mm_resize_stub, None, doc="rows-only: stubbed decode", tags=("llm", "multimodal")),
]
