"""Multimodal column plumbing (SURVEY.md / driver north star): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extraction as Arrow-batched Pandas UDFs
over ``mapInPandas``.

The container has no image/audio libraries, so the decode step is STUBBED:
``decode_image_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it produces seeded fake features
from the payload bytes. Everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested (tests/test_llm.py).

Scale notes: binary payloads ride in parquet as plain byte arrays;
``mapInPandas`` streams Arrow record batches, so executor memory is bounded
by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
partition size. Feature extraction is embarrassingly parallel — zero
shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..registry import register

#: Output schema of the decode/feature stage — stable contract for sinks.
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("phash", StringType()),
    ]
)


def decode_image_stub(payload: bytes, *, deterministic_fake: bool = False) -> dict:
    """Decode an image payload → (format, width, height, phash).

    STUB: real decoding needs an image library this container lacks.
    With ``deterministic_fake`` the dimensions derive from the payload's
    md5 — stable across runs/engines, good enough to exercise the
    pipeline's schema, batching, and partitioning for real.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; "
            "run with deterministic_fake=True for pipeline tests"
        )
    digest = hashlib.md5(payload).hexdigest()
    return {
        "format": "fake",
        "width": int(digest[:4], 16) % 1920 + 1,
        "height": int(digest[4:8], 16) % 1080 + 1,
        "phash": digest[:16],
    }


def extract_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over a binary payload column.

    Input must carry (doc_id: long, payload: binary); output follows
    IMAGE_FEATURES_SCHEMA. Arrow-batched — never row-at-a-time Python.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(p, deterministic_fake=True) for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "n_bytes", [len(p) for p in pdf[payload_col]])
            yield out[[f.name for f in IMAGE_FEATURES_SCHEMA.fields]]

    from ..session import ship_package

    # ``run`` closes over module-level symbols (decode_image_stub, the
    # schema) that executors import by reference — ship the package.
    ship_package(df.sparkSession)
    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def documents_as_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata has no binary column; synthesize one from text bytes.

    This stands in for reading real image bytes — the binary-typed column,
    not its content, is what the plumbing exercises.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "source"
    )


Q39_SQL = """
SELECT
  doc_id,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 AS fake_width,
  CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 AS fake_height,
  substr(md5(text), 1, 16) AS phash
FROM documents
"""


@register("q39_multimodal_meta", Q39_SQL)
def q39_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column, all JVM-side.

    Mirrors what ``extract_image_features`` computes in Python — this
    SQL-expressible twin lets the oracle verify the metadata derivation
    (sizes, md5-derived fake dimensions, prefix phash) end to end.
    """
    blobs = documents_as_blobs(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    j = blobs.join(d, "doc_id")
    md5 = F.md5(F.col("text"))
    return j.select(
        "doc_id",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        (F.conv(F.substring(md5, 1, 4), 16, 10).cast("long") % 1920 + 1).alias(
            "fake_width"
        ),
        (F.conv(F.substring(md5, 5, 4), 16, 10).cast("long") % 1080 + 1).alias(
            "fake_height"
        ),
        F.substring(md5, 1, 16).alias("phash"),
    )


@register("q43_image_features")  # rows-only: exercises the Pandas-UDF path
def q43_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real mapInPandas pipeline over synthesized binary payloads."""
    return extract_image_features(
        documents_as_blobs(spark, sf_dir).select("doc_id", "payload")
    )


def resize_image_stub(
    payload: bytes, width: int, height: int, *, deterministic_fake: bool = False
) -> bytes:
    """Resize an image payload to (width, height).

    STUB: real resizing needs an imaging library. The deterministic fake
    re-derives bytes from (payload digest, target dims) so the output is
    stable and size-plausible — enough to exercise the binary-in /
    binary-out UDF plumbing for real.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image resizing requires an imaging library; "
            "run with deterministic_fake=True for pipeline tests"
        )
    seed = hashlib.md5(payload + f"{width}x{height}".encode()).digest()
    size = max(1, (width * height) // 512)
    return (seed * (size // len(seed) + 1))[:size]


def sample_frames_stub(
    payload: bytes, n_frames: int, *, deterministic_fake: bool = False
) -> list[dict]:
    """Sample ``n_frames`` evenly from a video payload → per-frame records.

    STUB: real demuxing needs a video library. The fake derives one
    digest per frame index — deterministic, so downstream dedup/embedding
    stages are testable.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "video decoding requires a media library; "
            "run with deterministic_fake=True for pipeline tests"
        )
    return [
        {
            "frame_idx": i,
            "phash": hashlib.md5(payload + bytes([i])).hexdigest()[:16],
        }
        for i in range(n_frames)
    ]


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("phash", StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame, n_frames: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas frame sampling: one input row (video) → n_frames rows.

    The row-expanding shape matters: frame extraction multiplies rows, and
    doing it inside mapInPandas keeps the expansion streaming through
    Arrow batches instead of materializing per-video frame lists in a
    single row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                for fr in sample_frames_stub(
                    payload, n_frames, deterministic_fake=True
                ):
                    out.append(
                        {"doc_id": doc_id, "frame_idx": fr["frame_idx"], "phash": fr["phash"]}
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "phash"])

    from ..session import ship_package

    ship_package(df.sparkSession)
    return df.mapInPandas(run, FRAME_SCHEMA)
