"""Multimodal column plumbing (EXT): image/audio/video as opaque
``binary`` payloads + typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode libraries (PIL/torchaudio/decord) are NOT in this
container, so the decode kernel is stubbed: ``decode_features``
produces deterministic payload-derived pseudo-features, and
``decode_image`` raises NotImplementedError unless PIL is importable.
Everything Spark-side is real and tested — schema contract, Arrow
batch iteration, partition-preserving execution — so swapping the
kernel body for a real decoder is a one-function change.

Scale notes: binary payloads ride in parquet with
``spark.sql.files.maxPartitionBytes`` bounding task input; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle);
metadata-only predicates (kind, n_bytes) push down before any decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("feat_0", LongType()),
        StructField("feat_1", LongType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - container lacks PIL
    """Real decode path — requires PIL (absent here by design)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; this container ships without it — "
            "swap decode_features' kernel when the decoder is available"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def _fake_features(payload: bytes) -> tuple[str, int, int]:
    """Deterministic payload-derived stand-in for decoded features."""
    h = hashlib.sha256(payload).digest()
    return h.hex(), int.from_bytes(h[:4], "big"), int.from_bytes(h[4:8], "big")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each executor receives pandas batches, runs the
    (stub) decode kernel, yields feature frames — zero driver
    involvement, no shuffle."""

    # spread narrow single-split inputs so decode parallelizes across
    # python workers (real media tables arrive multi-split)
    n = int(media.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if media.rdd.getNumPartitions() < n:
        media = media.repartition(n)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha": feats.map(lambda t: t[0]),
                    "feat_0": feats.map(lambda t: t[1]).astype("int64"),
                    "feat_1": feats.map(lambda t: t[2]).astype("int64"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: documents.text → opaque binary payloads with
    cycling media kinds (the container has no real media fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
