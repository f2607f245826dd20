"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery (schema, partition-friendly
batch shape, Arrow-batched UDF signatures) is real and tested; the actual
codec work is STUBBED (this container ships no image/audio libraries) —
``decode_media`` either raises NotImplementedError (strict mode) or emits
a deterministic fake feature vector derived from the bytes, clearly marked.

The flow mirrors what the 100 TB pipeline does:
  media manifest (explode media spans) -> fetch/attach bytes ->
  mapInPandas decode/feature-extract (Arrow batches, one model per task) ->
  feature table partitioned by content hash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, span_offset int, media_type string,"
    " content binary"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, span_offset int, media_type string,"
    " content_hash string, n_bytes long, features array<float>"
)


def media_manifest(docs_spans: DataFrame) -> DataFrame:
    """Explode media spans -> one row per media reference, typed by
    extension. (doc_id, media_ref, span_offset, media_type)."""
    sp = docs_spans.select("doc_id", F.explode("spans").alias("span")).filter(
        F.col("span.kind") == "media"
    )
    ext = F.lower(F.regexp_extract("span.media_ref", r"\.([A-Za-z0-9]+)$", 1))
    media_type = (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "webp"), "image")
        .when(ext.isin("mp3", "wav", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "webm", "mkv", "avi"), "video")
        .otherwise("unknown")
    )
    return sp.select(
        "doc_id",
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("span_offset"),
        media_type.alias("media_type"),
    )


def attach_fake_bytes(manifest: DataFrame) -> DataFrame:
    """Test stand-in for the fetch step: deterministic bytes from the ref
    (in production this is a join against a blob store / binaryFile scan)."""
    return manifest.withColumn(
        "content", F.encode(F.concat(F.lit("bytes:"), F.col("media_ref")), "utf-8")
    )


def decode_media(with_bytes: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode / feature-extract over mapInPandas.

    STUB: real decoding needs PIL/ffmpeg (absent here). strict=True raises
    NotImplementedError exactly where the codec call would go; otherwise a
    deterministic fake feature vector is derived from the content bytes so
    the batch shape, schema, and partitioning are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this image"
                )
            feats = []
            hashes = []
            for b in pdf["content"]:
                h = hashlib.sha256(bytes(b)).digest()
                hashes.append(h.hex())
                # fake "embedding": first FEATURE_DIM bytes of the digest,
                # scaled to [0,1) — deterministic, marked fake
                feats.append(
                    (np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8) / 256.0)
                    .astype(np.float32)
                    .tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "span_offset": pdf["span_offset"],
                    "media_type": pdf["media_type"],
                    "content_hash": hashes,
                    "n_bytes": pdf["content"].map(len),
                    "features": feats,
                }
            )

    return with_bytes.mapInPandas(run, FEATURE_SCHEMA)


def media_feature_table(docs_spans: DataFrame, strict: bool = False) -> DataFrame:
    """manifest -> bytes -> decode; repartitioned by content hash so the
    downstream near-dup/groupBy work is co-located."""
    out = decode_media(attach_fake_bytes(media_manifest(docs_spans)), strict)
    return out.repartition(F.col("content_hash"))
