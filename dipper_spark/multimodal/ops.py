"""Multimodal operators: binary media columns + Arrow-batched processing.

Layout per row::

    media: binary                      -- opaque encoded bytes
    media_meta: struct<modality string, mime string, width int, height int,
                       sample_rate int, n_frames int, n_bytes bigint>

Scale notes:
- metadata queries never touch ``media`` (nested-field pruning — verified via
  .explain ReadSchema shows only media_meta when media is unreferenced);
- every per-byte stage is ``mapInPandas`` (Arrow batches, zero per-row Python
  overhead); batch size follows spark.sql.execution.arrow.maxRecordsPerBatch;
- decode fan-out (frame sampling) is a generator UDF — output rows stream per
  batch, the full decoded video never materializes in one Python list.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ["image", "audio", "video"]
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

MEDIA_META_FIELDS = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Deterministic media ingest over the synthetic documents table.

    Stands in for a real manifest reader (object-store paths + sidecar
    metadata).  Bytes are the utf-8 text payload; modality cycles by doc_id;
    metadata is derived deterministically so oracles can recompute it.  All
    pure column expressions — JVM-side, codegen'd.
    """
    modality = F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int"))
    n_bytes = F.octet_length(F.col("media")).cast("long")
    return (
        docs.withColumn("media", F.encode(F.col("text"), "UTF-8"))
        .withColumn(
            "media_meta",
            F.struct(
                modality.alias("modality"),
                F.element_at(
                    F.create_map(*[x for m in MODALITIES for x in (F.lit(m), F.lit(MIMES[m]))]),
                    modality,
                ).alias("mime"),
                F.when(modality == "audio", F.lit(None).cast("int"))
                .otherwise((F.col("doc_id") % 64 + 1).cast("int") * 16)
                .alias("width"),
                F.when(modality == "audio", F.lit(None).cast("int"))
                .otherwise((F.col("doc_id") % 48 + 1).cast("int") * 16)
                .alias("height"),
                F.when(modality == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
                F.when(modality == "video", (F.col("doc_id") % 30 + 1).cast("int"))
                .when(modality == "image", F.lit(1).cast("int"))
                .alias("n_frames"),
                n_bytes.alias("n_bytes"),
            ),
        )
    )


def _try_real_codecs():
    """The real decode path needs PIL/soundfile/av — absent in this container."""
    try:  # pragma: no cover - not installed here by design
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("decoded", BinaryType()),
        StructField("decode_ok", StringType()),
    ]
)


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode media bytes → raw sample/pixel buffer (Arrow-batched).

    With real codecs installed this would be ``PIL.Image.open`` /
    ``soundfile.read`` per modality.  Here the codec step is STUBBED: either
    raise NotImplementedError (``strict=True``) or apply a DETERMINISTIC FAKE
    decode (byte-reverse) that preserves size so downstream shape logic is
    exercised honestly.  The plumbing — mapInPandas signature, declared output
    schema, per-batch iteration — is the real production shape.
    """
    have_codecs = _try_real_codecs()
    if strict and not have_codecs:
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/av which are not installed; "
            "run with strict=False for the deterministic fake-decode path"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    # FAKE DECODE (deterministic): reverse of the encoded bytes.
                    "decoded": [bytes(reversed(b)) if b is not None else None for b in pdf["media"]],
                    "decode_ok": "fake",
                }
            )

    flat = media.select(
        "doc_id", F.col("media_meta.modality").alias("modality"), "media"
    )
    return flat.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: normalized byte-value histogram per media blob.

    The one per-byte stage that is REAL (not stubbed): with codecs installed
    the same batch loop would run a vision/audio encoder over the decoded
    buffer — identical schema, identical batching.  numpy.bincount per Arrow
    batch; output is a fixed-dim ``array<float>`` ready for the similarity
    operators (cosine_topk / ivf_topk take any embedding column).
    """
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["media"]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * bins)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)
                feats.append((hist / len(arr)).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": pdf["modality"], "features": feats}
            )

    flat = media.select("doc_id", F.col("media_meta.modality").alias("modality"), "media")
    return flat.mapInPandas(feature_batches, schema=FEATURES_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage: images only, others pass through untouched.

    Real path would be PIL ``Image.resize``; the FAKE keeps bytes and rewrites
    the metadata struct (what a resize contract guarantees downstream).  Done
    as column expressions — a resize that only the image rows pay for, with no
    shuffle and no Python when stubbed.
    """
    is_img = F.col("media_meta.modality") == "image"
    new_meta = F.struct(
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.mime").alias("mime"),
        F.when(is_img, F.lit(width)).otherwise(F.col("media_meta.width")).alias("width"),
        F.when(is_img, F.lit(height)).otherwise(F.col("media_meta.height")).alias("height"),
        F.col("media_meta.sample_rate").alias("sample_rate"),
        F.col("media_meta.n_frames").alias("n_frames"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )
    return media.withColumn("media_meta", new_meta)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling: one output row per kept frame (1:N generator).

    Real path: pyav keyframe iteration.  FAKE: the blob is split into
    ``n_frames`` equal slices and every ``every_n``-th slice is emitted.  The
    plumbing is the production shape — a generator mapInPandas whose output
    rows stream out per input batch, so a 2-hour video never materializes as
    one Python object; fan-out parallelism comes from input partitioning.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, nf, b in zip(pdf["doc_id"], pdf["n_frames"], pdf["media"]):
                if b is None or nf is None or nf <= 0:
                    continue
                step = max(1, len(b) // int(nf))
                for i in range(0, int(nf), every_n):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(bytes(b[i * step : (i + 1) * step]))
            yield pd.DataFrame({"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames})

    vids = media.filter(F.col("media_meta.modality") == "video").select(
        "doc_id", F.col("media_meta.n_frames").alias("n_frames"), "media"
    )
    return vids.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Per-modality inventory: count / total+avg bytes / frame totals.

    Metadata-only — the plan must NOT read ``media`` (nested pruning keeps the
    scan to the meta struct).  This is the query a 100 TB lake runs constantly
    and it must cost megabytes, not terabytes.
    """
    return (
        media.groupBy(F.col("media_meta.modality").alias("modality"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("media_meta.n_bytes").alias("total_bytes"),
            F.round(F.avg("media_meta.n_bytes"), 2).alias("avg_bytes"),
            F.sum(F.coalesce(F.col("media_meta.n_frames"), F.lit(0)).cast("long")).alias(
                "total_frames"
            ),
        )
        .orderBy("modality")
    )
