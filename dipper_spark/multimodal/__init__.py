"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Beyond-reference capability (BASELINE.json north star): a 100 TB training-data
pipeline carries media next to text.  The design keeps media as an opaque
``binary`` column with a typed ``media_meta`` struct so that:

- Parquet stores the bytes inline (small media) or as references (large —
  swap ``attach_media`` for a reader over an object-store manifest without
  touching downstream operators);
- Catalyst prunes ``media`` away for metadata-only queries (struct-field
  pruning keeps `media_meta.modality` scans cheap);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — per-partition batch processing, no driver
  involvement, shape-stable schemas declared up front.

The actual codec step (PIL / ffmpeg / librosa) is NOT available in this
container; ``decode_media`` gates the real path behind an import-try and
otherwise uses a clearly-marked DETERMINISTIC FAKE decode so the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real and
tested end-to-end.
"""

from dipper_spark.multimodal.ops import (
    MEDIA_META_FIELDS,
    attach_media,
    byte_histogram_features,
    decode_media,
    media_stats,
    phash_media,
    phash_pairs,
    spectral_hash_media,
    spectral_pairs,
    resize_image,
    sample_frames,
)

__all__ = [
    "MEDIA_META_FIELDS",
    "attach_media",
    "byte_histogram_features",
    "decode_media",
    "media_stats",
    "phash_media",
    "phash_pairs",
    "spectral_hash_media",
    "spectral_pairs",
    "resize_image",
    "sample_frames",
]
