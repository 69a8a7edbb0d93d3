"""Query catalog, part 3: multimodal binary-column operators.

The media table is derived deterministically from ``documents`` by
``attach_media`` (bytes = utf-8 payload, modality cycles by doc_id), so the
DuckDB oracle can recompute the metadata side exactly.  The decode /
feature-extraction stages run through real ``mapInPandas`` plumbing with the
codec stubbed (this container has no PIL/ffmpeg); the frame-sampling fan-out
count IS oracle-checkable (ceil(n_frames / every_n)), which pins the
generator-UDF row semantics from SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.multimodal import (
    attach_media,
    byte_histogram_features,
    media_stats,
    sample_frames,
)
from dipper_spark.plans.catalog import register
from dipper_spark.session import load_table

MODALITY_SQL = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


@register(
    "q_media_stats",
    f"""
    WITH m AS (
      SELECT doc_id,
             {MODALITY_SQL} AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT modality,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           ROUND(avg(n_bytes), 2) AS avg_bytes,
           CAST(sum(CASE modality WHEN 'video' THEN doc_id % 30 + 1
                                  WHEN 'image' THEN 1 ELSE 0 END) AS BIGINT) AS total_frames
    FROM m GROUP BY modality ORDER BY modality
    """,
)
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media inventory — must never scan the binary payload."""
    return media_stats(attach_media(load_table(spark, sf_dir, "documents")))


@register(
    "q_media_frames",
    f"""
    WITH m AS (
      SELECT doc_id, doc_id % 30 + 1 AS n_frames
      FROM documents WHERE {MODALITY_SQL} = 'video')
    SELECT doc_id,
           CAST((n_frames + 4) // 5 AS BIGINT) AS n_sampled
    FROM m
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample fan-out: the generator mapInPandas emits exactly
    ceil(n_frames/5) rows per video — checked against closed-form SQL."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return (
        sample_frames(media, every_n=5)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "q_media_features",
    f"""
    WITH ch AS (
      SELECT doc_id, {MODALITY_SQL} AS modality,
             unnest(regexp_split_to_array(text, '')) AS c
      FROM documents),
    b AS (SELECT doc_id, modality, ord(c) // 16 AS bin FROM ch)
    SELECT doc_id, modality, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM b GROUP BY doc_id, modality, bin
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-histogram feature extraction, hard-checked: the
    normalized float32 histogram is inverted back to exact integer byte
    counts (``round(frac * n_bytes)`` — exact while counts < 2^23), which
    DuckDB recomputes from character codes (the synthetic corpus is pure
    ASCII, so code point == UTF-8 byte).  Bins with zero mass are dropped on
    both sides."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    feats = byte_histogram_features(media, bins=16)
    lens = media.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes"))
    hist = feats.select(
        "doc_id", "modality", F.posexplode("features").alias("bin", "frac")
    )
    return (
        hist.join(lens, "doc_id")
        .select(
            "doc_id",
            "modality",
            F.col("bin").cast("long").alias("bin"),
            F.round(F.col("frac").cast("double") * F.col("n_bytes")).cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


@register(
    "q_media_dedup",
    """
    SELECT md5(substr(text, 1, 48)) AS payload_key, min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY payload_key HAVING count(*) >= 2
    """,
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup by payload digest: md5 over a 48-byte prefix of the
    BINARY media column (storage dedup for image/audio/video assets — the
    leading-bytes digest is the header-block key real asset dedup starts
    from; hash the whole blob for strict identity).  Spark slices/hashes
    the blob; the oracle hashes the source text whose utf-8 bytes ARE the
    blob, so the keys coincide on this ascii corpus.  One hash-agg on the
    digest; the payload never shuffles."""
    from dipper_spark.operators.dedup import exact_dedup

    media = attach_media(load_table(spark, sf_dir, "documents"))
    key = F.md5(F.substring(F.col("media"), 1, 48))
    return exact_dedup(media, "doc_id", key, min_group=2).select(
        F.col("dup_key").alias("payload_key"),
        "canonical_id",
        F.col("n_dups").alias("n_copies"),
    )


_PH_CELLS = 64  # 1-D resample windows = DCT length; hash is _PH_CELLS-1 bits


@register(
    "q_media_phash",
    f"""
    WITH b AS (
      SELECT doc_id, length(text) AS n, u.j AS j,
             ord(array_extract(regexp_split_to_array(text, ''), u.j + 1)) AS byte
      FROM documents, unnest(range(0, length(text))) AS u(j)),
    cells AS (
      -- decoded position i = n-1-j (the stub decode is a byte reverse);
      -- mean-pool onto {_PH_CELLS} equal windows
      SELECT doc_id, ((n - 1 - j) * {_PH_CELLS}) // n AS cell,
             avg(CAST(byte AS DOUBLE)) AS v
      FROM b GROUP BY 1, 2),
    grid AS (
      SELECT d.doc_id, g.cell, coalesce(c.v, 0.0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN (SELECT unnest(range(0, {_PH_CELLS})) AS cell) g
      LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.cell = g.cell),
    coef AS (
      -- DCT-II, DC dropped; floor(x*100 + 0.5)/100 = round-half-UP at 2
      -- decimals, the ONE rule both engines implement identically (numpy
      -- round is banker's, DuckDB round is half-away-from-zero — a .xx5
      -- coefficient would flip a bit between them)
      SELECT doc_id, uu.u AS u,
             floor(CAST(sum(v * cos(pi() * (2 * cell + 1) * uu.u
                                    / {2 * _PH_CELLS})) AS DOUBLE)
                   * 100 + 0.5) / 100 AS y
      FROM grid, unnest(range(1, {_PH_CELLS})) AS uu(u)
      GROUP BY 1, 2),
    med AS (SELECT doc_id, median(y) AS m FROM coef GROUP BY 1)
    SELECT coef.doc_id,
           {MODALITY_SQL.replace('doc_id', 'coef.doc_id')} AS modality,
           CAST(sum(CASE WHEN y > m
                         THEN CAST(1 AS BIGINT) << CAST(u - 1 AS INT)
                         ELSE 0 END) AS BIGINT) AS phash
    FROM coef JOIN med USING (doc_id) GROUP BY 1, 2
    """,
)
def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual DCT fingerprint per media asset over the DECODED buffer
    (decode -> Arrow mapInPandas pool/DCT/median-threshold), the
    re-encode-robust dedup key: amplitude noise that rewrites every
    byte-patch digest moves this hash by <= a few bits (pinned in
    tests/test_multimodal.py against q_media_patch_dedup's miss).  The
    oracle recomputes the EXACT 63-bit hash relationally — pooling via
    grouped avg, DCT as a cos-product sum, median threshold, integer bit
    packing — byte-for-byte (all 500 sf0.01 hashes cross-checked during
    design)."""
    from dipper_spark.multimodal.ops import phash_media

    media = attach_media(load_table(spark, sf_dir, "documents"))
    return phash_media(media, n_cells=_PH_CELLS)


@register(
    "q_media_spectrum",
    f"""
    WITH b AS (
      SELECT doc_id, length(text) AS n, u.j AS j,
             ord(array_extract(regexp_split_to_array(text, ''), u.j + 1)) AS byte
      FROM documents, unnest(range(0, length(text))) AS u(j)),
    cells AS (
      -- decoded position i = n-1-j (the stub decode is a byte reverse);
      -- mean-pool onto {_PH_CELLS} equal windows (same resize as phash)
      SELECT doc_id, ((n - 1 - j) * {_PH_CELLS}) // n AS cell,
             avg(CAST(byte AS DOUBLE)) AS v
      FROM b GROUP BY 1, 2),
    grid AS (
      SELECT d.doc_id, g.cell, coalesce(c.v, 0.0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN (SELECT unnest(range(0, {_PH_CELLS})) AS cell) g
      LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.cell = g.cell),
    pw AS (
      -- real-DFT POWER spectrum Re^2 + Im^2 for u = 1..{_PH_CELLS // 2}
      -- (DC dropped, upper half redundant by real-signal symmetry);
      -- floor(x*100+0.5)/100 = the cross-engine round-half-UP rule
      SELECT doc_id, uu.u AS u,
             floor((power(CAST(sum(v * cos(2 * pi() * cell * uu.u
                                           / {_PH_CELLS})) AS DOUBLE), 2)
                    + power(CAST(sum(v * sin(2 * pi() * cell * uu.u
                                             / {_PH_CELLS})) AS DOUBLE), 2))
                   * 100 + 0.5) / 100 AS y
      FROM grid, unnest(range(1, {_PH_CELLS // 2 + 1})) AS uu(u)
      GROUP BY 1, 2),
    med AS (SELECT doc_id, median(y) AS m FROM pw GROUP BY 1)
    SELECT pw.doc_id,
           {MODALITY_SQL.replace('doc_id', 'pw.doc_id')} AS modality,
           CAST(sum(CASE WHEN y > m
                         THEN CAST(1 AS BIGINT) << CAST(u - 1 AS INT)
                         ELSE 0 END) AS BIGINT) AS shash
    FROM pw JOIN med USING (doc_id) GROUP BY 1, 2
    """,
)
def q_media_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIFT-invariant perceptual fingerprint per media asset: DFT
    magnitude (power) spectrum of the pooled decoded buffer, median
    threshold, 32-bit key — closes the translation blindspot
    q_media_phash self-documents (the DCT-sign hash is a phase hash; a
    byte shift scrambles it, while |X_u| is unchanged under cyclic
    shifts).  The golden in tests/test_multimodal.py shows a rotated
    duplicate that q_media_phash misses and this key catches.  The
    oracle recomputes the EXACT key relationally — pooling via grouped
    avg, Re/Im as cos/sin product sums, power() squares (no sqrt),
    round-half-up at 2 decimals, median threshold, integer bit pack."""
    from dipper_spark.multimodal.ops import spectral_hash_media

    media = attach_media(load_table(spark, sf_dir, "documents"))
    return spectral_hash_media(media, n_cells=_PH_CELLS)


_PATCH_B, _PATCH_MIN, _PATCH_CAP = 32, 2, 20
_PATCH_N = f"CAST(ceil(octet_length(encode(text)) / {_PATCH_B}.0) AS BIGINT)"


@register(
    "q_media_patch_dedup",
    f"""
    WITH p AS (
      SELECT DISTINCT doc_id, {_PATCH_N} AS n_patches,
             md5(substr(text, i * {_PATCH_B} + 1, {_PATCH_B})) AS k
      FROM documents,
           unnest(range(0, CAST({_PATCH_N} AS INT))) AS u(i)
      WHERE octet_length(encode(text)) >= 1),
    freq AS (SELECT k, count(*) AS dfreq FROM p GROUP BY k),
    kept AS (SELECT p.* FROM p JOIN freq USING (k) WHERE dfreq <= {_PATCH_CAP}),
    pairs AS (
      SELECT a.doc_id AS id_1, b.doc_id AS id_2,
             a.n_patches AS n_1, b.n_patches AS n_2, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.k = b.k AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4 HAVING count(*) >= {_PATCH_MIN})
    SELECT id_1, id_2, CAST(n_shared AS BIGINT) AS n_shared, n_1, n_2,
           round(n_shared / CAST(least(n_1, n_2) AS DOUBLE), 6) AS share_frac
    FROM pairs
    """,
)
def q_media_patch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media assets by shared 32-byte patch digests — the
    block-level storage-dedup / near-dup-image primitive, composing the
    multimodal binary plumbing with the text-dedup discipline: hot-patch
    prune (df > 20 dropped) bounds candidate fan-out, the pair search is a
    digest equi-join, and only 16-byte digests ever shuffle (never the
    blobs).  The oracle recomputes the digests from the source text whose
    utf-8 bytes ARE the blob on this ascii corpus."""
    from dipper_spark.multimodal.ops import patch_neardup_pairs

    media = attach_media(load_table(spark, sf_dir, "documents"))
    return patch_neardup_pairs(
        media, patch_bytes=_PATCH_B, min_shared=_PATCH_MIN, max_doc_freq=_PATCH_CAP
    )
