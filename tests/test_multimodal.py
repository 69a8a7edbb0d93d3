"""Multimodal column plumbing: schema stability, Arrow batch shapes,
determinism, metadata-only pruning (SURVEY.md §2 beyond-reference)."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.multimodal import (
    attach_media,
    byte_histogram_features,
    decode_media,
    media_stats,
    resize_image,
    sample_frames,
)
from dipper_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_media(load_table(spark, sf_dir, "documents")).cache()


class TestAttach:
    def test_schema_and_modalities(self, media):
        assert dict(media.dtypes)["media"] == "binary"
        meta_fields = {f.name for f in media.schema["media_meta"].dataType.fields}
        assert meta_fields == {"modality", "mime", "width", "height", "sample_rate", "n_frames", "n_bytes"}
        mods = {r[0] for r in media.select("media_meta.modality").distinct().collect()}
        assert mods == {"image", "audio", "video"}

    def test_bytes_match_text(self, media):
        bad = media.filter(
            F.octet_length("media") != F.octet_length(F.encode("text", "UTF-8"))
        ).count()
        assert bad == 0
        # n_bytes metadata agrees with the payload
        assert media.filter(F.col("media_meta.n_bytes") != F.octet_length("media")).count() == 0

    def test_modality_metadata_contract(self, media):
        # audio: sample_rate set, no dims; image: 1 frame + dims; video: frames + dims
        assert media.filter((F.col("media_meta.modality") == "audio") & F.col("media_meta.width").isNotNull()).count() == 0
        assert media.filter((F.col("media_meta.modality") == "image") & (F.col("media_meta.n_frames") != 1)).count() == 0
        assert media.filter(
            (F.col("media_meta.modality") == "video")
            & (F.col("media_meta.n_frames") < 1)
        ).count() == 0


class TestDecode:
    def test_strict_raises_without_codecs(self, media):
        with pytest.raises(NotImplementedError):
            decode_media(media, strict=True)

    def test_fake_decode_shape_and_determinism(self, media):
        out = decode_media(media)
        assert [f.name for f in out.schema.fields] == ["doc_id", "modality", "decoded", "decode_ok"]
        joined = (
            out.alias("d")
            .join(media.alias("m"), "doc_id")
            .select("d.decoded", "m.media")
            .limit(20)
            .collect()
        )
        for r in joined:
            assert r.decoded == bytes(reversed(r.media))

    def test_rowcount_preserved(self, media):
        assert decode_media(media).count() == media.count()


class TestFeatures:
    def test_fixed_dim_and_norm(self, media):
        out = byte_histogram_features(media, bins=16)
        rows = out.limit(50).collect()
        assert all(len(r.features) == 16 for r in rows)
        for r in rows:
            assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram

    def test_feeds_similarity_operators(self, media, spark):
        # the feature column is a drop-in embedding for the ANN operators
        from dipper_spark.operators.similarity import cosine_topk

        emb = byte_histogram_features(media).select(
            F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
        )
        res = cosine_topk(emb.limit(5), emb, k=3)
        assert res.groupBy("query_id").count().filter("count > 3").count() == 0


class TestResizeAndFrames:
    def test_resize_only_images(self, media):
        out = resize_image(media, 224, 224)
        assert out.filter((F.col("media_meta.modality") == "image") & (F.col("media_meta.width") != 224)).count() == 0
        # non-image metadata untouched (joined against the pre-resize values)
        changed = (
            out.alias("o")
            .join(media.alias("m"), "doc_id")
            .filter(
                (F.col("m.media_meta.modality") != "image")
                & (
                    F.col("o.media_meta.width").eqNullSafe(F.col("m.media_meta.width")) == F.lit(False)
                )
            )
            .count()
        )
        assert changed == 0
        # media bytes pass through
        assert dict(out.dtypes)["media"] == "binary"

    def test_frame_sampling_fanout(self, media):
        frames = sample_frames(media, every_n=5)
        vids = media.filter(F.col("media_meta.modality") == "video").select(
            "doc_id", F.col("media_meta.n_frames").alias("nf")
        )
        got = frames.groupBy("doc_id").count().join(vids, "doc_id").collect()
        for r in got:
            expect = len(range(0, r.nf, 5))
            assert r["count"] == expect

    def test_frame_bytes_are_slices(self, media):
        one = (
            media.filter((F.col("media_meta.modality") == "video") & (F.col("media_meta.n_frames") >= 6))
            .limit(1)
        )
        row = one.select("doc_id", "media", "media_meta.n_frames").collect()[0]
        frames = {r.frame_idx: r.frame for r in sample_frames(one, every_n=5).collect()}
        step = max(1, len(row.media) // row.n_frames)
        assert frames[0] == bytes(row.media[0:step])


class TestStats:
    def test_stats_values(self, media):
        rows = {r.modality: r for r in media_stats(media).collect()}
        assert set(rows) == {"image", "audio", "video"}
        total = sum(r.n_media for r in rows.values())
        assert total == media.count()

    def test_metadata_only_plan_prunes_media(self, spark, sf_dir):
        # write media to parquet, re-read, and check the scan ReadSchema
        import tempfile

        media = attach_media(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "media", "media_meta"
        )
        with tempfile.TemporaryDirectory() as d:
            media.write.mode("overwrite").parquet(d + "/media")
            re = spark.read.parquet(d + "/media")
            plan = media_stats(re)._jdf.queryExecution().executedPlan().toString()
            assert "media_meta" in plan
            # the binary payload column must not be read for metadata stats
            import re as _re

            readschema = _re.search(r"ReadSchema: ([^\n]+)", plan)
            assert readschema and "media:" not in readschema.group(1).replace("media_meta", "")


class TestPatchDedup:
    def test_shared_patch_pairs_and_hot_prune(self, spark):
        from dipper_spark.multimodal.ops import patch_neardup_pairs

        boiler = b"H" * 32  # identical first block everywhere (hot)
        blk = lambda c: bytes([c]) * 32
        rows = [
            # docs 1 and 2 share two unique blocks -> a pair
            (1, boiler + blk(65) + blk(66)),
            (2, boiler + blk(65) + blk(66) + blk(67)),
            # doc 3 shares only ONE block with 1/2 -> below min_shared
            (3, boiler + blk(65) + blk(90)),
            # doc 4 disjoint
            (4, boiler + blk(80) + blk(81)),
        ]
        media = spark.createDataFrame(
            [(i, b) for i, b in rows], ["doc_id", "media"]
        ).withColumn(
            "media_meta",
            F.struct(F.length("media").cast("long").alias("n_bytes")),
        )
        out = patch_neardup_pairs(media, patch_bytes=32, min_shared=2, max_doc_freq=3)
        got = {(r.id_1, r.id_2): r for r in out.collect()}
        assert set(got) == {(1, 2)}
        r = got[(1, 2)]
        # boiler block hits df=4 > 3 -> pruned; shared = blocks A, B only
        assert r.n_shared == 2 and r.n_1 == 3 and r.n_2 == 4
        assert abs(r.share_frac - 2 / 3) < 1e-6  # rounded to 6 places

    def test_blob_never_shuffles_only_digests(self, spark, sf_dir=None):
        from dipper_spark.multimodal.ops import attach_media, patch_neardup_pairs
        from dipper_spark.session import load_table

        media = attach_media(load_table(spark, "/root/testdata/sf0.001", "documents"))
        plan = (
            patch_neardup_pairs(media)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftAnti" in plan  # hot-patch prune
        assert "CartesianProduct" not in plan


class TestPerceptualHash:
    """phash_media / phash_pairs: the decoded-domain near-dup signal that
    closes q_media_patch_dedup's re-encode blindspot (round-8 verdict
    item #3).  The 'lossy re-encode' stand-in is quantization-style
    amplitude noise on the payload bytes — it rewrites EVERY fixed-width
    block digest while leaving the coarse DCT spectrum intact."""

    @staticmethod
    def _media(spark):
        # real corpus content (repetitive synthetic text clusters DCT
        # coefficients at the median and makes bits fragile — corpus docs
        # have the varied spectra the operator is designed for)
        corpus = {
            r.doc_id: r.text
            for r in load_table(spark, "/root/testdata/sf0.001", "documents")
            .filter("doc_id IN (1, 6) AND length(text) > 300")
            .collect()
        }
        base, unrelated = corpus[1], corpus[6]
        # lossy re-encode stand-in: bump every 3rd byte (stays ascii)
        noisy = "".join(
            chr(ord(c) + 1) if i % 3 == 0 and " " < c < "~" else c
            for i, c in enumerate(base)
        )
        docs = spark.createDataFrame(
            [(1, base), (2, noisy), (3, unrelated)], ["doc_id", "text"]
        )
        return attach_media(docs)

    def test_reencoded_dup_caught_where_patch_dedup_misses(self, spark):
        from dipper_spark.multimodal import phash_media, phash_pairs
        from dipper_spark.multimodal.ops import patch_neardup_pairs

        media = self._media(spark)
        # byte-level patch dedup: the noise rewrote every 32-byte block,
        # so NO pair survives — the documented blindspot
        assert patch_neardup_pairs(media, patch_bytes=32, min_shared=2).count() == 0
        # perceptual hash: the banded pair search catches exactly the
        # re-encoded pair, within the pigeonhole guarantee (hamming <= 3)
        pairs = phash_pairs(phash_media(media), max_hamming=3).collect()
        assert [(r.id_1, r.id_2) for r in pairs] == [(1, 2)]
        assert pairs[0].hamming <= 3

    def test_identical_content_hamming_zero_and_determinism(self, spark):
        from dipper_spark.multimodal import phash_media

        media = self._media(spark)
        h1 = {r.doc_id: r.phash for r in phash_media(media).collect()}
        h2 = {
            r.doc_id: r.phash
            for r in phash_media(media.repartition(7)).collect()
        }
        assert h1 == h2  # partitioning-invariant
        assert all(0 <= v < 1 << 63 for v in h1.values())
        # unrelated content is far: > max_hamming by a wide margin
        assert bin(h1[1] ^ h1[3]).count("1") > 10

    def test_phash_only_hashes_shuffle_never_blobs(self, spark):
        from dipper_spark.multimodal import phash_media, phash_pairs

        plan = (
            phash_pairs(phash_media(self._media(spark)))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestSpectralHash:
    """spectral_hash_media: the magnitude-spectrum companion that closes
    phash_media's self-documented translation blindspot — a shifted
    (cyclically rotated) duplicate keeps |X_u| bit-for-bit while the
    DCT-sign hash scrambles."""

    @staticmethod
    def _rotated_media(spark):
        import random

        rng = random.Random(77)
        # 128 printable ascii bytes -> 64 pooled cells of exactly 2 bytes;
        # rotating by 2 bytes rotates the pooled cell vector by 1 cell, so
        # the DFT magnitude is unchanged by construction
        base = "".join(chr(rng.randrange(33, 127)) for _ in range(128))
        rot = base[2:] + base[:2]
        other = "".join(chr(rng.randrange(33, 127)) for _ in range(128))
        # doc_ids 0 and 3: both % 3 == 0 -> same modality.  NB the
        # unrelated control must be fresh content, NOT reversed(base):
        # time reversal is itself phase-only (X_rev = conj(X)·phasor), so
        # a reversed copy shares the magnitude key BY DESIGN.
        docs = spark.createDataFrame(
            [(0, base), (3, rot), (6, other)], ["doc_id", "text"]
        )
        return attach_media(docs)

    def test_rotated_dup_caught_where_phash_misses(self, spark):
        from dipper_spark.multimodal import phash_media, spectral_hash_media

        media = self._rotated_media(spark)
        ph = {r.doc_id: r.phash for r in phash_media(media).collect()}
        sh = {r.doc_id: r.shash for r in spectral_hash_media(media).collect()}
        # the phase-aware DCT hash scrambles under the shift...
        assert bin(ph[0] ^ ph[3]).count("1") > 3
        # ...the magnitude key is EXACTLY preserved
        assert sh[0] == sh[3]
        # and magnitude is not degenerate: reversed content differs
        assert sh[0] != sh[6]

    def test_spectral_pairs_band_search(self, spark):
        from dipper_spark.multimodal import spectral_hash_media, spectral_pairs

        media = self._rotated_media(spark)
        pairs = spectral_pairs(spectral_hash_media(media), max_hamming=3).collect()
        assert [(r.id_1, r.id_2, r.hamming) for r in pairs] == [(0, 3, 0)]

    def test_determinism_and_key_range(self, spark):
        from dipper_spark.multimodal import spectral_hash_media

        media = self._rotated_media(spark)
        h1 = {r.doc_id: r.shash for r in spectral_hash_media(media).collect()}
        h2 = {
            r.doc_id: r.shash
            for r in spectral_hash_media(media.repartition(5)).collect()
        }
        assert h1 == h2
        assert all(0 <= v < 1 << 32 for v in h1.values())

    def test_spectral_only_hashes_shuffle_never_blobs(self, spark):
        from dipper_spark.multimodal import spectral_hash_media, spectral_pairs

        plan = (
            spectral_pairs(spectral_hash_media(self._rotated_media(spark)))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # the binary payload never crosses a shuffle: every Exchange in
        # the pair search carries only the id + 8-byte key columns
        for section in plan.split("Exchange")[1:]:
            first_line = section.splitlines()[0]
            assert "media" not in first_line, first_line
