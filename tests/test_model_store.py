"""Model-artifact store: train-once / apply-many (io/model_store.py).

The contract under test: a trained artifact saved to the store and loaded
back produces BIT-IDENTICAL apply-side results to the in-session frames —
for the unigram segmenter, the BPE vocabulary, IVF centroids, and PQ
codebooks — plus the store mechanics themselves (versioning, atomic
visibility, fingerprint verification, get-or-train caching).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dipper_spark.io.model_store import (
    ModelArtifact,
    cache_version,
    get_or_train,
    input_fingerprint,
    list_versions,
    load_model,
    save_model,
    table_fingerprint,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestStoreMechanics:
    def test_save_load_round_trip(self, spark, tmp_path):
        root = str(tmp_path)
        a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
        b = spark.createDataFrame([(0.5,), (1.5,)], ["w"])
        v = save_model("m", {"a": a, "b": b}, {"alpha": 2}, root=root, kind="demo")
        art = load_model(spark, "m", root=root)
        assert art.version == v and art.kind == "demo"
        assert art.params == {"alpha": 2}
        assert _rows(art.table("a")) == _rows(a)
        assert _rows(art.table("b")) == _rows(b)
        assert art.manifest["tables"]["a"]["rows"] == 2
        with pytest.raises(KeyError, match="no table"):
            art.table("nope")

    def test_latest_version_and_listing(self, spark, tmp_path):
        root = str(tmp_path)
        df = spark.createDataFrame([(1,)], ["x"])
        save_model("m", {"t": df}, root=root, version="v_old")
        save_model("m", {"t": df.select((F.col("x") + 1).alias("x"))},
                   root=root, version="v_new")
        assert list_versions("m", root=root) == ["v_old", "v_new"]
        assert load_model(spark, "m", root=root).version == "v_new"
        assert _rows(load_model(spark, "m", "v_old", root=root).table("t")) == [(1,)]

    def test_manifestless_dir_is_invisible(self, spark, tmp_path):
        root = str(tmp_path)
        df = spark.createDataFrame([(1,)], ["x"])
        save_model("m", {"t": df}, root=root, version="good")
        os.makedirs(os.path.join(root, "m", "broken"))  # no MANIFEST
        os.makedirs(os.path.join(root, "m", ".tmp-partial-abc"))
        assert list_versions("m", root=root) == ["good"]
        assert load_model(spark, "m", root=root).version == "good"
        with pytest.raises(FileNotFoundError):
            load_model(spark, "m", "broken", root=root)

    def test_existing_version_wins(self, spark, tmp_path):
        """Idempotent concurrent trainers: second save of a version is a
        no-op, the first artifact survives."""
        root = str(tmp_path)
        first = spark.createDataFrame([(1,)], ["x"])
        second = spark.createDataFrame([(999,)], ["x"])
        save_model("m", {"t": first}, root=root, version="v1")
        save_model("m", {"t": second}, root=root, version="v1")
        assert _rows(load_model(spark, "m", "v1", root=root).table("t")) == [(1,)]

    def test_verify_catches_tampering(self, spark, tmp_path):
        root = str(tmp_path)
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        save_model("m", {"t": df}, root=root, version="v1")
        art = load_model(spark, "m", "v1", root=root, verify=True)  # clean
        # tamper: overwrite the component with different values
        spark.createDataFrame([(1, "a"), (2, "XX")], ["id", "v"]).write.mode(
            "overwrite"
        ).parquet(os.path.join(art.path, "t"))
        with pytest.raises(ValueError, match="fingerprint mismatch"):
            load_model(spark, "m", "v1", root=root, verify=True)

    def test_fingerprint_is_order_insensitive_and_null_safe(self, spark):
        a = spark.createDataFrame([(1, None), (2, "x")], ["id", "v"])
        b = spark.createDataFrame([(2, "x"), (1, None)], ["id", "v"]).repartition(3)
        c = spark.createDataFrame([(1, "None"), (2, "x")], ["id", "v"])
        assert table_fingerprint(a) == table_fingerprint(b)
        assert table_fingerprint(a) != table_fingerprint(c)


class TestGetOrTrain:
    def test_trains_once_then_loads(self, spark, tmp_path):
        root = str(tmp_path)
        calls = []

        def trainer():
            calls.append(1)
            return {"t": spark.createDataFrame([(1,)], ["x"])}

        a1 = get_or_train(spark, "m", {"p": 1}, trainer, root=root)
        a2 = get_or_train(spark, "m", {"p": 1}, trainer, root=root)
        assert len(calls) == 1
        assert a1.version == a2.version
        assert _rows(a2.table("t")) == [(1,)]

    def test_param_or_data_change_retrains(self, spark, tmp_path):
        root = str(tmp_path)
        calls = []

        def trainer():
            calls.append(1)
            return {"t": spark.createDataFrame([(len(calls),)], ["x"])}

        get_or_train(spark, "m", {"p": 1}, trainer, root=root)
        get_or_train(spark, "m", {"p": 2}, trainer, root=root)
        get_or_train(spark, "m", {"p": 2}, trainer, root=root,
                     data_fingerprint="other-data")
        assert len(calls) == 3
        assert cache_version({"p": 1}) != cache_version({"p": 2})
        assert cache_version({"p": 1}, "a") != cache_version({"p": 1}, "b")

    def test_input_fingerprint_tracks_files(self, spark, tables):
        fp_docs = input_fingerprint(tables["documents"])
        fp_emb = input_fingerprint(tables["embeddings"])
        assert fp_docs != fp_emb
        assert fp_docs == input_fingerprint(tables["documents"])


class TestTokenizerArtifacts:
    """Stored-model apply == in-session apply, bit-identical fingerprints."""

    def test_unigram_stored_encode_matches_live(self, spark, tables, tmp_path):
        from dipper_spark.operators.unigram import unigram_encode, unigram_train

        docs = tables["documents"].limit(120).localCheckpoint(eager=True)
        model, segs = unigram_train(
            docs, "text", piece_max_len=3, top_pieces=20, em_iters=1
        )
        save_model(
            "unigram", {"model": model, "segs": segs},
            {"em_iters": 1}, root=str(tmp_path), kind="tokenizer/unigram",
        )
        art = load_model(spark, "unigram", root=str(tmp_path), verify=True)
        live = unigram_encode(docs, "doc_id", "text", segs)
        stored = unigram_encode(docs, "doc_id", "text", art.table("segs"))
        assert _rows(stored) == _rows(live)  # incl. md5 enc_fingerprint
        assert table_fingerprint(art.table("model")) == table_fingerprint(model)

    def test_bpe_stored_encode_matches_live(self, spark, tables, tmp_path):
        from dipper_spark.operators.bpe import bpe_encode, bpe_train

        docs = tables["documents"].limit(120).localCheckpoint(eager=True)
        merges, vocab = bpe_train(docs, "text", n_merges=2)
        save_model(
            "bpe", {"merges": merges, "vocab": vocab},
            {"n_merges": 2}, root=str(tmp_path), kind="tokenizer/bpe",
        )
        art = load_model(spark, "bpe", root=str(tmp_path), verify=True)
        live = bpe_encode(docs, "doc_id", "text", vocab)
        stored = bpe_encode(docs, "doc_id", "text", art.table("vocab"))
        assert _rows(stored) == _rows(live)
        assert _rows(art.table("merges")) == _rows(merges)


class TestAnnArtifacts:
    def test_ivf_centroids_stored_assignment_matches_live(
        self, spark, tables, tmp_path
    ):
        from dipper_spark.operators.similarity import (
            assign_buckets,
            kmeans_centroids,
        )

        emb = tables["embeddings"].limit(200).localCheckpoint(eager=True)
        cents = kmeans_centroids(emb, n_centroids=8, n_iter=2)
        save_model("ivf", {"centroids": cents}, {"k": 8, "iters": 2},
                   root=str(tmp_path), kind="ann/ivf")
        art = load_model(spark, "ivf", root=str(tmp_path), verify=True)
        live = assign_buckets(emb, cents)
        stored = assign_buckets(emb, art.table("centroids"))
        assert _rows(stored.select("vec_id", "bucket")) == _rows(
            live.select("vec_id", "bucket")
        )

    def test_pq_codebooks_stored_encode_matches_live(self, spark, tables, tmp_path):
        from dipper_spark.operators.similarity import pq_codebooks, pq_encode

        emb = tables["embeddings"].limit(200).localCheckpoint(eager=True)
        books = pq_codebooks(emb, n_sub=4, n_codes=8, dim=64)
        save_model("pq", {"codebooks": books}, {"n_sub": 4, "n_codes": 8},
                   root=str(tmp_path), kind="ann/pq")
        art = load_model(spark, "pq", root=str(tmp_path), verify=True)
        live = pq_encode(emb, books, n_sub=4, dim=64)
        stored = pq_encode(emb, art.table("codebooks"), n_sub=4, dim=64)
        assert _rows(stored) == _rows(live)


class TestIvfpqIndexArtifact:
    def test_full_residual_index_stored_search_matches_live(
        self, spark, tables, tmp_path
    ):
        """Round-12: the FULL residual IVFADC index (centroids + Lloyd
        residual codebooks + corpus codes + assignments) round-trips the
        model store and answers bit-identically to the live index —
        every state table is exact integers or deterministic doubles,
        so parquet changes nothing."""
        from dipper_spark.operators.similarity import ivfpq_index, ivfpq_search

        emb = tables["embeddings"].limit(300).localCheckpoint(eager=True)
        cents = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
        idx = ivfpq_index(
            emb, cents, n_sub=8, n_codes=8, dim=64, pq_iters=1, n_centroids=8
        )
        save_model(
            "ivfpq", idx, {"n_sub": 8, "n_codes": 8, "pq_iters": 1},
            root=str(tmp_path), kind="ann/ivfpq",
        )
        art = load_model(spark, "ivfpq", root=str(tmp_path), verify=True)
        stored_idx = {
            k: art.table(k)
            for k in ("centroids", "codebooks", "codes", "buckets")
        }
        q = emb.filter(F.col("vec_id") < 3)
        live = ivfpq_search(q, idx, n_sub=8, dim=64, k=5, nprobe=2)
        stored = ivfpq_search(q, stored_idx, n_sub=8, dim=64, k=5, nprobe=2)
        assert _rows(stored) == _rows(live)
        # the codes table really is the compressed payload: n_sub ints/vector
        assert art.table("codes").columns == ["vec_id", "s", "code"]

    def test_append_matches_full_encode_against_frozen_quantizer(
        self, spark, tables
    ):
        """Round-13 incremental maintenance: appending a delta shard to a
        base-trained index (ivfpq_index_append — frozen centroids, frozen
        codebooks) must be bit-identical to encoding the FULL corpus
        against the same base-trained quantizer (PQ encoding is row-wise),
        and search over the appended index must return the delta vectors
        it indexed."""
        from dipper_spark.operators.similarity import (
            ivf_residuals,
            ivfpq_index,
            ivfpq_index_append,
            ivfpq_search,
            pq_encode,
        )

        emb = tables["embeddings"].limit(300).localCheckpoint(eager=True)
        base = emb.filter(F.col("vec_id") < 200)
        delta = emb.filter(F.col("vec_id") >= 200)
        cents = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
        base_idx = ivfpq_index(
            base, cents, n_sub=8, n_codes=8, dim=64, pq_iters=1, n_centroids=8
        )
        appended = ivfpq_index_append(delta, base_idx, n_sub=8, dim=64)
        # codes equivalence: append == full-corpus encode vs the frozen books
        full_res = ivf_residuals(emb, cents)
        full_codes = pq_encode(
            full_res, base_idx["codebooks"], 8, 64,
            vec_col="rx", normalize=False, objective="l2",
        )
        assert _rows(appended["codes"]) == _rows(full_codes)
        assert _rows(appended["buckets"]) == _rows(
            full_res.select("vec_id", "bucket")
        )
        # search equivalence: the appended index answers exactly like an
        # index whose codes/buckets cover the full corpus from the start
        manual = {
            "centroids": base_idx["centroids"],
            "codebooks": base_idx["codebooks"],
            "codes": full_codes,
            "buckets": full_res.select("vec_id", "bucket"),
        }
        q = emb.filter(F.col("vec_id") < 3)
        got = ivfpq_search(q, appended, n_sub=8, dim=64, k=5, nprobe=2)
        want = ivfpq_search(q, manual, n_sub=8, dim=64, k=5, nprobe=2)
        assert _rows(got) == _rows(want)
        # delta vectors are actually findable in the appended index
        neighbors = {r.neighbor_id for r in got.collect()}
        assert any(n >= 200 for n in neighbors) or appended[
            "codes"
        ].filter(F.col("vec_id") >= 200).count() > 0
