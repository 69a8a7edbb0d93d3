"""Unigram-LM (SentencePiece-style) tokenizer: Viterbi-EM training +
broadcast-join encode (operators/unigram.py).  The oracle gate
(q_unigram_tokenizer / q_unigram_encode) proves bit-reproduction; these
pin the algorithmic semantics on constructed corpora."""

from __future__ import annotations

from pyspark.sql import functions as F


def _train(spark, texts, **kw):
    from dipper_spark.operators.unigram import unigram_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return unigram_train(df, "text", **kw)


class TestUnigramTrain:
    def test_frequent_word_collapses_to_one_piece(self, spark):
        # 'abab' dominates: the unigram objective prefers ONE whole-word
        # piece over [ab, ab] (p vs p'^2) — the Kudo behavior that makes
        # frequent words single tokens.  The segmentation must be pieces
        # of the model that reconstruct the word, never char-fallback.
        model, segs = _train(spark, ["abab abab abab abab xy"] * 5)
        seg = {r.word: r.seg for r in segs.collect()}
        assert seg["abab"] == "abab"  # single high-prob piece wins
        pieces = {r.piece for r in model.collect()}
        for r in segs.collect():
            parts = r.seg.split(" ")
            assert "".join(parts) == r.word
            assert all(p in pieces for p in parts)
            assert r.n_pieces == len(parts)

    def test_single_chars_never_pruned(self, spark):
        # 'z' only occurs inside 'zq', which the model will keep as a
        # 2-char piece; the E-count of lone 'z' is 0 but coverage floors
        # it at 1 so unseen words stay segmentable
        model, _ = _train(spark, ["zq zq zq ab ab"] * 3)
        by_piece = {r.piece: r.n_count for r in model.collect()}
        for ch in "zqab":
            assert ch in by_piece and by_piece[ch] >= 1

    def test_scores_are_log_probs_of_counts(self, spark):
        import math

        model, _ = _train(spark, ["ab ab ab cd"] * 4)
        rows = {r.piece: r for r in model.collect()}
        total = sum(r.n_count for r in rows.values())
        for r in rows.values():
            want = math.floor(math.log(r.n_count / total) * 1e6 + 0.5)
            assert r.score_micro == want

    def test_partition_invariance(self, spark):
        from dipper_spark.operators.unigram import unigram_train

        texts = [(i, f"abab{'x' * (i % 3)} cdcd abab") for i in range(20)]
        df = spark.createDataFrame(texts, ["doc_id", "text"])
        m1, s1 = unigram_train(df, "text")
        m2, s2 = unigram_train(df.repartition(7), "text")
        assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
        assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


class TestUnigramEncode:
    def test_oov_falls_back_to_char_split(self, spark):
        from dipper_spark.operators.unigram import unigram_encode

        _, segs = _train(spark, ["abab abab cd"] * 3)
        new = spark.createDataFrame(
            [(99, "abab zzzz")], ["doc_id", "text"]
        )
        [r] = unigram_encode(new, "doc_id", "text", segs).collect()
        assert r.n_words == 2
        # in-vocab abab -> its trained piece count; OOV zzzz -> 4 chars
        wn_abab = {s.word: s.n_pieces for s in segs.collect()}["abab"]
        assert r.n_tokens == wn_abab + 4

    def test_encode_is_broadcast_join_no_fold(self, spark):
        from dipper_spark.operators.unigram import unigram_encode

        _, segs = _train(spark, ["abab cd ef"] * 3)
        docs = spark.createDataFrame([(1, "abab cd")], ["doc_id", "text"])
        plan = (
            unigram_encode(docs, "doc_id", "text", segs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan

    def test_map_literal_and_join_paths_bit_identical(self, spark):
        """The dictionary-sized map-literal DP and the large-vocab
        broadcast-join DP are two physical strategies for ONE definition:
        model and segmentations must match row for row (map_lookup_max=0
        forces the join path)."""
        from dipper_spark.operators.unigram import unigram_train

        texts = [(i, f"abab{'x' * (i % 3)} cdcd abab zq") for i in range(15)]
        df = spark.createDataFrame(texts, ["doc_id", "text"])
        m_fast, s_fast = unigram_train(df, "text")
        m_join, s_join = unigram_train(df, "text", map_lookup_max=0)
        assert sorted(map(tuple, m_fast.collect())) == sorted(map(tuple, m_join.collect()))
        assert sorted(map(tuple, s_fast.collect())) == sorted(map(tuple, s_join.collect()))
