"""Trained linear quality classifier (operators/classifier.py).

Contracts under test:
- fixed-point GD is partition-order invariant (identical weights at any
  input layout) and run-to-run deterministic;
- the broadcast-residual fast path and the window/shuffle fallback
  produce IDENTICAL weights (both are exact integer arithmetic);
- the model-store round trip scores bit-identically to live weights;
- training actually learns (accuracy beats the base rate on the
  distillation label) and the documented lr stability bound is real
  (lr = 4 diverges, lr = 1/4 does not);
- grain fixed-point invariants (bias exactly SCALE, dense features in
  [0, SCALE]).
"""

import os

from pyspark.sql import functions as F

from dipper_spark.functions.text import quality_rules
from dipper_spark.operators.classifier import (
    BIAS,
    SCALE,
    classifier_grains,
    linear_classifier_apply,
    linear_classifier_train,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _labeled(spark):
    return _docs(spark).select(
        "doc_id", "text", quality_rules("text")["passed"].alias("y")
    )


def _weights(df, **kw):
    kw.setdefault("n_buckets", 64)
    kw.setdefault("iters", 4)
    return sorted(
        map(tuple, linear_classifier_train(df, "doc_id", "text", "y", **kw).collect())
    )


class TestDeterminism:
    def test_partition_layout_invariance(self, spark):
        lab = _labeled(spark)
        w1 = _weights(lab.repartition(1))
        w13 = _weights(lab.repartition(13, "doc_id"))
        assert w1 == w13 and len(w1) > 5

    def test_run_to_run_deterministic(self, spark):
        lab = _labeled(spark)
        assert _weights(lab) == _weights(lab)

    def test_broadcast_and_window_paths_identical(self, spark):
        lab = _labeled(spark)
        fast = _weights(lab)  # broadcast-residual path (default threshold)
        slow = _weights(lab, broadcast_residuals=0)  # window/shuffle fallback
        assert fast == slow


class TestLearning:
    def test_beats_base_rate(self, spark):
        lab = _labeled(spark)
        w = linear_classifier_train(
            lab, "doc_id", "text", "y", n_buckets=64, iters=16
        )
        scored = linear_classifier_apply(lab, "doc_id", "text", w, n_buckets=64)
        j = scored.join(
            lab.select(F.col("doc_id").alias("id"), F.col("y").cast("int").alias("y")),
            "id",
        )
        n = j.count()
        acc = j.filter(F.col("pred") == F.col("y")).count() / n
        ybar = j.agg(F.avg("y")).collect()[0][0]
        base = max(ybar, 1.0 - ybar)
        assert acc > base + 0.05, (acc, base)

    def test_lr_stability_bound(self, spark):
        """||x||^2 <= 6 => GD diverges at lr=4 and stays bounded at the
        1/4 default (the docstring's stability claim, pinned)."""
        lab = _labeled(spark)
        stable = dict(_weights(lab, iters=6))
        diverged = dict(_weights(lab, iters=6, lr_num=4, lr_den=1))
        assert abs(diverged[BIAS]) > 10 * max(1, abs(stable[BIAS]))
        assert abs(stable[BIAS]) < 2 * SCALE  # |w_bias| < 2.0 real units

    def test_label_accepts_column_expression(self, spark):
        docs = _docs(spark)
        w = linear_classifier_train(
            docs, "doc_id", "text", (F.col("n_chars") > 300).cast("int"),
            n_buckets=16, iters=2,
        )
        assert w.count() > 0


class TestGrains:
    def test_fixed_point_invariants(self, spark):
        g = classifier_grains(_docs(spark), "doc_id", "text", n_buckets=64)
        bad = g.filter((F.col("fx") < 0) | (F.col("fx") > SCALE)).count()
        assert bad == 0
        bias = g.filter(F.col("bucket") == BIAS).select("fx").distinct().collect()
        assert [r.fx for r in bias] == [SCALE]
        # 5 dense grains per doc, every doc covered
        n_docs = _docs(spark).count()
        dense = g.filter(F.col("bucket") < 0)
        assert dense.count() == 5 * n_docs


class TestStoreRoundTrip:
    def test_stored_weights_score_identically(self, spark, tmp_path):
        from dipper_spark.io.model_store import load_model, save_model

        lab = _labeled(spark)
        w = linear_classifier_train(lab, "doc_id", "text", "y", n_buckets=64, iters=4)
        save_model(
            "clf", {"weights": w}, {"iters": 4}, root=str(tmp_path),
            kind="classifier/linear", version="v1",
        )
        stored = load_model(spark, "clf", "v1", root=str(tmp_path), verify=True)
        live = linear_classifier_apply(lab, "doc_id", "text", w, n_buckets=64)
        via_store = linear_classifier_apply(
            lab, "doc_id", "text", stored.table("weights"), n_buckets=64
        )
        assert sorted(map(tuple, live.collect())) == sorted(
            map(tuple, via_store.collect())
        )
