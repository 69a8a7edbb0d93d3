"""Physical-plan audits: the properties we designed for must be visible in
the executed plans (pushdown, pruning, broadcast joins, codegen, no
accidental cartesian products).  These are the `.explain("formatted")`
iterations frozen as assertions so a regression (a filter that stops
reaching the scan, a broadcast that silently becomes a shuffle join) fails
CI instead of quietly costing 100× at 100 TB."""

import pytest
from pyspark.sql import functions as F

from dipper_spark.plans import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan_of(df) -> str:
    """AQE finalizes the physical plan only on execution — run the query
    (tiny at test SF), then read the final adaptive plan."""
    df.collect()  # count() would be a separate queryExecution
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


class TestPushdownAndPruning:
    def test_filter_reaches_parquet_scan(self, spark, sf):
        # q_score_threshold: events.value > threshold must be a PushedFilter
        plan = QUERIES["q_score_threshold"](spark, sf)._jdf.queryExecution().toString()
        assert "PushedFilters: [" in plan
        assert "GreaterThan" in plan or "IsNotNull" in plan

    def test_column_pruning_on_wide_table(self, spark, sf):
        # pricing summary touches 7 of lineitem's 16 columns; the ReadSchema
        # must not include the untouched ones
        plan = QUERIES["q_pricing_summary"](spark, sf)._jdf.queryExecution().toString()
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and "l_comment" not in read[0] and "l_partkey" not in read[0]

    def test_media_stats_prunes_binary_payload(self, spark, sf):
        from dipper_spark.multimodal import attach_media, media_stats
        from dipper_spark.session import load_table

        # over parquet-backed media the payload column is never read; over
        # the derived frame the projection list must not carry 'media' into
        # the aggregate either
        plan = plan_of(media_stats(attach_media(load_table(spark, sf, "documents"))))
        agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
        assert agg_lines and all("encode" not in ln for ln in agg_lines)


class TestJoinStrategies:
    def test_star_join_broadcasts_dims(self, spark, sf):
        plan = plan_of(QUERIES["q_star_join_revenue"](spark, sf))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # all dims are broadcast-sized

    def test_range_join_is_not_cartesian(self, spark, sf):
        plan = plan_of(QUERIES["q_range_join"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_lsh_candidate_join_shuffles_on_band_key(self, spark, sf):
        # minhash-LSH must join candidates on band buckets — never an
        # all-pairs nested loop over the corpus
        plan = plan_of(QUERIES["q_minhash_lsh"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_simhash_pairs_is_banded_equi_join(self, spark, sf):
        # pigeonhole bit-band blocking: the pair search must be a hash/merge
        # equi-join on the band value, never an all-pairs nested loop (the
        # round-1 plan that dies at scale)
        plan = plan_of(QUERIES["q_simhash_pairs"](spark, sf))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_jaccard_pruned_uses_broadcast_anti_join(self, spark, sf):
        # the hot-shingle prune must be a broadcast LEFT ANTI against the
        # (small) high-doc-freq table, and the candidate join an equi-join
        plan = plan_of(QUERIES["q_jaccard_pruned"](spark, sf))
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "CartesianProduct" not in plan

    def test_strip_boilerplate_uses_broadcast_anti_join(self, spark, sf):
        # the hot-chunk table is vocabulary-bounded: the strip must be a
        # broadcast LEFT ANTI, never a shuffled join on the raw chunk table
        plan = plan_of(QUERIES["q_strip_boilerplate"](spark, sf))
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "CartesianProduct" not in plan

    def test_pii_redact_filter_pushed_to_scan(self, spark, sf):
        # the custkey predicate must reach the parquet scan; redaction is
        # map-only (no shuffle operators at all in the plan)
        plan = plan_of(QUERIES["q_pii_redact"](spark, sf))
        assert "PushedFilters: [IsNotNull(c_custkey), LessThanOrEqual(c_custkey,50)]" in plan or \
            "LessThanOrEqual(c_custkey,50)" in plan
        assert "Exchange" not in plan

    def test_bloom_probe_is_broadcast(self, spark, sf):
        # the bit-set side is bounded by m (8192 rows) and must broadcast;
        # probing never joins against the corpus
        plan = plan_of(QUERIES["q_bloom_probe"](spark, sf))
        assert "Broadcast" in plan
        assert "CartesianProduct" not in plan

    def test_top_ngrams_is_salted_two_phase(self, spark, sf):
        # heavy hitters = one hash-agg + SALTED two-phase top-k: `source`
        # has ~20 values, so a single per-source window is one task's
        # external sort over a source's billions of distinct n-grams at
        # 100 TB.  The plan must show the phase-1 window partitioned by
        # (source, _salt) AND the bounded phase-2 window; no joins.
        plan = plan_of(QUERIES["q_top_ngrams"](spark, sf))
        assert "CartesianProduct" not in plan
        assert plan.count("Window") >= 2
        assert "_salt" in plan

    def test_source_quota_is_salted_two_phase(self, spark, sf):
        # same low-cardinality-key hazard on raw documents: phase 1 keeps
        # the quota-smallest hashes per (source, _salt) cell; phase 2 ranks
        # <= quota * n_salts survivors per source.
        plan = plan_of(QUERIES["q_source_quota"](spark, sf))
        assert "CartesianProduct" not in plan
        assert plan.count("Window") >= 2
        assert "_salt" in plan

    def test_clean_corpus_single_anti_join_then_map(self, spark, sf):
        # the capstone adds ONLY map stages after the strip's rebuild: same
        # LeftAnti+broadcast discipline, no extra joins, no cartesian
        plan = plan_of(QUERIES["q_clean_corpus"](spark, sf))
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "CartesianProduct" not in plan

    def test_containment_uses_broadcast_anti_join(self, spark, sf):
        # round 5's one scale-weak plan: the containment index must now be
        # hot-shingle-pruned (broadcast LEFT ANTI) before the self-equi-join,
        # mirroring test_jaccard_pruned_uses_broadcast_anti_join
        plan = plan_of(QUERIES["q_containment"](spark, sf))
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "CartesianProduct" not in plan

    def test_ivf_probe_join_is_bucketed(self, spark, sf):
        # the IVF probe shuffles on the bucket id — never all-pairs
        plan = plan_of(QUERIES["q_ann_ivf"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_refined_ivf_probe_join_is_bucketed(self, spark, sf):
        # the production path (Lloyd + nprobe) keeps the same discipline:
        # the final probe is an equi-join on the bucket id, and the
        # per-iteration lineage truncation leaves no cartesian anywhere
        plan = plan_of(QUERIES["q_ann_ivf_refined"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_cosine_topk_is_deliberate_broadcast_product(self, spark, sf):
        # brute-force ANN is an intentional broadcast nested-loop (queries
        # side is tiny); the corpus side must NOT be the broadcast side
        plan = plan_of(QUERIES["q_cosine_topk"](spark, sf))
        assert "BroadcastNestedLoopJoin" in plan


class TestRound5Plans:
    def test_chunk_dedup_no_cartesian(self, spark, sf):
        # chunk dedup is hash-aggs + equi-joins on the chunk/id keys
        plan = plan_of(QUERIES["q_chunk_dedup"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_bm25_is_broadcast_stats_plus_take_ordered(self, spark, sf):
        # the only join is the 1-row stats broadcast; top-k must be the
        # partial-per-partition TakeOrdered, never a global sort
        plan = plan_of(QUERIES["q_bm25_topk"](spark, sf))
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan

    def test_unigram_logprob_freq_join_is_keyed(self, spark, sf):
        plan = plan_of(QUERIES["q_unigram_logprob"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_quality_rules_scan_only(self, spark, sf):
        # pure column expressions: no exchange, no python
        plan = plan_of(QUERIES["q_quality_rules"](spark, sf))
        assert "Exchange" not in plan

    def test_weighted_sample_filter_reaches_scan_stage(self, spark, sf):
        plan = plan_of(QUERIES["q_weighted_sample"](spark, sf))
        assert "Exchange" not in plan  # map-side membership, no shuffle

    def test_anonymize_single_window_shuffle(self, spark, sf):
        # one analytic window over the quasi-identifier key: exactly one
        # hash-partitioning exchange
        plan = plan_of(QUERIES["q_anonymize"](spark, sf))
        assert plan.count("Exchange hashpartitioning") == 1


class TestRound5LateBatch:
    def test_fuzzy_join_verifies_on_domain_expands_by_equi_join(self, spark, sf):
        # record linkage: the expensive verifier runs on the distinct-name
        # DOMAIN (the only non-equi join allowed is the broadcast loop over
        # that tiny frame); the expansion back to row pairs must be hash
        # equi-joins — never a cartesian/NL join over the row table
        plan = plan_of(QUERIES["q_fuzzy_join"](spark, sf))
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # the (name, brand) expansion
        # the domain cross is NL by necessity, but there must be exactly
        # one such join and levenshtein must not appear in any hash-join
        # condition (it would mean row-level verify came back)
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        hash_joins = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
        assert all("levenshtein" not in ln for ln in hash_joins)

    def test_robust_outliers_broadcasts_tiny_aggregates(self, spark, sf):
        # the per-type median/MAD frames are broadcast back over the scan
        plan = plan_of(QUERIES["q_robust_outliers"](spark, sf))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_event_gaps_single_window_shuffle(self, spark, sf):
        plan = plan_of(QUERIES["q_event_gaps"](spark, sf))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_quantized_scan_stays_jvm_side(self, spark, sf):
        plan = plan_of(QUERIES["q_cosine_topk_quantized"](spark, sf))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCodegen:
    def test_headline_aggregate_is_whole_stage_codegen(self, spark, sf):
        # the '*(n)' stage prefix is the WholeStageCodegen marker in
        # executedPlan.toString (explain("formatted") spells it out)
        plan = final_plan_of(QUERIES["q_pricing_summary"](spark, sf))
        assert "*(1)" in plan and "HashAggregate" in plan

    def test_no_python_udf_in_sql_queries(self, spark, sf):
        # every oracle-checked relational query stays JVM-side; Python
        # appears only in the explicitly-Arrow paths (multimodal, xml scan)
        for name in ("q_pricing_summary", "q_star_join_revenue", "q_topk_per_group",
                     "q_minhash_lsh", "q_simhash", "q_lang_id",
                     "q_chunk_dedup", "q_bm25_topk", "q_tfidf_keywords",
                     "q_quality_rules", "q_weighted_sample", "q_unigram_logprob",
                     "q_label_centroids", "q_length_percentiles", "q_anonymize"):
            plan = plan_of(QUERIES[name](spark, sf))
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name


class TestShuffleEconomy:
    def test_dedup_exact_single_shuffle(self, spark, sf):
        # exact dedup = one hash-agg pair (partial+final) → exactly one
        # exchange below the final aggregate
        plan = plan_of(QUERIES["q_dedup_exact"](spark, sf))
        assert plan.count("Exchange") <= 2  # agg shuffle + optional AQE read

    def test_minhash_signatures_no_shuffle(self, spark, sf):
        from dipper_spark.operators.dedup import minhash_signatures
        from dipper_spark.session import load_table

        docs = load_table(spark, sf, "documents")
        plan = plan_of(minhash_signatures(docs, "doc_id", "text", num_perm=8))
        # signature building is a pure map stage: the only exchange allowed
        # is the under-parallel-scan guard repartition
        assert plan.count("Exchange hashpartitioning") == 0


class TestSkewHandling:
    """The banded joins rely on AQE skew splitting for hot buckets at scale
    (VERDICT r2 #7): pin the configs so a session regression fails CI, and
    prove correctness under a synthetic hot bucket."""

    def test_skew_join_configs_pinned(self, spark):
        conf = spark.conf
        assert conf.get("spark.sql.adaptive.enabled") == "true"
        assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        assert conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor") == "4"
        assert (
            conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
            == "128m"
        )
        assert conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") == "64m"

    def test_hot_bucket_blocked_neardup_correct(self, spark):
        """One block holds 60 of 70 vectors (a hot LSH bucket).  The blocked
        self-join must stay an equi-join (no cartesian fallback) and return
        exactly the expected pair count."""
        import itertools
        import random

        from dipper_spark.operators.similarity import blocked_neardup

        rng = random.Random(3)
        rows = []
        for i in range(70):
            block = 0 if i < 60 else (i - 59)  # 60 rows in block 0, rest alone
            v = [rng.gauss(0, 1.0) for _ in range(8)]
            rows.append((i, v, block))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        got = blocked_neardup(emb, "label", threshold=0.5)
        plan = plan_of(got)
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

        expected = {
            (i, j)
            for (i, vi, bi), (j, vj, bj) in itertools.combinations(rows, 2)
            if bi == bj and cos(vi, vj) >= 0.5
        }
        assert {(r.id_1, r.id_2) for r in got.collect()} == expected


class TestRound5LateOps:
    def test_epoch_shuffle_single_exchange(self, spark, sf):
        # one shuffle: the rank over the shard partition; the md5 draw and
        # shard assignment are map-side
        plan = final_plan_of(QUERIES["q_epoch_shuffle"](spark, sf))
        assert plan.count("Exchange") <= 2  # shard hashpartitioning (+AQE read)
        assert "CartesianProduct" not in plan

    def test_quality_classifier_is_scan_only(self, spark, sf):
        # hashing-trick scorer must be a pure map pass: no Exchange at all
        plan = plan_of(QUERIES["q_quality_classifier"](spark, sf))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_passage_chunks_is_scan_only(self, spark, sf):
        # no KEYED shuffle — the only allowed Exchange is the deliberate
        # round-robin parallelism repartition over a single-file scan
        plan = plan_of(QUERIES["q_passage_chunks"](spark, sf))
        assert "hashpartitioning" not in plan
        assert "rangepartitioning" not in plan
        assert "Generate" in plan  # the explode

    def test_incremental_dedup_no_cartesian_hot_pruned(self, spark, sf):
        plan = final_plan_of(QUERIES["q_incremental_dedup"](spark, sf))
        assert "CartesianProduct" not in plan
        # the hot-shingle cap applies as a broadcast anti-join
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_triangle_count_all_equi_joins(self, spark, sf):
        plan = final_plan_of(QUERIES["q_triangle_count"](spark, sf))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_funnel_stage_frames_broadcast(self, spark, sf):
        # per-user stage tables are dimension-sized → every join back to
        # events must be broadcast, not sort-merge
        plan = final_plan_of(QUERIES["q_conversion_funnel"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_embedding_outliers_broadcasts_centroids(self, spark, sf):
        plan = final_plan_of(QUERIES["q_embedding_outliers"](spark, sf))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_dedup_decision_no_cartesian(self, spark, sf):
        plan = final_plan_of(QUERIES["q_dedup_decision"](spark, sf))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bpe_merges_runs_no_python_eval(self, spark, sf):
        # the merge fold and pair explode are pure JVM expressions
        df = QUERIES["q_bpe_merges"](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_substring_spans_semi_join_no_cartesian(self, spark, sf):
        # duplicated starts survive via a LEFT SEMI join on the window key;
        # the op is count-based — no pair self-join, no cartesian anywhere
        plan = final_plan_of(QUERIES["q_substring_spans"](spark, sf))
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_semdedup_blocked_join_no_cartesian(self, spark, sf):
        # centroid assignment is a DELIBERATE broadcast product (k tiny);
        # the pair search must be the bucket equi-join, never a cartesian
        plan = final_plan_of(QUERIES["q_semdedup"](spark, sf))
        assert "CartesianProduct" not in plan

    def test_dsir_model_table_is_broadcast(self, spark, sf):
        # the 4096-bucket model table joins back to doc features broadcast;
        # the corpus is never shuffled on doc volume
        plan = final_plan_of(QUERIES["q_dsir_weights"](spark, sf))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_gumbel_topk_is_take_ordered(self, spark, sf):
        # global weighted top-k must be the per-partition partial fold,
        # never a global sort
        plan = plan_of(QUERIES["q_gumbel_topk"](spark, sf))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_hist_quantiles_sketch_shape(self, spark, sf):
        # one hash-agg to (group, bin) counters; no join at all
        plan = final_plan_of(QUERIES["q_hist_quantiles"](spark, sf))
        assert "HashAggregate" in plan
        assert "CartesianProduct" not in plan
        assert "Join" not in plan

    def test_bpe_encode_vocab_broadcast(self, spark, sf):
        # the word->segmentation table joins back broadcast; the corpus
        # side never shuffles on doc volume
        plan = final_plan_of(QUERIES["q_bpe_encode"](spark, sf))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_rrf_fusion_arms_truncated_before_fuse(self, spark, sf):
        # both arms are TakeOrdered-bounded; the fuse join runs on <= 2N
        # rows so no shuffle-heavy join shape may appear on corpus volume
        plan = final_plan_of(QUERIES["q_rrf_fusion"](spark, sf))
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_zorder_layout_is_pure_agg(self, spark, sf):
        # the layout audit is scan -> map (bit ops) -> grouped agg per
        # layout: no joins of any kind
        plan = final_plan_of(QUERIES["q_zorder_layout"](spark, sf))
        assert "Join" not in plan
        assert "CartesianProduct" not in plan

    def test_media_patch_dedup_hot_prune(self, spark, sf):
        # hot-patch prune is a broadcast anti-join; pairs only via digest
        # equi-join — never a cartesian, blobs never in the shuffle
        plan = final_plan_of(QUERIES["q_media_patch_dedup"](spark, sf))
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_training_mix_capstone_shape(self, spark, sf):
        # DSIR model broadcast, Gumbel draw TakeOrdered, 200-row shard
        # shuffle — no cartesians, no global sort of the corpus
        plan = plan_of(QUERIES["q_training_mix"](spark, sf))
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestScd2History:
    def test_single_keyed_shuffle(self, spark, sf):
        """The SCD2 build's two windows and the run-aggregate must share
        ONE (user_id) hash exchange — the q_session_ids discipline; a
        second exchange means the agg or lead() re-shuffled."""
        plan = final_plan_of(QUERIES["q_scd2_history"](spark, sf))
        # count in the FINAL adaptive plan only (the AQE dump appends an
        # "== Initial Plan ==" section that would double-count)
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in final


class TestRound9Additions:
    def test_collapse_runs_is_pure_map(self, spark, sf):
        # indexed-lambda scrub: scan -> project, zero shuffles, zero joins
        plan = plan_of(QUERIES["q_collapse_runs"](spark, sf))
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan

    def test_hll_registers_shuffle_is_sketch_sized(self, spark, sf):
        # after the distinct-pair stage every agg runs on (source, bucket)
        # register rows; no sort-merge join anywhere and the estimate join
        # is broadcast
        plan = final_plan_of(QUERIES["q_hll_distinct"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final
        assert "CartesianProduct" not in final

    def test_pmi_collocations_take_ordered(self, spark, sf):
        # global top-50 must be TakeOrdered; N rides a 1-row broadcast
        plan = plan_of(QUERIES["q_pmi_collocations"](spark, sf))
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_ann_pq_broadcast_shapes(self, spark, sf):
        # codebooks + query set broadcast; the only nested-loop is the
        # 5-row query broadcast against the quantized corpus; never a
        # shuffle join
        plan = final_plan_of(QUERIES["q_ann_pq"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final
        assert final.count("BroadcastNestedLoopJoin") <= 1
        assert "CartesianProduct" not in final

    def test_key_skew_runs_on_count_table(self, spark, sf):
        # raw rows reduced by one keyed hash-agg before any window/join;
        # nothing python-side, no cartesian
        plan = final_plan_of(QUERIES["q_key_skew"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "Python" not in final and "CartesianProduct" not in final

    def test_kneser_ney_model_join_shapes(self, spark, sf):
        # scalars ride a broadcast 1-row frame; no cartesian anywhere
        plan = final_plan_of(QUERIES["q_kneser_ney"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final
        assert "BroadcastNestedLoopJoin" in final  # the 1-row consts frame

    def test_calibration_is_two_map_arms_one_tiny_agg(self, spark, sf):
        plan = final_plan_of(QUERIES["q_calibration"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "Python" not in final and "CartesianProduct" not in final


class TestRound9LateAdditions:
    def test_ivfpq_no_shuffle_joins(self, spark, sf):
        # centroids, codebooks, and the query set all broadcast; the
        # quantized corpus is the only big frame
        plan = final_plan_of(QUERIES["q_ann_ivfpq"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final
        assert "CartesianProduct" not in final

    def test_source_dup_matrix_attribution_stays_pair_sized(self, spark, sf):
        # the (source, source) attribution joins ride the bounded pair
        # list; nothing python-side, no cartesian
        plan = final_plan_of(QUERIES["q_source_dup_matrix"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "Python" not in final and "CartesianProduct" not in final

    def test_drift_psi_two_aggs_one_broadcast(self, spark, sf):
        # decile counts then a broadcast 1-row totals frame — never a
        # shuffle join of the bin table
        plan = final_plan_of(QUERIES["q_drift_psi"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastNestedLoopJoin" in final  # the 1-row totals
        assert "SortMergeJoin" not in final and "CartesianProduct" not in final


class TestRound10Additions:
    def test_salted_agg_every_exchange_is_sketch_or_key_sized(self, spark, sf):
        """Two exchanges for the two-phase agg (partial over (key,salt),
        final over key), the expanded two-level count-distinct, the key
        universe, and a broadcast recombination join — no window, no
        python, nothing row-sized past the first aggregation."""
        plan = final_plan_of(QUERIES["q_salted_agg"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "Window" not in final and "Python" not in final
        assert "CartesianProduct" not in final
        assert "BroadcastHashJoin" in final  # key-sized recombination

    def test_skew_join_fixture_dim_broadcasts_salt_inert(self, spark, sf):
        """At fixture scale Catalyst broadcasts the 5-row language dim —
        a broadcast join has no skew problem, so the salt must be inert
        overhead-wise: ONE exchange at most (the profile agg), never a
        sort-merge join or nested loop.  The salted-shuffle shape under a
        non-broadcastable dim is locked in tests/test_skew.py."""
        plan = final_plan_of(QUERIES["q_skew_join"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "SortMergeJoin" not in final
        assert "BroadcastNestedLoopJoin" not in final
        assert final.count("Exchange hashpartitioning") <= 1

    def test_media_spectrum_is_one_map_stage(self, spark, sf):
        """Decode -> pool -> DFT power -> threshold is a single
        mapInPandas pass: ZERO exchanges, the blob never shuffles."""
        plan = final_plan_of(QUERIES["q_media_spectrum"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") == 0
        assert "MapInPandas" in final
        assert "CartesianProduct" not in final

    def test_ivfpq_refine_no_cartesian_no_python(self, spark, sf):
        """The refine arm joins shortlist-sized candidate rows back to
        full vectors — equi-joins only, all JVM-side."""
        plan = final_plan_of(QUERIES["q_ann_ivfpq_refine"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final and "Python" not in final

    def test_tokenizer_compression_report_is_broadcast_joined(self, spark, sf):
        """Both encode arms ride broadcast word->segmentation joins; the
        2-row report never shuffles the corpus twice per tokenizer."""
        plan = final_plan_of(QUERIES["q_tokenizer_compression"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "CartesianProduct" not in final


class TestRound11Additions:
    def test_guarded_join_engages_salted_on_the_zipfian_lang(self, spark, sf):
        """'en' owns ~44% of the corpus, so BOTH runtime guards must fire:
        the profile agg takes the two-phase salted shape and the
        enrichment join carries the hot-dim replication explode.  At
        fixture scale the replica dim still broadcasts (a broadcast join
        has no skew problem — salt inert); the salted-shuffle shape under
        a non-broadcastable dim is locked in tests/test_skew.py."""
        plan = final_plan_of(QUERIES["q_guarded_join"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "Generate explode" in final  # guarded_join took the salted arm
        assert "Python" not in final
        assert "CartesianProduct" not in final
        assert "BroadcastNestedLoopJoin" not in final

    def test_unigram_encode_stored_is_encode_only(self, spark, sf):
        """The stored-model variant must not retrain: the plan is the
        broadcast word->segmentation join over a PARQUET SCAN of the
        stored artifact — no Viterbi DP stages, no EM exchanges.  The
        artifact table appears as a FileScan of the model store path."""
        plan = final_plan_of(QUERIES["q_unigram_encode_stored"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "Python" not in final and "CartesianProduct" not in final
        # encode is one corpus scan + one model scan + one aggregation:
        # the train-time DP (dozens of exchanges) must be absent
        assert final.count("Exchange hashpartitioning") <= 2

    def test_classifier_apply_stored_is_scan_speed(self, spark, sf):
        """The stored-classifier scorer must be the apply-many shape:
        grains -> BROADCAST join of the dictionary-sized weight table ->
        one hash aggregation.  No GD iterations (the 16 training rounds
        live behind the store), no Python, no cartesian; the only wide
        exchange is the (id, bucket) grain count."""
        plan = final_plan_of(QUERIES["q_classifier_apply_stored"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "Python" not in final
        assert "CartesianProduct" not in final
        assert "BroadcastNestedLoopJoin" not in final
        # grain count + final (id) agg: at most 3 hash exchanges
        assert final.count("Exchange hashpartitioning") <= 3

    def test_classifier_gradient_iteration_shape(self, spark, sf):
        """One GD iteration = the co-partitioned SHUFFLE_HASH residual
        join over an id-partitioned persisted grain table — no sort, no
        sort-merge join, no Python, and (round 14) ZERO exchanges before
        the final bucket aggregation: the margin aggregation and the
        residual join both reuse the grain table's own
        hashpartitioning(id) (guide §2.4)."""
        from dipper_spark.functions.text import quality_rules
        from dipper_spark.operators.classifier import (
            _gradient,
            classifier_grains,
        )

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        lab = docs.select(
            "doc_id", "text", quality_rules("text")["passed"].alias("y")
        )
        feat = (
            classifier_grains(lab, "doc_id", "text", 64)
            .join(
                lab.select(
                    F.col("doc_id").alias("id"), F.col("y").cast("long").alias("y")
                ),
                "id",
            )
            .select("id", "bucket", "fx", "y")
            .repartition(4, "id")
            .persist()
        )
        try:
            feat.count()
            plan = final_plan_of(_gradient(feat, {-1: 1000, 3: -500}, bcast=True))
            final = plan.split("== Initial Plan ==")[0]
            assert "ShuffledHashJoin" in final
            assert "Python" not in final
            assert "SortMergeJoin" not in final
            assert "CartesianProduct" not in final
            # the only exchange is the dictionary-sized bucket aggregation:
            # residual agg + join ride the persisted id-partitioning (the
            # InMemoryRelation section embeds the cached featurize subtree's
            # own plan, so count only the main query above it)
            assert final.split("InMemoryRelation")[0].count(
                "Exchange hashpartitioning"
            ) == 1
        finally:
            feat.unpersist(blocking=False)


class TestRound12Additions:
    def test_ann_ivf_stored_is_probe_only(self, spark, sf):
        """The stored-index ANN variant must not retrain: query time is
        coarse assignment (broadcast of the PARQUET-scanned centroid
        artifact) + the probed-bucket scan + top-k.  The centroid table
        must come from a FileScan of the model store ('models' path), not
        from a just-trained checkpoint RDD, and no training stage
        (posexplode mean passes, Python, cartesian) may appear."""
        plan = final_plan_of(QUERIES["q_ann_ivf_stored"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "models" in final  # the stored artifact's parquet scan
        assert "ExistingRDD" not in final  # no in-session training residue
        assert "posexplode" not in final.lower()  # the kmeans mean signature
        assert "Python" not in final
        assert "CartesianProduct" not in final
        assert "SortMergeJoin" not in final

    def test_ann_ivfpq_residual_no_shuffle_joins(self, spark, sf):
        """The residual IVFADC stack keeps the broadcast economics of the
        raw stack: centroids, codebooks, and the query set broadcast; the
        quantized corpus is the only big frame.  Lloyd codebook training
        adds hash aggregations, never a shuffle join or Python stage."""
        plan = final_plan_of(QUERIES["q_ann_ivfpq"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final
        assert "CartesianProduct" not in final
        assert "Python" not in final

    def test_dedup_agreement_shuffle_volume_budget(self, spark, sf):
        """Round-12 verdict item #8: pin the steady-state shuffle WRITE
        volume of the most expensive bench query to its current order of
        magnitude.  Wall time at small SF hides plan rot (a lost hot-
        shingle prune or a full cross join adds milliseconds here but
        terabytes at 100 TB); bytes shuffled do not — the known-good
        volume at this SF is ~0.1 MB, and the pruned/banded plan cannot
        legitimately grow it 20x without a shape change."""
        from dipper_spark.session import stage_shuffle_bytes

        QUERIES["q_dedup_agreement"](spark, sf).count()  # warm/codegen
        pre = stage_shuffle_bytes(spark)
        QUERIES["q_dedup_agreement"](spark, sf).count()
        post = stage_shuffle_bytes(spark)
        if not post:
            import pytest

            pytest.skip("Spark UI disabled - no task metrics available")
        vol = sum(b for sid, b in post.items() if sid not in pre)
        assert 0 < vol < 2_000_000, f"shuffle volume {vol}B outside budget"


class TestPlanLockSensitivity:
    """Round-12 verdict item #7: the ~80 plan locks assert shapes
    (broadcast present, no SortMergeJoin/CartesianProduct/Python, bounded
    exchange counts, no-retrain stored plans) — this suite proves those
    assertions have TEETH by seeding each representative plan fault
    deliberately and checking the lock's predicate goes red on it.  A
    lock that cannot fail locks nothing (the value-gate twin lives in
    tests/test_gate_sensitivity.py)."""

    def _lineitem_orders(self, spark, sf):
        li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        od = spark.read.parquet(f"{sf}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        return li, od

    def test_broadcast_off_fault_trips_the_sortmergejoin_lock(self, spark, sf):
        """Fault: the dim-side broadcast is dropped (hint removed, auto
        threshold disabled).  The star-join locks' 'no SortMergeJoin'
        predicate must detect it."""
        li, od = self._lineitem_orders(spark, sf)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            rotten = final_plan_of(
                li.join(od, li.l_orderkey == od.o_orderkey)
            ).split("== Initial Plan ==")[0]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in rotten or "ShuffledHashJoin" in rotten
        assert "BroadcastHashJoin" not in rotten  # the lock's positive arm fails too

    def test_extra_exchange_fault_trips_the_exchange_count_lock(self, spark, sf):
        """Fault: a gratuitous repartition injected mid-plan.  The
        bounded-exchange locks (<= N 'Exchange hashpartitioning') must
        count the extra shuffle."""
        li, _ = self._lineitem_orders(spark, sf)
        clean = final_plan_of(
            li.groupBy("l_orderkey").count()
        ).split("== Initial Plan ==")[0]
        rotten = final_plan_of(
            li.repartition(7, "l_extendedprice").groupBy("l_orderkey").count()
        ).split("== Initial Plan ==")[0]
        assert rotten.count("Exchange hashpartitioning") \
            > clean.count("Exchange hashpartitioning")

    def test_python_udf_fault_trips_the_no_python_lock(self, spark, sf):
        """Fault: a row-at-a-time Python UDF slipped into the hot path.
        Every 'Python not in final' lock must light up."""
        from pyspark.sql.functions import udf

        li, _ = self._lineitem_orders(spark, sf)
        slow = udf(lambda x: x * 2.0, "double")
        # the faulted column must be CONSUMED — aggregate over it, or
        # Catalyst prunes the UDF away and the fault is a no-op
        rotten = final_plan_of(
            li.select("l_orderkey", slow("l_extendedprice").alias("d"))
            .groupBy("l_orderkey").agg(F.sum("d"))
        ).split("== Initial Plan ==")[0]
        assert "Python" in rotten

    def test_cartesian_fault_trips_the_no_cartesian_lock(self, spark, sf):
        """Fault: an equi-join condition lost (joins on TRUE).  The
        'CartesianProduct not in final' locks must detect the product."""
        li, od = self._lineitem_orders(spark, sf)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            rotten = final_plan_of(
                li.limit(50).crossJoin(od.limit(50))
            ).split("== Initial Plan ==")[0]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "CartesianProduct" in rotten

    def test_inline_retrain_fault_trips_the_stored_model_locks(self, spark, sf):
        """Fault: the stored-model variant silently retrains in-query.
        Simulated by applying the stored locks' predicates to the honest
        retrain-in-query twins: inline kmeans puts posexplode back in the
        ANN plan, and the retrain plan has no model-store FileScan (the
        training (kmeans mean passes AND their posexplode stages) hides
        behind localCheckpoint lineage truncation in BOTH variants'
        final plans, so the artifact scan — not posexplode or the
        exchange count — is the stored-vs-retrain discriminator: the
        stored plan reads the versioned parquet artifact, the retrain
        plan reads the checkpointed RDD it just paid to train."""
        ann_rotten = final_plan_of(
            QUERIES["q_ann_ivf_refined"](spark, sf)
        ).split("== Initial Plan ==")[0]
        stored = final_plan_of(
            QUERIES["q_ann_ivf_stored"](spark, sf)
        ).split("== Initial Plan ==")[0]
        assert "models" in stored and "models" not in ann_rotten
        assert "ExistingRDD" in ann_rotten  # the just-trained checkpoint scan

    def test_salted_plan_presence_lock_goes_red_when_guard_disabled(self, spark, sf):
        """Fault: the skew guard wired out (plain join on the Zipfian
        key).  The guarded-join plan lock checks for the salted shape
        (dim-replica explode); the plain plan must NOT contain it — i.e.
        the lock can distinguish the two."""
        from dipper_spark.session import load_table

        docs = load_table(spark, sf, "documents")
        prof = docs.groupBy(F.col("lang").alias("p_lang")).count()
        plain = final_plan_of(
            docs.join(prof, docs.lang == prof.p_lang)
        ).split("== Initial Plan ==")[0]
        assert "Generate explode" not in plain
        guarded = final_plan_of(
            QUERIES["q_guarded_join"](spark, sf)
        ).split("== Initial Plan ==")[0]
        assert "Generate explode" in guarded

    def test_ann_ivfpq_stored_is_probe_only(self, spark, sf):
        """The stored FULL-index IVFADC variant: every state table comes
        from model-store parquet FileScans; no training residue (no
        checkpointed RDD scans, no Python, no cartesian/shuffle joins)."""
        plan = final_plan_of(QUERIES["q_ann_ivfpq_stored"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "models" in final
        assert "ExistingRDD" not in final
        assert "Python" not in final
        assert "CartesianProduct" not in final
        assert "SortMergeJoin" not in final


class TestRound13Additions:
    def test_ann_family_shares_one_session_index(self, spark, sf):
        """Round-12 verdict item #1: q_ann_ivfpq / _recall / _refine consume
        ONE in-session residual index.  The cache must return the identical
        state-table dict on repeat calls (training ran once), and the
        family's plans must be search-only over the checkpointed tables:
        scans of ExistingRDD, no Python, no cartesian, no shuffle join."""
        from dipper_spark.plans.catalog_text import (
            _IVFPQ_SESSION,
            _session_ivfpq_index,
        )
        from dipper_spark.session import load_table

        emb = load_table(spark, sf, "embeddings")
        i1 = _session_ivfpq_index(spark, emb, sf)
        i2 = _session_ivfpq_index(spark, emb, sf)
        assert i1 is i2  # cache hit — no retraining
        assert (spark.sparkContext.applicationId, sf) in _IVFPQ_SESSION
        for q in ("q_ann_ivfpq", "q_ann_ivfpq_recall", "q_ann_ivfpq_refine"):
            df = QUERIES[q](spark, sf)
            final = final_plan_of(df).split("== Initial Plan ==")[0]
            assert "Python" not in final
            assert "CartesianProduct" not in final
            assert "SortMergeJoin" not in final
            # the checkpointed index scans live inside materialized AQE
            # stages, which the executed-plan string elides — assert on
            # the full pre-AQE physical plan instead
            assert "ExistingRDD" in df._jdf.queryExecution().toString()

    def test_session_index_search_is_bit_identical_to_retraining(self, spark, sf):
        """The sharing must be invisible to values: searching the cached
        index reproduces a from-scratch ivfpq_topk(residual=True) exactly
        (training is deterministic end-to-end)."""
        fresh = QUERIES["q_ann_ivfpq"](spark, sf).collect()
        from pyspark.sql import functions as F

        from dipper_spark.operators.similarity import ivfpq_topk
        from dipper_spark.plans.catalog_text import _PQ_DIM, _PQR_CODES, _PQR_IT, _PQR_SUB
        from dipper_spark.session import load_table

        emb = load_table(spark, sf, "embeddings")
        retrained = ivfpq_topk(
            emb.filter(F.col("vec_id") < 5), emb,
            n_centroids=16, n_sub=_PQR_SUB, n_codes=_PQR_CODES, dim=_PQ_DIM,
            k=5, residual=True, pq_iters=_PQR_IT,
        ).collect()
        key = lambda r: (r.query_id, r.rank)
        assert sorted(map(tuple, fresh), key=lambda t: (t[0], t[4])) == \
               sorted(map(tuple, retrained), key=lambda t: (t[0], t[4]))

    def test_tokenizer_families_share_one_session_training(self, spark, sf):
        """q_bpe_merges/_vocab/_encode and q_unigram_tokenizer/_encode
        consume ONE shared in-session training each (_session_bpe /
        _session_unigram): repeat calls return the identical checkpointed
        frames (no retraining), and the encode entries' plans are
        encode-only over the checkpointed vocab — scans of ExistingRDD,
        no training stages re-run (zero Python, no cartesian)."""
        from dipper_spark.plans.catalog_search import (
            _TOKENIZER_SESSION,
            _session_bpe,
            _session_unigram,
        )
        from dipper_spark.session import load_table

        docs = load_table(spark, sf, "documents")
        b1 = _session_bpe(spark, docs, sf)
        b2 = _session_bpe(spark, docs, sf)
        assert b1 is b2  # cache hit — no retraining
        u1 = _session_unigram(spark, docs, sf)
        u2 = _session_unigram(spark, docs, sf)
        assert u1 is u2
        app = spark.sparkContext.applicationId
        assert (app, sf, "bpe") in _TOKENIZER_SESSION
        assert (app, sf, "unigram") in _TOKENIZER_SESSION
        for q in ("q_bpe_encode", "q_unigram_encode"):
            df = QUERIES[q](spark, sf)
            final = final_plan_of(df).split("== Initial Plan ==")[0]
            assert "Python" not in final
            assert "CartesianProduct" not in final
            assert "ExistingRDD" in df._jdf.queryExecution().toString()

    def test_session_tokenizer_is_bit_identical_to_retraining(self, spark, sf):
        """Sharing must be invisible to values: the cached trainings
        reproduce a from-scratch bpe_train / unigram_train exactly (both
        trainers are deterministic — integer scores, total-order ties)."""
        from dipper_spark.operators.bpe import bpe_train
        from dipper_spark.operators.unigram import unigram_train
        from dipper_spark.plans.catalog_search import (
            _BPE_MERGES,
            _UNI_EM,
            _UNI_L,
            _UNI_P,
            _UNI_V,
            _session_bpe,
            _session_unigram,
        )
        from dipper_spark.session import load_table

        docs = load_table(spark, sf, "documents")
        cached_m, cached_v = _session_bpe(spark, docs, sf)
        fresh_m, fresh_v = bpe_train(docs, "text", n_merges=_BPE_MERGES)
        assert sorted(map(tuple, cached_m.collect())) == \
               sorted(map(tuple, fresh_m.collect()))
        assert sorted(map(tuple, cached_v.collect())) == \
               sorted(map(tuple, fresh_v.collect()))
        cached_model, _ = _session_unigram(spark, docs, sf)
        fresh_model, _ = unigram_train(
            docs, "text", piece_max_len=_UNI_P, top_pieces=_UNI_V,
            em_iters=_UNI_EM, word_max_len=_UNI_L,
        )
        assert sorted(map(tuple, cached_model.collect())) == \
               sorted(map(tuple, fresh_model.collect()))

    def test_ann_index_append_is_apply_only(self, spark, sf):
        """Round-13 incremental maintenance: the append entry's plan is
        pure apply work — model-store FileScans for the frozen quantizer
        plus assignment/encode of the delta shard.  No training residue
        (no checkpointed RDD scans), no Python, no cartesian, no
        sort-merge join."""
        plan = final_plan_of(QUERIES["q_ann_index_append"](spark, sf))
        final = plan.split("== Initial Plan ==")[0]
        assert "models" in final
        assert "ExistingRDD" not in final
        assert "Python" not in final
        assert "CartesianProduct" not in final
        assert "SortMergeJoin" not in final


class TestRound14PlanLocks:
    """Round-13 verdict item #6: locks for the round-13 shapes that had
    bench evidence but no standing plan assertion — the argmax-by-array-
    fold in IVF assignment (no corpus-sized join+aggregation) and the
    salted in-join scoring width in centroid_neardup (REPARTITION_BY_NUM
    pins it against AQE coalescing).  Each lock's sensitivity twin seeds
    the reverted shape deliberately and checks the predicate goes red."""

    def test_assign_buckets_is_argmax_fold(self, spark, sf):
        """IVF assignment must stay ONE map pass over the vectors: the
        centroid set collapses to a single broadcast array row (carried
        by a 1-row BroadcastNestedLoopJoin), and the plan has NO
        per-vector hash-aggregation exchange and NO hash/sort-merge join
        — reverting to the r12 join+max(struct) form reintroduces both."""
        from dipper_spark.operators.similarity import assign_buckets
        from dipper_spark.session import load_table

        emb = load_table(spark, sf, "embeddings")
        cents = emb.filter(F.col("vec_id") < 4)
        plan = plan_of(assign_buckets(emb, cents))
        assert "BroadcastNestedLoopJoin" in plan  # the folded-array carrier
        assert "array_max" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" not in plan
        assert "Python" not in plan

    def test_assign_fold_lock_trips_on_join_agg_revert(self, spark, sf):
        """Sensitivity twin: the pre-r13 join+aggregation assignment
        (broadcast-product join, max(struct) groupBy) must violate the
        fold lock's predicates."""
        from dipper_spark.operators.similarity import l2_norm, dot
        from dipper_spark.session import load_table

        emb = load_table(spark, sf, "embeddings")
        cents = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
        )
        joined = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            F.struct(
                (dot(F.col("embedding"), F.col("cent_emb"))
                 / (l2_norm("embedding") * l2_norm("cent_emb"))).alias("c"),
                (-F.col("cent_id")).alias("nc"),
                F.col("cent_id").alias("cent_id"),
            ).alias("_s"),
        )
        rotten = plan_of(
            joined.groupBy("vec_id").agg(F.max("_s").alias("_t"))
        )
        assert "Exchange hashpartitioning" in rotten  # the corpus-sized agg

    def test_centroid_neardup_pins_salted_join_width(self, spark, sf):
        """The multi-assign near-dup scorer must keep scoring INSIDE the
        salted bucket self-join: both sides repartition by (bucket, salt)
        with REPARTITION_BY_NUM (never AQE-coalesced), the a-side salt is
        the deterministic pmod(xxhash64(id), K), and no corpus-sized frame
        is broadcast (the fetch-back attach joins stay gone)."""
        df = QUERIES["q_neardup_multiassign"](spark, sf)
        pre = df._jdf.queryExecution().toString()
        assert pre.count("REPARTITION_BY_NUM") >= 2
        assert "xxhash64" in pre
        final = final_plan_of(df).split("== Initial Plan ==")[0]
        assert "Python" not in final
        assert "CartesianProduct" not in final

    def test_salt_width_lock_trips_on_plain_repartition(self, spark, sf):
        """Sensitivity twin: an ENSURE_REQUIREMENTS exchange (what the
        join would insert on its own, AQE-coalescible) does not satisfy
        the REPARTITION_BY_NUM predicate."""
        li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey")
        a, b = li.alias("a"), li.alias("b")
        rotten = a.join(
            b, F.col("a.l_orderkey") == F.col("b.l_orderkey")
        )._jdf.queryExecution().toString()
        assert "REPARTITION_BY_NUM" not in rotten
