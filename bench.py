#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-style action (collect for small
outputs) — wall time includes scan, shuffle, and result materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: scan-agg, star join, window topk, symmetric-pair network,
#: json/scalar families, event-time windows, plus the heavier LLM-pipeline
#: operators as they land.
HEADLINE = [
    "q_pricing_summary",
    "q_star_join_revenue",
    "q_topk_per_group",
    "q_symmetric_pairs",
    "q_interval_rollup",
    "q_zscore_threshold",
    "q_json_extract",
    "q_windowed_events",
    "q_rolling_avg",
    "q_event_gaps",
    "q_key_skew",
    "q_salted_agg",
    "q_skew_join",
    "q_selfjoin_size",
    "q_robust_outliers",
    "q_conversion_funnel",
    "q_cohort_retention",
    "q_triangle_count",
    "q_hash_ids",
    "q_range_join",
    "q_fuzzy_join",
    "q_pagerank",
    "q_asof_join",
    "q_vec_quantize",
    # LLM-pipeline operators
    "q_dedup_agreement",
    "q_session_ids",
    "q_scd2_history",
    "q_sequence_pack",
    "q_bpe_vocab",
    "q_bpe_encode",
    "q_unigram_tokenizer",
    "q_unigram_encode",
    "q_media_spectrum",
    "q_ann_ivfpq_refine",
    "q_ngram_jaccard",
    "q_doc_fingerprint",
    "q_count_min",
    "q_distinct_sketch",
    "q_hll_distinct",
    "q_repetition",
    "q_stratified_sample",
    "q_source_quota",
    "q_token_stats",
    "q_stats_rollup",
    "q_lang_pivot",
    "q_bpe_token_count",
    "q_bpe_merges",
    "q_rolling_fingerprint",
    "q_quality_rules",
    "q_curation_funnel",
    "q_unigram_logprob",
    "q_worst_window",
    "q_bigram_logprob",
    "q_kneser_ney",
    "q_ngram_diversity",
    "q_token_entropy",
    "q_source_overlap",
    "q_source_divergence",
    "q_incremental_dedup",
    "q_embedding_outliers",
    "q_length_percentiles",
    "q_hist_quantiles",
    "q_anonymize",
    "q_l_diversity",
    "q_label_centroids",
    "q_weighted_sample",
    "q_temperature_sample",
    "q_epoch_shuffle",
    "q_snapshot_diff",
    "q_drift_psi",
    "q_novelty_rate",
    "q_zorder_layout",
    "q_label_pca",
    "q_quality_classifier",
    "q_calibration",
    "q_rank_corr",
    "q_passage_chunks",
    "q_bm25_topk",
    "q_rrf_fusion",
    "q_tfidf_keywords",
    "q_bloom_probe",
    "q_top_ngrams",
    "q_pmi_collocations",
    "q_keyness",
    "q_pii_scan",
    "q_pii_redact",
    "q_strip_boilerplate",
    "q_collapse_runs",
    "q_clean_corpus",
    "q_dedup_exact",
    "q_chunk_dedup",
    "q_substring_spans",
    "q_semdedup",
    "q_dsir_weights",
    "q_gumbel_topk",
    "q_training_mix",
    "q_dedup_decision",
    "q_decontaminate",
    "q_jaccard_pruned",
    "q_containment",
    "q_minhash_lsh",
    "q_source_dup_matrix",
    "q_lsh_recall",
    "q_simhash",
    "q_simhash_pairs",
    "q_cosine_topk",
    "q_cosine_topk_arrow",
    "q_cosine_topk_quantized",
    "q_ann_ivf",
    "q_ann_ivf_refined",
    # stored-index ANN (round 12): cold run trains + saves, warm run is
    # assignment + probe only — min-of-2 reports the steady state
    "q_ann_ivf_stored",
    "q_ann_recall",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_ann_ivfpq_stored",
    "q_ann_index_append",
    "q_ann_bucket_drift",
    "q_ann_ivfpq_recall",
    "q_matryoshka_recall",
    "q_embedding_neardup",
    "q_neardup_multiassign",
    "q_dup_components",
    # multimodal columns
    "q_media_stats",
    "q_media_features",
    "q_media_dedup",
    "q_media_frames",
    "q_media_patch_dedup",
    "q_media_phash",
    # tokenizer capstones through the model store (round 11): cold run
    # trains + saves, warm run loads — min-of-2 reports the steady state
    "q_unigram_encode_stored",
    "q_tokenizer_compression",
    # runtime-guarded skew dispatch (round 11)
    "q_guarded_join",
    # trained quality classifier: in-session GD (honest training cost),
    # stored-model apply + eval (steady state)
    "q_classifier_train",
    "q_classifier_apply_stored",
    "q_classifier_eval",
    # the remaining catalog micro-queries (scans/filters/set-ops): cheap,
    # but included so the bench covers 100% of the catalog — no silent
    # exclusions (round-10 verdict nit b)
    "q_anti_join",
    "q_composite_key_join",
    "q_date_functions",
    "q_dedup_triples",
    "q_dispatch_case",
    "q_except_diff",
    "q_lang_id",
    "q_limit_topn",
    "q_one_to_one",
    "q_pairwise_self_join",
    "q_predicate_histogram",
    "q_qualifier_filter",
    "q_scalar_strings",
    "q_score_threshold",
    "q_test_id_subset",
    "q_text_quality",
    "q_token_count",
    "q_union_dedup",
    "q_void_stats",
]


#: Queries whose steady-state (min-of-2, in-session-shared) timings no
#: longer include their training cost: the BPE/unigram families share one
#: in-session training and the residual-IVFPQ trio shares one in-session
#: index (all keyed on applicationId — cold across JVMs).  The round-13
#: verdict flagged that a 10x trainer regression would be invisible to
#: the bench; SPARK_GRAFT_BENCH_COLD=1 times these entries' FIRST run in
#: a fresh JVM (the run that pays the training) and writes the result to
#: the normal artifacts with mode="cold_first_run".  q_classifier_train /
#: q_ann_ivf_refined are included as the honest-training references
#: (their steady timing already contains training).
COLD_TRAINED = [
    "q_bpe_vocab",
    "q_bpe_encode",
    "q_bpe_merges",
    "q_unigram_tokenizer",
    "q_unigram_encode",
    "q_ann_ivfpq",
    "q_ann_ivfpq_recall",
    "q_ann_ivfpq_refine",
    "q_classifier_train",
    "q_ann_ivf_refined",
]


def _isolate_main(n_samples: int, names: list[str] | None, sf_dir: str) -> int:
    """Drift-adjudication mode (round-8 verdict item #1): run the headline
    set ``n_samples`` times, EACH in a fresh subprocess (fresh JVM, fresh
    session — no session crowding from earlier queries), record loadavg
    around every sample, and report the per-query MEDIAN.  This is the
    docs/BENCH_DRIFT_r5.md protocol made permanent.  OPT-IN (the driver's
    per-round bench path stays single-session: N fresh JVMs multiply wall
    time the same way the 8-minute source sweep would — see the
    SPARK_GRAFT_SOURCE_BENCH precedent)."""
    import statistics
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    samples: list[dict[str, float]] = []
    loads: list[list[float]] = []
    for i in range(n_samples):
        loads.append([round(x, 2) for x in os.getloadavg()])
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
            out = fh.name
        env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD=out, SPARK_GRAFT_SF_DIR=sf_dir)
        if names is not None:
            env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(names)
        rc = subprocess.call([sys.executable, os.path.join(here, "bench.py")], env=env)
        if rc != 0:
            print(f"# sample {i} failed rc={rc}", file=sys.stderr)
            return rc
        with open(out) as f:
            samples.append(json.load(f)["queries"])
        os.unlink(out)
        print(f"# sample {i}: total={round(sum(samples[-1].values()), 3)}s "
              f"loadavg@start={loads[-1]}", file=sys.stderr)
    medians = {
        q: round(statistics.median(s[q] for s in samples), 3) for q in samples[0]
    }
    total = round(sum(medians.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(
            {"metric": "headline_queries_total", "value": total, "unit": "sec",
             "mode": "isolate", "n_samples": n_samples, "loadavg": loads,
             "queries": medians, "samples": samples, "sf": float(sf)},
            fh, indent=1,
        )
    slowest = dict(sorted(medians.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps(
        {"metric": "headline_queries_total", "value": total, "unit": "sec",
         "mode": "isolate", "n_samples": n_samples, "queries": slowest,
         "n_queries": len(medians), "detail": "BENCH_DETAIL.json",
         "sf": float(sf)}
    ))
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    if args and args[0] == "--isolate":
        n_samples = int(args[1]) if len(args) > 1 and args[1].isdigit() else 3
        names = None
        if "--queries" in args:
            qfile = args[args.index("--queries") + 1]
            names = [ln.strip() for ln in open(qfile) if ln.strip()]
        return _isolate_main(n_samples, names, sf_dir)

    from dipper_spark.plans import QUERIES
    from dipper_spark.session import get_spark, stage_shuffle_bytes

    spark = get_spark("dipper_spark-bench")
    timings: dict[str, float] = {}
    shuffle_bytes: dict[str, int] = {}
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1"
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = subset.split(",") if subset else (COLD_TRAINED if cold else HEADLINE)
    names = [n for n in headline if n in QUERIES]
    # warm the JVM + parquet footers AND the Arrow Python worker pool once
    # (spark.python.worker.reuse keeps them alive), so per-query timings
    # measure steady-state execution, not one-time spawn cost — otherwise
    # the first Arrow query in the list is billed ~10s of worker startup.
    # COLD mode warms with a NEUTRAL query: warming with names[0] would
    # train the first family before its timed (cold) run.
    warm = "q_pricing_summary" if cold else names[0]
    QUERIES[warm](spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for name in names:
        # min of 2 consecutive executions = steady-state (the number that
        # predicts cluster throughput; single-shot sub-second timings are
        # dominated by one-time codegen/compile — see docs/BENCH_DRIFT_r5.md)
        #
        # Materialization: count() by default — the historical trajectory
        # metric.  Catalyst COLUMN-PRUNES a count(), so per-row projection
        # queries (q_quality_rules, q_repetition, ...) measure plan
        # overhead, not expression cost; aggregate queries (most of the
        # catalog) are unaffected.  SPARK_GRAFT_BENCH_MATERIALIZE=full
        # switches to the noop DSv2 sink, which evaluates EVERY output
        # column without collecting — the "write the result" cost a real
        # pipeline pays (artifact: BENCH_MATERIALIZED_r11.json).
        full_mat = os.environ.get("SPARK_GRAFT_BENCH_MATERIALIZE") == "full"
        samples = []
        pre_stages: dict[int, int] = {}
        for run in range(2):
            if run == 1:
                # snapshot between runs: the recorded volume is the SECOND
                # run's — steady-state, matching the min-of-2 wall time
                pre_stages = stage_shuffle_bytes(spark)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            if full_mat:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            samples.append(round(time.time() - t0, 3))
        post_stages = stage_shuffle_bytes(spark)
        shuffle_bytes[name] = sum(
            b for sid, b in post_stages.items() if sid not in pre_stages
        )
        # cold mode records the FIRST run — the one that pays in-session
        # training (fresh JVM assumed; see COLD_TRAINED)
        timings[name] = samples[0] if cold else min(samples)
        print(
            f"# {name}: {timings[name]}s (runs={samples}) rows={n} "
            f"shuffle={shuffle_bytes[name]}B",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    child_out = os.environ.get("SPARK_GRAFT_BENCH_CHILD")
    if child_out:
        # isolate-mode sample: hand the per-query map to the parent and
        # leave BENCH_DETAIL.json / stdout to the aggregator
        with open(child_out, "w") as fh:
            json.dump({"queries": timings, "sf": sf_val}, fh)
        spark.stop()
        return 0
    # full per-query map goes to a sidecar artifact — the single stdout JSON
    # line must stay SMALL (the round-5 73-query line outgrew the driver's
    # tail buffer and parsed as null), so it carries totals + the slowest 10
    # per-source ETL sweep seconds (round-6 task #8): fixture-scale but
    # round-over-round stable, so a rebuilt pipeline whose plan regressed
    # shows as a step change.  OPT-IN (the 41-source sweep adds ~8 min,
    # which must not sit on the driver's per-round bench path): set
    # SPARK_GRAFT_SOURCE_BENCH=1, or run tools/bench_sources.py standalone
    # — either way the result lands in BENCH_SOURCES.json, committed at
    # round close.
    sources: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_SOURCE_BENCH") == "1":
        try:
            from tools.bench_sources import bench_sources, write_sources_artifact

            sources = bench_sources(spark)
            write_sources_artifact(sources)
        except Exception as ex:  # noqa: BLE001 — sweep failure must not sink the bench line
            print(f"# source sweep failed: {ex}", file=sys.stderr)
    # cold runs land in their own artifact and metric name: they must
    # never clobber (or be confused with) the driver's steady-state line
    metric = "cold_trained_first_run" if cold else "headline_queries_total"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_COLD.json" if cold else "BENCH_DETAIL.json",
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {"metric": metric, "value": total, "unit": "sec",
             "queries": timings,
             # per-query steady-state shuffle WRITE volume (round-11 verdict
             # item #8): the plan-regression tripwire wall time can't see at
             # small SF — a lost broadcast or extra exchange is a bytes jump
             "shuffle_write_bytes": shuffle_bytes,
             "sources": sources or "see BENCH_SOURCES.json (opt-in sweep)",
             "sf": sf_val},
            fh, indent=1,
        )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "shuffle_total_mb": round(sum(shuffle_bytes.values()) / 1e6, 1),
                "detail": os.path.basename(detail_path),
                "sf": sf_val,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
