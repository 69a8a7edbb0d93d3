"""Multi-source ETL CLI — the dipper-etl analog (SURVEY.md §3.1).

Reference: dipper-etl.py — CLI contract 64-128 (--sources --limit --taxon
--dest_fmt -t/--test_only --skip_tests), source loop 219-268 with per-phase
timing (fetch 240-241, parse 246-251, write 266-268), property-axiom
enrichment 256-264, per-source outputs out/<src>.<fmt> + <src>_dataset.<fmt>
(Source.write, Source.py:178-240).

Usage::

    python -m dipper_spark.etl --sources hpoa,ctd --raw-dir raw/ --out-dir out/ \
        --dest-fmt nt [--limit N] [-t] [--skolemize]
"""

from __future__ import annotations

import argparse
import logging
import time

from pyspark.sql import SparkSession

LOG = logging.getLogger("dipper_spark.etl")
FORMATS = ("nt", "nquads", "ttl", "rdfxml", "n3", "parquet")


def run(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    from dipper_spark.core import union_graphs
    from dipper_spark.core.curie import CurieMap
    from dipper_spark.io import (
        to_nquads,
        write_graph_parquet,
        write_n3,
        write_nt,
        write_rdfxml,
        write_turtle_auto,
    )
    from dipper_spark.models import hcls_dataset_triples
    from dipper_spark.quality import add_property_axioms, default_property_table
    from dipper_spark.session import get_spark
    from dipper_spark.sources import REGISTRY, get_pipeline

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sources", required=True, help="comma-separated source names")
    ap.add_argument("--raw-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--dest-fmt", default="nt", choices=FORMATS)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("-t", "--test-only", action="store_true", help="test-id subset mode (P6)")
    ap.add_argument("--skolemize", action="store_true", help="skolemize blank nodes")
    ap.add_argument("--no-axioms", action="store_true", help="skip property-axiom enrichment")
    ap.add_argument(
        "--fetch", action="store_true",
        help="stage declared source files into raw-dir before transforming (S1)",
    )
    ap.add_argument("--force-fetch", action="store_true", help="re-download even when fresh")
    ap.add_argument("--cache-base", default=None, help="web-cache base url tried before origin")
    ap.add_argument(
        "--fetch-only", action="store_true",
        help="stage source files and stop (dipper-etl --fetch_only)",
    )
    ap.add_argument(
        "--parse-only", action="store_true",
        help="transform and report triple counts without writing output "
        "(dipper-etl --parse_only)",
    )
    ap.add_argument(
        "--taxon", default=None,
        help="comma-separated NCBITaxon numbers constraining sources that "
        "declare tax_ids (dipper-etl -t/--taxon; NCBIGene, Panther, BioGrid, "
        "UCSCBands, GO)",
    )
    ap.add_argument(
        "--data-release-version", default=None,
        help="release tag (e.g. 201908) used in the dataset stanza's version "
        "and distribution IRIs (dipper-etl -d)",
    )
    ap.add_argument(
        "--ttl-parts", action="store_true",
        help="force --dest-fmt ttl to the distributed part-file layout "
        "(<src>.ttl.parts/) regardless of graph size",
    )
    ap.add_argument(
        "--ttl-parts-threshold", type=int, default=1_000_000,
        help="triple count at/above which --dest-fmt ttl switches from the "
        "driver-streamed single file to the distributed part-file layout",
    )
    args = ap.parse_args(argv)

    own_spark = spark is None
    spark = spark or get_spark("dipper_spark-etl")
    names = [s.strip() for s in args.sources.split(",") if s.strip()]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown sources {unknown}; available: {sorted(REGISTRY)}")

    report: dict = {"sources": {}, "fmt": args.dest_fmt}
    props = default_property_table(spark)
    taxa = (
        [t.strip() for t in args.taxon.split(",") if t.strip()]
        if args.taxon
        else None
    )
    for name in names:
        timings: dict[str, float] = {}
        pipe = get_pipeline(name)
        if taxa is not None and hasattr(pipe, "tax_ids"):
            # reference semantics (dipper-etl.py:95-105 + Source.settaxon):
            # constrain a taxon-aware source to the supplied ids
            pipe.tax_ids = taxa
        source_files: dict | None = None
        if args.fetch:
            t_f = time.time()
            staged = pipe.fetch(
                args.raw_dir, is_dl_forced=args.force_fetch, cache_base=args.cache_base
            )
            timings["fetch"] = round(time.time() - t_f, 3)
            LOG.info("%s: staged %s", name, staged)
            # staged-file provenance for the dataset stanza: file IRI →
            # retrieval date (version-level dc:source + pav:retrievedOn,
            # Dataset.py:77-84)
            import datetime
            import os as _os

            source_files = {}
            for contract in pipe.files.values():
                local = f"{args.raw_dir.rstrip('/')}/{contract.file}"
                if contract.url and _os.path.exists(local):
                    source_files[contract.url] = {
                        "retrieved_on": datetime.date.fromtimestamp(
                            _os.path.getmtime(local)
                        ).isoformat()
                    }
        if args.fetch_only:
            report["sources"][name] = timings
            continue
        t0 = time.time()
        graph = pipe.transform(
            spark, args.raw_dir, limit=args.limit, test_mode=args.test_only
        )
        # Truncate lineage before fanning out: metadata stats, property-axiom
        # enrichment, the prefix scan and the sink each re-embed this plan in
        # a union arm, and for emitter-heavy sources (IMPC's SEPIO star) the
        # repeated Catalyst analysis of the multiplied tree OOMs the driver.
        # localCheckpoint resets the logical plan to a scan of the computed
        # partitions; the durable 100 TB equivalent is a parquet intermediate
        # (write_graph_parquet) between transform and sink.
        graph = graph.localCheckpoint(eager=True)
        # dataset metadata graph unioned into the output (U1, Source.py:228-229)
        # — the full three-level HCLS stanza (summary/version/distribution)
        meta = hcls_dataset_triples(
            spark, graph, name, ingest_title=name,
            distribution_type=args.dest_fmt, source_files=source_files,
            graph_id=name, data_release_version=args.data_release_version,
        )
        if not args.no_axioms:
            graph = add_property_axioms(graph, props)
        out = union_graphs(graph, meta)
        if not args.parse_only:
            # The sink issues several actions (prefix/size profile, range
            # sampling, partition fetches); without this checkpoint each
            # one re-executes the meta-stats and axiom-join union arms —
            # the residual fixed cost docs/ETL_WRITE_OVERHEAD.md measured
            # at ~0.8 s/action on fixture graphs.  One eager checkpoint
            # runs them once; every sink action then scans cached
            # partitions.
            out = out.localCheckpoint(eager=True)
        timings["transform"] = round(time.time() - t0, 3)

        if args.parse_only:
            timings["n_triples"] = out.count()
            report["sources"][name] = timings
            LOG.info("%s: parse-only, %d triples", name, timings["n_triples"])
            continue

        t1 = time.time()
        dest = f"{args.out_dir.rstrip('/')}/{name}"
        suffix = "_test" if args.test_only else ""
        if args.dest_fmt == "nt":
            write_nt(out, f"{dest}{suffix}.nt", skolemize=args.skolemize)
        elif args.dest_fmt == "nquads":
            # per-source graph IRI, as the reference names each source graph
            # MonarchData:<src>.ttl (Source.py:186-190)
            graph_iri = CurieMap().expand_str(f"MonarchData:{name}.ttl")
            to_nquads(out, graph_iri=graph_iri, skolemize=args.skolemize).orderBy(
                "line"
            ).write.mode("overwrite").text(f"{dest}{suffix}.nq")
        elif args.dest_fmt == "ttl":
            # size-dispatched (round-12 verdict item #2): small graphs keep
            # the reference's single-file contract; large ones write the
            # distributed part-file layout — no driver byte funnel
            write_turtle_auto(
                out, f"{dest}{suffix}.ttl",
                parts_threshold=args.ttl_parts_threshold,
                force_parts=args.ttl_parts,
            )
        elif args.dest_fmt == "rdfxml":
            write_rdfxml(out, f"{dest}{suffix}.rdf")
        elif args.dest_fmt == "n3":
            write_n3(out, f"{dest}{suffix}.n3")
        else:
            write_graph_parquet(out, f"{dest}{suffix}.parquet")
        timings["write"] = round(time.time() - t1, 3)
        report["sources"][name] = timings
        LOG.info("%s: transform %.1fs write %.1fs", name, timings["transform"], timings["write"])

    if own_spark:
        spark.stop()
    return report


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    run()
