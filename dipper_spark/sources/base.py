"""SourcePipeline protocol + registry (SURVEY.md §2.11, §7.1-5).

Reference: every dipper source subclasses ``Source`` with a declarative
``files`` contract and ``fetch()``/``parse()`` overrides
(dipper/sources/Source.py:160-176); the CLI maps names to classes through a
registry dict and dynamic import (dipper-etl.py:20-62,209-212).

Spark-first shape: ``fetch`` stays a driver-side staging step (network IO is
not a cluster op — §2.1 S1); ``transform(spark, raw_dir)`` is a pure
DataFrame DAG ending in the canonical triples schema.  Test mode (P6) and
row limits (P7) are first-class transform args, applied as early filters so
Catalyst pushes them into the scan.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FileContract:
    """One entry of a source's ``files`` dict (reference shape:
    ``{key: {file, url, columns}}``, e.g. HPOAnnotations.py:59-110)."""

    file: str
    url: str | None = None
    columns: list[str] = field(default_factory=list)
    #: row-tag for giant single-file XML releases: staging splits the
    #: download at this stanza boundary so the scan parallelizes
    #: (io.staging.split_xml_stanzas)
    split_tag: str | None = None
    split_stanzas: int = 5000
    #: contract may be absent from raw_dir; the pipeline degrades (documented
    #: per-source) instead of failing — e.g. ncbigene's OMIM typing dimension
    optional: bool = False


class SourcePipeline:
    """Base per-source pipeline.  Subclasses set ``name``, ``files`` and
    implement ``transform``; ``fetch`` is optional (staging is out of band
    in tests, which write fixture files straight into raw_dir)."""

    name: str = "abstract"
    files: dict[str, FileContract] = {}
    #: curies whose rows are kept in test mode (resources/test_ids.yaml shape)
    test_ids: list[str] = []

    def path(self, raw_dir: str, key: str) -> str:
        return f"{raw_dir.rstrip('/')}/{self.files[key].file}"

    def transform(
        self,
        spark: SparkSession,
        raw_dir: str,
        *,
        limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        raise NotImplementedError

    def fetch(
        self,
        raw_dir: str,
        *,
        is_dl_forced: bool = False,
        cache_base: str | None = None,
    ) -> dict[str, str]:
        """Stage this source's declared files into ``raw_dir`` with
        conditional-download freshness (S1; Source.get_files/fetch_from_url,
        Source.py:280-494).  Driver-side network IO — the cluster only scans
        what lands here.  Returns a per-file staging report."""
        from dipper_spark.io.staging import stage_files

        return stage_files(
            self, raw_dir, is_dl_forced=is_dl_forced, cache_base=cache_base
        )

    def test_filter(self, df: DataFrame, col: str, test_mode: bool) -> DataFrame:
        """Test-id subsetting (reference: HPOAnnotations.py:215-221,
        MGI.py:531-533; ids from resources/test_ids.yaml).  A literal isin
        over a curated list — Catalyst turns it into a pushed-down IN."""
        if not test_mode:
            return df
        return df.filter(F.col(col).isin(list(self.test_ids)))


#: name -> pipeline class, the analog of dipper-etl.py:20-62
REGISTRY: dict[str, type[SourcePipeline]] = {}


def register(cls: type[SourcePipeline]) -> type[SourcePipeline]:
    REGISTRY[cls.name] = cls
    return cls


def get_pipeline(name: str) -> SourcePipeline:
    try:
        return REGISTRY[name]()
    except KeyError:
        raise KeyError(f"unknown source '{name}' (have: {sorted(REGISTRY)})") from None


def run_sources(
    spark: SparkSession,
    names: Iterable[str],
    raw_dir: str,
    *,
    limit: int | None = None,
    test_mode: bool = False,
) -> DataFrame:
    """Multi-source run unioned into one graph (the analog of the CLI loop
    dipper-etl.py:219-268 + Jenkins parallel stages): per-source DAGs are
    independent Spark jobs; the union is a zero-shuffle unionByName."""
    from dipper_spark.core import union_graphs

    outs = [
        get_pipeline(n).transform(spark, raw_dir, limit=limit, test_mode=test_mode)
        for n in names
    ]
    return union_graphs(*outs)
