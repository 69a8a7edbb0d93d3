"""Contract-checked file readers (SURVEY.md §2.1 S2/S4/S6/S8, §1.3).

The reference declares a ``files = {key: {file, url, columns}}`` contract per
source and validates real headers against it before parsing
(``Source.check_fileheader``, dipper/sources/Source.py:798-828).  Here the
same contract gates a ``spark.read.csv`` scan, and columns are always selected
by NAME, never position, so upstream column reordering is harmless.

Scale notes
-----------
* csv/gz scans split per-file (gz is unsplittable) — at 100 TB the staging
  layer should land many moderate files, which these readers take as globs.
* the XML stanza reader parallelizes per *file* (an unsplittable format);
  memory stays bounded via iterparse + ``elem.clear()`` exactly like the
  reference (ClinVar.py:824-833, Source.py:529).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG = logging.getLogger(__name__)


class HeaderError(AssertionError):
    """Raised when a file header is missing expected columns
    (reference raises bare AssertionError, Source.py:819-821)."""


def check_fileheader(expected: list[str], received: list[str], src_key: str | None = None) -> bool:
    """Header-contract validation with evolution tolerance (reference:
    Source.check_fileheader, dipper/sources/Source.py:798-828).

    Hard-fails when expected columns are MISSING; warns (passes) on new or
    reordered columns.  Returns True when received covers expected.
    """
    exp, got = set(expected), set(received)
    if expected != received:
        LOG.error(
            "file resource: %s\nExpected header:\n %s\nReceived header:\n %s",
            src_key, expected, received,
        )
        if exp - got:
            LOG.error("Missing: %s", exp - got)
            raise HeaderError(f"Incoming headers are missing expected column(s): {sorted(exp - got)}")
        if got - exp:
            LOG.warning("Additional new columns: %s", got - exp)
        else:
            LOG.warning("Check columns order")
    return (exp ^ got) & exp == set()


def read_delim(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str] | None = None,
    *,
    sep: str = "\t",
    header: bool = True,
    comment: str | None = None,
    encoding: str = "UTF-8",
    header_prefix: str = "",
    src_key: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Contract-checked delimited scan (reference pattern: csv.reader loops in
    every source, e.g. HPOAnnotations.py:188-207; latin-1 cases Coriell.py:310).

    ``columns`` is the declared contract; when ``header`` the real header is
    validated via :func:`check_fileheader` then columns are selected by name.
    ``header_prefix`` strips a leading marker from the first header cell (NCBI
    ``#tax_id``, HPOA ``#DatabaseID`` shapes).  gz compression is automatic.
    ``limit`` mirrors the CLI ``--limit`` row cap (dipper-etl.py:73) — Catalyst
    pushes it into the scan (P7).
    """
    reader = (
        spark.read.option("sep", sep)
        .option("header", header)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if comment:
        reader = reader.option("comment", comment)
    df = reader.csv(path)
    if header:
        received = list(df.columns)
        if header_prefix and received:
            # literal prefix strip on the FIRST cell only (NCBI '#tax_id')
            received[0] = received[0].removeprefix(header_prefix)
        if received != df.columns:
            df = df.toDF(*received)
        if columns:
            check_fileheader(columns, received, src_key)
            df = df.select(*columns)
    elif columns:
        got_n, want_n = len(df.columns), len(columns)
        if got_n < want_n:
            # row-width sanity check (reference: Source._check_list_len,
            # Source.py:531-542; GAF col count GeneOntology.py:297-301)
            raise HeaderError(f"{src_key}: expected {want_n} columns, scan found {got_n}")
        df = df.toDF(*columns, *df.columns[want_n:]).select(*columns)
    return df.limit(limit) if limit else df


#: GAF 2.x column contract (reference: GeneOntology.py:51-69)
GAF_COLUMNS = [
    "DB", "DB_Object_ID", "DB_Object_Symbol", "Qualifier", "GO_ID",
    "DB_Reference", "Evidence_Code", "With_or_From", "Aspect",
    "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type", "Taxon",
    "Date", "Assigned_By", "Annotation_Extension", "Gene_Product_Form_ID",
]


def read_gaf(spark: SparkSession, path: str | list[str], limit: int | None = None) -> DataFrame:
    """GO gene-association scan (reference: GeneOntology.process_gaf,
    dipper/sources/GeneOntology.py:289-301; '!' comment lines, no header).

    Multi-valued columns are split to arrays (pipe-separated refs/synonyms,
    GeneOntology.py:336,365); Taxon keeps the first of the pipe pair.
    """
    df = read_delim(
        spark, path, GAF_COLUMNS, header=False, comment="!", src_key="gaf", limit=limit
    )
    # empty cells are '' not NULL in the reference's csv.reader rows
    df = df.select(*[F.coalesce(F.col(c), F.lit("")).alias(c) for c in GAF_COLUMNS])
    return df.select(
        "DB", "DB_Object_ID", "DB_Object_Symbol", "Qualifier", "GO_ID",
        F.split("DB_Reference", r"\|").alias("refs"),
        "Evidence_Code",
        F.split("With_or_From", r"\|").alias("with_from"),
        "Aspect", "DB_Object_Name",
        F.split("DB_Object_Synonym", r"\|").alias("synonyms"),
        "DB_Object_Type",
        F.regexp_replace(F.split("Taxon", r"\|").getItem(0), "^taxon:", "NCBITaxon:").alias("taxon"),
        "Date", "Assigned_By",
    )


#: GFF3 column contract (reference: AnimalQTLdb._process_qtls_genomic_location,
#: dipper/sources/AnimalQTLdb.py:633-660)
GFF_COLUMNS = [
    "seqname", "source", "feature_type", "start", "end", "score", "strand", "frame", "attributes",
]


def read_gff(spark: SparkSession, path: str | list[str], limit: int | None = None) -> DataFrame:
    """9-column GFF scan with the ``key=value;...`` attribute bag parsed into a
    MapType column (reference: AnimalQTLdb.py:690-705 builds the same dict
    row-at-a-time; WormBase.process_feature_loc WormBase.py:689+).

    Pure column expressions — ``str_to_map`` stays JVM-side.
    """
    df = read_delim(
        spark, path, GFF_COLUMNS, header=False, comment="#", src_key="gff", limit=limit
    )
    return df.select(
        "seqname", "source", "feature_type",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        "score", "strand", "frame",
        # NB: str_to_map delimiters are regexes parsed from a SQL string
        # literal — '\s' would lose its backslash and become ';s*', silently
        # eating the leading 's' of the next attribute key ('strain'→'train')
        F.expr("str_to_map(attributes, ';[ ]*', '=')").alias("attributes"),
    )


def read_mapping(spark: SparkSession, path: str) -> dict[str, str]:
    """2-column TSV label→id mapping loaded driver-side for broadcast
    (reference: Source.parse_mapping_file, dipper/sources/Source.py:683-699)."""
    rows = (
        spark.read.option("sep", "\t").csv(path)
        .select(F.col("_c0").alias("k"), F.col("_c1").alias("v"))
        .collect()
    )
    return {r["k"]: r["v"] for r in rows}


def read_xml_stanzas(
    spark: SparkSession,
    paths: list[str],
    row_tag: str,
    parse_fn: Callable[[object], dict | None],
    schema: StructType,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Streaming XML stanza scan distributed one-file-per-task (reference:
    ClinVar iterparse loop, dipper/sources/ClinVar.py:824-848; generic table
    walker Source.process_xml_table, Source.py:497-529).

    ``parse_fn(elem) -> dict | None`` maps one ``<row_tag>`` element to a row
    dict (None drops it).  A stanza whose parse raises is routed to
    ``corrupt_col`` as its serialized XML, mirroring the reference's reject
    file (ClinVar.py:753-760) as PERMISSIVE-mode corrupt-record routing.
    Memory is bounded per task: ``elem.clear()`` after every stanza.
    """
    import xml.etree.ElementTree as ET

    # copy the field list — StructType.add mutates it in place
    out_schema = StructType(list(schema.fields)).add(corrupt_col, "string")
    field_names = [f.name for f in schema.fields]

    def scan(part: Iterator[Row]) -> Iterator[Row]:
        import gzip

        for file_row in part:
            fpath = file_row.path
            opener = gzip.open if fpath.endswith(".gz") else open
            with opener(fpath, "rb") as handle:
                for _event, elem in ET.iterparse(handle):
                    if elem.tag != row_tag:
                        continue
                    try:
                        rec = parse_fn(elem)
                        if rec is not None:
                            rec = {k: rec.get(k) for k in field_names}
                            rec[corrupt_col] = None
                            yield Row(**rec)
                    except Exception:  # noqa: BLE001 — corrupt-record routing
                        bad = {k: None for k in field_names}
                        bad[corrupt_col] = ET.tostring(elem, encoding="unicode")
                        yield Row(**bad)
                    finally:
                        elem.clear()

    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(max(len(paths), 1))
    return spark.createDataFrame(files.rdd.mapPartitions(scan), out_schema)


def read_jdbc_query(
    spark: SparkSession, url: str, query: str, *, expected_count: int | None = None, **options: str
) -> DataFrame:
    """Postgres/JDBC query export with the reference's row-count integrity
    check (reference: PostgreSQLSource.fetch_query_from_pgdb,
    dipper/sources/PostgreSQLSource.py:106-152, count check 88-100).

    The reference shells out ``COPY (SELECT ...) TO STDOUT``; Spark's JDBC
    source pushes the query down and parallelizes via partitionColumn options.
    """
    df = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in options.items():
        df = df.option(k, v)
    out = df.load()
    if expected_count is not None:
        got = out.count()
        if got != expected_count:
            raise ValueError(f"JDBC row count mismatch: expected {expected_count}, got {got}")
    return out


def read_mysqldump_xml(
    spark: SparkSession,
    paths: list[str],
    tables: dict[str, list[str]],
) -> DataFrame:
    """mysql-dump XML scan: ``<database><table_data name="T"><row><field
    name="f">v</field>...`` → long DataFrame ``(table, fields map<str,str>)``.

    Reference: the OMIA dump walker — Source.process_xml_table
    (dipper/sources/Source.py:497-529) driven by three full-file iterparse
    passes in OMIA.parse (dipper/sources/OMIA.py:212-290).  Spark-first
    differences: ONE streaming pass emits every requested table's rows tagged
    by table name (the reference re-reads the gz three times); downstream
    per-table frames are column projections over the map, so Catalyst prunes
    unrequested tables at the filter.  Parallelism is per file (the dump is
    one unsplittable gz; at scale the staging layer lands per-table exports).

    ``tables`` maps table name → list of field names to keep (the declared
    contract; unexpected extra fields are dropped, missing ones are null).
    Memory is bounded: each ``<row>`` is cleared after emit, and the parent
    ``table_data`` element is cleared at its end event.
    """
    import xml.etree.ElementTree as ET

    wanted = {t: list(cols) for t, cols in tables.items()}

    def scan(part: Iterator[Row]) -> Iterator[Row]:
        import gzip
        import io as _io
        import re as _re

        ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
        for file_row in part:
            fpath = file_row.path
            opener = gzip.open if fpath.endswith(".gz") else open
            with opener(fpath, "rb") as raw:
                # the OMIA dump carries mixed-encoding control characters that
                # break the parser (reference scrubs the whole file first,
                # OMIA.scrub, OMIA.py:178-209); scrub the stream inline
                text = _io.TextIOWrapper(raw, encoding="utf-8", errors="replace", newline="")
                scrubbed = (ctrl.sub("", line) for line in text)
                current_table: str | None = None
                for event, elem in ET.iterparse(_StreamOfLines(scrubbed), events=("start", "end")):
                    if event == "start":
                        if elem.tag == "table_data":
                            current_table = elem.attrib.get("name")
                        continue
                    if elem.tag == "row" and current_table in wanted:
                        fields = {
                            f.attrib.get("name"): f.text for f in elem.findall("field")
                        }
                        yield Row(
                            table=current_table,
                            fields={k: fields.get(k) for k in wanted[current_table]},
                        )
                        elem.clear()
                    elif elem.tag == "table_data":
                        current_table = None
                        elem.clear()

    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )
    return spark.createDataFrame(
        files.rdd.mapPartitions(scan), "table string, fields map<string,string>"
    )


class _StreamOfLines:
    """Minimal read()-able wrapper over a line generator (keeps the scrubbed
    dump streaming — no whole-file buffer)."""

    def __init__(self, lines):
        self._lines = lines
        self._buf = ""

    def read(self, n: int = -1) -> str:
        while n < 0 or len(self._buf) < n:
            try:
                self._buf += next(self._lines)
            except StopIteration:
                break
        if n < 0:
            out, self._buf = self._buf, ""
        else:
            out, self._buf = self._buf[:n], self._buf[n:]
        return out


def dump_table(dump: DataFrame, table: str, columns: list[str]) -> DataFrame:
    """Project one table out of a :func:`read_mysqldump_xml` frame: filter on
    the table tag, then map-key lookups become named columns."""
    return dump.filter(F.col("table") == table).select(
        *[F.col("fields").getItem(c).alias(c) for c in columns]
    )
