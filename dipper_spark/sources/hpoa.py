"""HPO annotations (phenotype.hpoa) pipeline — the M2 end-to-end slice.

Reference: dipper/sources/HPOAnnotations.py:162-332 (``_process_phenotype_hpoa``).
Covers: TSV scan w/ preamble + '#'-prefixed header (S2), header contract
(§1.3), Qualifier≠NOT filter (P2), test-id subset (P6), limit (P7), aspect
dispatch (P10), evidence translation-table resolve, malformed-curie pub
rejection (P8), OMIM→url pub rewrite, D2P reified associations with
onset/frequency, sex-specificity decoration, publication typing.

Whole pipeline is select/filter/explode/union — one scan, no shuffle until
the final dedup; every filter sits directly on the scan so Catalyst pushes
it down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.core import CURIE_REGEXP, TranslationTable, make_triples, union_graphs
from dipper_spark.models import class_triples, d2p_association_triples
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

#: per-source localtt (reference: translationtable/hpoa.yaml) composed with
#: the globaltt label→curie hop (Source.resolve, Source.py:751-796)
EVIDENCE_TT = TranslationTable(
    globaltt={
        "evidence used in automatic assertion": "ECO:0000501",
        "experimental evidence used in manual assertion": "ECO:0000269",
        "author statement supported by traceable reference used in manual assertion": "ECO:0000304",
        "computational combinatorial evidence used in automatic assertion": "ECO:0000246",
        "curator inference used in manual assertion": "ECO:0000305",
    },
    localtt={
        "IEA": "evidence used in automatic assertion",
        "PCS": "experimental evidence used in manual assertion",
        "TAS": "author statement supported by traceable reference used in manual assertion",
        "ITM": "computational combinatorial evidence used in automatic assertion",
        "ICE": "curator inference used in manual assertion",
    },
)

HAS_PHENOTYPE = "RO:0002200"    # globaltt['has phenotype']
HAS_DISPOSITION = "RO:0000091"  # globaltt['has disposition']
HAS_SEX_SPECIFICITY = ":has_sex_specificity"
SEX_TERMS = {"male": "PATO:0000384", "female": "PATO:0000383"}
JOURNAL_ARTICLE = "IAO:0000013"  # globaltt['journal article']
PUBLICATION = "IAO:0000311"      # globaltt['publication']
WEB_PAGE = "SIO:000302"          # globaltt['web page']


@register
class HpoaPipeline(SourcePipeline):
    name = "hpoa"
    files = {
        "annot": FileContract(
            file="phenotype.hpoa",
            url="http://purl.obolibrary.org/obo/hp/hpoa/phenotype.hpoa",
            # reference contract: HPOAnnotations.py:59-82
            columns=[
                "DatabaseID", "DiseaseName", "Qualifier", "HPO_ID", "Reference",
                "Evidence", "Onset", "Frequency", "Sex", "Modifier", "Aspect",
                "Biocuration",
            ],
        ),
    }
    test_ids = ["OMIM:119600", "OMIM:120160", "ORPHA:93400", "DECIPHER:1"]

    def read(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """phenotype.hpoa has 4 '#' preamble lines, then a header whose first
        cell is '#DatabaseID' (HPOAnnotations.py:188-207).  Read headerless,
        drop '#'-rows (preamble AND header), bind contract columns by
        position — the header row itself is contract-checked driver-side."""
        cols = self.files["annot"].columns
        schema = " ".join(f"`{c}` string," for c in cols).rstrip(",")
        raw = spark.read.option("sep", "\t").schema(schema).csv(self.path(raw_dir, "annot"))
        df = raw.filter(~F.col("DatabaseID").startswith("#"))
        for c in df.columns:  # row = [str(col).strip() ...] HPOAnnotations.py:208
            df = df.withColumn(c, F.trim(F.coalesce(F.col(c), F.lit(""))))
        return df

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        g = self.name
        df = self.read(spark, raw_dir)
        df = self.test_filter(df, "DatabaseID", test_mode)
        if limit:
            df = df.limit(limit)

        # rows0 = post-qualifier-filter rows of ANY aspect: the reference adds
        # the disease/evidence/onset class declarations BEFORE the aspect
        # dispatch (HPOAnnotations.py:241-245), so even an unknown-aspect row
        # contributes them
        rows0 = (
            df.filter(F.col("Qualifier") != "NOT")  # P2, HPOAnnotations.py:225-226
            .select(
                F.col("DatabaseID").alias("disease_id"),
                F.col("HPO_ID").alias("phenotype_id"),
                F.col("Reference").alias("publist"),
                EVIDENCE_TT.resolve("Evidence").alias("eco_id"),
                F.col("Onset").alias("onset"),
                F.col("Frequency").alias("frequency"),
                F.lower("Sex").alias("sex"),
                F.col("Aspect").alias("aspect"),
            )
        )
        rows = (
            # unknown aspects build no association (HPOAnnotations.py:261-263
            # falls into the else: LOG.error branch; the reference then
            # decorates the PREVIOUS row's stale assoc object — a
            # row-order-dependent bug we deliberately do NOT reproduce:
            # unknown-aspect rows here contribute their class declarations
            # and nothing else)
            rows0.filter(F.col("aspect").isin("P", "M", "I", "C"))
            .withColumn(
                # aspect dispatch (P10): P/M → has phenotype w/ onset+freq,
                # I/C → has disposition, no qualifiers (HPOAnnotations.py:246-261)
                "predicate",
                F.when(F.col("aspect").isin("P", "M"), F.lit(HAS_PHENOTYPE))
                .otherwise(F.lit(HAS_DISPOSITION)),
            )
            # I/C rows carry NO onset/frequency attributes: the reference
            # builds D2PAssoc(..., rel=...) with onset=None/frequency=None,
            # and make_association_id FILTERS None (but keeps '') before the
            # '+'-join — concat_ws mirrors exactly that (skips NULL, keeps
            # empty string), so NULL here is what keeps the id digests
            # bit-compatible (Association.py:282-288, D2PAssoc.py:91-105)
            .withColumn(
                "onset",
                F.when(F.col("aspect").isin("P", "M"), F.col("onset")).otherwise(F.lit(None)),
            )
            .withColumn(
                "frequency",
                F.when(F.col("aspect").isin("P", "M"), F.col("frequency")).otherwise(F.lit(None)),
            )
            # evidence[] is an array on the assoc (Association.py:37-40)
            .withColumn("evidence", F.array("eco_id"))
        )

        # reified D2P associations (+ onset/frequency on the assoc node)
        # the reference calls assoc.add_association_to_graph() ONLY inside
        # the per-publication loop, after the malformed-ref and pubtype-ladder
        # `continue`s (HPOAnnotations.py:280-327) — so a row with ZERO valid
        # publications emits NO association star / direct edge / onset /
        # frequency / evidence triples (its classes and sex triple still
        # appear, being emitted before the loop).  Mirrored with a map-side
        # EXISTS over the split publist — no join, no shuffle.
        _p = lambda c: F.trim(c)
        valid_pub = lambda c: _p(c).startswith("http") | (
            _p(c).rlike(CURIE_REGEXP)
            & (
                _p(c).startswith("PMID:")
                | _p(c).startswith("ISBN")
                | _p(c).startswith("OMIM:")
                | _p(c).startswith("DECIPHER:")
                | _p(c).startswith("ORPHA:")
            )
        )
        rows = rows.withColumn(
            "has_valid_pub", F.exists(F.split("publist", ";"), valid_pub)
        )

        # definedby is the SOURCE name in the id digest — the reference
        # constructs D2PAssoc(graph, self.name, ...) (HPOAnnotations.py:248,
        # Association.make_association_id)
        assoc = d2p_association_triples(
            rows.filter("has_valid_pub"), "disease_id", "phenotype_id", "predicate",
            onset_col="onset", frequency_col="frequency",
            evidence_col="evidence", definedby=g, graph_id=g,
        )

        keyed = with_assoc_id(
            rows.withColumn("_pred", F.col("predicate")),
            "disease_id", "_pred", "phenotype_id", definedby=g,
            extra_cols=["onset", "frequency"],
        )

        # sex-specificity decoration on the assoc node (HPOAnnotations.py:264-270)
        sex = make_triples(
            keyed.filter(F.col("sex").isin(*SEX_TERMS)),
            "assoc_id", F.lit(HAS_SEX_SPECIFICITY),
            F.element_at(F.create_map(*[F.lit(x) for kv in SEX_TERMS.items() for x in kv]), F.col("sex")),
            graph_id=g,
        )

        # publications: split ';', strip, reject malformed non-http non-curie
        # refs (HPOAnnotations.py:280-288), rewrite OMIM:n → omim url (296-298),
        # type by prefix, attach as dc:source on the assoc node (319-323)
        pubs = (
            keyed.select("assoc_id", F.explode(F.split("publist", ";")).alias("pub"))
            .withColumn("pub", F.trim("pub"))
            .filter(F.col("pub").startswith("http") | F.col("pub").rlike(CURIE_REGEXP))
            .withColumn(
                "pubtype",
                F.when(F.col("pub").startswith("PMID:"), F.lit(JOURNAL_ARTICLE))
                .when(F.col("pub").startswith("ISBN"), F.lit(PUBLICATION))
                .when(
                    F.col("pub").startswith("OMIM:")
                    | F.col("pub").startswith("DECIPHER:")
                    | F.col("pub").startswith("ORPHA:")
                    | F.col("pub").startswith("http"),
                    F.lit(WEB_PAGE),
                ),
            )
            .filter(F.col("pubtype").isNotNull())
            # the reference rewrites OMIM:n → 'http://omim.org/entry/n'
            # (HPOAnnotations.py:296-298), which is exactly the curie-map
            # expansion of OMIM:n (curie_map.yaml:78) — an RDF-level no-op.
            # In this engine's curie-space triple store the CURIE is the
            # canonical spelling of that IRI, so we keep it (otherwise the
            # same node exists under two spellings and the final
            # triple-dedup can't merge them); the nt serializer expands it
            # to the identical URL bytes the reference emits.
        )
        pub_source = make_triples(pubs, "assoc_id", F.lit(T.SOURCE), "pub", is_literal=False, graph_id=g)
        pub_type = make_triples(pubs, "pub", F.lit(T.TYPE), "pubtype", graph_id=g)

        # class declarations: disease/evidence/onset from rows of ANY aspect
        # (emitted pre-dispatch, HPOAnnotations.py:241-245); the phenotype
        # class only inside the known-aspect branches (py:246-260)
        classes = union_graphs(
            class_triples(rows0.select(F.col("disease_id").alias("id")), "id", graph_id=g),
            class_triples(rows.select(F.col("phenotype_id").alias("id")), "id", graph_id=g),
            class_triples(
                rows0.filter(F.col("eco_id") != "").select(F.col("eco_id").alias("id")), "id", graph_id=g
            ),
            class_triples(
                rows0.filter(F.col("onset") != "").select(F.col("onset").alias("id")),
                "id", graph_id=g,
            ),
        )

        return union_graphs(assoc, sex, pub_source, pub_type, classes).dropDuplicates(
            ["subject", "predicate", "object"]
        )
