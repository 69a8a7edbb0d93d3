"""MPD (Mouse Phenome Database) pipeline — the full 4-file slice.

Reference: dipper/sources/MPD.py —
- straininfo scan (``_process_straininfo`` 213-277): strain individuals
  typed Mus musculus, shortname synonyms, JAX/RBRC sameAs, vendor/url
  xrefs, panel descriptions;
- measurements scan (``_process_measurements_file`` 279-324 +
  ``build_measurement_description`` 543-588): assay label/description
  metadata;
- ontology_mappings scan (``_process_ontology_mappings_file`` 186-211):
  assay → MP/VT term sets;
- strainmeans scan + |zscore| >= 2 threshold
  (``_process_strainmeans_file`` 326-388, ``_fill_provenance_graph``
  390-455, threshold 416-418, P4) driving sex-qualified-genotype G2P
  associations (``_add_g2p_assoc`` 458-530): strain→genotype bnode,
  sex-specific genotype bnode, per-MP-term association with assay + ECO
  evidence, zscore comment, sex specificity.

An association requires BOTH a measurements row AND an ontology mapping
for its assay (the reference's try/KeyError + ``ont_terms is None`` guards
skip otherwise).

Spark shape: strainmeans is the only large input — the three metadata
files join in as broadcast dims; every emission is a narrow select over
the one filtered join product, so the full graph is one scan + map-side
joins + the final dedup shuffle.  The reference instead collects all four
files into driver dicts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dipper_spark.core import make_triples, union_graphs
from dipper_spark.core.ids import make_id
from dipper_spark.models import class_triples, comment_triples, g2p_association_triples
from dipper_spark.models.assoc import with_assoc_id
from dipper_spark.models import terms as T
from dipper_spark.sources.base import FileContract, SourcePipeline, register

HAS_PHENOTYPE = "RO:0002200"
EXPERIMENTAL_PHENOTYPIC_EVIDENCE = "ECO:0000059"
MUS_MUSCULUS = "NCBITaxon:10090"
ASSAY = "OBI:0000070"                  # globaltt['assay']
HAS_GENOTYPE = "GENO:0000222"
GENOMIC_BACKGROUND = "GENO:0000611"
SEX_AGNOSTIC_PART = "GENO:0000650"     # globaltt['has_sex_agnostic_part']
SEX_QUALIFIED = "GENO:0000645"
MALE_GENOTYPE = "GENO:0000646"         # globaltt['male intrinsic genotype']
FEMALE_GENOTYPE = "GENO:0000647"
HAS_SEX_SPECIFICITY = ":has_sex_specificity"
SEX_PATO = {"m": "PATO:0000384", "f": "PATO:0000383"}
#: localtt (translationtable/mpd.yaml) for the description's sex-tested slot
SEX_TESTED = {"m": "male", "f": "female", "fm": "male and female",
              "both": "male and female"}

ONT_COLUMNS = ["measnum", "ont_term", "descrip"]
STRAININFO_COLUMNS = [
    "strainname", "vendor", "stocknum", "panel", "mpd_strainid", "straintype",
    "n_proj", "n_snp_datasets", "mpd_shortname", "url",
]
MEAS_COLUMNS = [
    "measnum", "mpdsector", "projsym", "varname", "descrip", "units", "method",
    "intervention", "paneldesc", "datatype", "sextested", "nstrainstested",
    "ageweeks",
]
MPD_COLUMNS = [
    "measnum", "varname", "strain", "strainid", "sex", "mean", "nmice", "sd",
    "sem", "cv", "minval", "maxval", "zscore",
]


def _measurement_description() -> Column:
    """build_measurement_description (MPD.py:543-588), byte-for-byte,
    with the sex-tested slot passed through the mpd localtt."""
    sext = F.col("sextested")
    for k, v in SEX_TESTED.items():
        sext = F.when(F.col("sextested") == k, F.lit(v)).otherwise(sext)
    base = F.concat(
        F.lit("This is an assay of ["), F.col("descrip"),
        F.lit("] shown as a ["), F.col("datatype"),
        F.lit("] measured in ["), F.col("units"), F.lit("]"),
    )
    with_iv = F.when(
        F.col("intervention") != "",
        F.concat(base, F.lit(" in response to ["), F.col("intervention"), F.lit("]")),
    ).otherwise(base)
    return F.concat(
        with_iv,
        F.lit(".  The overall experiment is entitled ["), F.col("projsym"),
        F.lit("].  It was conducted in ["), sext,
        F.lit("] mice at ["), F.col("ageweeks"),
        F.lit("] of age in ["), F.col("nstrainstested"),
        F.lit("] different mouse strains. "),
    )


@register
class MpdPipeline(SourcePipeline):
    name = "mpd"
    files = {
        "ontology_mappings": FileContract(
            file="ontology_mappings.csv",
            url="https://phenome.jax.org/download/ontology_mappings.csv",
            columns=ONT_COLUMNS,
        ),
        "straininfo": FileContract(
            file="straininfo.csv",
            url="https://phenome.jax.org/download/straininfo.csv",
            columns=STRAININFO_COLUMNS,
        ),
        "assay_metadata": FileContract(
            file="measurements.csv",
            url="https://phenome.jax.org/download/measurements.csv",
            columns=MEAS_COLUMNS,
        ),
        "strainmeans": FileContract(
            file="strainmeans.csv.gz",
            url="https://phenome.jax.org/download/strainmeans.csv.gz",
            columns=MPD_COLUMNS,
        ),
    }
    z_threshold = 2.0  # self.stdevthreshold (MPD.py:416-418)

    def transform(
        self, spark: SparkSession, raw_dir: str, *, limit: int | None = None,
        test_mode: bool = False,
    ) -> DataFrame:
        from dipper_spark.io import read_delim

        g = self.name

        # ---- strain individuals (MPD.py:213-277) ----------------------
        st = read_delim(
            spark, self.path(raw_dir, "straininfo"), STRAININFO_COLUMNS,
            sep=",", src_key=self.name,
        ).select(
            F.concat(F.lit("MPD-strain:"), F.col("mpd_strainid")).alias("strain_id"),
            F.col("strainname").alias("strain_label"),
            F.trim("mpd_shortname").alias("shortname"),
            "vendor", "stocknum", "panel", "url",
        )
        st = self.test_filter(st, "strain_id", test_mode)
        strain_graph = union_graphs(
            # addIndividualToGraph(strain_id, strain_name, tax_id)
            make_triples(st, "strain_id", F.lit(T.TYPE), F.lit(MUS_MUSCULUS), graph_id=g),
            make_triples(st, "strain_id", F.lit(T.LABEL), "strain_label", is_literal=True, graph_id=g),
            make_triples(
                st.filter(F.col("shortname") != ""),
                "strain_id", F.lit(T.HAS_EXACT_SYNONYM), "shortname",
                is_literal=True, graph_id=g,
            ),
            # vendor J → JAX sameAs; Rbrc → RBRC sameAs (MPD.py:252-262)
            make_triples(
                st.filter((F.col("stocknum") != "") & (F.col("vendor") == "J")),
                "strain_id", F.lit(T.SAME_AS),
                F.concat(F.lit("JAX:"), F.col("stocknum")), graph_id=g,
            ),
            make_triples(
                st.filter((F.col("stocknum") != "") & (F.col("vendor") == "Rbrc")),
                "strain_id", F.lit(T.SAME_AS),
                F.concat(F.lit("RBRC:"), F.col("stocknum")), graph_id=g,
            ),
            # other vendors: url + vendor:stocknum xrefs AS LITERALS
            # (MPD.py:263-271, addXref(..., True))
            make_triples(
                st.filter(
                    (F.col("stocknum") != "")
                    & ~F.col("vendor").isin("J", "Rbrc")
                    & (F.col("url") != "")
                ),
                "strain_id", F.lit(T.HAS_DBXREF), "url", is_literal=True, graph_id=g,
            ),
            make_triples(
                st.filter(
                    (F.col("stocknum") != "")
                    & ~F.col("vendor").isin("J", "Rbrc")
                    & (F.col("vendor") != "")
                ),
                "strain_id", F.lit(T.HAS_DBXREF),
                F.concat_ws(":", "vendor", "stocknum"), is_literal=True, graph_id=g,
            ),
            make_triples(
                st.filter(F.col("panel") != ""),
                "strain_id", F.lit(T.DESCRIPTION),
                F.concat(F.col("panel"), F.lit(" [panel]")), is_literal=True, graph_id=g,
            ),
            # model.addClassToGraph(taxon_id, None) — emitted unconditionally
            class_triples(
                spark.createDataFrame([(MUS_MUSCULUS,)], ["id"]), "id", graph_id=g
            ),
        )

        # ---- assay metadata + ontology mappings (broadcast dims) ------
        meas = read_delim(
            spark, self.path(raw_dir, "assay_metadata"), MEAS_COLUMNS,
            sep=",", src_key=self.name,
        ).select(
            F.col("measnum").alias("assay_num"),
            F.col("descrip").alias("assay_label"),
            _measurement_description().alias("assay_description"),
        )
        onts = (
            read_delim(
                spark, self.path(raw_dir, "ontology_mappings"), ONT_COLUMNS,
                sep=",", src_key=self.name,
            )
            .filter(F.col("ont_term").rlike(r"^(MP|VT)"))  # MPD.py:205
            .select(F.col("measnum").alias("assay_num"), "ont_term")
            .distinct()  # ont_terms is a SET in the reference
        )

        # ---- threshold pass over strainmeans (the big scan) -----------
        sm = read_delim(
            spark, self.path(raw_dir, "strainmeans"), MPD_COLUMNS, sep=",",
            src_key=self.name, limit=limit,
        ).select(
            F.col("strainid"),
            F.concat(F.lit("MPD-strain:"), F.col("strainid")).alias("strain_id"),
            F.col("measnum").alias("assay_num"),
            F.concat(F.lit("MPD-assay:"), F.col("measnum")).alias("assay_id"),
            "sex",
            F.col("zscore").cast("double").alias("zscore"),
        )
        sm = self.test_filter(sm, "strain_id", test_mode)
        passing = sm.filter(
            F.col("zscore").isNotNull() & (F.abs("zscore") >= self.z_threshold)
        )
        # an association needs measurement metadata AND >=1 MP/VT mapping
        # (try/KeyError + ont_terms-None guards, MPD.py:425-448) AND a
        # strain label (the reference would crash concatenating None)
        rows = (
            passing.join(F.broadcast(meas), "assay_num")
            .join(F.broadcast(onts), "assay_num")
            .join(
                F.broadcast(st.select("strain_id", "strain_label")), "strain_id"
            )
        )
        rows = (
            rows.withColumn(
                "genotype_id",
                make_id(
                    F.concat(F.lit("MPD-strain"), F.col("strainid"), F.lit("-genotype")),
                    prefix="_",
                ),
            )
            .withColumn(
                "sex_geno_id",
                make_id(
                    F.concat_ws(
                        "-",
                        F.concat(F.lit("MPD-strain"), F.col("strainid")),
                        F.col("sex"), F.lit("genotype"),
                    ),
                    prefix="_",
                ),
            )
            .withColumn("predicate", F.lit(HAS_PHENOTYPE))
            .withColumn(
                "evidence",
                F.array(F.col("assay_id"), F.lit(EXPERIMENTAL_PHENOTYPIC_EVIDENCE)),
            )
            .withColumn(
                "comment",
                F.concat(
                    F.col("assay_label"), F.lit(" (zscore="),
                    F.col("zscore").cast("string"), F.lit(")"),
                ),
            )
        )

        # ---- genotype scaffolding (MPD.py:479-516) --------------------
        sex_type = (
            F.when(F.col("sex") == "m", F.lit(MALE_GENOTYPE))
            .when(F.col("sex") == "f", F.lit(FEMALE_GENOTYPE))
            .otherwise(F.lit(SEX_QUALIFIED))
        )
        geno = union_graphs(
            make_triples(rows, "genotype_id", F.lit(T.TYPE), F.lit(GENOMIC_BACKGROUND), graph_id=g),
            make_triples(
                rows, "genotype_id", F.lit(T.LABEL),
                F.concat(F.lit("["), F.col("strain_label"), F.lit("]")),
                is_literal=True, graph_id=g,
            ),
            make_triples(rows, "strain_id", F.lit(HAS_GENOTYPE), "genotype_id", graph_id=g),
            make_triples(rows, "sex_geno_id", F.lit(T.TYPE), sex_type, graph_id=g),
            make_triples(
                rows, "sex_geno_id", F.lit(T.LABEL),
                F.concat(F.col("strain_label"), F.lit(" ("), F.col("sex"), F.lit(")")),
                is_literal=True, graph_id=g,
            ),
            make_triples(rows, "sex_geno_id", F.lit(SEX_AGNOSTIC_PART), "genotype_id", graph_id=g),
        )

        # ---- assay individuals (Provenance.add_assay_to_graph) --------
        assay_nodes = union_graphs(
            make_triples(rows, "assay_id", F.lit(T.TYPE), F.lit(ASSAY), graph_id=g),
            make_triples(
                rows, "assay_id", F.lit(T.LABEL),
                F.concat(F.col("assay_label"), F.lit(" ("), F.col("assay_num"), F.lit(")")),
                is_literal=True, graph_id=g,
            ),
            make_triples(
                rows, "assay_id", F.lit(T.DESCRIPTION), "assay_description",
                is_literal=True, graph_id=g,
            ),
        )

        # ---- G2P associations (MPD.py:518-530) ------------------------
        assoc = g2p_association_triples(
            rows, "sex_geno_id", "ont_term", "predicate",
            evidence_col="evidence", definedby=g, graph_id=g,
        )
        keyed = with_assoc_id(
            rows.withColumn("_pred", F.col("predicate")),
            "sex_geno_id", "_pred", "ont_term", definedby=g,
        )
        decorations = union_graphs(
            comment_triples(keyed, "assoc_id", "comment", graph_id=g),
            make_triples(
                keyed.filter(F.col("sex").isin(*SEX_PATO)),
                "assoc_id", F.lit(HAS_SEX_SPECIFICITY),
                F.element_at(
                    F.create_map(*[F.lit(x) for kv in SEX_PATO.items() for x in kv]),
                    F.col("sex"),
                ),
                graph_id=g,
            ),
        )

        return union_graphs(
            strain_graph, geno, assay_nodes, assoc, decorations
        ).dropDuplicates(["subject", "predicate", "object"])

    def recomputed_zscores(self, spark: SparkSession, raw_dir: str) -> DataFrame:
        """Audit variant of A6: z recomputed from the group mean/stddev over
        (measnum, sex) — one window, no collect."""
        from dipper_spark.io import read_delim

        df = read_delim(
            spark, self.path(raw_dir, "strainmeans"), MPD_COLUMNS, sep=",", src_key=self.name
        )
        w = Window.partitionBy("measnum", "sex")
        m = F.col("mean").cast("double")
        return df.select(
            "measnum", "sex", "strainid", m.alias("mean"),
            ((m - F.avg(m).over(w)) / F.stddev_samp(m).over(w)).alias("z_recomputed"),
            F.col("zscore").cast("double").alias("z_published"),
        )
